package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-sketch columns for near-duplicate detection: MinHash
  * signatures, LSH band keys, and SimHash bit votes. All built on
  * Spark's XxHash64 expression (seeded by prepending the permutation
  * index to the hash input), so signatures are deterministic across
  * runs, partitionings and cluster sizes — no RNG state anywhere.
  */
object Hashing {

  /** LSH band keys: hash of each `rowsPerBand`-slice of the signature
    * (the signature itself is computed as min-aggregates over exploded
    * shingle rows — see Dedup.minhashLsh — because a per-row array
    * lambda would re-hash the shingle set per permutation).
    * Two docs sharing any band key are near-dup candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand))): _*)

  /** 16-bit band of a 64-bit SimHash (4 bands → finds all pairs with
    * Hamming distance ≤ 3 by pigeonhole). */
  def simhashBand(sim: Column, band: Int): Column =
    shiftrightunsigned(sim, band * 16).bitwiseAND(lit(0xFFFFL))

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
