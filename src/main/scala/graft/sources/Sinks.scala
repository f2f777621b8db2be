package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output layout helpers. At corpus scale the written layout IS the
  * downstream read plan: partition columns become partition-pruned
  * directories, bucket columns become shuffle-free join keys, and
  * file count controls both write parallelism and the next job's task
  * count (too many small files is the classic 100 TB failure mode).
  */
object Sinks {

  /** Write hive-partitioned parquet with a bounded file count per
    * partition: repartitions on the partition columns (plus a spread
    * key so one giant partition value still parallelizes into
    * `filesPerPartition` files, never one straggler file). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       filesPerPartition: Int = 4): Unit = {
    val spread = pmod(spark_partition_id() + monotonically_increasing_id(),
      lit(filesPerPartition))
    df.withColumn("__spread", spread)
      .repartition(partitionCols.map(col) :+ col("__spread"): _*)
      .drop("__spread")
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }

  /** Write parquet Z-ORDERED on N key columns (2 ≤ N ≤ 8): rows are
    * range-partitioned and sorted by the bit-interleaved Z-curve
    * value, so each output file covers a tight hyper-rectangle in key
    * space — min/max file statistics then prune file reads for range
    * predicates on ANY of the keys, where a single-column sort
    * clusters one key and scatters the rest (the layout trick behind
    * Delta's OPTIMIZE ZORDER, here as a plain parquet write).
    *
    * Every key is first NORMALIZED to a common `64/N`-bit range
    * (capped at 16 bits; one cheap min/max pass): interleaving raw
    * values lets whichever key has more significant bits dominate the
    * curve and the layout degenerates to a single-column sort — the
    * classic z-order mistake. Requires (max-min) < 2^47 per key (any
    * surrogate key). An empty input (all-null aggregates) is written
    * as-is — there is nothing to lay out. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    files: Int = 8): Unit = {
    require(cols.size >= 2 && cols.size <= 8,
      s"z-order needs 2..8 key columns, got ${cols.size}")
    val bits = math.min(16, 64 / cols.size)
    val range = (1L << bits) - 1L
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    if (r.isNullAt(0)) { // empty input (or an all-null first key)
      df.write.mode("overwrite").parquet(path)
      return
    }
    // a single all-null key degenerates to the hi == lo case (that
    // dimension contributes nothing to the curve) instead of an NPE
    def norm(i: Int) =
      if (r.isNullAt(2 * i)) lit(0L)
      else {
        val (lo, hi) = (r.getLong(2 * i), r.getLong(2 * i + 1))
        if (hi > lo)
          ((col(cols(i)).cast("long") - lit(lo)) * lit(range) / lit(hi - lo))
            .cast("long")
        else lit(0L)
      }
    df.withColumn("__z",
        graft.plans.Exprs.zorder(cols.indices.map(norm), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Two-key form of [[writeZOrdered]]. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    files: Int): Unit =
    writeZOrdered(df, path, Seq(colA, colB), files)

  /** Write bucketed+sorted tables for shuffle-free co-located joins
    * (see ScaleShapeSpec): the managed-table form of pre-partitioning
    * a fact table on its join key. Also the persistence layout for the
    * incremental-dedup stores: the exact-dedup keeper store
    * ([[graft.operators.Dedup.keeperStore]]) bucketed on fp, and
    * [[graft.operators.Dedup.MinHashStore]]'s banded keys on bkey /
    * shingle rows on doc_id — each ingest's delta joins then read the
    * store pre-partitioned on its join key. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)
}
