package graft.tools

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Ground-truth vector dump for [[graft.registry.XxSql]]'s DuckDB
  * xxhash64 replay: prints Spark's XXH64 over string (UTF-8 bytes,
  * incl. ≥32-byte stripe cases), int (the 128 permutation seeds) and
  * long inputs at seed 42, in a greppable STRHASH_BEGIN/END block.
  * Re-run after a Spark upgrade to re-pin the replay's reference
  * values (the driver's DuckDB compare is the continuous gate). */
object XxProbe {
  def main(args: Array[String]): Unit = {
    // ASCII only: XxSql.strHash extracts bytes as ord-per-CHARACTER,
    // which equals UTF-8 bytes only for ASCII (the corpus gate
    // MultimodalSpec pins). A multi-byte vector here would be
    // structurally unreplayable and poison the compare — Spark-side
    // multi-byte ground truth goes in the separate NONASCII block
    // below, which no replay should consume.
    val strs = Seq("", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
      "abcdefgh", "abcdefghi", "the quick brown", "0123456789012345",
      "01234567890123456789012345678901", "012345678901234567890123456789012",
      "the quick brown fox jumps over the lazy dog extra words here")
    println("STRHASH_BEGIN")
    strs.foreach { s =>
      val u = UTF8String.fromString(s)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      println(s"STR\t${java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))}\t$h")
    }
    // Spark-side-only (NOT replayable by XxSql's char-indexed bytes)
    Seq("café über").foreach { s =>
      val u = UTF8String.fromString(s)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      println(s"NONASCII\t${java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))}\t$h")
    }
    (0 until 128).foreach { i => println(s"INT\t$i\t${XXH64.hashInt(i, 42L)}") }
    Seq((0L, 42L), (1L, 42L), (-1L, 42L), (123456789L, -987654321L),
      (Long.MinValue, 7L), (Long.MaxValue, -7L)).foreach { case (l, sd) =>
      println(s"LONG\t$l\t$sd\t${XXH64.hashLong(l, sd)}") }
    println("STRHASH_END")
  }
}
