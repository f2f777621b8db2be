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

  /** Write parquet Z-ORDERED on two key columns: rows are range-
    * partitioned and sorted by the bit-interleaved Z-curve value, so
    * each output file covers a tight rectangle in (colA, colB) space —
    * min/max file statistics then prune file reads for range
    * predicates on EITHER column, where a single-column sort clusters
    * one key and scatters the other (the layout trick behind Delta's
    * OPTIMIZE ZORDER, here as a plain parquet write).
    *
    * Both keys are first NORMALIZED to a common 16-bit range (one
    * cheap min/max pass): interleaving raw values lets whichever key
    * has more significant bits dominate the curve and the layout
    * degenerates to a single-column sort — the classic z-order
    * mistake. Requires (max-min) < 2^47 per key (any surrogate key). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    files: Int = 8): Unit = {
    val r = df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    def norm(c: String, lo: Long, hi: Long) =
      if (hi > lo) (col(c).cast("long") - lit(lo)) * lit(65535L) / lit(hi - lo)
      else lit(0L)
    df.withColumn("__z", graft.plans.Exprs.zorder(
        norm(colA, r.getLong(0), r.getLong(1)).cast("long"),
        norm(colB, r.getLong(2), r.getLong(3)).cast("long")))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Write bucketed+sorted tables for shuffle-free co-located joins
    * (see ScaleShapeSpec): the managed-table form of pre-partitioning
    * a fact table on its join key. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)
}
