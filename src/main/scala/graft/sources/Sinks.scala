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
