package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own input mode: a directory of plain-text files,
  * one "document" per file (reference main.go:84-111 walks a file
  * list; chunked reads at main.go:115-140 are subsumed by Spark's
  * splittable file reader). Produces the same shape as the parquet
  * `documents` table so every operator runs unchanged on either. */
object TextCorpus {

  /** One row per file: doc_id from a stable hash of the path, the
    * whole file as `text`, the path as `source`. */
  def perFile(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("wholetext", "true")
      .text(dir)
      .select(
        xxhash64(input_file_name()).as("doc_id"),
        col("value").as("text"),
        lit("").as("lang"),
        input_file_name().as("source"),
        length(col("value")).cast("long").as("n_chars"))

  /** One row per line (for corpora where a line is a record); doc_id
    * is the stable (file, line) hash. */
  def perLine(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir)
      .select(
        xxhash64(input_file_name(), col("value")).as("doc_id"),
        col("value").as("text"),
        lit("").as("lang"),
        input_file_name().as("source"),
        length(col("value")).cast("long").as("n_chars"))
}
