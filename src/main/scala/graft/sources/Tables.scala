package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated parquet tables.
  *
  * Every operator in graft takes `DataFrame`s, so the library is
  * storage-agnostic; this object is the one place that knows the
  * on-disk layout (`<dir>/<name>.parquet`). Scans stay declarative so
  * Catalyst pushes filters/projections into the parquet reader.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts normalization: downstream operators (sessionize, funnel,
    * as-of, range join, streaming watermarks) require TimestampType, but
    * the driver's parquet layout has shifted across regens, so all known
    * physical encodings are absorbed here:
    *   - TIMESTAMP(NANOS): Spark has no nanos type and reads it as an
    *     epoch-nanos long (legacy.parquet.nanosAsLong); truncate to a
    *     micros TimestampType — exactly how micros engines (DuckDB
    *     included) read the same file.
    *   - timestamp[us] isAdjustedToUTC=false: Spark >=3.4 infers
    *     TIMESTAMP_NTZ, which unix_micros()/withWatermark reject; cast
    *     to TimestampType. Under the session's UTC zone the cast
    *     reinterprets the wall-clock micros as UTC-instant micros
    *     bit-identically — the same reading DuckDB gives the file.
    *   - TimestampType: already an instant, passes through. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
