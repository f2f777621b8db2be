package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.registry._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Each operator family registers its `queries` (Spark bindings over
  * the driver's table layout) and `oracleSql` (the DuckDB-equivalent
  * SQL with identical column names and ordering) in a
  * `graft.registry.*Registry`; this object is just the concatenation.
  */
object SparkEntry {

  private def registries = Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])](
    (WcRegistry.queries, WcRegistry.oracleSql),
    (AnalyticsRegistry.queries, AnalyticsRegistry.oracleSql),
    (TextAnalysisRegistry.queries, TextAnalysisRegistry.oracleSql),
    (DedupRegistry.queries, DedupRegistry.oracleSql),
    (SimilarityRegistry.queries, SimilarityRegistry.oracleSql),
    (MultimodalRegistry.queries, MultimodalRegistry.oracleSql),
    (StreamsRegistry.queries, StreamsRegistry.oracleSql),
    (CorpusRegistry.queries, CorpusRegistry.oracleSql),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("wc_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.iterator.flatMap(_._1).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Keys absent here are non-SQL-
    * expressible (hash/state-based) and covered by ScalaTest specs. */
  def oracleSql: Map[String, String] =
    registries.iterator.flatMap(_._2).toMap
}
