package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Similarity}

/** Round-12 operators: the IVF health census and the streaming
  * media-kind census. */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  val d = "/root/testdata/sf0.001"

  test("ivfCensus: partitions the corpus exactly, shares sum to 1, skew visible") {
    val emb = graft.sources.Tables.embeddings(spark, d)
    val n = emb.count()
    val census = Similarity.ivfCensus(emb, 37)
      .as[(Long, Long, Double)].collect()
    // every vector lands in exactly one cell
    assert(census.map(_._2).sum == n)
    assert(math.abs(census.map(_._3).sum - 1.0) < 1e-9)
    // cells are real centroid ids and occupancy is positive
    assert(census.forall(c => c._1 % 37 == 0 && c._2 > 0))
    // the census agrees with counting the assignment directly
    val direct = Similarity.ivfAssigned(emb, 37)
      .groupBy(col("cell")).count()
      .as[(Long, Long)].collect().toMap
    assert(census.map(c => c._1 -> c._2).toMap == direct)
  }

  test("streaming media census: drained ledger + serving query == batch kindCensus") {
    val streamed = Streams_mmKindCensus()
      .as[(String, Long, Long, Long)].collect().toSet
    val batch = Multimodal.kindCensus(
      spark.read.parquet(s"$d/documents.parquet"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  private def Streams_mmKindCensus() =
    graft.streaming.Streams.mmKindCensus(spark, d)
      .select("kind", "n_payloads", "n_unique", "total_bytes")
}
