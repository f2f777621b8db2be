package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, WordCount}
import graft.sources.Tables

/** Spec coverage for the sketch/ANN paths without SQL oracles. */
class ApproxAndIvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  val d = "/root/testdata/sf0.001"

  test("approx distinct words is within the configured error of exact") {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val exact = WordCount.distinctWords(docs).as[Long].head().toDouble
    val approx = WordCount.distinctWordsApprox(docs, rsd = 0.05)
      .as[Long].head().toDouble
    assert(math.abs(approx - exact) / exact <= 0.15) // 3x rsd headroom
  }

  test("IVF ANN returns exact scores for in-cell candidates, bounded per probe") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val ivf = Similarity.knnIvf(emb, probeMod = 50, k = 10)
      .as[(Long, Long, Double, Int)].collect()
    assert(ivf.nonEmpty)
    val bf = Similarity.knnBruteForce(emb, probeMod = 50, k = 1000)
      .as[(Long, Long, Double, Int)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap
    ivf.foreach { case (p, nb, cos, _) => assert(bf((p, nb)) == cos) }
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 10)
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length)) // dense ranks
    }
    // deterministic across runs
    val again = Similarity.knnIvf(emb, probeMod = 50, k = 10)
      .as[(Long, Long, Double, Int)].collect()
    assert(again.sortBy(r => (r._1, r._4)).toSeq == ivf.sortBy(r => (r._1, r._4)).toSeq)
  }
}
