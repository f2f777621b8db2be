package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis, WordCount}

/** Degenerate inputs must not throw: empty corpora, null/empty text,
  * docs shorter than a shingle. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  def empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  def degenerate = Seq(
    (1L, null.asInstanceOf[String], "s"),
    (2L, "", "s"),
    (3L, "ab", "s"), // one token, shorter than any 3-shingle
    (4L, "!!! 123 ...", "s"), // separators only
  ).toDF("doc_id", "text", "source")

  test("word count family on empty and degenerate corpora") {
    assert(WordCount.wordCount(empty).count() == 0)
    assert(WordCount.distinctWords(empty).as[Long].head() == 0L)
    val m = WordCount.wordCount(degenerate).as[(String, Long)].collect().toMap
    assert(m == Map("ab" -> 1L))
  }

  test("dedup families tolerate null/short text") {
    assert(Dedup.minhashLsh(degenerate).count() == 0) // no shingles → no pairs
    assert(Dedup.simhash(degenerate).collect()
      .forall(r => r.getLong(0) != r.getLong(1)))
    // null text → null fingerprint group; must not throw
    assert(Dedup.exact(degenerate).count() == 4)
  }

  test("text analysis tolerates null/empty text") {
    val q = TextAnalysis.qualityScore(degenerate).collect()
    assert(q.length == 4)
    val lid = TextAnalysis.langId(
      degenerate.withColumn("lang", org.apache.spark.sql.functions.lit("en")))
      .count()
    assert(lid == 4)
  }
}
