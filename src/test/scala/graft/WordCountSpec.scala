package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordCount

/** Mirrors the reference's own tests (reference main_test.go:36-47):
  * mixed case folds together, punctuation is stripped, counts are
  * exact across multiple "files" (rows). */
class WordCountSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  def docs = Seq(
    (1L, "Hello, hello world! WORLD?? wOrLd", "a"),
    (2L, "it's 42 degrees -- hello", "b"),
    (3L, "", "b"),
  ).toDF("doc_id", "text", "source")

  test("mixed case folds, punctuation/digits are separators") {
    val m = WordCount.wordCount(docs).as[(String, Long)].collect().toMap
    assert(m == Map(
      "hello" -> 3L, "world" -> 3L, "it" -> 1L, "s" -> 1L,
      "degrees" -> 1L))
  }

  test("distinct and total word counts match the reference accounting") {
    assert(WordCount.distinctWords(docs).as[Long].head() == 5L)
    assert(WordCount.totalWords(docs).as[Long].head() == 9L)
  }

  test("per-doc partials sum to the global counts") {
    val per = WordCount.perDoc(docs).as[(Long, String, Long)].collect()
    assert(per.filter(_._2 == "hello").map(_._3).sum == 3L)
    assert(per.filter(_._1 == 3L).isEmpty) // empty doc → no tokens
  }

  test("topK is deterministic: count desc then word asc") {
    val top = WordCount.topK(docs, 3).as[(String, Long)].collect().toSeq
    assert(top == Seq(("hello", 3L), ("world", 3L), ("degrees", 1L)))
  }

  test("bigram LM probabilities sum to 1 per context; spectrum balances the counts") {
    // un-limited table (k larger than any possible bigram count)
    val lm = WordCount.bigramLm(docs, 1000)
      .as[(String, String, Long, Long, Double)].collect()
    assert(lm.nonEmpty)
    // doc 1: hello hello world world world → P(hello|hello)=.5, P(world|hello)=.5
    val m = lm.map(r => (r._1, r._2) -> r._5).toMap
    assert(m(("hello", "hello")) == 0.5 && m(("hello", "world")) == 0.5)
    assert(m(("world", "world")) == 1.0)
    // each context's continuation probabilities sum to 1 (exactly, for
    // this fixture's power-of-two denominators)
    lm.groupBy(_._1).foreach { case (w1, rows) =>
      assert(rows.map(_._5).sum == 1.0, s"context $w1")
    }
    // spectrum: Σ cnt·n_words = total tokens, Σ n_words = distinct words
    val spec = WordCount.freqSpectrum(docs).as[(Long, Long)].collect()
    assert(spec.map { case (c, n) => c * n }.sum == 9L)
    assert(spec.map(_._2).sum == 5L)
  }

  test("per-source grouping keeps corpora separate") {
    val m = WordCount.perGroup(docs, "source")
      .as[(String, String, Long)].collect()
      .map { case (s, w, c) => (s, w) -> c }.toMap
    assert(m(("a", "hello")) == 2L && m(("b", "hello")) == 1L)
  }
}
