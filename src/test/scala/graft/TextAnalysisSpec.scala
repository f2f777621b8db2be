package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Behavior checks for text-analysis shapes that exist for scale
  * safety (the co-occurrence vocabulary cap). */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  test("co-occurrence caps a high-vocab doc at its top-V frequent tokens") {
    def L(k: Int) = ('a' + k).toChar
    // one pathological doc: 200 singleton tokens + 6 dominant tokens
    // repeated 5x; a normal doc for the margins
    val rare = (0 until 200).map(i => s"rare${L(i / 26 / 26)}${L(i / 26 % 26)}${L(i % 26)}")
    val hot = (0 until 6).map(i => s"hot${L(i)}")
    val pathological = (rare ++ hot.flatMap(Seq.fill(5)(_))).mkString(" ")
    val docs = Seq(
      (1L, pathological, "s"),
      (2L, "hota hotb plain words here", "s"),
    ).toDF("doc_id", "text", "source")
    val capped = TextAnalysis.cooccurrence(docs, topN = 1000, maxVocab = 6)
      .as[(String, String, Long, Double)].collect()
    // doc 1 contributes pairs only among its 6 dominant tokens (15
    // pairs), not the 206-token vocabulary's 21k — and doc 2's tokens
    // all survive its own (under-cap) vocabulary
    val doc1Words = capped.flatMap(r => Seq(r._1, r._2)).toSet
    assert(capped.nonEmpty)
    assert(doc1Words.forall(w => w.startsWith("hot") || Set("plain", "words", "here")(w)),
      s"rare tokens leaked past the cap: $doc1Words")
    val bothDocsPair = capped.filter(r => r._1 == "hota" && r._2 == "hotb").head
    assert(bothDocsPair._3 == 2L) // co-occurs in both docs
    // uncapped, the rare tokens pair up
    val uncapped = TextAnalysis.cooccurrence(docs, topN = 30000, maxVocab = 512)
      .as[(String, String, Long, Double)].collect()
    assert(uncapped.exists(r => r._1.startsWith("rare")))
  }
}
