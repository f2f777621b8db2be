package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** The recall-vs-cost trade of every approximate ANN path, pinned to
  * regression-guarded numbers: recall@10 against the exact brute-force
  * answer on the same probes. A refactor that silently degrades
  * bucketing/assignment (wrong plane constants, a broken argmax) drops
  * recall long before it breaks a row-count check. Everything here is
  * deterministic — planes, seed codebook, Lloyd's iterations — so
  * recall is a constant per (data, params), not a flaky statistic; the
  * floors sit just under the measured values.
  *
  * Two operating points per path. The registry DEFAULTS are tuned for
  * sub-linearity at corpus scale (small candidate sets), which on this
  * 500-vector / weakly-clustered synthetic table measures LOW —
  * lsh(4x6) 0.10, ivf(nProbe=2) 0.36, trained 0.49 — so those floors
  * guard regression, not quality. The HIGH-RECALL points prove the
  * dial works: more tables / fewer planes per table (bigger buckets),
  * more probed cells → measured 0.88 lsh(16x4), 0.70 ivf(nProbe=6),
  * 0.81 trained(nProbe=6). At a real corpus size the same dial picks
  * the operating point; the spec pins both ends plus monotonicity.
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  val d = "/root/testdata/sf0.001"

  private lazy val emb = Tables.embeddings(spark, d)
  private lazy val probes = Similarity.probeEvery(emb, 50)
  private lazy val exact = Similarity.knnBruteForce(emb, probes, 10)

  private def lshRecall(tables: Int, planes: Int): Double =
    Similarity.recallAtK(exact,
      Similarity.knnLsh(emb, probes, 10, nTables = tables, planesPerTable = planes))

  private def ivfRecall(nProbe: Int, trained: Boolean): Double =
    Similarity.recallAtK(exact,
      if (trained) Similarity.knnIvfTrained(emb, probes, 10, nProbe = nProbe)
      else Similarity.knnIvf(emb, probes, 10, nProbe = nProbe))

  test("knn_lsh recall@10: defaults >= 0.08, 16x4 high-recall point >= 0.8, dial monotone") {
    val atDefaults = lshRecall(4, 6) // the registry operating point
    val highRecall = lshRecall(16, 4) // more tables, bigger buckets
    info(f"lsh recall@10: 4x6 = $atDefaults%.3f, 16x4 = $highRecall%.3f")
    assert(atDefaults >= 0.08, f"default-lsh recall degraded: $atDefaults%.3f")
    assert(highRecall >= 0.8, f"high-recall lsh degraded: $highRecall%.3f")
    assert(highRecall > atDefaults, "amplification dial stopped working")
  }

  test("knn_ivf recall@10: nProbe=2 default >= 0.3, nProbe=6 >= 0.65, monotone in nProbe") {
    val atDefaults = ivfRecall(2, trained = false)
    val wide = ivfRecall(6, trained = false)
    info(f"ivf recall@10: nProbe=2 = $atDefaults%.3f, nProbe=6 = $wide%.3f")
    assert(atDefaults >= 0.3, f"default-ivf recall degraded: $atDefaults%.3f")
    assert(wide >= 0.65, f"wide-ivf recall degraded: $wide%.3f")
    assert(wide > atDefaults, "nProbe dial stopped working")
  }

  test("knn_ivf_trained recall@10: >= 0.4 default / >= 0.75 wide, and training pays for itself") {
    val untrained = ivfRecall(2, trained = false)
    val trained = ivfRecall(2, trained = true)
    val trainedWide = ivfRecall(6, trained = true)
    info(f"ivf_trained recall@10: nProbe=2 = $trained%.3f " +
      f"(untrained $untrained%.3f), nProbe=6 = $trainedWide%.3f")
    assert(trained >= 0.4, f"trained-ivf recall degraded: $trained%.3f")
    assert(trainedWide >= 0.75, f"wide trained-ivf degraded: $trainedWide%.3f")
    assert(trained >= untrained,
      f"Lloyd's refinement made recall worse: $trained%.3f < $untrained%.3f")
  }

  test("recallAtK is 1.0 for the exact result against itself") {
    assert(Similarity.recallAtK(exact, exact) == 1.0)
  }

  test("knn_pq recall@10: defaults >= 0.25, kSub=64 >= 0.35, codebook dial works") {
    // measured on this table: 0.29 at the registry defaults (16
    // centroids/subspace — 4-bit codes), 0.40 at kSub=64 (6-bit
    // codes): quantization recall, traded against a 64x smaller
    // neighbor representation and M-add pair scoring.
    val atDefaults = Similarity.recallAtK(exact,
      Similarity.knnPq(emb, probes, 10))
    val wide = Similarity.recallAtK(exact,
      Similarity.knnPq(emb, probes, 10, kSub = 64, seedMod = 3))
    info(f"pq recall@10: kSub=16 = $atDefaults%.3f, kSub=64 = $wide%.3f")
    assert(atDefaults >= 0.25, f"default-pq recall degraded: $atDefaults%.3f")
    assert(wide >= 0.35, f"wide-pq recall degraded: $wide%.3f")
    assert(wide > atDefaults, "codebook-size dial stopped working")
  }

  test("knn_ivfpq recall@10: defaults >= 0.1, wide point >= 0.28, both dials compound") {
    // the composed index compounds both approximations — measured 0.14
    // at the defaults (nProbe=2 shortlist x 4-bit codes) and 0.33 at
    // (nProbe=6, kSub=64): candidate loss x quantization loss, the
    // price of sub-linear search over 4-byte codes.
    val atDefaults = Similarity.recallAtK(exact,
      Similarity.knnIvfPq(emb, probes, 10))
    val wide = Similarity.recallAtK(exact,
      Similarity.knnIvfPq(emb, probes, 10, nProbe = 6, kSub = 64, seedMod = 3))
    info(f"ivfpq recall@10: defaults = $atDefaults%.3f, wide = $wide%.3f")
    assert(atDefaults >= 0.1, f"default-ivfpq recall degraded: $atDefaults%.3f")
    assert(wide >= 0.28, f"wide-ivfpq recall degraded: $wide%.3f")
    assert(wide > atDefaults, "the compound dial stopped working")
  }
}
