package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.operators.Dedup

/** Pins the r12 hashed-shingle representation ([[Dedup.shingleRows]]
  * stores xxhash64(s), not the shingle string): the Jaccard family's
  * results are hash-invariant only while no two DISTINCT shingle
  * strings collide in 64 bits, so (a) collision-freedom is asserted on
  * the REAL corpus (sf0.01 — the gated SF's shingle population), and
  * (b) the end-to-end pair results are pinned against a Jaccard
  * computed locally over shingle STRING sets, so a representation
  * regression (e.g. a 32-bit hash, a seed change colliding on real
  * data) fails here rather than at the driver's oracle gate. */
class ShingleHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("sf0.01 corpus: xxhash64 is collision-free over the 3-gram shingle population") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val sh = docs
      .select(explode(Text.shingles(Text.tokens(col("text")), 3)).as("s"))
    val (strings, hashes) = (
      sh.agg(countDistinct(col("s"))).head().getLong(0),
      sh.agg(countDistinct(xxhash64(col("s")))).head().getLong(0))
    assert(strings > 0, "shingle population must be non-empty for the gate to mean anything")
    assert(strings === hashes,
      s"xxhash64 collision on the real corpus: $strings distinct shingles -> $hashes hashes")
  }

  test("hashed-shingle ngramJaccard equals Jaccard over shingle string sets") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),
      (3L, "a completely different document about spark physical plans"),
      (4L, "the quick brown fox jumps over the lazy dog tonight"),
      (5L, "spark physical plans are a completely different document topic"),
    ).toDF("doc_id", "text")
    val n = 3
    val tau = 0.5
    // local reference: string-set Jaccard over every pair (fixture is
    // lowercase a-z + spaces, where Text.tokens is exactly letter-run
    // splitting and shingles are space-joined distinct n-grams)
    def shingles(t: String): Set[String] =
      t.split("[^a-z]+").filter(_.nonEmpty)
        .sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet
    val local = docs.collect().map(r => r.getLong(0) -> shingles(r.getString(1)))
    val expected = (for {
      (ia, sa) <- local; (ib, sb) <- local if ia < ib && sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= tau
    } yield (ia, ib, j)).toSet
    val got = Dedup.ngramJaccard(docs, n, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
  }
}
