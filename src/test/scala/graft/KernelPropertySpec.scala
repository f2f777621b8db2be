package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Exprs

/** Seeded fuzz parity: for arbitrary strings (heavy on Unicode case
  * edge cases, including surrogate pairs) and arbitrary float
  * vectors, the native kernels must equal the interpreted
  * compositions they replaced, bit for bit. */
class KernelPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  // ASCII, punctuation, digits, case-interesting letters (İ ı ß Σ ς),
  // CJK (letters without case), zero-width space, emoji (surrogates)
  private val alphabet: IndexedSeq[String] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).map(_.toString) ++
      Seq(" ", "\t", "\n", ",", ".", "!", "-", "'", "  ",
        "İ", "ı", "ß", "Σ", "ς", "Ä", "é", "Œ", "œ", "ǅ",
        "北", "京", "あ", "Ω", "​", "🙂", "𐐀")

  private def randomText(rnd: scala.util.Random): String =
    Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString

  test("TokenizeExpr == split-then-lower composition on 2000 fuzzed strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val texts = Seq.fill(2000)(randomText(rnd))
    val rows = texts.toDF("text").select(
      Exprs.tokens(col("text")).as("fast"),
      filter(transform(split(col("text"), "[^\\p{L}]+"), w => lower(w)),
        w => w =!= lit("")).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    rows.zip(texts).foreach { case ((fast, ref), t) =>
      assert(fast == ref, s"mismatch on ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("DotExpr == zip_with fold on 500 fuzzed float vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    def vec() = Array.fill(16)((rnd.nextFloat() - 0.5f) * 2e6f)
    val pairs = Seq.fill(500)((vec(), vec()))
    val rows = pairs.toDF("a", "b")
      .select(Exprs.dot(col("a"), col("b")).as("fast"),
        aggregate(zip_with(transform(col("a"), _.cast("double")),
          transform(col("b"), _.cast("double")), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("ref"))
      .as[(Double, Double)].collect()
    rows.foreach { case (fast, ref) =>
      assert(fast == ref || (fast.isNaN && ref.isNaN))
    }
  }
}
