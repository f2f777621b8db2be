package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Exprs

/** The native kernels must be drop-in equal to the column-function
  * compositions they replaced — including Unicode edge cases and the
  * exact float accumulation order. */
class PlansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  /** The original interpreted composition TokenizeExpr replaces. */
  private def hofTokens(c: org.apache.spark.sql.Column) =
    filter(transform(split(c, "[^\\p{L}]+"), w => lower(w)), w => w =!= lit(""))

  test("MinHashSigExpr == xxhash64 min-aggregate composition, bit for bit") {
    import graft.functions.Text
    val rnd = new scala.util.Random(5L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "İst", "straße", "北京")
    val docs = (0 until 60).map { i =>
      (i.toLong, Seq.fill(4 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val perms = 32
    val sh = docs
      .select(col("doc_id"), Text.shingles(Text.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val viaExpr = sh
      .select(col("doc_id"), Exprs.minhashSig(col("sh"), perms).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // the pre-round-5 shape: explode + wide min-aggregate
    val aggs = (0 until perms).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val viaAgg = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .withColumn("h", xxhash64(col("s")))
      .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until perms).map(i => col(s"m$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr.nonEmpty && viaExpr == viaAgg)
  }

  test("SimHashExpr == tf-weighted vote-aggregate composition, bit for bit") {
    import graft.functions.Text
    val rnd = new scala.util.Random(7L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "İst", "straße", "北京")
    val docs = (0 until 60).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val viaExpr = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), Exprs.simhash(col("toks")).as("sh"))
      .as[(Long, Long)].collect().toMap
    // the pre-round-5 shape: tf aggregate + 64 conditional-sum votes
    val tf = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("word")))
    val voteAggs = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, col("cnt"))
        .otherwise(-col("cnt"))).as(s"v$j"))
    val viaAgg = tf.groupBy(col("doc_id")).agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr.nonEmpty && viaExpr == viaAgg)
  }

  test("TokenizeExpr == split-then-lower HOF composition, incl. Unicode") {
    val texts = Seq(
      "Hello, hello world! 42",
      "İstanbul Straße ŒUF — naïve façade", // U+0130, ß, Œ, diacritics
      "...", "", "a", "ΑΒΓ αβγ МОСКВА 北京 mixed123end",
    ).toDF("text")
    val rows = texts.select(
      Exprs.tokens(col("text")).as("fast"), hofTokens(col("text")).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("DotExpr == aggregate(zip_with) fold on doubles; float promotes as CAST") {
    val a = Array(0.1f, -2.5f, 3.25f, 1e-7f)
    val b = Array(4.0f, 0.5f, -1.125f, 2e7f)
    val df = Seq((a, b)).toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with(transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double")), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as[Double].head()
    val fast = df.select(Exprs.dot(col("a"), col("b"))).as[Double].head()
    assert(fast == hof) // bit-identical, not approximately
    // mixed float/double inputs
    val mixed = df.select(Exprs.dot(col("a"),
      transform(col("b"), _.cast("double")))).as[Double].head()
    assert(mixed == hof)
  }

  test("expressions stay codegen-compatible (no fallback errors) and null-safe") {
    val df = Seq(Some("x y"), None).toDF("text")
    val r = df.select(Exprs.tokens(col("text"))).collect()
    assert(r(0).getSeq[String](0) == Seq("x", "y") && r(1).isNullAt(0))
  }

  test("MultiStopHitsExpr == per-list filter(isInCollection) passes, fuzzed") {
    import graft.functions.Text
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(13L)
    // vocab straddles the stopword lists: shared words ("de" is in the
    // de/es/fr/zh lists), unique words, non-stopwords, Unicode
    val vocab = Vector("the", "de", "la", "und", "wo", "zai", "straße",
      "北京", "notastop", "xyz")
    val docs = (0 until 80).map { i =>
      (i.toLong,
        Seq.fill(rnd.nextInt(50))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text") // includes empty docs (rnd.nextInt(50) == 0)
    val lists = TextAnalysis.StopwordsByLang.map(_._2) :+
      TextAnalysis.StopwordsByLang.flatMap(_._2).distinct.sorted
    val viaExpr = docs
      .select(col("doc_id"),
        Exprs.multiStopHits(Text.tokens(col("text")), lists).as("h"))
      .as[(Long, Seq[Int])].collect().toMap
    val filterCols = lists.zipWithIndex.map { case (ws, i) =>
      size(filter(Text.tokens(col("text")), t => t.isInCollection(ws))).as(s"h$i")
    }
    val viaFilter = docs.select(col("doc_id") +: filterCols: _*)
      .as[(Long, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5, r._6, r._7)).toMap
    assert(viaExpr.size == 80 && viaExpr == viaFilter)
    // null text → null hit array, same as the filter path
    val nulls = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    val r = nulls.select(
      Exprs.multiStopHits(Text.tokens(col("text")), lists)).collect()
    assert(r(0).isNullAt(0))
  }

  test("SumSqTokenCountsExpr == (doc, word) count-aggregate sum(c*c) on fuzzed docs") {
    import graft.functions.Text
    val rnd = new scala.util.Random(11L)
    val vocab = Vector("a", "bb", "ccc", "İst", "straße", "北京", "word")
    val docs = (0 until 80).map { i =>
      (i.toLong,
        Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val viaExpr = docs
      .select(col("doc_id"),
        Exprs.sumSqTokenCounts(Text.tokens(col("text"))).as("ss"))
      .as[(Long, Long)].collect().toMap
    val viaAgg = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c") * col("c")).as("ss"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr.size == 80)
    docs.as[(Long, String)].collect().foreach { case (id, _) =>
      // empty docs: expr gives 0, the aggregate path has no row
      assert(viaExpr(id) == viaAgg.getOrElse(id, 0L), s"doc $id")
    }
  }
}
