package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextCorpus

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("graft_tokens / graft_dot are SQL-callable via session extensions") {
    import spark.implicits._
    val toks = spark.sql("SELECT graft_tokens('Hello, WORLD! 42 foo') AS t")
      .as[Seq[String]].head()
    assert(toks == Seq("hello", "world", "foo"))
    val dot = spark.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
      .as[Double].head()
    assert(dot == 1.5 * 2.0 + 2.0 * 0.5)
  }

  test("graft_topk / graft_nearest_cells are SQL-callable via session extensions") {
    import spark.implicits._
    // top-2 of 4 scored rows, ranked (score desc, id asc)
    val top = spark.sql(
      """SELECT graft_topk(s, i, 2) AS top FROM VALUES
        |  (0.5D, 1L), (0.9D, 2L), (0.9D, 3L), (0.1D, 4L) AS t(s, i)""".stripMargin)
      .selectExpr("transform(top, x -> x.id) AS ids")
      .as[Seq[Long]].head()
    assert(top == Seq(2L, 3L))
    val cell = spark.sql(
      """SELECT graft_nearest_cells(
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(10L, 20L),
        |  array(array(0.0D, 1.0D), array(1.0D, 0.0D)), 1) AS c""".stripMargin)
      .as[Seq[Long]].head()
    assert(cell == Seq(20L)) // the x-axis centroid
  }

  test("graft_topk dedupes repeated ids (r20) == row_number over DISTINCT input") {
    import spark.implicits._
    // the multi-table ANN shape: the same (id, score) row arrives once
    // per shared LSH table; the heap must keep each id once so the
    // operators can drop their pre-ranking .distinct(). Repeats of id 2
    // must not evict the distinct id 1 from the top-3, and a buffer
    // already full of one id's repeats would be the old failure mode.
    val top = spark.sql(
      """SELECT graft_topk(s, i, 3) AS top FROM VALUES
        |  (0.9D, 2L), (0.9D, 2L), (0.9D, 2L), (0.9D, 2L),
        |  (0.5D, 1L), (0.5D, 1L), (0.2D, 4L), (0.1D, 5L)
        |  AS t(s, i)""".stripMargin)
      .selectExpr("transform(top, x -> x.id) AS ids")
      .as[Seq[Long]].head()
    assert(top == Seq(2L, 1L, 4L))
    // randomized: duplicated input through the aggregate == the window
    // rank over the distinct rows, across partial/final merges
    val rnd = new scala.util.Random(17L)
    val distinctRows = (1L to 40L).map(i => (i, rnd.nextInt(10) / 10.0))
    val dup = rnd.shuffle(distinctRows ++ distinctRows ++ distinctRows.take(13))
    val viaAgg = dup.toDF("i", "s").repartition(7)
      .groupBy().agg(org.apache.spark.sql.functions.expr("graft_topk(s, i, 5)").as("top"))
      .selectExpr("transform(top, x -> x.id) AS ids").as[Seq[Long]].head()
    val expected = distinctRows.sortBy { case (i, s) => (-s, i) }.take(5).map(_._1)
    assert(viaAgg == expected)
  }

  test("graft_minhash_sig / graft_simhash are SQL-callable via session extensions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // SQL result == Column-API kernel result (same expression class)
    val sig = spark.sql(
      "SELECT graft_minhash_sig(array('a b c', 'b c d'), 4) AS sig")
      .as[Seq[Long]].head()
    val sigCol = Seq(Seq("a b c", "b c d")).toDF("sh")
      .select(graft.plans.Exprs.minhashSig(col("sh"), 4).as("sig"))
      .as[Seq[Long]].head()
    assert(sig == sigCol && sig.length == 4)
    val sh = spark.sql("SELECT graft_simhash(array('x', 'x', 'y')) AS s")
      .as[Long].head()
    val shCol = Seq(Seq("x", "x", "y")).toDF("t")
      .select(graft.plans.Exprs.simhash(col("t")).as("s")).as[Long].head()
    assert(sh == shCol)
  }

  test("sketch SQL functions treat NULL array elements as absent") {
    import spark.implicits._
    // SQL-callable surface: the array type is containsNull=true there,
    // so a null element must not crash codegen — set semantics says
    // a null shingle/token simply isn't in the set.
    val withNull = spark.sql(
      "SELECT graft_minhash_sig(array('a', CAST(NULL AS STRING), 'b'), 4) AS sig")
      .as[Seq[Long]].head()
    val without = spark.sql(
      "SELECT graft_minhash_sig(array('a', 'b'), 4) AS sig")
      .as[Seq[Long]].head()
    assert(withNull == without)
    val shNull = spark.sql(
      "SELECT graft_simhash(array('x', CAST(NULL AS STRING), 'y')) AS s")
      .as[Long].head()
    val shPlain = spark.sql("SELECT graft_simhash(array('x', 'y')) AS s")
      .as[Long].head()
    assert(shNull == shPlain)
  }

  test("text corpus source mirrors the reference's file-walk input") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.txt"),
      "Hello hello world")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b.txt"),
      "it's 42 degrees")
    val docs = TextCorpus.perFile(spark, dir)
    assert(docs.count() == 2)
    assert(docs.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val wc = graft.operators.WordCount.wordCount(docs)
      .as[(String, Long)].collect().toMap
    assert(wc("hello") == 2L && wc("it") == 1L && !wc.contains("42"))
  }
}
