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
