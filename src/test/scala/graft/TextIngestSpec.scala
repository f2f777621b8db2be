package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordCount
import graft.sources.TextCorpus

/** Fault-tolerant + chunked text ingest (reference main.go:119-140:
  * warn-and-continue past a bad file, stream big files in chunks). */
class TextIngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  private def writeCorpus(): String = {
    val dir = Files.createTempDirectory("graft_corpus")
    Files.write(dir.resolve("a.txt"),
      "Hello, world! hello...\nWORLD; of words\n".getBytes("UTF-8"))
    Files.write(dir.resolve("b.txt"),
      "words words words\n".getBytes("UTF-8"))
    dir.toString
  }

  private def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    import spark.implicits._
    WordCount.wordCount(df).as[(String, Long)].collect().toMap
  }

  test("chunked (per-line) ingest counts == whole-file ingest counts") {
    val dir = writeCorpus()
    val whole = counts(TextCorpus.perFile(spark, dir))
    val chunked = counts(TextCorpus.perFileChunked(spark, dir))
    assert(chunked == whole)
    // reference tokenization semantics (main_test.go:36-47): case
    // folds, punctuation separates
    assert(whole("hello") == 2L && whole("world") == 2L && whole("words") == 4L)
  }

  test("a corrupt file warns and is skipped; the run completes") {
    val dir = writeCorpus()
    // garbage bytes behind a .gz extension: the codec fails mid-read,
    // which is exactly the unreadable-file case at object-store scale
    Files.write(Paths.get(dir, "bad.txt.gz"),
      Array[Byte](0x1f, 0x8b.toByte, 8, 0, 42, 42, 42, 42, 42, 42, 42))
    val chunked = counts(TextCorpus.perFileChunked(spark, dir))
    val clean = counts(TextCorpus.perFileChunked(spark, writeCorpus()))
    assert(chunked == clean) // bad file contributed nothing, job finished
  }

  test("one big file splits into multiple chunk tasks, counts unchanged") {
    val dir = Files.createTempDirectory("graft_bigfile")
    val line = "alpha beta gamma delta epsilon zeta\n"
    val sb = new StringBuilder
    (0 until 20000).foreach(_ => sb.append(line))
    Files.write(dir.resolve("big.txt"), sb.toString.getBytes("UTF-8"))
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      val df = TextCorpus.perFileChunked(spark, dir.toString)
      assert(df.rdd.getNumPartitions > 1, "big file did not split into chunks")
      val c = counts(df)
      assert(c == Map("alpha" -> 20000L, "beta" -> 20000L, "gamma" -> 20000L,
        "delta" -> 20000L, "epsilon" -> 20000L, "zeta" -> 20000L))
      // and all rows belong to ONE logical document
      assert(df.select("doc_id").distinct().count() == 1)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("jsonl ingest: parses records, drops bad lines, fills gaps deterministically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.write(dir.resolve("c.jsonl"), Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "words words"}""",        // lang/source missing
      """{"text": "no id here"}""",                      // doc_id missing
      """{"doc_id": 4}""",                               // no text: dropped
      """not json at all {{{""",                          // corrupt: dropped
      """{"doc_id": 5, "text": "five", "lang": "de", "source": "books"}""",
    ).mkString("\n").getBytes("UTF-8"))
    val rows = TextCorpus.jsonl(spark, dir.toString)
      .as[(Long, String, String, String, Long)].collect()
      .map(r => r._2 -> r).toMap
    assert(rows.size == 4) // corrupt + text-less lines dropped
    assert(rows("hello world") == ((1L, "hello world", "en", "web", 11L)))
    // missing lang/source fall back like the text readers
    assert(rows("words words")._3 == "" &&
      rows("words words")._4.endsWith("c.jsonl"))
    assert(rows("five")._1 == 5L && rows("five")._3 == "de")
    // a missing doc_id gets the stable (file, text) hash — reading the
    // corpus twice yields the same id
    val again = TextCorpus.jsonl(spark, dir.toString)
      .as[(Long, String, String, String, Long)].collect()
      .map(r => r._2 -> r._1).toMap
    assert(again("no id here") == rows("no id here")._1)
    // and the standard operators run unchanged on the jsonl shape
    val wc = counts(TextCorpus.jsonl(spark, dir.toString))
    assert(wc("words") == 2L && wc("hello") == 1L)
  }
}
