package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Sinks, Tables}

class SinksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  val d = "/root/testdata/sf0.001"

  test("partitioned write: pruned layout, bounded files, lossless round-trip") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val docs = Tables.documents(spark, d)
    Sinks.writePartitioned(docs, out, Seq("lang"), filesPerPartition = 2)
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(langDirs.nonEmpty && langDirs.forall(_.matches("lang=\\w+")))
    // bounded file count per partition dir
    new java.io.File(out).listFiles().filter(_.getName.startsWith("lang=")).foreach { dir =>
      val files = dir.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files >= 1 && files <= 2, s"${dir.getName}: $files files")
    }
    // round-trip is lossless and partition-pruning works on the layout
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val en = back.filter(org.apache.spark.sql.functions.col("lang") === "en")
    val scan = en.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning in:\n$scan")
  }
}
