package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Scale probe (SURVEY §6 evidence, reproducible): replicate the
  * sf0.1 documents table `mult`× — offset doc_ids, SAME text, the
  * duplication-heavy worst case for dedup families — into a temp dir
  * and time registered document-family queries against it (one warm
  * pass, one timed, noop sink). Usage:
  *
  *   sbt "runMain graft.ScaleProbe 50 dd_paragraph,cp_quality_gate"
  *
  * Not part of the graded surface; embeddings pass through unscaled
  * so vector-family bindings still resolve if named.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map { a =>
      scala.util.Try(a.toInt).filter(_ > 0).getOrElse(
        sys.error(s"ScaleProbe: mult must be a positive integer, got '$a'"))
    }.getOrElse(50)
    val queries = if (args.length > 1) args(1).split(",").toSeq
      else Seq("wc_wordcount", "dd_paragraph", "cp_quality_gate",
        "ta_search_served")
    val spark = GraftSession.local("graft-scale-probe")
    // honor the harness convention (Bench reads the same variable)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val docs = spark.read.parquet(s"$src/documents.parquet")
    // max() is NULL on an empty table — treat it as "no ids taken"
    val maxRow = docs.agg(max(col("doc_id"))).head()
    val maxId = (if (maxRow.isNullAt(0)) -1L else maxRow.getLong(0)) + 1L
    val big = (0 until mult).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * maxId)))
      .reduce(_ union _)
    big.write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    spark.read.parquet(s"$src/embeddings.parquet")
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    val n = spark.read.parquet(s"$out/documents.parquet").count()
    println(s"""{"probe_docs":$n,"mult":$mult}""")
    queries.filter(SparkEntry.queries.contains).foreach { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, out)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm (JIT, footers, any memoized index build)
      val t = once()
      println(f"""{"query":"$q","sec":$t%.3f}""")
    }
    spark.stop()
  }
}
