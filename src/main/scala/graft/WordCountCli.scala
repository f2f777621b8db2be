package graft

import org.apache.spark.sql.functions._

import graft.operators.WordCount
import graft.sources.TextCorpus

/** Drop-in CLI for the reference binary: point it at a directory of
  * text files, get word counts, the distinct-word total and wall-clock
  * timing (reference main.go:62-81: flag parsing → processFiles →
  * printResult → len(finalResult) → elapsed).
  *
  * Usage: runMain graft.WordCountCli [-profile] [-top=N] <path>...
  * Paths may be files or directories (the reference takes a file
  * list; Spark's reader accepts both). `-profile` enables the Spark
  * UI (per-stage CPU/memory/spill — the engine-native pprof,
  * reference main.go:27); `-top=N` caps printed rows — counts always
  * cover everything.
  *
  * Fault tolerance and chunking match the reference: corrupt or
  * vanished files warn and are skipped (main.go:119-131), and big
  * files stream through byte-range chunk tasks instead of
  * materializing whole (main.go:134-140) — see
  * [[graft.sources.TextCorpus.perFileChunked]].
  */
object WordCountCli {
  def main(args: Array[String]): Unit = {
    val (flags, paths) = args.partition(_.startsWith("-"))
    require(paths.nonEmpty, "usage: WordCountCli [-profile] [-top=N] <path>...")
    val topN = flags.collectFirst { case f if f.startsWith("-top=") =>
      f.stripPrefix("-top=").toInt }.getOrElse(Int.MaxValue)
    val profile = flags.exists(_.startsWith("-profile"))
    val spark = GraftSession.local("graft-wordcount", enableUi = profile)
    if (profile)
      System.err.println("[graft] profiling: Spark UI enabled at " +
        spark.sparkContext.uiWebUrl.getOrElse("<ui url unavailable>") +
        " (per-stage CPU, memory, spill)")
    val t0 = System.nanoTime()
    val docs = paths.toIndexedSeq.map(p => TextCorpus.perFileChunked(spark, p))
      .reduce(_ unionByName _)
    val ranked = WordCount.wordCount(docs)
      .orderBy(col("cnt").desc, col("word").asc)
    if (topN == Int.MaxValue) {
      // Unbounded print (the reference's default): stream result
      // partitions to the driver one at a time — a web-scale
      // vocabulary must not be collect()ed into driver memory at once.
      val it = ranked.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        println(s"${r.getString(0)}: ${r.getLong(1)}")
      }
    } else {
      ranked.limit(topN).collect()
        .foreach(r => println(s"${r.getString(0)}: ${r.getLong(1)}"))
    }
    val distinct = WordCount.distinctWords(docs).head().getLong(0)
    val elapsed = (System.nanoTime() - t0) / 1e9
    println(s"Total unique words: $distinct")
    println(f"Elapsed: $elapsed%.3f s")
    spark.stop()
  }
}
