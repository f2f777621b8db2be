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
  * list; Spark's reader accepts both). `-profile` maps the
  * reference's pprof flag (main.go:27) to the Spark UI; `-top=N`
  * caps printed rows — counts always cover everything.
  */
object WordCountCli {
  def main(args: Array[String]): Unit = {
    val (flags, paths) = args.partition(_.startsWith("-"))
    require(paths.nonEmpty, "usage: WordCountCli [-profile] [-top=N] <path>...")
    val topN = flags.collectFirst { case f if f.startsWith("-top=") =>
      f.stripPrefix("-top=").toInt }.getOrElse(Int.MaxValue)
    if (flags.exists(_.startsWith("-profile")))
      System.err.println("[graft] profiling: inspect the Spark UI / event log " +
        "(per-stage CPU, memory, spill) — the engine-native equivalent of pprof")
    val spark = GraftSession.local("graft-wordcount")
    val t0 = System.nanoTime()
    val docs = paths.toIndexedSeq.map(p => TextCorpus.perFile(spark, p))
      .reduce(_ unionByName _)
    val counts = WordCount.wordCount(docs)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(topN)
      .collect()
    val distinct = WordCount.distinctWords(docs).head().getLong(0)
    val elapsed = (System.nanoTime() - t0) / 1e9
    counts.foreach(r => println(s"${r.getString(0)}: ${r.getLong(1)}"))
    println(s"Total unique words: $distinct")
    println(f"Elapsed: $elapsed%.3f s")
    spark.stop()
  }
}
