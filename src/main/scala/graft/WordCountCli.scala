package graft

import org.apache.spark.sql.functions._

import graft.operators.WordCount
import graft.sources.TextCorpus

/** Drop-in CLI for the reference binary: point it at a directory of
  * text files, get word counts, the distinct-word total and wall-clock
  * timing (reference main.go:62-81: flag parsing → processFiles →
  * printResult → len(finalResult) → elapsed).
  *
  * Usage: runMain graft.WordCountCli <dir> [topN]
  * (topN caps printed rows; counts are computed over everything.)
  */
object WordCountCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: WordCountCli <textdir> [topN]")
    val dir = args(0)
    val topN = if (args.length > 1) args(1).toInt else Int.MaxValue
    val spark = GraftSession.local("graft-wordcount")
    val t0 = System.nanoTime()
    val docs = TextCorpus.perFile(spark, dir)
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
