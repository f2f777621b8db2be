package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The reference's entire surface, Spark-first.
  *
  * The reference (reference main.go:84-197) maps files to partial
  * word-count maps and merges them in parallel reducers. In Spark that
  * is exactly `explode(tokens) → groupBy(word).count`: Tungsten's
  * hash aggregate does the map-side partial aggregation (the
  * "reducers" of main.go:185-197) before the single shuffle on the
  * word key, so high-frequency words (skew) are pre-combined per
  * partition and the plan scales linearly with corpus size.
  */
object WordCount {

  /** word → occurrence count (reference main.go:84-111). */
  def wordCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Distinct-word cardinality (reference main.go:73 prints
    * `len(finalResult)`). */
  def distinctWords(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .agg(count_distinct(col("word")).as("n_words"))

  /** Approximate distinct-word count via HyperLogLog++ — the sketch
    * path for corpora where exact count_distinct's shuffle of every
    * distinct token is the bottleneck. Mergeable across partitions,
    * one small state per task. */
  def distinctWordsApprox(docs: DataFrame, rsd: Double = 0.05,
                          textCol: String = "text"): DataFrame =
    docs
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .agg(approx_count_distinct(col("word"), rsd).as("n_words_approx"))

  /** Total token count across the corpus. */
  def totalWords(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.agg(sum(size(Text.tokens(col(textCol)))).as("n_tokens"))

  /** Per-document word counts — the map-phase partial results the
    * reference materializes per file (reference main.go:115-171). */
  def perDoc(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("word"))
      .groupBy(idCol, "word")
      .agg(count(lit(1)).as("cnt"))

  /** Top-k words, deterministic tie-break on the word itself. */
  def topK(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    wordCount(docs, textCol).orderBy(col("cnt").desc, col("word").asc).limit(k)

  /** Top-k corpus word n-grams WITH multiplicity — the language-model
    * statistic (n-gram frequency table) word count generalizes to.
    * Same plan shape as [[wordCount]]: explode → map-side-combined
    * count → one shuffle on the n-gram key. */
  def ngramCounts(docs: DataFrame, n: Int, k: Int,
                  textCol: String = "text"): DataFrame =
    docs
      .select(explode(Text.ngrams(Text.tokens(col(textCol)), n)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)

  /** Word counts per corpus grouping column (the reference's
    * multi-file corpus, reference main.go:102-105). */
  def perGroup(docs: DataFrame, groupCol: String,
               textCol: String = "text"): DataFrame =
    docs
      .select(col(groupCol), explode(Text.tokens(col(textCol))).as("word"))
      .groupBy(groupCol, "word")
      .agg(count(lit(1)).as("cnt"))
}
