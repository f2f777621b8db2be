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

  /** Bigram LM table: P(w2 | w1) for the corpus' top bigrams — the
    * conditional-probability table an n-gram language model IS. c12 =
    * bigram count, c1 = the context's total continuations (Σ of its
    * bigram counts = occurrences of w1 as a non-final token), prob =
    * c12/c1 — integer counts, ONE IEEE division, so every probability
    * is bit-identical on any engine (their per-context sum is 1 up to
    * float rounding of the individual quotients). Same one-shuffle
    * shape as [[wordCount]] on the bigram key; the context aggregate
    * reuses the bigram counts (no second corpus scan) and joins back
    * on w1. Deterministic top-k: c12 desc, then (w1, w2). */
  def bigramLm(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    val bi = docs
      .select(explode(Text.ngrams(Text.tokens(col(textCol)), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c12"))
      // tokens never contain spaces, so first/last split is exact
      .select(substring_index(col("bigram"), " ", 1).as("w1"),
        substring_index(col("bigram"), " ", -1).as("w2"), col("c12"))
    val ctx = bi.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    bi.join(ctx, "w1")
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        (col("c12").cast("double") / col("c1")).as("prob"))
      .orderBy(col("c12").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Frequency-of-frequencies (the Zipf spectrum): how many distinct
    * words occur exactly `cnt` times — the statistic Good–Turing-style
    * smoothing starts from and a one-row-per-count duplication
    * fingerprint of the corpus. Two map-side-combined aggregates, no
    * joins. */
  def freqSpectrum(docs: DataFrame, textCol: String = "text"): DataFrame =
    wordCount(docs, textCol)
      .groupBy(col("cnt")).agg(count(lit(1)).as("n_words"))

  /** Word counts per corpus grouping column (the reference's
    * multi-file corpus, reference main.go:102-105). */
  def perGroup(docs: DataFrame, groupCol: String,
               textCol: String = "text"): DataFrame =
    docs
      .select(col(groupCol), explode(Text.tokens(col(textCol))).as("word"))
      .groupBy(groupCol, "word")
      .agg(count(lit(1)).as("cnt"))
}
