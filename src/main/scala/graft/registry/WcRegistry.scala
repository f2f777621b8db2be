package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.WordCount
import graft.sources.Tables

/** A-family bindings: the reference's own word-count surface
  * (reference main.go:84-197) over the `documents` table.
  *
  * Each oracle reproduces the Spark semantics in DuckDB SQL with the
  * same column names; the compare is row-order-insensitive, so only
  * LIMIT queries (topk) carry a total ORDER BY.
  */
object WcRegistry {

  /** DuckDB spelling of graft.functions.Text.tokens: split on
    * non-letter runs first, lowercase each token, drop empties. */
  private val TokCte =
    """WITH toks AS (
      |  SELECT doc_id, source, lower(w) AS word
      |  FROM (SELECT doc_id, source,
      |               unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS w
      |        FROM documents)
      |  WHERE w <> ''
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wc_wordcount" -> ((s, d) =>
      WordCount.wordCount(Tables.documents(s, d))),
    "wc_distinct_words" -> ((s, d) =>
      WordCount.distinctWords(Tables.documents(s, d))),
    "wc_distinct_approx" -> ((s, d) =>
      WordCount.distinctWordsApprox(Tables.documents(s, d))),
    "wc_total_words" -> ((s, d) =>
      WordCount.totalWords(Tables.documents(s, d))),
    "wc_per_doc" -> ((s, d) =>
      WordCount.perDoc(Tables.documents(s, d))),
    "wc_topk" -> ((s, d) =>
      WordCount.topK(Tables.documents(s, d), 20)),
    "wc_per_source" -> ((s, d) =>
      WordCount.perGroup(Tables.documents(s, d), "source")),
    "wc_trigrams" -> ((s, d) =>
      WordCount.ngramCounts(Tables.documents(s, d), 3, 50)),
    // the conditional-probability table an n-gram LM is; per-context
    // probabilities sum to exactly 1 (integer counts, one division)
    "wc_bigram_lm" -> ((s, d) =>
      WordCount.bigramLm(Tables.documents(s, d), 50)),
    // Zipf spectrum: count of distinct words per occurrence count
    "wc_freq_spectrum" -> ((s, d) =>
      WordCount.freqSpectrum(Tables.documents(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "wc_wordcount" ->
      s"""$TokCte
         |SELECT word, count(*) AS cnt FROM toks
         |GROUP BY word""".stripMargin,
    "wc_distinct_words" ->
      s"""$TokCte
         |SELECT count(DISTINCT word) AS n_words FROM toks""".stripMargin,
    "wc_total_words" ->
      s"""$TokCte
         |SELECT count(*) AS n_tokens FROM toks""".stripMargin,
    "wc_per_doc" ->
      s"""$TokCte
         |SELECT doc_id, word, count(*) AS cnt FROM toks
         |GROUP BY doc_id, word""".stripMargin,
    "wc_topk" ->
      s"""$TokCte
         |SELECT word, count(*) AS cnt FROM toks
         |GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 20""".stripMargin,
    "wc_per_source" ->
      s"""$TokCte
         |SELECT source, word, count(*) AS cnt FROM toks
         |GROUP BY source, word""".stripMargin,
    // n-grams WITH multiplicity (not the dedup families' distinct sets)
    "wc_trigrams" ->
      """WITH base AS (
        |  SELECT list_filter(list_transform(
        |    regexp_split_to_array(text, '[^\p{L}]+'), w -> lower(w)),
        |    w -> w <> '') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT unnest(list_transform(range(greatest(len(toks) - 2, 0)),
        |    i -> concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]))) AS ngram
        |  FROM base
        |)
        |SELECT ngram, count(*) AS cnt FROM g
        |GROUP BY ngram ORDER BY cnt DESC, ngram ASC LIMIT 50""".stripMargin,
    // the bigram table split back into (w1, w2); the context total is
    // the SUM of its bigram counts (= non-final occurrences of w1)
    "wc_bigram_lm" ->
      """WITH base AS (
        |  SELECT list_filter(list_transform(
        |    regexp_split_to_array(text, '[^\p{L}]+'), w -> lower(w)),
        |    w -> w <> '') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT unnest(list_transform(range(greatest(len(toks) - 1, 0)),
        |    i -> concat_ws(' ', toks[i + 1], toks[i + 2]))) AS ngram
        |  FROM base
        |), bi AS (
        |  SELECT string_split(ngram, ' ')[1] AS w1,
        |         string_split(ngram, ' ')[2] AS w2,
        |         count(*) AS c12
        |  FROM g GROUP BY ngram
        |), ctx AS (
        |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bi GROUP BY w1
        |)
        |SELECT bi.w1, w2, c12, c1, CAST(c12 AS DOUBLE) / c1 AS prob
        |FROM bi JOIN ctx ON ctx.w1 = bi.w1
        |ORDER BY c12 DESC, bi.w1 ASC, w2 ASC LIMIT 50""".stripMargin,
    "wc_freq_spectrum" ->
      s"""$TokCte
         |SELECT cnt, count(*) AS n_words FROM (
         |  SELECT word, count(*) AS cnt FROM toks GROUP BY word
         |) GROUP BY cnt""".stripMargin,
  )
}
