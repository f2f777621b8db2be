package graft.registry

import graft.operators.TextAnalysis

/** Shared DuckDB spellings of the text primitives several registries
  * replay (tokenization, stopword votes, the language-ID argmax). One
  * source of truth: the C-family oracles and the H-family quality gate
  * MUST vote identically, and a single helper makes a drift between
  * them impossible instead of merely unlikely.
  */
private[registry] object TextSql {

  /** DuckDB spelling of Text.tokens as a per-row list column. */
  val ToksExpr: String =
    "list_filter(list_transform(regexp_split_to_array(text, '[^\\p{L}]+'), w -> lower(w)), w -> w <> '')"

  /** DuckDB spelling of Text.shingles(Text.tokens(text), 3) over a
    * `toks` list column — shared by the D-family Jaccard oracles and
    * the XxSql MinHash replay (one source of truth, same reason as
    * ToksExpr). */
  val Sh3Expr: String =
    """list_distinct(list_transform(range(greatest(len(toks) - 2, 0)),
      |    i -> concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3])))""".stripMargin

  def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Stopword hit count over a `toks` list column. */
  def hits(words: Seq[String]): String =
    s"len(list_filter(toks, t -> list_contains(${sqlList(words)}, t)))"

  /** The argmax-with-first-tie-break CASE chain, same order as
    * [[TextAnalysis.argmaxLang]]. The `filter(_ > l)` comparison set is
    * a first-listed tie-break only for sorted language keys — the
    * invariant TextAnalysis asserts where the lists are defined. */
  def predLangCase(langs: Seq[String], prefix: String): String = {
    require(langs == langs.sorted,
      "predLangCase needs sorted language keys (argmax tie-break)")
    val whens = langs.dropRight(1).map { l =>
      val conds = langs.filter(_ > l)
        .map(o => s"$prefix$l >= $prefix$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${langs.last}' END"
  }
}
