package graft.registry

/** DuckDB replay of Spark's XXH64 (`xxhash64`, seed 42) — the r12
  * oracle promotion of the MinHash/SimHash sketch family (VERDICT r11
  * task 5). xxHash64 is a fixed public algorithm over 64-bit wrapping
  * arithmetic, so the whole chain the kernels evaluate
  * ([[graft.plans.MinHashKernels]]: `hashLong(hashUnsafeBytes(s, 42),
  * hashInt(i, 42))`; [[graft.plans.SimHashKernels]]: per-token
  * `hashUnsafeBytes` bit votes; [[graft.functions.Hashing.bandKeys]]:
  * the array fold `h = hashLong(elem, h)` from seed 42) is expressible
  * as SQL integer arithmetic — validated bit-for-bit against
  * `org.apache.spark.sql.catalyst.expressions.XXH64` on string/int/
  * long vectors including the ≥32-byte stripe path.
  *
  * Engineering constraints that shaped the spelling (all measured):
  *   - DuckDB UBIGINT ops overflow-CHECK instead of wrapping, so the
  *     64-bit wrap is explicit: multiply splits into 32-bit halves,
  *     add branches on the headroom (`gx_add`'s CASE — branches are
  *     evaluated selectively, so the unsigned underflow in the taken
  *     arm can't fire for unselected rows).
  *   - HUGEINT arithmetic is ~25x slower than UBIGINT; the hot
  *     per-(shingle x permutation) stage (|distinct shingles| x 128
  *     rows) uses the pure-UBIGINT macros, staged ONE primitive per
  *     column through chained subselects — nesting the macros instead
  *     multiplies expression size (each macro duplicates its argument
  *     textually) and took the bind+eval time from seconds to minutes.
  *   - Rotations spell their power-of-two factors as literals:
  *     `1::HUGEINT << (64-r)` inside a macro is NOT constant-folded
  *     and costs 10x per row.
  *   - The compact HUGEINT forms (`gh_mul`/`gh_add`) survive inside
  *     the variable-length `list_reduce` folds of the string hash
  *     (stripes / tail words / tail bytes), where columns can't be
  *     staged and textual compactness bounds the lambda size; those
  *     folds run once per DISTINCT shingle/token, not per (shingle,
  *     permutation).
  *   - Signatures take `min` over SIGNED longs (Spark semantics), so
  *     the unsigned hash state converts via the branch-free `gx_sgn`
  *     before any min/ordering.
  *
  * Byte extraction uses `ord` on character substrings — byte == char
  * on the ASCII corpus, the same assumption every F-family oracle
  * makes, gated loudly by MultimodalSpec's ASCII gate.
  */
private[registry] object XxSql {

  private val P1 = "11400714785074694791::UBIGINT"
  private val P2 = "14029467366897019727::UBIGINT"
  private val P3 = "1609587929392839161::UBIGINT"
  private val P4 = "9650029242287828579::UBIGINT"
  private val P5 = "2870177450012600261::UBIGINT"

  /** rotl64 with literal power-of-two factors (see scaladoc). */
  private def rotl(x: String, r: Int): String = {
    val m = java.lang.Long.toUnsignedString(1L << (64 - r))
    val p = java.lang.Long.toUnsignedString(1L << r)
    s"(($x) % $m::UBIGINT) * $p::UBIGINT + (($x) >> ${64 - r})"
  }

  /** The macro DDL prelude every promoted oracle carries (DuckDB
    * executes the statements in order and returns the final SELECT;
    * CREATE OR REPLACE keeps re-execution on a shared connection
    * idempotent). */
  val Macros: String = s"""
    |CREATE OR REPLACE MACRO gh_mul(a, b) AS (
    |  ( ( (a::HUGEINT % 4294967296) * (b::HUGEINT % 4294967296)
    |      + ( ( (a::HUGEINT // 4294967296) * (b::HUGEINT % 4294967296)
    |          + (a::HUGEINT % 4294967296) * (b::HUGEINT // 4294967296) ) % 4294967296 ) * 4294967296
    |    ) % 18446744073709551616 )::UBIGINT
    |);
    |CREATE OR REPLACE MACRO gh_add(a, b) AS (
    |  ((a::HUGEINT + b::HUGEINT) % 18446744073709551616)::UBIGINT
    |);
    |CREATE OR REPLACE MACRO gx_word(h, w) AS (
    |  gh_add(gh_mul(${rotl(s"xor(h, gh_mul(${rotl(s"gh_mul(w, $P2)", 31)}, $P1))", 27)}, $P1), $P4)
    |);
    |CREATE OR REPLACE MACRO gx_acc(v, w) AS (
    |  gh_mul(${rotl(s"gh_add(v, gh_mul(w, $P2))", 31)}, $P1)
    |);
    |CREATE OR REPLACE MACRO gx_mrg(h, v) AS (
    |  gh_add(gh_mul(xor(h, gh_mul(${rotl(s"gh_mul(v, $P2)", 31)}, $P1)), $P1), $P4)
    |);
    |CREATE OR REPLACE MACRO gx_byte(h, bb) AS (
    |  gh_mul(${rotl(s"xor(h, gh_mul(bb, $P5))", 11)}, $P1)
    |);
    |CREATE OR REPLACE MACRO gx_int4(h, i4) AS (
    |  gh_add(gh_mul(${rotl(s"xor(h, gh_mul(i4, $P1))", 23)}, $P2), $P3)
    |);
    |CREATE OR REPLACE MACRO gx_add(a, b) AS (
    |  CASE WHEN a > 18446744073709551615::UBIGINT - b
    |       THEN a - (18446744073709551615::UBIGINT - b) - 1::UBIGINT
    |       ELSE a + b END
    |);
    |CREATE OR REPLACE MACRO gx_mul(a, b) AS (
    |  gx_add((a % 4294967296::UBIGINT) * (b % 4294967296::UBIGINT),
    |         ((((a >> 32) * (b % 4294967296::UBIGINT)) % 4294967296::UBIGINT
    |           + (((a % 4294967296::UBIGINT) * (b >> 32)) % 4294967296::UBIGINT))
    |          % 4294967296::UBIGINT) * 4294967296::UBIGINT)
    |);
    |CREATE OR REPLACE MACRO gx_f2(h) AS ( gx_mul(xor(h, h >> 33), $P2) );
    |CREATE OR REPLACE MACRO gx_f3(h) AS ( gx_mul(xor(h, h >> 29), $P3) );
    |CREATE OR REPLACE MACRO gx_sgn(h) AS (
    |  (((h::HUGEINT + 9223372036854775808) % 18446744073709551616) - 9223372036854775808)::BIGINT
    |);
    |CREATE OR REPLACE MACRO gx_uns(l) AS (
    |  ((l::HUGEINT % 18446744073709551616 + 18446744073709551616) % 18446744073709551616)::UBIGINT
    |);""".stripMargin

  /** One expression per column through chained subselects — the flat
    * staging that keeps macro expansion linear. */
  private def staged(base: String, steps: Seq[(String, String)],
                     finalCols: String): String = {
    val inner = steps.foldLeft(s"($base)") {
      case (q, (n, e)) => s"(SELECT *, $e AS $n FROM $q)"
    }
    s"SELECT $finalCols FROM $inner"
  }

  /** XXH64.hashLong(l, seed) staged: columns `l`, `seed` → `out`. */
  private def hashLongSteps(l: String, seed: String, out: String,
                            pfx: String): Seq[(String, String)] = Seq(
    s"${pfx}0" -> s"gx_add($seed, 2870177450012600269::UBIGINT)",
    s"${pfx}1" -> s"gx_mul($l, $P2)",
    s"${pfx}2" -> rotl(s"${pfx}1", 31),
    s"${pfx}3" -> s"gx_mul(${pfx}2, $P1)",
    s"${pfx}4" -> s"xor(${pfx}0, ${pfx}3)",
    s"${pfx}5" -> rotl(s"${pfx}4", 27),
    s"${pfx}6" -> s"gx_add(gx_mul(${pfx}5, $P1), $P4)",
    s"${pfx}7" -> s"gx_f2(${pfx}6)",
    s"${pfx}8" -> s"gx_f3(${pfx}7)",
    out -> s"xor(${pfx}8, ${pfx}8 >> 32)")

  /** XXH64.hashInt(i, seed) staged. */
  private def hashIntSteps(i: String, seed: String, out: String,
                           pfx: String): Seq[(String, String)] = Seq(
    s"${pfx}0" -> s"gx_add($seed, 2870177450012600265::UBIGINT)",
    s"${pfx}1" -> s"gx_mul($i, $P1)",
    s"${pfx}2" -> s"xor(${pfx}0, ${pfx}1)",
    s"${pfx}3" -> rotl(s"${pfx}2", 23),
    s"${pfx}4" -> s"gx_add(gx_mul(${pfx}3, $P2), $P3)",
    s"${pfx}5" -> s"gx_f2(${pfx}4)",
    s"${pfx}6" -> s"gx_f3(${pfx}5)",
    out -> s"xor(${pfx}6, ${pfx}6 >> 32)")

  /** XXH64.hashUnsafeBytes over UTF-8 bytes of column `s`, seed 42:
    * `src` yields rows with a VARCHAR `s`; emits (s, h UBIGINT). Full
    * algorithm — 32-byte stripes with the four accumulators, 8-byte
    * tail words, the 4-byte step, single bytes, final avalanche —
    * with the variable-length parts as `list_reduce` folds (the
    * accumulator seed rides `list_prepend`; DuckDB's list_reduce has
    * no init parameter). */
  def strHash(src: String): String = {
    val word = (1 to 8).map(j =>
      s"b[8*k + $j]" + (if (j == 1) "" else s"*${java.lang.Long.toUnsignedString(1L << (8 * (j - 1)))}::UBIGINT"))
      .mkString(" + ")
    val stripeInit = "{'a': 6983438078262162944::UBIGINT, 'b': 14029467366897019769::UBIGINT, " +
      "'c': 42::UBIGINT, 'd': 7046029288634856867::UBIGINT}"
    staged(src, Seq(
      "b" -> "list_transform(range(length(s)), i -> ord(substr(s, (i+1)::INT, 1))::UBIGINT)",
      "n" -> "length(s)",
      "nw" -> "n // 8",
      "nstripes" -> "CASE WHEN n >= 32 THEN n // 32 ELSE 0 END",
      "w8" -> s"list_transform(range(nw), k -> ($word)::UBIGINT)",
      "vs" -> s"""CASE WHEN nstripes > 0 THEN
        list_reduce(
          list_prepend($stripeInit,
            list_transform(range(nstripes), j -> {'a': w8[4*j+1], 'b': w8[4*j+2], 'c': w8[4*j+3], 'd': w8[4*j+4]})),
          (acc, x) -> {'a': gx_acc(acc.a, x.a), 'b': gx_acc(acc.b, x.b),
                       'c': gx_acc(acc.c, x.c), 'd': gx_acc(acc.d, x.d)})
        ELSE NULL END""",
      "h0" -> s"""CASE WHEN nstripes > 0 THEN
        gx_mrg(gx_mrg(gx_mrg(gx_mrg(
          gh_add(gh_add(gh_add(${rotl("vs.a", 1)}, ${rotl("vs.b", 7)}),
            ${rotl("vs.c", 12)}), ${rotl("vs.d", 18)}),
          vs.a), vs.b), vs.c), vs.d)
        ELSE 2870177450012600303::UBIGINT END""",
      "h1" -> "gx_add(h0, n::UBIGINT)",
      "h2" -> """CASE WHEN nw > nstripes * 4 THEN
        list_reduce(list_prepend(h1, w8[nstripes * 4 + 1 : nw]), (acc, x) -> gx_word(acc, x))
        ELSE h1 END""",
      "i4v" -> """CASE WHEN n % 8 >= 4 THEN
        (b[nw*8 + 1] + b[nw*8 + 2]*256 + b[nw*8 + 3]*65536 + b[nw*8 + 4]*16777216)::UBIGINT
        ELSE NULL END""",
      "h3" -> "CASE WHEN n % 8 >= 4 THEN gx_int4(h2, i4v) ELSE h2 END",
      "bdone" -> "nw * 8 + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END",
      "h4" -> """CASE WHEN n > bdone THEN
        list_reduce(list_prepend(h3, b[bdone + 1 : n]), (acc, x) -> gx_byte(acc, x))
        ELSE h3 END""",
      "f2s" -> "gx_f2(h4)",
      "f3s" -> "gx_f3(f2s)",
      "h" -> "xor(f3s, f3s >> 32)"), "s, h")
  }

  /** The LSH band-key fold: Spark's `xxhash64(slice(sig, ...))` over
    * a `rowsPerBand`-long array folds `h = hashLong(elem, h)` from
    * seed 42 — unrolled across staged columns over pivoted sig values
    * s0..s{r-1} (signed). `src` yields (doc_id, band, s0..s{r-1}).
    * Parameterized on r since r13 so the banding-sweep oracle can
    * replay every split of the fixed 128-permutation budget. */
  private def bandKeys(src: String, rowsPerBand: Int = 8): String = {
    val steps = (0 until rowsPerBand).flatMap { k =>
      val seed = if (k == 0) "42::UBIGINT" else s"h${k - 1}"
      Seq(s"u$k" -> s"gx_uns(s$k)") ++
        hashLongSteps(s"u$k", seed, s"h$k", s"k$k")
    }
    staged(src, steps, s"doc_id, band, gx_sgn(h${rowsPerBand - 1}) AS bkey")
  }

  /** Per-config banding CTE triple over the SHARED `sig` chain
    * (requires [[minhashSigCtes]] + a `szs` CTE in scope): bandvals /
    * band keys / candidates / verified pairs, each suffixed
    * `_<bands>x<rows>`. Every config re-slices the same 128
    * signature mins — the banding sweep's whole point is that the
    * split, not the signature, moves the candidate curve. */
  def minhashBandConfigCtes(bands: Int, rowsPerBand: Int,
                            tau: Double): String = {
    val sfx = s"${bands}x$rowsPerBand"
    val pivots = (0 until rowsPerBand)
      .map(k => s"max(CASE WHEN i % $rowsPerBand = $k THEN v END) AS s$k")
      .mkString(", ")
    s"""bandvals_$sfx AS MATERIALIZED (
       |  SELECT doc_id, (i // $rowsPerBand)::INT AS band, $pivots
       |  FROM sig GROUP BY 1, 2
       |), bk_$sfx AS MATERIALIZED (
       |${bandKeys(s"SELECT * FROM bandvals_$sfx", rowsPerBand)}
       |), cand_$sfx AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bk_$sfx a JOIN bk_$sfx b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |), found_$sfx AS (
       |  SELECT i.id_a, i.id_b
       |  FROM (SELECT c.id_a, c.id_b, count(*) AS inter
       |        FROM cand_$sfx c JOIN ex ra ON ra.doc_id = c.id_a
       |        JOIN ex rb ON rb.doc_id = c.id_b AND ra.s = rb.s
       |        GROUP BY 1, 2) i
       |  JOIN szs sa ON sa.doc_id = i.id_a
       |  JOIN szs sb ON sb.doc_id = i.id_b
       |  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= $tau
       |)""".stripMargin
  }

  /** Shared CTE chain of the MinHash LSH replay over a docs relation
    * (`source` must yield doc_id + text): tokenize → 3-gram shingle
    * sets → per-distinct-shingle XXH64 → 128 permutation mixes
    * (hashInt(i, 42) seeds, hashLong re-mix — the exact
    * MinHashKernels chain) → per-doc signature mins over SIGNED
    * longs → 16x8 band keys → band-equality candidates. MATERIALIZED
    * pins each stage to one evaluation (the CTEs are referenced more
    * than once; inlining re-expands the whole chain per reference).
    * Ends with `cand(id_a, id_b)` + `ex(doc_id, sz, s)` available. */
  /** The signature-side chain alone — tokenize → shingle sets →
    * distinct-shingle XXH64 → 128 permutation mixes → per-doc mins —
    * ending with `sig(doc_id, i, v)` and `ex(doc_id, sz, s)` in
    * scope. Shared by the default 16×8 [[minhashCtes]] and the
    * banding-sweep oracle (every split re-slices the SAME sig). */
  def minhashSigCtes(source: String): String = {
    val perms = staged("SELECT unnest(range(128)) AS i",
      hashIntSteps("i::UBIGINT", "42::UBIGINT", "pseed", "p"), "i, pseed")
    val mix = staged(
      "SELECT d.s, d.h AS hval, p.i, p.pseed FROM dhash d CROSS JOIN perms p",
      hashLongSteps("hval", "pseed", "mh", "m"), "s, i, gx_sgn(mh) AS v")
    s"""t AS (SELECT doc_id, ${TextSql.ToksExpr} AS toks FROM $source),
       |sets AS MATERIALIZED (
       |  SELECT doc_id, ${TextSql.Sh3Expr} AS sh FROM t
       |  WHERE len(${TextSql.Sh3Expr}) > 0
       |), ex AS MATERIALIZED (
       |  SELECT doc_id, len(sh) AS sz, unnest(sh) AS s FROM sets
       |), ds AS (SELECT DISTINCT s FROM ex),
       |dhash AS MATERIALIZED (${strHash("SELECT s FROM ds")}),
       |perms AS MATERIALIZED ($perms),
       |mix AS MATERIALIZED ($mix),
       |sig AS MATERIALIZED (
       |  SELECT e.doc_id, m.i, min(m.v) AS v
       |  FROM ex e JOIN mix m ON e.s = m.s GROUP BY 1, 2
       |)""".stripMargin
  }

  private def minhashCtes(source: String): String = {
    val pivots = (0 until 8)
      .map(k => s"max(CASE WHEN i % 8 = $k THEN v END) AS s$k").mkString(", ")
    s"""${minhashSigCtes(source)},
       |bandvals AS MATERIALIZED (
       |  SELECT doc_id, (i // 8)::INT AS band, $pivots FROM sig GROUP BY 1, 2
       |), bk AS MATERIALIZED ($bandKeysSql),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bk a JOIN bk b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  private val bandKeysSql: String = bandKeys("SELECT * FROM bandvals")

  /** Full dd_minhash replay: candidates → exact-Jaccard verify ≥ tau.
    * `restrict` optionally narrows the emitted pairs (the delta rows'
    * touching-the-delta contract). */
  def minhashPairs(source: String, tau: Double,
                   restrict: String = ""): String =
    s"""$Macros
       |${minhashPairsNested(source, tau, restrict)}""".stripMargin

  /** [[minhashPairs]] WITHOUT the macro preamble — nestable as a CTE
    * body (dd_minhash_recall composes it beside the exact-Jaccard
    * truth under ONE shared macro block; DuckDB macros are top-level
    * DDL, so a composed query must hoist them once). */
  def minhashPairsNested(source: String, tau: Double,
                         restrict: String = ""): String =
    s"""WITH ${minhashCtes(source)},
       |inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS inter
       |  FROM cand c JOIN ex ra ON ra.doc_id = c.id_a
       |  JOIN ex rb ON rb.doc_id = c.id_b AND ra.s = rb.s
       |  GROUP BY 1, 2
       |), szs AS (SELECT doc_id, any_value(sz) AS sz FROM ex GROUP BY doc_id)
       |SELECT i.id_a, i.id_b,
       |  CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
       |FROM inter i JOIN szs sa ON sa.doc_id = i.id_a
       |JOIN szs sb ON sb.doc_id = i.id_b
       |WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= $tau
       |$restrict""".stripMargin

  /** The streaming candidate row's replay: just the band-equality
    * candidate SET (the stateful bucket stream emits exactly the
    * intra-bucket pairs of the batch banding on a bounded drain). */
  def minhashCandidates(source: String): String =
    s"""$Macros
       |WITH ${minhashCtes(source)}
       |SELECT id_a, id_b FROM cand""".stripMargin

  /** Full dd_simhash replay over `source`: per-token-OCCURRENCE
    * xxhash64 bit votes (distinct tokens hashed once, joined back to
    * occurrence rows — Σ±1 per occurrence ≡ the kernel's per-token
    * vote loop), sign → bit, 4x16-bit band blocking, Hamming ≤
    * `maxDist` via bit_count(xor). */
  def simhashPairs(source: String, maxDist: Int,
                   restrict: String = ""): String = {
    val votes = (0 until 64)
      .map(j => s"sum(CASE WHEN (h >> $j) % 2 = 1 THEN 1 ELSE -1 END) AS v$j")
      .mkString(",\n    ")
    val sim = (0 until 64)
      .map(j => s"CASE WHEN v$j > 0 THEN ${java.lang.Long.toUnsignedString(1L << j)}::UBIGINT ELSE 0::UBIGINT END")
      .mkString(" + ")
    s"""$Macros
       |WITH t AS (SELECT doc_id, ${TextSql.ToksExpr} AS toks FROM $source),
       |occ AS MATERIALIZED (
       |  SELECT doc_id, unnest(toks) AS w FROM t WHERE len(toks) > 0
       |), dw AS (SELECT DISTINCT w AS s FROM occ),
       |dh AS MATERIALIZED (${strHash("SELECT s FROM dw")}),
       |votes AS MATERIALIZED (
       |  SELECT o.doc_id,
       |    $votes
       |  FROM occ o JOIN dh ON dh.s = o.w
       |  GROUP BY o.doc_id
       |), sim AS MATERIALIZED (
       |  SELECT doc_id, ($sim) AS sim_u FROM votes
       |), banded AS MATERIALIZED (
       |  SELECT doc_id, sim_u, b.band,
       |    (sim_u >> (b.band * 16)) % 65536::UBIGINT AS bkey
       |  FROM sim, (SELECT unnest(range(4)) AS band) b
       |), cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.sim_u AS su_a, b.sim_u AS su_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, bit_count(xor(su_a, su_b))::INTEGER AS hamming
       |FROM cand WHERE bit_count(xor(su_a, su_b)) <= $maxDist
       |$restrict""".stripMargin
  }
}
