package graft.registry

/** Shared DuckDB spellings for vector math and LSH blocking.
  *
  * Parity contract (SURVEY §5): every fold is strict left-to-right,
  * and the oracle works on `CAST(embedding AS DOUBLE[])` so each
  * element is the same (double)(float) value Spark's kernels promote
  * per element — products, sums and sqrt then agree bit-for-bit. The
  * hyperplanes and codebooks are deterministic, so the oracle can
  * inline them as double literals (Double.toString round-trips). */
private[registry] object VectorSql {

  def dot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), q -> q[1] * q[2]), (acc, x) -> acc + x)"

  def nrm(v: String): String =
    s"sqrt(list_reduce(list_transform($v, x -> x * x), (acc, x) -> acc + x))"

  def cos(a: String, b: String): String =
    s"${dot(a, b)} / (${nrm(a)} * ${nrm(b)})"

  /** DuckDB spelling of [[graft.operators.Similarity.lshBucketed]]
    * over a CTE `e(vec_id, v)`: one SELECT per hash table; the bucket
    * is `planesPerTable` sign bits of dot(v, plane) with the plane
    * components inlined as double literals. */
  def lshBucketed(nTables: Int, planesPerTable: Int, dim: Int): String = {
    val planes = graft.operators.Similarity.hyperplanes(nTables * planesPerTable, dim)
    (0 until nTables).map { t =>
      val bits = (0 until planesPerTable).map { p =>
        val lits = planes(t * planesPerTable + p).mkString("[", ", ", "]")
        s"""(CASE WHEN list_reduce(list_transform(list_zip(v, $lits),
           |      q -> q[1] * q[2]), (acc, x) -> acc + x) >= 0
           |  THEN ${1L << p} ELSE 0 END)""".stripMargin
      }.mkString(" + ")
      s"  SELECT vec_id, v, $t AS tbl,\n$bits AS bucket FROM e"
    }.mkString("\n  UNION ALL\n")
  }
}
