package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers for oracle-exact aggregation.
  *
  * Double addition is not associative, so a parallel `sum(double)`
  * depends on partition order and can never hash-match a single-node
  * oracle. Every money/quantity aggregate therefore sums in
  * DECIMAL(38,6) — exact, associative, order-independent — and casts
  * the final value back to double. The per-row arithmetic stays in
  * double (single IEEE ops are deterministic on any engine); only the
  * reduction is decimal. Same trick the oracle SQL applies, so Spark
  * and DuckDB agree bit-for-bit. At 100 TB this also makes results
  * stable across retries/partition counts — a real reproducibility
  * property, not just a test convenience.
  */
object Num {
  private val D = DecimalType(38, 6)

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact-sum average: one double division at the end. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** The oracle-SQL spelling of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE)"

  /** The oracle-SQL spelling of [[davg]]. */
  def davgSql(expr: String): String =
    s"${dsumSql(expr)} / count($expr)"
}
