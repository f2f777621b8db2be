package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent
  * right row with the same key and time ≤ the left time.
  *
  * Spark has no built-in as-of join; the composition here is the
  * scalable union-and-carry shape rather than a per-key loop: tag both
  * inputs, union them, and let one window per key — ordered by
  * (time, side) with right rows first at equal times — carry the last
  * non-null right attributes forward onto each left row. One shuffle
  * on the key, linear state, no pair explosion; skewed keys behave
  * like any window (salt if a single key dominates).
  */
object AsOf {

  /** Events ⟕ most recent order per user at event time.
    *
    * Right rows are first deduplicated to one per (key, time) with a
    * deterministic tie-break (max orderkey), so the as-of match is
    * well-defined on both engines. Output times are epoch micros.
    *
    * The unbounded case of [[eventsLastOrderWithin]] (any finite gap
    * clears a Long.MaxValue staleness bound — gaps are micros-scale
    * differences, nowhere near overflow — and an unmatched row nulls
    * either way), so the two forms share one union-and-carry body and
    * cannot drift (Round11OpsSpec pins the equivalence). */
  def eventsLastOrder(events: DataFrame, orders: DataFrame): DataFrame =
    eventsLastOrderWithin(events, orders, Long.MaxValue)

  /** As-of join with a MAX-STALENESS tolerance: the match is the most
    * recent right row at-or-before the left time, AND it must be no
    * older than `maxAgeUs` — else the left row matches nothing (a
    * point-in-time feature join where a year-old price is as good as
    * no price; every feature-store as-of read has this dial).
    *
    * The scalable union-and-carry shape rather than a per-key loop:
    * one shuffle on the key, linear window state, no pair explosion —
    * with the matched right TIME carried beside its attributes so
    * staleness is one per-row comparison after the window; the carry
    * itself stays tolerance-free (the nearest match is either
    * in-window or the row has no match: a farther one can't be
    * nearer). NULLing both output attributes on a stale match keeps
    * the left-join contract (every event emits exactly one row). */
  def eventsLastOrderWithin(events: DataFrame, orders: DataFrame,
                            maxAgeUs: Long): DataFrame = {
    // one order per (custkey, date): the latest orderkey wins
    val byKeyTime = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val rights = orders
      .withColumn("rn", row_number().over(byKeyTime))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("k"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"), // NTZ→UTC instant
        lit(0).as("side"), lit(null).cast("long").as("event_id"),
        col("o_orderkey").as("r_orderkey"),
        col("o_totalprice").as("r_totalprice"))
    val lefts = events
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        lit(1).as("side"), col("event_id"),
        lit(null).cast("long").as("r_orderkey"),
        lit(null).cast("double").as("r_totalprice"))
    // right rows sort before left rows at equal t → ties match (>= asof)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightT = when(col("side") === 0, col("t"))
    rights.unionByName(lefts)
      .withColumn("m_orderkey", last(col("r_orderkey"), ignoreNulls = true).over(w))
      .withColumn("m_totalprice", last(col("r_totalprice"), ignoreNulls = true).over(w))
      .withColumn("m_t", last(rightT, ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("fresh",
        col("m_t").isNotNull && col("t") - col("m_t") <= maxAgeUs)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("ts_us"),
        when(col("fresh"), col("m_orderkey")).as("last_orderkey"),
        when(col("fresh"), col("m_totalprice")).as("last_totalprice"))
  }
}
