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
    * well-defined on both engines. Output times are epoch micros. */
  def eventsLastOrder(events: DataFrame, orders: DataFrame): DataFrame = {
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
    rights.unionByName(lefts)
      .withColumn("last_orderkey", last(col("r_orderkey"), ignoreNulls = true).over(w))
      .withColumn("last_totalprice", last(col("r_totalprice"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("ts_us"),
        col("last_orderkey"), col("last_totalprice"))
  }
}
