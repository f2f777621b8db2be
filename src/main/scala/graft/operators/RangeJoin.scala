package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs of rows whose times fall within a window
  * of each other. Spark plans a raw inequality join as a broadcast
  * nested loop (quadratic); the scalable shape buckets time into
  * `window`-sized bands, joins each row to its own and its neighbor
  * band (a row's partner within `window` is always in the same or an
  * adjacent band), then applies the exact predicate. One equi-shuffle
  * on (key, band); work is linear in input + true output.
  */
object RangeJoin {

  /** Same-user event pairs within `windowMinutes` of each other
    * (a < b for a canonical pair order). The band key makes the join
    * an equi-join; the exact |Δt| filter runs on band-local pairs. */
  def eventPairsWithin(events: DataFrame, windowMinutes: Int): DataFrame = {
    val winUs = windowMinutes * 60L * 1000000L
    val base = events.select(col("user_id"),
        col("event_id"), unix_micros(col("ts")).as("t"))
      .withColumn("band0", expr(s"t div ${winUs}L"))
    // Right rows carry their own band; left rows probe all three
    // neighbor bands (the canonical id_a < id_b order is not time
    // order, so the partner may sit one band before OR after).
    val lefts = base.select(col("user_id"), col("event_id").as("id_a"),
      col("t").as("t_a"),
      explode(array(col("band0") - 1, col("band0"), col("band0") + 1))
        .as("band"))
    val rights = base.select(col("user_id").as("r_user_id"),
      col("event_id").as("id_b"), col("t").as("t_b"),
      col("band0").as("band"))
    lefts.join(rights,
        col("user_id") === col("r_user_id") && lefts("band") === rights("band") &&
          col("id_a") < col("id_b"))
      .filter(abs(col("t_b") - col("t_a")) <= winUs)
      .select(col("user_id"), col("id_a"), col("id_b"),
        (col("t_b") - col("t_a")).as("dt_us"))
      .distinct() // a pair can meet in two bands (own + neighbor overlap)
  }
}
