package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  def ev(rows: (Long, Long, String)*) = // (event_id, ts_us, type)
    rows.toDF("event_id", "ts_us", "event_type")
      .selectExpr("event_id", "timestamp_micros(ts_us) AS ts",
        "1 AS user_id", "event_type", "1.0 AS value", "'{}' AS props")

  test("sessionize splits on gaps strictly greater than the threshold") {
    val m = 60L * 1000000L // one minute in micros
    val sessions = Analytics.sessionize(
      ev((1L, 0L, "a"), (2L, 30 * m, "a"), (3L, 60 * m, "a"),
         (4L, 91 * m, "a"), (5L, 100 * m, "a")), gapMinutes = 30)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    // gap of exactly 30min keeps the session; 31min splits it
    assert(sessions.map(s => (s._3, s._4, s._5)).toSeq ==
      Seq((0L, 60 * m, 3L), (91 * m, 100 * m, 2L)))
  }

  test("rollup emits leaf, subtotal and grand-total rows") {
    val orders = Seq(("O", "1-URGENT", 10.0), ("O", "2-HIGH", 20.0),
      ("F", "1-URGENT", 5.0)).toDF("o_orderstatus", "o_orderpriority", "o_totalprice")
    val r = Analytics.ordersRollup(orders).collect()
    assert(r.length == 3 + 2 + 1) // leaves + per-status + grand total
    val grand = r.find(x => x.isNullAt(0) && x.isNullAt(1)).get
    assert(grand.getLong(2) == 3L && grand.getDouble(3) == 35.0)
  }

  test("pivotCounts spreads counts across value columns, 0 for empty cells") {
    val orders = Seq(("O", "1-URGENT"), ("O", "1-URGENT"), ("F", "1-URGENT"),
      ("O", "2-HIGH")).toDF("o_orderstatus", "o_orderpriority")
    val r = Analytics.ordersPivotByStatus(orders)
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> (a, b, c) }.toMap
    // no P orders anywhere: the cell is 0, not null or a dropped column
    assert(r == Map("1-URGENT" -> (1L, 2L, 0L), "2-HIGH" -> (0L, 1L, 0L)))
  }

  test("set-op census: intersect and both excepts over purchase years") {
    val orders = Seq(
      (1L, "1995-03-01"), (1L, "1996-04-01"), // both years
      (2L, "1995-05-01"), (2L, "1995-06-01"), // only 1995 (distinct-ness)
      (3L, "1996-07-01"),                     // only 1996
      (4L, "1997-01-01"),                     // neither cohort
    ).toDF("o_custkey", "d")
      .selectExpr("o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate")
    val r = Analytics.customerYearSetOps(orders, 1995, 1996)
      .as[(String, Long)].collect().toMap
    assert(r == Map("both" -> 1L, "only_1995" -> 1L, "only_1996" -> 1L))
    // the one-scan census form (the registered query) is identical
    val census = Analytics.customerYearCensus(orders, 1995, 1996)
      .as[(String, Long)].collect().toMap
    assert(census == r)
  }

  test("customerYearCensus reads orders once on real data, setops six times") {
    import graft.sources.Tables
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val census = Analytics.customerYearCensus(orders, 1995, 1996)
    val setops = Analytics.customerYearSetOps(orders, 1995, 1996)
    assert(census.as[(String, Long)].collect().toMap ==
      setops.as[(String, Long)].collect().toMap)
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .sliding("FileScan".length).count(_ == "FileScan")
    assert(scans(census) == 1, "census must read orders exactly once")
    assert(scans(setops) == 6) // two year-filtered sides per set op
  }

  test("pivotCounts rejects an empty value list with a contract error") {
    val orders = Seq(("O", "1-URGENT")).toDF("o_orderstatus", "o_orderpriority")
    val e = intercept[IllegalArgumentException] {
      Analytics.pivotCounts(orders, "o_orderpriority", "o_orderstatus", Nil)
    }
    assert(e.getMessage.contains("at least one pivot value"))
  }

  test("approx percentiles stay within rank tolerance of exact on real data") {
    import graft.sources.Tables
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val exact = Analytics.eventValuePercentiles(events)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val approx = Analytics.eventValuePercentilesApprox(events)
      .as[(String, Double, Double, Double)].collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    // approx returns an actual data value near the requested rank; at
    // accuracy 10000 the rank error is tiny, so each approx percentile
    // must fall inside a +/-2-rank-point exact bracket.
    import org.apache.spark.sql.functions._
    approx.foreach { case (tpe, a50, a90, a99) =>
      val bracket = events.filter(col("event_type") === tpe)
        .agg(expr("percentile(value, array(0.48, 0.52, 0.88, 0.92, 0.97, 1.0))"))
        .as[Seq[Double]].head()
      assert(a50 >= bracket(0) && a50 <= bracket(1), s"$tpe p50 $a50 !in $bracket")
      assert(a90 >= bracket(2) && a90 <= bracket(3), s"$tpe p90 $a90 !in $bracket")
      assert(a99 >= bracket(4) && a99 <= bracket(5), s"$tpe p99 $a99 !in $bracket")
      assert((exact(tpe)._1 - a50).abs <= (exact(tpe)._1.abs + 1) * 0.05)
    }
  }

  test("hourly aggregation buckets by wall-clock hour") {
    val r = Analytics.eventsHourly(
      ev((1L, 0L, "a"), (2L, 3599L * 1000000L, "a"), (3L, 3600L * 1000000L, "a")))
      .as[(String, String, Long, Double)].collect().sortBy(_._1)
    assert(r.map(x => (x._1, x._3)).toSeq == Seq(
      ("1970-01-01 00:00:00", 2L), ("1970-01-01 01:00:00", 1L)))
  }

  test("correlated subqueries decorrelate to hash joins, never nested loops") {
    import graft.sources.Tables
    val d = "/root/testdata/sf0.001"
    val q17 = Analytics.smallQtyRevenue(spark, Tables.lineitem(spark, d),
      Tables.part(spark, d), "Brand#13", 0.2)
    val q18 = Analytics.largeOrders(spark, Tables.customer(spark, d),
      Tables.orders(spark, d), Tables.lineitem(spark, d), 250.0, 100)
    val p17 = q17.queryExecution.executedPlan.toString
    val p18 = q18.queryExecution.executedPlan.toString
    // decorrelation produced real join operators...
    assert(!p17.contains("BroadcastNestedLoopJoin"), p17)
    assert(!p18.contains("BroadcastNestedLoopJoin"), p18)
    // ...the scalar subquery became an aggregate joined on the
    // correlation key, and the IN-subquery a left-semi hash join.
    assert(p17.contains("HashJoin"), p17)
    assert(p18.contains("LeftSemi"), p18)
    // and the results are right (oracle re-checks at sf0.01):
    assert(q17.collect().length == 1)
    val rows = q18.collect()
    assert(rows.length == 25 && rows.forall(_.getDouble(5) > 250.0))
    // EXISTS + NOT EXISTS pair (Q21 shape) → left-semi + left-anti
    val q21 = Analytics.blameSupplier(spark, Tables.supplier(spark, d),
      Tables.lineitem(spark, d), 20)
    val p21 = q21.queryExecution.executedPlan.toString
    assert(!p21.contains("BroadcastNestedLoopJoin"), p21)
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"), p21)
    assert(q21.collect().nonEmpty)
    // uncorrelated scalar subquery + non-equi correlated EXISTS (Q22
    // shape) → semi join with a residual o_totalprice > c_acctbal
    val q22 = Analytics.richActiveCustomers(spark,
      Tables.customer(spark, d), Tables.orders(spark, d))
    val p22 = q22.queryExecution.executedPlan.toString
    assert(!p22.contains("BroadcastNestedLoopJoin"), p22)
    assert(p22.contains("LeftSemi"), p22)
    assert(p22.contains("Subquery") || p22.contains("subquery"), p22)
    assert(q22.collect().length == 5) // one row per segment
  }

  test("q4/q20 subquery shapes decorrelate to semi joins, never nested loops") {
    import graft.sources.Tables
    val d = "/root/testdata/sf0.001"
    // Q4: EXISTS with a non-equi date residual → left-semi hash join
    val q4 = Analytics.orderPriorityCheck(spark, Tables.orders(spark, d),
      Tables.lineitem(spark, d), "1996-01-01", "1996-04-01", 60)
    val p4 = q4.queryExecution.executedPlan.toString
    assert(!p4.contains("BroadcastNestedLoopJoin"), p4)
    assert(p4.contains("LeftSemi"), p4)
    assert(q4.collect().map(_.getLong(1)).sum > 0)
    // Q20: IN over a grouped HAVING whose threshold is itself a
    // correlated scalar — both levels decorrelate to hash joins
    val q20 = Analytics.excessShippers(spark, Tables.supplier(spark, d),
      Tables.lineitem(spark, d), Tables.part(spark, d),
      "red", "1996-01-01", "1997-01-01", 0.5)
    val p20 = q20.queryExecution.executedPlan.toString
    assert(!p20.contains("BroadcastNestedLoopJoin"), p20)
    assert(p20.contains("LeftSemi"), p20)
    val rows20 = q20.collect()
    assert(rows20.nonEmpty)
    // the threshold actually excludes someone: tightening it to ~every
    // group (factor 0) must yield strictly more suppliers
    val all = Analytics.excessShippers(spark, Tables.supplier(spark, d),
      Tables.lineitem(spark, d), Tables.part(spark, d),
      "red", "1996-01-01", "1997-01-01", 0.0).collect()
    assert(all.length > rows20.length)
  }

  test("retention: day-0 equals cohort size, later offsets never exceed it") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val m = Analytics.retention(events, "purchase")
      .as[(String, Int, Long)].collect()
    assert(m.nonEmpty && m.forall(_._2 >= 0))
    val day0 = m.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    // every cohort has a day-0 row (a user is active on their first
    // day by definition) and retention is monotonically bounded by it
    m.foreach { case (c, off, n) =>
      assert(day0.contains(c), s"cohort $c missing its day-0 row")
      assert(n <= day0(c), s"cohort $c offset $off: $n > ${day0(c)}")
    }
    // cohort sizes partition the purchasing-user population
    val purchasers = events.filter($"event_type" === "purchase")
      .select($"user_id").distinct().count()
    assert(day0.values.sum == purchasers)
  }

  test("q13 outer-join distribution keeps order-less customers at count 0") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq((10L, 1L, "5-LOW"), (11L, 1L, "5-LOW"),
      (12L, 2L, "1-URGENT")).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val r = Analytics.customerOrderDistribution(customer, orders, "1-URGENT")
      .as[(Long, Long)].collect().toMap
    // cust 1 has 2 counted orders; cust 2's only order is excluded by
    // priority and cust 3 has none — both land in the 0 bucket
    assert(r == Map(2L -> 1L, 0L -> 2L))
  }

  test("q19 disjunctive filter stays an equi-join with a residual, not a BNLJ") {
    import graft.sources.Tables
    val d = "/root/testdata/sf0.001"
    val q19 = Analytics.disjunctiveRevenue(Tables.lineitem(spark, d),
      Tables.part(spark, d), Seq(Analytics.QtyBand("Brand#12", 5, 1, 11),
        Analytics.QtyBand("Brand#23", 10, 10, 20)))
    val p19 = q19.queryExecution.executedPlan.toString
    assert(!p19.contains("BroadcastNestedLoopJoin"), p19)
    assert(!p19.contains("CartesianProduct"), p19)
    assert(p19.contains("HashJoin"), p19)
    // empty band list is a contract error, not a NoSuchElementException
    val e = intercept[IllegalArgumentException] {
      Analytics.disjunctiveRevenue(Tables.lineitem(spark, d),
        Tables.part(spark, d), Nil)
    }
    assert(e.getMessage.contains("at least one band"))
  }

  test("q15 returns every supplier tied at the max revenue") {
    val supplier = Seq((1L, "sup1"), (2L, "sup2"), (3L, "sup3"))
      .toDF("s_suppkey", "s_name")
    val lineitem = Seq(
      (1L, 100.0, 0.0), (2L, 50.0, 0.0), (2L, 50.0, 0.0), (3L, 10.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
      .selectExpr("l_suppkey", "l_extendedprice", "l_discount",
        "CAST('1996-02-01' AS TIMESTAMP) AS l_shipdate")
    val r = Analytics.topRevenueSupplier(spark, supplier, lineitem,
      "1996-01-01", "1996-04-01")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    // suppliers 1 and 2 both total 100.0 — exact decimal sums make the
    // double equality safe, so BOTH come back
    assert(r.toSeq == Seq((1L, "sup1", 100.0), (2L, "sup2", 100.0)))
  }

  test("q16 NOT IN blacklist excludes flagged suppliers from the counts") {
    val part = Seq((1L, "Brand#1", "SMALL", 5), (2L, "Brand#2", "LARGE", 5))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val lineitem = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))
      .toDF("l_partkey", "l_suppkey")
    val supplier = Seq((10L, 100.0), (11L, -5.0), (12L, 3.0))
      .toDF("s_suppkey", "s_acctbal")
    val r = Analytics.supplierVariety(spark, part, lineitem, supplier,
      "Brand#9", "MEDIUM", Seq(5))
      .as[(String, String, Int, Long)].collect()
      .map(x => x._1 -> x._4).toMap
    // supplier 11 is blacklisted (negative balance): Brand#1 counts
    // only 10 and 12; Brand#2 still counts supplier 10
    assert(r == Map("Brand#1" -> 2L, "Brand#2" -> 1L))
  }

  test("funnel counts ordered step completion, strictly increasing times") {
    def evu(rows: (Long, Long, String)*) = // (user_id, ts_us, type)
      rows.zipWithIndex.map { case ((u, us, t), i) => (i.toLong, u, us, t) }
        .toDF("event_id", "user_id", "ts_us", "event_type")
        .selectExpr("event_id", "timestamp_micros(ts_us) AS ts", "user_id",
          "event_type", "1.0 AS value", "'{}' AS props")
    val events = evu(
      (1L, 10L, "view"), (1L, 15L, "error"), (1L, 20L, "click"),
      (1L, 30L, "purchase"),                       // full funnel
      (2L, 5L, "click"), (2L, 10L, "view"),        // click BEFORE view only
      (3L, 10L, "view"), (3L, 15L, "purchase"),
      (3L, 20L, "click"),                          // purchase precedes click
      (4L, 1L, "click"), (4L, 2L, "purchase"),     // never viewed
      (5L, 10L, "view"), (5L, 10L, "click"))       // same-instant: strict >
    val out = Analytics.funnel(events, Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0, "view", 4L), (1, "click", 2L), (2, "purchase", 1L)))
    // a shorter funnel over the same events: u1 and u3 click after
    // their view; u2 clicked only before it, u5 only at the same tick
    val two = Analytics.funnel(events, Seq("view", "click"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(two == Seq((0, "view", 4L), (1, "click", 2L)))
  }

  test("windowed funnel prunes conversions outside the step window") {
    def evu(rows: (Long, Long, String)*) =
      rows.zipWithIndex.map { case ((u, us, t), i) => (i.toLong, u, us, t) }
        .toDF("event_id", "user_id", "ts_us", "event_type")
        .selectExpr("event_id", "timestamp_micros(ts_us) AS ts", "user_id",
          "event_type", "1.0 AS value", "'{}' AS props")
    val events = evu(
      (1L, 10L, "view"), (1L, 20L, "click"),   // inside the window
      (2L, 10L, "view"), (2L, 121L, "click"),  // outside: 111 > 100
      (3L, 10L, "view"), (3L, 110L, "click"))  // boundary: exactly 100
    val out = Analytics.funnel(events, Seq("view", "click"), Some(100L))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    // boundary is inclusive (<= window); u2's only click is too late
    assert(out == Seq((0, "view", 3L), (1, "click", 2L)))
    // without the window all three convert
    val all = Analytics.funnel(events, Seq("view", "click"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(all == Seq((0, "view", 3L), (1, "click", 3L)))
  }

  test("funnel on empty input emits no rows (counts need >= 1 user)") {
    val none = Seq.empty[(Long, Long, String)]
      .toDF("user_id", "ts_us", "event_type")
      .selectExpr("user_id", "timestamp_micros(ts_us) AS ts", "event_type")
    assert(Analytics.funnel(none, Seq("view", "click")).count() == 0)
  }
}
