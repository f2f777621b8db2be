package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Num.{davgSql, dsumSql}
import graft.operators.Analytics
import graft.sources.Tables

/** B-family bindings: relational analytics over the TPC-H-ish tables.
  * Oracle SQL mirrors each Spark plan with identical column names,
  * decimal-exact sums, and deterministic tie-breaks on every LIMIT.
  */
object AnalyticsRegistry {

  private val Q1Cutoff = "1998-09-02"
  private val Q3Cutoff = "1998-03-15"

  /** Funnel binding: the synthetic event stream's natural conversion
    * sequence. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Windowed-funnel bound: 24 h — the synthetic stream's median
    * click-after-view gap is ~32 h, so the window genuinely prunes. */
  val FunnelWindowUs: Long = 24L * 3600L * 1000000L

  /** As-of staleness bound: 8,500 days. The synthetic corpus dates
    * orders in the TPC-H 1990s and events two decades later, so the
    * event→last-order gap runs ~8,200-9,200 days (p50 ≈ 8,372, p90 ≈
    * 8,817, measured at sf0.01); 8,500 sits between them, so the bound
    * genuinely splits the stream — most matches survive, a real
    * fraction are nulled as stale. */
  val AsOfMaxAgeUs: Long = 8500L * 86400L * 1000000L

  /** Value-histogram bucket width. */
  val HistWidth: Double = 10.0

  /** Session-length histogram bucket width (minutes). */
  val SessionBucketMin: Int = 5

  /** Anomaly-report z-score threshold. */
  val AnomalyZ: Double = 3.0

  /** DuckDB replay of [[Analytics.funnel]] for the bound FunnelSteps,
    * optionally with the conversion-window clause. */
  private def funnelSql(withinUs: Option[Long]): String = {
    val ctes = FunnelSteps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        s"""s0 AS (
           |  SELECT user_id, min(epoch_us(ts)) AS t FROM events
           |  WHERE event_type = '$step' GROUP BY user_id
           |)""".stripMargin
      else {
        val window = withinUs
          .map(w => s" AND epoch_us(e.ts) - s${i - 1}.t <= $w").getOrElse("")
        s"""s$i AS (
           |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
           |  FROM events e JOIN s${i - 1} USING (user_id)
           |  WHERE e.event_type = '$step' AND epoch_us(e.ts) > s${i - 1}.t$window
           |  GROUP BY e.user_id
           |)""".stripMargin
      }
    }.mkString("WITH ", ", ", "")
    val selects = FunnelSteps.zipWithIndex.map { case (step, i) =>
      s"SELECT $i AS step, '$step' AS step_name, count(*) AS n_users FROM s$i"
    }.mkString("\nUNION ALL ")
    s"$ctes\n$selects"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, d) =>
      Analytics.pricingSummary(Tables.lineitem(s, d), Q1Cutoff)),
    "q3_shipping_priority" -> ((s, d) =>
      Analytics.shippingPriority(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), "BUILDING", Q3Cutoff)),
    "q5_local_supplier" -> ((s, d) =>
      Analytics.localSupplierVolume(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), "ASIA", "1996-01-01", "1997-01-01")),
    "q6_forecast_revenue" -> ((s, d) =>
      Analytics.forecastRevenue(Tables.lineitem(s, d),
        "1996-01-01", "1997-01-01", 0.05, 0.07, 24.0)),
    "q10_returned_items" -> ((s, d) =>
      Analytics.returnedItems(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.nation(s, d),
        "1996-01-01", "1996-04-01")),
    "q17_small_qty_revenue" -> ((s, d) =>
      Analytics.smallQtyRevenue(s, Tables.lineitem(s, d), Tables.part(s, d),
        "Brand#13", 0.2)),
    "q18_large_orders" -> ((s, d) =>
      Analytics.largeOrders(s, Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), 250.0, 100)),
    "q21_blame_supplier" -> ((s, d) =>
      Analytics.blameSupplier(s, Tables.supplier(s, d),
        Tables.lineitem(s, d), 20)),
    "q22_rich_active" -> ((s, d) =>
      Analytics.richActiveCustomers(s, Tables.customer(s, d),
        Tables.orders(s, d))),
    "q4_priority_check" -> ((s, d) =>
      Analytics.orderPriorityCheck(s, Tables.orders(s, d),
        Tables.lineitem(s, d), "1996-01-01", "1996-04-01", 60)),
    "q7_nation_volume" -> ((s, d) =>
      Analytics.nationTradeVolume(Tables.nation(s, d), Tables.supplier(s, d),
        Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
        "NATION_3", "NATION_7", "1995-01-01", "1997-01-01")),
    "q8_market_share" -> ((s, d) =>
      Analytics.marketShare(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.part(s, d),
        "NATION_3", "ASIA", "PROMO", 1995, 1996)),
    "q12_priority_class" -> ((s, d) =>
      Analytics.linePriorityCounts(Tables.orders(s, d), Tables.lineitem(s, d),
        "1996-01-01", "1997-01-01")),
    "q13_cust_distribution" -> ((s, d) =>
      Analytics.customerOrderDistribution(Tables.customer(s, d),
        Tables.orders(s, d), "1-URGENT")),
    "q14_promo_revenue" -> ((s, d) =>
      Analytics.promoRevenueShare(Tables.lineitem(s, d), Tables.part(s, d),
        "1996-03-01", "1996-04-01")),
    "q15_top_supplier" -> ((s, d) =>
      Analytics.topRevenueSupplier(s, Tables.supplier(s, d),
        Tables.lineitem(s, d), "1996-01-01", "1996-04-01")),
    "q16_supplier_variety" -> ((s, d) =>
      Analytics.supplierVariety(s, Tables.part(s, d), Tables.lineitem(s, d),
        Tables.supplier(s, d), "Brand#5", "MEDIUM", Seq(1, 5, 9, 14, 19, 23, 36, 45))),
    "q19_disjunctive_revenue" -> ((s, d) =>
      Analytics.disjunctiveRevenue(Tables.lineitem(s, d), Tables.part(s, d),
        Seq(Analytics.QtyBand("Brand#12", 5, 1, 11),
          Analytics.QtyBand("Brand#23", 10, 10, 20),
          Analytics.QtyBand("Brand#34", 15, 20, 30)))),
    "q20_excess_shippers" -> ((s, d) =>
      Analytics.excessShippers(s, Tables.supplier(s, d), Tables.lineitem(s, d),
        Tables.part(s, d), "red", "1996-01-01", "1997-01-01", 0.5)),
    "q_top_customers_window" -> ((s, d) =>
      Analytics.topCustomersPerNation(Tables.nation(s, d),
        Tables.customer(s, d), Tables.orders(s, d), 5)),
    "q_orders_rollup" -> ((s, d) =>
      Analytics.ordersRollup(Tables.orders(s, d))),
    "q_orders_cube" -> ((s, d) =>
      Analytics.ordersCube(Tables.orders(s, d))),
    "q_orders_gsets" -> ((s, d) =>
      Analytics.ordersGroupingSets(Tables.orders(s, d))),
    "q_pivot_status" -> ((s, d) =>
      Analytics.ordersPivotByStatus(Tables.orders(s, d))),
    // the one-scan census form; the oracle keeps the INTERSECT/EXCEPT
    // spelling (equality spec-proven vs customerYearSetOps)
    "q_setops_census" -> ((s, d) =>
      Analytics.customerYearCensus(Tables.orders(s, d), 1995, 1996)),
    "q_asof_last_order" -> ((s, d) =>
      graft.operators.AsOf.eventsLastOrder(Tables.events(s, d), Tables.orders(s, d))),
    // the tolerance dial: same as-of carry, matches older than the
    // staleness bound are nulled — a feature-store point-in-time
    // read's max-age contract
    "q_asof_tolerance" -> ((s, d) =>
      graft.operators.AsOf.eventsLastOrderWithin(Tables.events(s, d),
        Tables.orders(s, d), AsOfMaxAgeUs)),
    "q_value_histogram" -> ((s, d) =>
      Analytics.eventValueHistogram(Tables.events(s, d), HistWidth)),
    "q_part_topn_per_brand" -> ((s, d) =>
      Analytics.topPartsPerBrand(Tables.part(s, d), 3)),
    "q_events_minutely" -> ((s, d) =>
      Analytics.eventsHourly(Tables.events(s, d))),
    "q_window_suite" -> ((s, d) =>
      Analytics.orderWindowStats(Tables.orders(s, d))),
    "q_value_percentiles" -> ((s, d) =>
      Analytics.eventValuePercentiles(Tables.events(s, d))),
    // sketch path: no SQL oracle (DuckDB's approx sketch differs);
    // AnalyticsSpec bounds its rank error against the exact version.
    "q_value_percentiles_approx" -> ((s, d) =>
      Analytics.eventValuePercentilesApprox(Tables.events(s, d))),
    "q_semi_anti_census" -> ((s, d) =>
      Analytics.customerOrderCensus(Tables.customer(s, d), Tables.orders(s, d))),
    "q_range_join" -> ((s, d) =>
      graft.operators.RangeJoin.eventPairsWithin(Tables.events(s, d), 5)),
    "q_events_json" -> ((s, d) =>
      Analytics.eventsJsonAgg(Tables.events(s, d))),
    "q_events_sessionize" -> ((s, d) =>
      Analytics.sessionize(Tables.events(s, d), 30)),
    // session-length histogram: the sessionizer composed with one
    // bucket-keyed aggregate (5-minute buckets)
    "q_session_stats" -> ((s, d) =>
      Analytics.sessionStats(Tables.events(s, d), 30, SessionBucketMin)),
    // volume-spike detection: per-minute counts z-scored against each
    // type's own distribution (exact-integer sufficient statistics)
    "q_events_anomaly" -> ((s, d) =>
      Analytics.eventAnomalies(Tables.events(s, d), AnomalyZ)),
    // purchase-cohort retention: day granularity so the synthetic
    // corpus yields a real multi-cohort matrix (week-level cohorts
    // collapse — every user is active in week 1)
    "q_retention" -> ((s, d) =>
      Analytics.retention(Tables.events(s, d), "purchase")),
    "q_events_funnel" -> ((s, d) =>
      Analytics.funnel(Tables.events(s, d), FunnelSteps)),
    "q_events_funnel_windowed" -> ((s, d) =>
      Analytics.funnel(Tables.events(s, d), FunnelSteps,
        Some(FunnelWindowUs))),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_extendedprice")} AS avg_price,
         |  ${davgSql("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '$Q1Cutoff 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |  o_orderpriority,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '$Q3Cutoff 00:00:00'
         |  AND l_shipdate > TIMESTAMP '$Q3Cutoff 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey ASC
         |LIMIT 10""".stripMargin,
    "q6_forecast_revenue" ->
      s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  c_acctbal, n_name
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey ASC
         |LIMIT 20""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,
    "q17_small_qty_revenue" ->
      s"""SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#13'
         |  AND l_quantity < (SELECT 0.2 * ${davgSql("l_quantity")}
         |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q18_large_orders" ->
      s"""SELECT c_name, c_custkey, o_orderkey,
         |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |  o_totalprice, ${dsumSql("l_quantity")} AS total_qty
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderkey IN (
         |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         |  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 250.0)
         |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderkey ASC
         |LIMIT 100""".stripMargin,
    "q21_blame_supplier" ->
      s"""SELECT s_name, count(*) AS numwait
         |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         |WHERE l1.l_returnflag = 'R'
         |  AND EXISTS (SELECT 1 FROM lineitem l2
         |              WHERE l2.l_orderkey = l1.l_orderkey
         |                AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
         |                  WHERE l3.l_orderkey = l1.l_orderkey
         |                    AND l3.l_suppkey <> l1.l_suppkey
         |                    AND l3.l_returnflag = 'R')
         |GROUP BY s_name
         |ORDER BY numwait DESC, s_name ASC
         |LIMIT 20""".stripMargin,
    "q22_rich_active" ->
      s"""SELECT c_mktsegment, count(*) AS numcust,
         |  ${dsumSql("c_acctbal")} AS totacctbal
         |FROM customer c
         |WHERE c_acctbal > (SELECT ${davgSql("c_acctbal")}
         |                   FROM customer WHERE c_acctbal > 0.0)
         |  AND EXISTS (SELECT 1 FROM orders o
         |              WHERE o.o_custkey = c.c_custkey
         |                AND o.o_totalprice > c.c_acctbal)
         |GROUP BY c_mktsegment""".stripMargin,
    "q4_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM supplier
         |JOIN lineitem ON s_suppkey = l_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  ${dsumSql("CASE WHEN n2.n_name = 'NATION_3' " +
            "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
         |    / ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS mkt_share
         |FROM part
         |JOIN lineitem ON p_partkey = l_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
         |  AND year(o_orderdate) BETWEEN 1995 AND 1996
         |GROUP BY 1""".stripMargin,
    "q12_priority_class" ->
      """SELECT l_returnflag,
        |  CAST(count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |    AS BIGINT) AS high_line_count,
        |  CAST(count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
        |    AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin,
    "q13_cust_distribution" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |)
        |SELECT c_count, count(*) AS custdist
        |FROM c_orders
        |GROUP BY c_count""".stripMargin,
    "q14_promo_revenue" ->
      s"""SELECT 100.0 * ${dsumSql("CASE WHEN p_type = 'PROMO' " +
            "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
         |    / ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q19_disjunctive_revenue" ->
      s"""SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_excess_shippers" ->
      """SELECT s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey, p_partkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > (
        |    SELECT 0.5 * sum(CAST(l2.l_quantity AS DECIMAL(38,6)))
        |    FROM lineitem l2
        |    WHERE l2.l_partkey = p_partkey
        |      AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND l2.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))""".stripMargin,
    "q_top_customers_window" ->
      s"""WITH spend AS (
         |  SELECT c_custkey, c_name, c_nationkey,
         |    ${dsumSql("o_totalprice")} AS spend
         |  FROM customer JOIN orders ON c_custkey = o_custkey
         |  GROUP BY c_custkey, c_name, c_nationkey
         |), ranked AS (
         |  SELECT n_name, c_custkey, c_name, spend,
         |    rank() OVER (PARTITION BY n_name
         |                 ORDER BY spend DESC, c_custkey ASC) AS rnk
         |  FROM spend JOIN nation ON c_nationkey = n_nationkey
         |)
         |SELECT n_name, c_custkey, c_name, spend, rnk
         |FROM ranked WHERE rnk <= 5""".stripMargin,
    "q_orders_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  count(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,
    "q_orders_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  count(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q_orders_gsets" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  count(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    // the conditional-aggregation spelling of the same single pass the
    // valued pivot compiles to
    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_setops_census" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |SELECT 'both' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
        |FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |UNION ALL
        |SELECT 'only_1995' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
        |FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |UNION ALL
        |SELECT 'only_1996' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
        |FROM (SELECT * FROM b EXCEPT SELECT * FROM a)""".stripMargin,
    "q_asof_last_order" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                       ORDER BY o_orderkey DESC) AS rn
        |  FROM orders
        |)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  r.o_orderkey AS last_orderkey, r.o_totalprice AS last_totalprice
        |FROM events e
        |ASOF LEFT JOIN (SELECT * FROM r WHERE rn = 1) r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate""".stripMargin,
    // the as-of replay + one staleness CASE: the ASOF match is
    // tolerance-free (nearest-or-nothing), freshness only nulls it
    "q_asof_tolerance" ->
      s"""WITH r AS (
         |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
         |    row_number() OVER (PARTITION BY o_custkey, o_orderdate
         |                       ORDER BY o_orderkey DESC) AS rn
         |  FROM orders
         |), m AS (
         |  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
         |    r.o_orderkey, r.o_totalprice,
         |    epoch_us(CAST(r.o_orderdate AS TIMESTAMP)) AS mt
         |  FROM events e
         |  ASOF LEFT JOIN (SELECT * FROM r WHERE rn = 1) r
         |    ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
         |)
         |SELECT event_id, user_id, ts_us,
         |  CASE WHEN mt IS NOT NULL AND ts_us - mt <= $AsOfMaxAgeUs
         |       THEN o_orderkey END AS last_orderkey,
         |  CASE WHEN mt IS NOT NULL AND ts_us - mt <= $AsOfMaxAgeUs
         |       THEN o_totalprice END AS last_totalprice
         |FROM m""".stripMargin,
    "q_value_histogram" ->
      s"""SELECT event_type, CAST(floor(value / $HistWidth) AS BIGINT) AS bucket,
         |  count(*) AS n_events,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q_part_topn_per_brand" ->
      s"""WITH ranked AS (
         |  SELECT p_brand, p_partkey, p_name, p_retailprice,
         |    row_number() OVER (PARTITION BY p_brand
         |                       ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
         |  FROM part
         |)
         |SELECT p_brand, p_partkey, p_name, p_retailprice, rn
         |FROM ranked WHERE rn <= 3""".stripMargin,
    "q_events_minutely" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         |  event_type, count(*) AS n_events,
         |  ${dsumSql("value")} AS total_value
         |FROM events
         |GROUP BY 1, 2""".stripMargin,
    // staged min-joins replay the per-user sorted fold: step k's time
    // is the min event time strictly after (and, windowed, within
    // `withinUs` of) the step-(k-1) time
    "q_events_funnel" -> funnelSql(None),
    "q_events_funnel_windowed" -> funnelSql(Some(FunnelWindowUs)),
    "q_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        |  FROM events WHERE event_type = 'purchase'
        |), cohorts AS (
        |  SELECT user_id, min(day) AS cohort FROM ud GROUP BY user_id
        |)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        |  CAST(date_diff('day', CAST(cohort AS DATE), CAST(day AS DATE))
        |    AS INTEGER) AS day_offset,
        |  count(*) AS n_users
        |FROM ud JOIN cohorts USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  avg(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,
    "q_value_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90,
        |  quantile_cont(value, 0.99) AS p99
        |FROM events GROUP BY event_type""".stripMargin,
    "q_semi_anti_census" ->
      """WITH active AS (
        |  SELECT c_mktsegment, count(*) AS n_active FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY 1
        |), inactive AS (
        |  SELECT c_mktsegment, count(*) AS n_inactive FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY 1
        |)
        |SELECT c_mktsegment,
        |  coalesce(n_active, 0) AS n_active,
        |  coalesce(n_inactive, 0) AS n_inactive
        |FROM active FULL OUTER JOIN inactive USING (c_mktsegment)""".stripMargin,
    "q_range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 300000000""".stripMargin,
    "q_events_json" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  ${dsumSql("CAST(json_extract_string(props, 'k') AS INTEGER)")} AS sum_k,
         |  ${davgSql("CAST(json_extract_string(props, 'k') AS INTEGER)")} AS avg_k
         |FROM events
         |GROUP BY event_type""".stripMargin,
    // minute counts -> exact-integer (k, s, ss) per type -> the same
    // fixed-order double expressions; zero-variance types excluded
    "q_events_anomaly" ->
      s"""WITH pm AS (
         |  SELECT event_type,
         |    strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS minute,
         |    count(*) AS n
         |  FROM events GROUP BY 1, 2
         |), st AS (
         |  SELECT event_type, count(*) AS k,
         |    CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS ss
         |  FROM pm GROUP BY 1
         |), j AS (
         |  SELECT pm.event_type, pm.minute, pm.n,
         |    CAST(s AS DOUBLE) / k AS mean,
         |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / k) / k AS varr
         |  FROM pm JOIN st USING (event_type)
         |)
         |SELECT event_type, minute, n,
         |  (n - mean) / sqrt(varr) AS zscore
         |FROM j
         |WHERE varr > 0 AND abs((n - mean) / sqrt(varr)) >= $AnomalyZ""".stripMargin,
    "q_events_sessionize" -> SessionizeSql,
    // the sessionize CTE + one integer-division bucket aggregate
    "q_session_stats" ->
      s"""WITH s AS (
         |$SessionizeSql
         |)
         |SELECT (session_end_us - session_start_us)
         |    // ${SessionBucketMin * 60L * 1000000L} AS dur_bucket,
         |  count(*) AS n_sessions,
         |  CAST(sum(n_events) AS BIGINT) AS n_events_total
         |FROM s GROUP BY 1""".stripMargin,
  )

  /** The gap-sessionizer replay, shared by q_events_sessionize and the
    * composed q_session_stats oracle. */
  private val SessionizeSql: String =
    s"""WITH t AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
       |                            ORDER BY ts ASC, event_id ASC) AS prev_us
       |  FROM events
       |), flagged AS (
       |  SELECT user_id, event_id, ts_us,
       |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM t
       |), numbered AS (
       |  SELECT user_id, ts_us,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id
       |      ORDER BY ts_us ASC, event_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged
       |)
       |SELECT user_id, session_id,
       |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       |  count(*) AS n_events
       |FROM numbered
       |GROUP BY user_id, session_id""".stripMargin
}
