package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num

/** B-family: general relational analytics — the reference's
  * scan→group→aggregate pattern (reference main.go:84-197) widened to
  * joins, windows, rollups and time-series aggregation.
  *
  * Scale posture (SURVEY §4): every dimension join that is small at any
  * SF (region, nation) is broadcast explicitly; fact⋈fact joins
  * (orders⋈lineitem, customer⋈orders) shuffle on their keys and are
  * left to AQE for runtime re-planning. All money sums aggregate in
  * DECIMAL(38,6) (see [[graft.functions.Num]]) so results are
  * partition-order-independent — reproducible at any parallelism.
  */
object Analytics {

  /** TPC-H Q1-style pricing summary: one scan, one shuffle, map-side
    * partial aggregation; filter pushed to parquet. */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base_price"),
        Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        Num.davg(col("l_quantity")).as("avg_qty"),
        Num.davg(col("l_extendedprice")).as("avg_price"),
        Num.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style shipping priority: two fact joins on their natural
    * keys (custkey, orderkey), top-10 revenue with a deterministic
    * orderkey tie-break. */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String,
                       cutoff: String): DataFrame =
    customer.filter(col("c_mktsegment") === segment)
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  /** TPC-H Q6-style forecast revenue: the pure scan-aggregate — every
    * predicate pushes to the parquet scan (shipdate range, discount
    * band, quantity cap all appear in PushedFilters), one decimal
    * scalar aggregate, no join, no wide shuffle. The canonical "is
    * pushdown working" probe. */
  def forecastRevenue(lineitem: DataFrame, yearStart: String,
                      yearEnd: String, discLo: Double, discHi: Double,
                      qtyMax: Double): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(yearStart).cast("timestamp") &&
        col("l_shipdate") < lit(yearEnd).cast("timestamp") &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < qtyMax)
      .agg(Num.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** TPC-H Q10-style returned-item report: customers ranked by revenue
    * lost to returns in a quarter. The return-flag filter prunes
    * lineitem at the scan; nation broadcasts; the fact joins shuffle
    * on their keys; TakeOrdered caps the result. */
  def returnedItems(customer: DataFrame, orders: DataFrame,
                    lineitem: DataFrame, nation: DataFrame,
                    qStart: String, qEnd: String): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit(qStart).cast("timestamp") &&
        col("o_orderdate") < lit(qEnd).cast("timestamp"))
      .join(lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  /** TPC-H Q5-style local-supplier volume: the 6-way join. region and
    * nation are broadcast (tiny at any SF); customer⋈orders⋈lineitem⋈
    * supplier shuffle on their keys. */
  def localSupplierVolume(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          orders: DataFrame, lineitem: DataFrame,
                          regionName: String, yearStart: String,
                          yearEnd: String): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit(yearStart).cast("timestamp") &&
        col("o_orderdate") < lit(yearEnd).cast("timestamp"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))

  /** Per-nation top-N customers by lifetime spend (rank window).
    * Spend is an exact decimal sum so the rank order is reproducible;
    * ties broken on custkey. */
  def topCustomersPerNation(nation: DataFrame, customer: DataFrame,
                            orders: DataFrame, n: Int): DataFrame = {
    val spend = customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .agg(Num.dsum(col("o_totalprice")).as("spend"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("spend").desc, col("c_custkey").asc)
    spend.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= n)
      .select(col("n_name"), col("c_custkey"), col("c_name"),
        col("spend"), col("rnk"))
  }

  /** Skew-safe variant of [[topCustomersPerNation]]: a rank window
    * partitioned by nation has only ~25 distinct keys — at cluster
    * scale one straggler task per giant nation. Two-phase top-N fixes
    * the shape: phase 1 ranks within (nation, salt) buckets — `salt`
    * splits each hot key across `saltBuckets` tasks — and keeps each
    * bucket's top N; phase 2 ranks the surviving ≤ N·saltBuckets rows
    * per nation. Any global top-N row is top-N within its bucket, so
    * the result is IDENTICAL to the unsalted window (spec-checked). */
  def topCustomersPerNationSalted(nation: DataFrame, customer: DataFrame,
                                  orders: DataFrame, n: Int,
                                  saltBuckets: Int = 16): DataFrame = {
    val spend = customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .agg(Num.dsum(col("o_totalprice")).as("spend"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .withColumn("salt", pmod(col("c_custkey"), lit(saltBuckets)))
    val wSalted = Window.partitionBy(col("n_name"), col("salt"))
      .orderBy(col("spend").desc, col("c_custkey").asc)
    val survivors = spend
      .withColumn("srnk", row_number().over(wSalted))
      .filter(col("srnk") <= n)
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("spend").desc, col("c_custkey").asc)
    survivors.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= n)
      .select(col("n_name"), col("c_custkey"), col("c_name"),
        col("spend"), col("rnk"))
  }

  /** ROLLUP(status, priority): grouping-set aggregation — count and
    * exact total per level, plus the grand total. */
  def ordersRollup(orders: DataFrame): DataFrame =
    orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Num.dsum(col("o_totalprice")).as("total_price"))

  /** CUBE(status, priority): all four grouping sets in one pass. */
  def ordersCube(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Num.dsum(col("o_totalprice")).as("total_price"))

  /** GROUPING SETS ((status), (priority), ()): the two one-column
    * marginals plus the grand total in ONE scan — the grouping-set
    * shapes ROLLUP/CUBE can't spell (no (status, priority) cell here,
    * which CUBE would force), via the Spark 4 DataFrame groupingSets
    * API so Catalyst plans its usual Expand + one map-side-combined
    * aggregate. */
  def ordersGroupingSets(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Num.dsum(col("o_totalprice")).as("total_price"))

  /** PIVOT with explicit values, compiled to its optimal single-
    * aggregate form: one conditional count per pivot value, all in ONE
    * scan + ONE map-side-combined aggregate + one exchange on the
    * group key. Spark's `.pivot(values)` API plans this as TWO
    * aggregate stages (a (key, value) pre-aggregate and exchange, then
    * a pivot_first aggregate on the key) — an extra exchange that buys
    * nothing for an enum-sized value set, so the operator spells the
    * conditional aggregate directly. An unvalued pivot would first run
    * a distinct-values job; at scale the values are a known enum and
    * must be passed. Empty cells count 0, never null. */
  def pivotCounts(df: DataFrame, groupCol: String, pivotCol: String,
                  values: Seq[(String, String)]): DataFrame = {
    require(values.nonEmpty, "pivotCounts needs at least one pivot value")
    val aggs = values.map { case (v, name) =>
      count(when(col(pivotCol) === v, 1)).as(name) }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-priority order counts pivoted across order status. */
  def ordersPivotByStatus(orders: DataFrame): DataFrame =
    pivotCounts(orders, "o_orderpriority", "o_orderstatus",
      Seq("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))

  /** Set-operation census: customer cohorts by purchase year —
    * INTERSECT (bought in both years) and EXCEPT both ways (churned /
    * acquired). Spark plans INTERSECT/EXCEPT as distinct + left-semi /
    * left-anti hash joins on the full row — the same shuffle shape as
    * the semi/anti census, no row-pair blowup; the three cohort counts
    * union into one labeled report. */
  def customerYearSetOps(orders: DataFrame, yearA: Int, yearB: Int): DataFrame = {
    def buyers(y: Int): DataFrame =
      orders.filter(year(col("o_orderdate")) === y).select(col("o_custkey"))
    val a = buyers(yearA)
    val b = buyers(yearB)
    def labeled(df: DataFrame, label: String): DataFrame =
      df.agg(count(lit(1)).as("n_customers"))
        .select(lit(label).as("cohort"), col("n_customers"))
    labeled(a.intersect(b), "both")
      .union(labeled(a.except(b), s"only_$yearA"))
      .union(labeled(b.except(a), s"only_$yearB"))
  }

  /** [[customerYearSetOps]] compiled to its one-scan form — the census
    * a 100 TB fact table can afford. The set-op spelling evaluates both
    * year-filtered sides once per set operation (six scans of orders);
    * this form reads orders ONCE: filter to the two years, one
    * map-side-combined per-customer aggregate producing boolean year
    * flags, one global conditional count, and a 3-row unpivot of the
    * count columns into the labeled report. Result is identical to the
    * INTERSECT/EXCEPT composition (AnalyticsSpec proves equality; the
    * DuckDB oracle keeps the set-op spelling). */
  def customerYearCensus(orders: DataFrame, yearA: Int, yearB: Int): DataFrame = {
    def inYear(y: Int) =
      max(when(year(col("o_orderdate")) === y, 1).otherwise(0))
    val flags = orders
      .filter(year(col("o_orderdate")).isin(yearA, yearB))
      .groupBy(col("o_custkey"))
      .agg(inYear(yearA).as("in_a"), inYear(yearB).as("in_b"))
    def cohort(cond: Column) =
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))
    val counts = flags.agg(
      cohort(col("in_a") === 1 && col("in_b") === 1).as("n_both"),
      cohort(col("in_a") === 1 && col("in_b") === 0).as("n_a"),
      cohort(col("in_a") === 0 && col("in_b") === 1).as("n_b"))
    counts.select(explode(array(
        struct(lit("both").as("cohort"), col("n_both").as("n_customers")),
        struct(lit(s"only_$yearA").as("cohort"), col("n_a").as("n_customers")),
        struct(lit(s"only_$yearB").as("cohort"), col("n_b").as("n_customers"))))
        .as("r"))
      .select(col("r.cohort").as("cohort"), col("r.n_customers").as("n_customers"))
  }

  /** Top-N parts per brand by retail price (row_number window),
    * deterministic via partkey tie-break. */
  def topPartsPerBrand(part: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    part.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select(col("p_brand"), col("p_partkey"), col("p_name"),
        col("p_retailprice"), col("rn"))
  }

  /** Window-function suite over orders: quartile, relative rank,
    * cumulative distribution and a 3-row moving average per customer
    * order history — one shuffle on custkey, every function shares the
    * same window frame pass. */
  def orderWindowStats(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wAvg = w.rowsBetween(-2, Window.currentRow)
    orders.select(col("o_custkey"), col("o_orderkey"),
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      avg(col("o_totalprice")).over(wAvg).as("moving_avg3"))
  }

  /** Exact interpolated percentiles of event values per type. Exact
    * `percentile` buffers every group value in executor memory — keep
    * it for oracle-exact answers; the scale path for skewed/huge
    * groups is [[eventValuePercentilesApprox]]. */
  def eventValuePercentiles(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))

  /** Sketch-path percentiles: `approx_percentile` maintains a bounded
    * quantile sketch per group (mergeable, map-side combinable), so a
    * skewed event_type with billions of rows costs O(accuracy) memory
    * instead of buffering the group. Rank error ≤ 1/accuracy. */
  def eventValuePercentilesApprox(events: DataFrame,
                                  accuracy: Int = 10000): DataFrame =
    events.groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, array(0.5, 0.9, 0.99), $accuracy)")
        .as("ps"))
      .select(col("event_type"), col("ps")(0).as("p50"),
        col("ps")(1).as("p90"), col("ps")(2).as("p99"))

  /** Fixed-width value histogram per event type — the full-distribution
    * report percentiles summarize (latency/spend buckets, anomaly
    * tails). One scan, one map-side-combinable aggregate on the
    * (type, bucket) key: the distribution's SHAPE costs the same
    * shuffle as a plain per-type count no matter how many rows feed
    * it, and a skewed type still spreads over its buckets. Bucket =
    * floor(value/width) (IEEE division+floor: every engine agrees
    * bitwise); min/max per bucket ride along free (exact aggregates,
    * no double-sum parity risk). */
  def eventValueHistogram(events: DataFrame, width: Double = 10.0): DataFrame =
    events.groupBy(col("event_type"),
        floor(col("value") / lit(width)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))

  private val viewSeq = new AtomicLong(0)

  /** Register `df` under a fresh temp-view name and return the name.
    * The correlated-subquery operators go through `spark.sql` ON
    * PURPOSE: a correlated subquery only exists at the SQL layer, and
    * the point is to hand Catalyst the correlated form and let its
    * decorrelation rules (RewriteCorrelatedScalarSubquery,
    * RewritePredicateSubquery) produce the agg+join plan — not to
    * hand-decorrelate in the DataFrame API, which would bypass the
    * machinery entirely. Names are counter-unique so concurrent
    * Verify threads and repeated Bench passes never collide. */
  private def tempView(spark: SparkSession, df: DataFrame,
                       prefix: String): String = {
    val name = s"graft_${prefix}_${viewSeq.incrementAndGet()}"
    df.createOrReplaceTempView(name)
    name
  }

  /** Run `sql` over views registered by [[tempView]], then DROP them:
    * Dataset construction analyzes the plan eagerly, so the returned
    * DataFrame no longer needs the catalog entries — without the drop
    * every Bench pass / Verify thread leaks views for the session
    * lifetime. */
  private def sqlOverViews(spark: SparkSession, views: Seq[String],
                           sql: String): DataFrame =
    try spark.sql(sql)
    finally views.foreach(spark.catalog.dropTempView)

  /** SQL single-quoted string literal ('' escaping — a quote in the
    * value must not terminate the literal). */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** TPC-H Q17-style small-quantity revenue: yearly revenue lost if
    * small orders (below `qtyFactor` x the part's average quantity)
    * were not filled. The scalar CORRELATED subquery
    * `(SELECT 0.2*avg(l_quantity) ... WHERE l2.l_partkey = p_partkey)`
    * decorrelates to a per-partkey aggregate joined back on the key —
    * never a per-row re-execution and never a BroadcastNestedLoopJoin
    * (plan-asserted in AnalyticsSpec and recorded in PLANS.md). The
    * quantity average runs decimal-exact on both engines so boundary
    * rows can't flip on float association. */
  def smallQtyRevenue(spark: SparkSession, lineitem: DataFrame,
                      part: DataFrame, brand: String,
                      qtyFactor: Double): DataFrame = {
    val li = tempView(spark, lineitem, "q17_li")
    val pt = tempView(spark, part, "q17_pt")
    sqlOverViews(spark, Seq(li, pt),
      s"""SELECT ${Num.dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM $li JOIN $pt ON p_partkey = l_partkey
         |WHERE p_brand = ${sqlLit(brand)}
         |  AND l_quantity < (SELECT $qtyFactor * ${Num.davgSql("l_quantity")}
         |                    FROM $li l2 WHERE l2.l_partkey = p_partkey)
         |""".stripMargin)
  }

  /** TPC-H Q18-style large-order customers: orders whose total line
    * quantity exceeds `minQty`, with their customers. The IN-subquery
    * over a HAVING aggregate decorrelates to a left-semi join against
    * the aggregated orderkey set (one hash aggregate + one equi-join,
    * plan-asserted). Quantity sums are decimal-exact on both engines so
    * the HAVING boundary is reproducible at any parallelism. */
  def largeOrders(spark: SparkSession, customer: DataFrame,
                  orders: DataFrame, lineitem: DataFrame,
                  minQty: Double, n: Int): DataFrame = {
    val cu = tempView(spark, customer, "q18_cu")
    val or = tempView(spark, orders, "q18_or")
    val li = tempView(spark, lineitem, "q18_li")
    sqlOverViews(spark, Seq(cu, or, li),
      s"""SELECT c_name, c_custkey, o_orderkey,
         |  date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
         |  o_totalprice, ${Num.dsumSql("l_quantity")} AS total_qty
         |FROM $cu JOIN $or ON c_custkey = o_custkey
         |JOIN $li ON o_orderkey = l_orderkey
         |WHERE o_orderkey IN (
         |  SELECT l_orderkey FROM $li GROUP BY l_orderkey
         |  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > $minQty)
         |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderkey ASC
         |LIMIT $n""".stripMargin)
  }

  /** TPC-H Q21-style sole-blame suppliers: for multi-supplier orders
    * where exactly one supplier's line was returned, count orders per
    * blamed supplier. The classic EXISTS + NOT EXISTS correlated pair
    * over self-joined lineitem: Catalyst decorrelates the EXISTS to a
    * left-semi and the NOT EXISTS to a left-anti join on the order key
    * (both with the `other supplier` non-equi condition attached) —
    * three scans of the same fact table, each pruned, never a per-row
    * subquery loop. */
  def blameSupplier(spark: SparkSession, supplier: DataFrame,
                    lineitem: DataFrame, n: Int): DataFrame = {
    val su = tempView(spark, supplier, "q21_su")
    val li = tempView(spark, lineitem, "q21_li")
    sqlOverViews(spark, Seq(su, li),
      s"""SELECT s_name, count(*) AS numwait
         |FROM $su JOIN $li l1 ON s_suppkey = l1.l_suppkey
         |WHERE l1.l_returnflag = 'R'
         |  AND EXISTS (SELECT 1 FROM $li l2
         |              WHERE l2.l_orderkey = l1.l_orderkey
         |                AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM $li l3
         |                  WHERE l3.l_orderkey = l1.l_orderkey
         |                    AND l3.l_suppkey <> l1.l_suppkey
         |                    AND l3.l_returnflag = 'R')
         |GROUP BY s_name
         |ORDER BY numwait DESC, s_name ASC
         |LIMIT $n""".stripMargin)
  }

  /** TPC-H Q22-style high-balance active customers: per segment, the
    * customers above the (positive-balance) global average who have at
    * least one order exceeding their own balance. Two more
    * decorrelation shapes in one query: an UNCORRELATED scalar
    * subquery (computed once, broadcast as a literal-like input) and a
    * correlated EXISTS whose join carries a NON-EQUI condition
    * (o_totalprice > c_acctbal) on top of the key equality — a
    * left-semi hash join with a residual predicate, not a nested loop.
    * The average is decimal-exact on both engines so the boundary is
    * reproducible. */
  def richActiveCustomers(spark: SparkSession, customer: DataFrame,
                          orders: DataFrame): DataFrame = {
    val cu = tempView(spark, customer, "q22_cu")
    val or = tempView(spark, orders, "q22_or")
    sqlOverViews(spark, Seq(cu, or),
      s"""SELECT c_mktsegment, count(*) AS numcust,
         |  ${Num.dsumSql("c_acctbal")} AS totacctbal
         |FROM $cu c
         |WHERE c_acctbal > (SELECT ${Num.davgSql("c_acctbal")}
         |                   FROM $cu WHERE c_acctbal > 0.0)
         |  AND EXISTS (SELECT 1 FROM $or o
         |              WHERE o.o_custkey = c.c_custkey
         |                AND o.o_totalprice > c.c_acctbal)
         |GROUP BY c_mktsegment""".stripMargin)
  }

  /** TPC-H Q4-style order-priority check: orders placed in a quarter
    * with at least one line shipped more than `lateDays` after the
    * order date, counted per priority. The correlated EXISTS carries a
    * NON-EQUI residual (l_shipdate > o_orderdate + interval) on top of
    * the orderkey equality — Catalyst decorrelates it to a left-semi
    * hash join with the date condition as a residual predicate, so the
    * fact table is probed once, never per-order. */
  def orderPriorityCheck(spark: SparkSession, orders: DataFrame,
                         lineitem: DataFrame, qStart: String, qEnd: String,
                         lateDays: Int): DataFrame = {
    val or = tempView(spark, orders, "q4_or")
    val li = tempView(spark, lineitem, "q4_li")
    sqlOverViews(spark, Seq(or, li),
      s"""SELECT o_orderpriority, count(*) AS order_count
         |FROM $or
         |WHERE o_orderdate >= TIMESTAMP '$qStart 00:00:00'
         |  AND o_orderdate < TIMESTAMP '$qEnd 00:00:00'
         |  AND EXISTS (SELECT 1 FROM $li
         |              WHERE l_orderkey = o_orderkey
         |                AND l_shipdate > o_orderdate + INTERVAL $lateDays DAY)
         |GROUP BY o_orderpriority""".stripMargin)
  }

  /** TPC-H Q7-style two-nation trade volume: revenue shipped between a
    * nation pair, by supplier nation x customer nation x ship year.
    * Both nation lookups are pre-filtered to the two names BEFORE the
    * broadcast joins, so they act as semi-filters that prune the fact
    * rows early; the residual pair predicate then removes the A-A/B-B
    * combinations. One shuffle per fact join, one for the final agg. */
  def nationTradeVolume(nation: DataFrame, supplier: DataFrame,
                        customer: DataFrame, orders: DataFrame,
                        lineitem: DataFrame, nationA: String, nationB: String,
                        dateLo: String, dateHi: String): DataFrame = {
    val pair = Seq(nationA, nationB)
    val n1 = broadcast(nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation")))
    val n2 = broadcast(nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation")))
    supplier.join(n1, col("s_nationkey") === col("s_nkey"))
      .join(lineitem.filter(
          col("l_shipdate") >= lit(dateLo).cast("timestamp") &&
          col("l_shipdate") < lit(dateHi).cast("timestamp")),
        col("s_suppkey") === col("l_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(n2, col("c_nationkey") === col("c_nkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  /** TPC-H Q8-style market share: the target nation's share of a
    * region's revenue for one part type, per order year. The share is
    * a conditional decimal sum over the total decimal sum — one
    * aggregate pass, one final double division per year. The part-type
    * filter prunes the smallest join input first; region and both
    * nation lookups broadcast. */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
                  supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  part: DataFrame, targetNation: String, regionName: String,
                  pType: String, yearLo: Int, yearHi: Int): DataFrame = {
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val custNation = broadcast(nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nkey")))
    val suppNation = broadcast(nation
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation")))
    part.filter(col("p_type") === pType)
      .join(lineitem, col("p_partkey") === col("l_partkey"))
      .join(orders.filter(year(col("o_orderdate")).between(yearLo, yearHi)),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(custNation, col("c_nationkey") === col("c_nkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("s_nkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((Num.dsum(when(col("supp_nation") === targetNation, vol)
          .otherwise(lit(0.0))) / Num.dsum(vol)).as("mkt_share"))
  }

  /** TPC-H Q12-style priority-class line counts (adapted: the schema
    * has no l_shipmode, so lines group by return flag): per flag, how
    * many lines of critical (1-URGENT/2-HIGH) vs lower priority
    * shipped in the window. Join + one conditional aggregate — counts
    * computed in the same pass, no second scan. */
  def linePriorityCounts(orders: DataFrame, lineitem: DataFrame,
                         dateLo: String, dateHi: String): DataFrame = {
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    orders.join(lineitem.filter(
        col("l_shipdate") >= lit(dateLo).cast("timestamp") &&
        col("l_shipdate") < lit(dateHi).cast("timestamp")),
      col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(when(critical, 1)).as("high_line_count"),
        count(when(!critical, 1)).as("low_line_count"))
  }

  /** TPC-H Q13-style customer order distribution: orders per customer
    * (excluding one priority class), then how many customers share
    * each order count. LEFT OUTER join keeps order-less customers in
    * the c_count=0 bucket — the outer-join aggregation plan class.
    * The priority filter sits on the orders side BEFORE the join
    * (equivalent for a left join, and it pushes to the scan). */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame,
                                excludePriority: String): DataFrame =
    customer.join(orders.filter(col("o_orderpriority") =!= excludePriority),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q14-style promo revenue share: percentage of one month's
    * revenue from promo-type parts. Conditional decimal sum over total
    * decimal sum, single aggregate, single join — the shipdate window
    * prunes lineitem at the scan. */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
                        monthLo: String, monthHi: String): DataFrame = {
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem.filter(
        col("l_shipdate") >= lit(monthLo).cast("timestamp") &&
        col("l_shipdate") < lit(monthHi).cast("timestamp"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * Num.dsum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit(0.0))) / Num.dsum(vol)).as("promo_revenue"))
  }

  /** TPC-H Q15-style top supplier: suppliers whose windowed revenue
    * equals the maximum. The revenue CTE aggregates once; the scalar
    * max subquery re-reads that aggregate, and the decimal-exact sums
    * make the double equality reproducible at any parallelism (the
    * reason Q15's `= max` is safe here at all). */
  def topRevenueSupplier(spark: SparkSession, supplier: DataFrame,
                         lineitem: DataFrame, dateLo: String,
                         dateHi: String): DataFrame = {
    val su = tempView(spark, supplier, "q15_su")
    val li = tempView(spark, lineitem, "q15_li")
    sqlOverViews(spark, Seq(su, li),
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    ${Num.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |  FROM $li
         |  WHERE l_shipdate >= TIMESTAMP '$dateLo 00:00:00'
         |    AND l_shipdate < TIMESTAMP '$dateHi 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM $su JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin)
  }

  /** TPC-H Q16-style supplier variety (adapted: lineitem is the
    * part-supplier relation): distinct suppliers per (brand, type,
    * size) for a filtered part class, excluding a supplier blacklist.
    * The NOT IN plans as a null-aware anti join against the (tiny,
    * broadcast) blacklist; count(DISTINCT) adds its usual expand —
    * both scans pruned by pushed filters. */
  def supplierVariety(spark: SparkSession, part: DataFrame,
                      lineitem: DataFrame, supplier: DataFrame,
                      excludeBrand: String, excludeType: String,
                      sizes: Seq[Int]): DataFrame = {
    val pt = tempView(spark, part, "q16_pt")
    val li = tempView(spark, lineitem, "q16_li")
    val su = tempView(spark, supplier, "q16_su")
    sqlOverViews(spark, Seq(pt, li, su),
      s"""SELECT p_brand, p_type, p_size,
         |  count(DISTINCT l_suppkey) AS supplier_cnt
         |FROM $pt JOIN $li ON p_partkey = l_partkey
         |WHERE p_brand <> ${sqlLit(excludeBrand)}
         |  AND p_type <> ${sqlLit(excludeType)}
         |  AND p_size IN (${sizes.mkString(", ")})
         |  AND l_suppkey NOT IN (
         |    SELECT s_suppkey FROM $su WHERE s_acctbal < 0.0)
         |GROUP BY p_brand, p_type, p_size""".stripMargin)
  }

  /** One (brand, max size, quantity band) arm of [[disjunctiveRevenue]]. */
  final case class QtyBand(brand: String, sizeMax: Int, qtyLo: Double,
                           qtyHi: Double)

  /** TPC-H Q19-style disjunctive revenue: an OR of per-brand
    * (size, quantity-band) conjunctions — the disjunctive-predicate
    * plan class. Catalyst cannot push the whole OR below the join, but
    * it derives and pushes the COMMON bounds (min size lower bound,
    * overall quantity envelope) to both scans, and the join stays a
    * plain partkey equi-join with the disjunction as a residual
    * filter — never a nested loop. */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame,
                         bands: Seq[QtyBand]): DataFrame = {
    require(bands.nonEmpty, "disjunctiveRevenue needs at least one band")
    val arm = bands.map { b =>
      col("p_brand") === b.brand &&
        col("p_size").between(1, b.sizeMax) &&
        col("l_quantity").between(b.qtyLo, b.qtyHi)
    }.reduce(_ || _)
    lineitem.join(part, col("l_partkey") === col("p_partkey"))
      .filter(arm)
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  /** TPC-H Q20-style excess shippers: suppliers who shipped more than
    * `factor` x the total shipped quantity of some matching part in
    * the window — Q20's NESTED correlation, adapted to the partsupp-
    * free schema: an IN-subquery whose HAVING threshold is itself a
    * correlated scalar subquery on the group key. Catalyst
    * decorrelates the inner scalar to a per-partkey aggregate joined
    * on the key and the outer IN to a left-semi join — two aggregates
    * and two hash joins, no per-group re-execution. */
  def excessShippers(spark: SparkSession, supplier: DataFrame,
                     lineitem: DataFrame, part: DataFrame,
                     namePrefix: String, dateLo: String, dateHi: String,
                     factor: Double): DataFrame = {
    val su = tempView(spark, supplier, "q20_su")
    val li = tempView(spark, lineitem, "q20_li")
    val pt = tempView(spark, part, "q20_pt")
    val window =
      s"""l_shipdate >= TIMESTAMP '$dateLo 00:00:00'
         |      AND l_shipdate < TIMESTAMP '$dateHi 00:00:00'""".stripMargin
    sqlOverViews(spark, Seq(su, li, pt),
      s"""SELECT s_name, s_acctbal
         |FROM $su
         |WHERE s_suppkey IN (
         |  SELECT l_suppkey
         |  FROM $li JOIN $pt ON p_partkey = l_partkey
         |  WHERE p_name LIKE ${sqlLit(namePrefix + "%")}
         |    AND $window
         |  GROUP BY l_suppkey, p_partkey
         |  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > (
         |    SELECT $factor * sum(CAST(l2.l_quantity AS DECIMAL(38,6)))
         |    FROM $li l2
         |    WHERE l2.l_partkey = p_partkey
         |      AND l2.l_shipdate >= TIMESTAMP '$dateLo 00:00:00'
         |      AND l2.l_shipdate < TIMESTAMP '$dateHi 00:00:00'))""".stripMargin)
  }

  /** Semi/anti-join census: per market segment, how many customers
    * have at least one order vs none. Two hash semi-joins (no payload
    * duplication, no row explosion) + one agg. */
  def customerOrderCensus(customer: DataFrame, orders: DataFrame): DataFrame = {
    val keys = orders.select(col("o_custkey"))
    val active = customer.join(keys, col("c_custkey") === col("o_custkey"),
        "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_active"))
    val inactive = customer.join(keys, col("c_custkey") === col("o_custkey"),
        "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_inactive"))
    active.join(inactive, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_inactive"), lit(0L)).as("n_inactive"))
  }

  /** Tumbling 1-hour window aggregation over the event stream: the
    * batch shape of the streaming G-family. Hour emitted as a
    * formatted string so every engine compares it identically. */
  def eventsHourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Num.dsum(col("value")).as("total_value"))

  /** Cohort retention matrix — the classic product-analytics query
    * class: cohort each user by their FIRST day doing `eventType`,
    * then count how many are still doing it N days later. Shape:
    * filtered scan → distinct (user, day) activity → per-user first
    * day (one map-side-combined aggregate on user) → join-back → one
    * aggregate on the (cohort, offset) matrix key. All keys are user-
    * or day-bounded; no window, no skew key. The day offset is an
    * exact integer day difference and the cohort day is emitted as a
    * formatted string, so every engine compares the matrix
    * identically. */
  def retention(events: DataFrame, eventType: String): DataFrame = {
    val ud = events
      .filter(col("event_type") === eventType)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    ud.join(first, "user_id")
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort")).cast("int").as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** ORDERED multi-step funnel: how many users performed step 1, then
    * step 2 STRICTLY after their first step 1, then step 3 strictly
    * after that earliest qualifying step 2, … — the conversion query
    * sessionization doesn't answer (sequence, not adjacency). Shape:
    * filter to funnel event types, ONE shuffle on user_id, then a
    * per-user sorted fold (higher-order `aggregate` over the sorted
    * event list) that carries the earliest qualifying timestamp per
    * step — per-user memory is bounded by that user's funnel events,
    * the same bound sessionize's window already assumes, and the
    * closing per-step count is a map-side-combined aggregate on a
    * step-count-sized key. Strict `>` between steps makes same-
    * timestamp ties order-independent (a step-k event at exactly the
    * step-(k-1) time never advances the funnel, whichever sorts
    * first). Timestamps fold as exact epoch-micros.
    *
    * `withinUs` adds a CONVERSION WINDOW: step k counts only within
    * `withinUs` micros of the step-(k-1) time (the product-analytics
    * "converts within a day" form). Semantics stay anchored at the
    * FIRST step-1 event — no funnel re-entry when a window lapses —
    * which keeps the fold greedy-correct and the oracle a pair of
    * bounds on the same staged min-joins. None adds no clause (the
    * unwindowed plan is unchanged: `true AND x` constant-folds). */
  def funnel(events: DataFrame, steps: Seq[String],
             withinUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val zero = struct(steps.indices.map(i =>
      lit(null).cast("long").as(s"t$i")): _*)
    val perUser = events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("us"), col("event_type"))))
        .as("evs"))
      .select(aggregate(col("evs"), zero, (acc, e) => struct(
        steps.indices.map { i =>
          val hit =
            if (i == 0)
              acc.getField("t0").isNull &&
                e.getField("event_type") === steps.head
            else
              acc.getField(s"t$i").isNull &&
                acc.getField(s"t${i - 1}").isNotNull &&
                e.getField("event_type") === steps(i) &&
                e.getField("us") > acc.getField(s"t${i - 1}") &&
                withinUs.fold(lit(true))(w =>
                  e.getField("us") - acc.getField(s"t${i - 1}") <= lit(w))
          when(hit, e.getField("us")).otherwise(acc.getField(s"t$i"))
            .as(s"t$i")
        }: _*)).as("f"))
    perUser
      .select(posexplode(array(steps.indices.map(i =>
        col(s"f.t$i")): _*)).as(Seq("step", "t")))
      .groupBy(col("step"))
      .agg(count(col("t")).as("n_users"))
      .select(col("step"),
        element_at(array(steps.map(lit): _*), col("step") + 1)
          .as("step_name"),
        col("n_users"))
  }

  /** JSON property extraction + aggregation: props is an opaque JSON
    * string column; `$.k` is pulled with the codegen'd JSON path
    * expression, never a UDF. */
  def eventsJsonAgg(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Num.dsum(col("k")).as("sum_k"),
        Num.davg(col("k")).as("avg_k"))

  /** Gap-based sessionization (gap > `gapMinutes` starts a new
    * session): two windows over (user, time) — lag to flag session
    * starts, running sum to number them — then one aggregation per
    * session. Timestamps flow as exact epoch-micros. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Count-spike anomaly report: per (event_type, minute) event counts
    * whose z-score against the type's own per-minute distribution
    * clears `z` — volume-spike detection over the event stream (the
    * ops question behind every rate alarm). Two map-side-combinable
    * aggregates: minute counts (the q_events_minutely shuffle one
    * granularity down), then per-type sufficient statistics
    * (k, Σn, Σn²) — all exact longs, so mean/variance/z are
    * fixed-order IEEE expressions over exact integers and the report
    * is bit-equal on any engine. The S-bounded stats side broadcasts
    * back onto the minute rows. Zero-variance types (every minute
    * identical) are excluded — a z-score is undefined there, and 0/0
    * must not surface as NaN rows. */
  def eventAnomalies(events: DataFrame, z: Double = 3.0): DataFrame = {
    // persisted: both the stats aggregate and the join's left side
    // read the minute counts — without it the events scan and the
    // (type, minute) shuffle run twice per query
    val perMin = graft.operators.CacheTracker.persistTracked(
      events.groupBy(col("event_type"),
        date_format(date_trunc("minute", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("minute"))
      .agg(count(lit(1)).as("n")))
    val stats = perMin.groupBy(col("event_type"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ss"))
    perMin.join(stats, "event_type")
      .withColumn("mean", col("s").cast("double") / col("k"))
      .withColumn("varr",
        (col("ss").cast("double") - col("s").cast("double") * col("s")
          / col("k")) / col("k"))
      .filter(col("varr") > 0)
      .withColumn("zscore", (col("n") - col("mean")) / sqrt(col("varr")))
      .filter(abs(col("zscore")) >= z)
      .select(col("event_type"), col("minute"), col("n"), col("zscore"))
  }

  /** Session-LENGTH distribution — the engagement report the session
    * table exists for (how long do visits last, how much happens in
    * them), as a fixed-width histogram over session duration:
    * dur_bucket = duration div (bucketMinutes of micros), session and
    * event counts per bucket. Composes [[sessionize]] (one user-keyed
    * shuffle + staged windows) with ONE map-side-combinable aggregate
    * on the bucket key; all-integer micro arithmetic, so the histogram
    * is bit-exact on any engine, and a skewed duration mix spreads
    * over buckets rather than hot-keying. */
  def sessionStats(events: DataFrame, gapMinutes: Int,
                   bucketMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .select(expr(s"(session_end_us - session_start_us) div " +
        s"${bucketMinutes * 60L * 1000000L}").as("dur_bucket"),
        col("n_events"))
      .groupBy(col("dur_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events_total"))
}
