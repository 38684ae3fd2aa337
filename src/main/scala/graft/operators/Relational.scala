package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Deterministic.{rd, qavg, qsum}
import graft.sources.Tables

/** Relational query surface over the TPC-H-ish star schema.
  *
  * The reference has NO joins, no general predicates, no windows, no set
  * ops (SURVEY.md §2.3) — its single hash-agg (`slave.cc:159-210`) is the
  * whole relational story. This module supplies the full surface a user
  * of a MapReduce-style engine would graduate to, Spark-first.
  *
  * Scale notes (designed for 100 TB / 1000 executors, tested at sf≤0.1):
  *   - `region`/`nation` are bounded-size dimensions (25/5 rows at any
  *     SF) → always `broadcast()`. `customer`/`supplier`/`part`/`orders`
  *     grow linearly with SF → never hard-broadcast; AQE converts the
  *     join to broadcast at runtime when the built side happens to be
  *     small, and handles skew otherwise.
  *   - Every query projects only the columns it needs before joining, so
  *     parquet column pruning (ReadSchema) and filter pushdown
  *     (PushedFilters) reach the scan.
  *   - Aggregates rounded to fixed decimals so results are
  *     oracle-stable across summation orders.
  */
object Relational {
  import Tables._

  /** TPC-H Q1-style pricing summary: full-scan partial-agg → 6-group
    * final agg. Shuffle volume is O(groups), not O(rows). */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"), // integral doubles: exact in any order
        qsum(col("l_extendedprice"), 2).as("sum_base_price"),
        rd(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6), 2).as("sum_disc_price"),
        rd(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6), 2).as("sum_charge"),
        rd(qavg(col("l_quantity"), 6), 4).as("avg_qty"),
        rd(qavg(col("l_discount"), 6), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style shipping priority: selective dim filter first, then
    * two shuffle joins (AQE may broadcast the filtered sides), agg,
    * top-10 via TakeOrderedAndProject. */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(rd(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style local-supplier volume: 6-way join; bounded dims
    * (nation, region) broadcast, linear tables shuffle-join on keys. */
  def q5RegionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val ord = orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = lineitem(spark, sfDir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val supp = supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val nat = nation(spark, sfDir).select("n_nationkey", "n_name", "n_regionkey")
    val reg = region(spark, sfDir).filter(col("r_name") === "ASIA").select("r_regionkey")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(rd(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** Top customers by total order value — agg-then-join keeps the join
    * input at O(customers), not O(orders). */
  def topCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val spend = orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(rd(qsum(col("o_totalprice"), 4), 2).as("total_spend"), count(lit(1)).as("n_orders"))
    spend.join(customer(spark, sfDir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "total_spend", "n_orders")
      .orderBy(desc("total_spend"), asc("c_custkey"))
      .limit(20)
  }

  /** EXISTS as left-semi join (TPC-H Q4 shape): orders having at least
    * one heavy lineitem, counted per priority. */
  def orderPriorityExists(spark: SparkSession, sfDir: String): DataFrame = {
    val heavy = lineitem(spark, sfDir)
      .filter(col("l_quantity") > 45).select("l_orderkey")
    orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** NOT EXISTS as left-anti join: customers with no 1995 order, per
    * nation. Bounded dim broadcast; anti join shuffles on c_custkey only
    * (the orders side is filter-pushed before the shuffle). */
  def customersNoOrders(spark: SparkSession, sfDir: String): DataFrame =
    customer(spark, sfDir).select("c_custkey", "c_nationkey")
      .join(orders(spark, sfDir)
          .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_name")

  /** Exact distinct aggregation per nation (expand + two-phase agg). */
  def nationCustomerStats(spark: SparkSession, sfDir: String): DataFrame =
    customer(spark, sfDir)
      .join(broadcast(nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count_distinct(col("c_mktsegment")).as("n_segments"),
        count(lit(1)).as("n_customers"),
        rd(qavg(col("c_acctbal"), 6), 4).as("avg_acctbal"))
      .orderBy("n_name")

  /** Window function: top-3 orders per customer by value. Single shuffle
    * on the partition key; rank computed within partitions. */
  def windowTopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** ROLLUP grouping sets over lineitem; group keys coalesced to 'ALL'
    * so the oracle comparison is null-free and order-stable. */
  def rollupLineitem(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** Set operations: customers active in both 1996 and 1997 (INTERSECT),
    * minus those with any open order (EXCEPT). */
  def setOpsActiveCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = orders(spark, sfDir)
    def activeIn(year: Int) = ord
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
              col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select("o_custkey")
    val open = ord.filter(col("o_orderstatus") === "O").select("o_custkey")
    activeIn(1996).intersect(activeIn(1997)).except(open)
      .orderBy("o_custkey")
  }

  /** Scalar-function bundle (string/date/math/conditional) — the general
    * expression evaluation the reference entirely lacks (SURVEY.md §2.3).
    * All codegen'd built-ins, no UDFs. */
  def scalarFunctions(spark: SparkSession, sfDir: String): DataFrame =
    orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
        when(col("o_totalprice") >= 300000, "high")
          .when(col("o_totalprice") >= 100000, "mid")
          .otherwise("low").as("price_band"),
        rd(sqrt(col("o_totalprice")), 4).as("sqrt_price"),
        rd(log(col("o_totalprice") + 1), 4).as("log_price"))
      .orderBy("o_orderkey")

  /** LEFT OUTER: every part with its 1996 revenue, zero when never
    * shipped that year — nulls materialized then coalesced (the join
    * class the inner/semi/anti queries don't cover). */
  def partsLeftRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val rev96 = lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_partkey")
      .agg(rd(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6), 2).as("rev"))
    part(spark, sfDir).select("p_partkey", "p_brand")
      .join(rev96, col("p_partkey") === col("l_partkey"), "left_outer")
      .select(col("p_partkey"), col("p_brand"),
        coalesce(col("rev"), lit(0.0d)).as("revenue_1996"),
        col("rev").isNull.as("unsold_1996"))
      .orderBy("p_partkey")
  }

  /** FULL OUTER: customer activity transition 1996→1997 — both sides
    * preserved, null patterns folded into a 2×2-ish transition matrix. */
  def customerActivityTransition(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = orders(spark, sfDir)
    def active(year: Int) = ord
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
              col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey").as(s"c$year")).distinct()
    active(1996).join(active(1997), col("c1996") === col("c1997"), "full_outer")
      .select(
        when(col("c1996").isNotNull, "active").otherwise("inactive").as("y1996"),
        when(col("c1997").isNotNull, "active").otherwise("inactive").as("y1997"))
      .groupBy("y1996", "y1997")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("y1996", "y1997")
  }

  /** SQL surface with a correlated scalar subquery — Catalyst
    * decorrelates it into an aggregate+join (`RewriteCorrelatedScalarSubquery`),
    * so the executed plan is shuffle-shaped, not nested-loop. The
    * reference had no query language at all (SURVEY.md §3). */
  def sqlBrandFloorParts(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part p
        |WHERE p_retailprice = (SELECT min(p_retailprice) FROM part
        |                       WHERE p_brand = p.p_brand)
        |ORDER BY p_brand, p_partkey""".stripMargin)
  }

  /** SQL surface with IN + NOT IN subqueries (semi/anti through the SQL
    * front door, decorrelated by Catalyst). */
  def sqlPriorityCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Part revenue: fact⋈fact join then top-N per brand via window —
    * combines join, agg, and window in one plan. */
  def brandTopParts(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = lineitem(spark, sfDir)
      .groupBy("l_partkey")
      .agg(rd(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6), 2).as("part_revenue"))
    val p = part(spark, sfDir).select("p_partkey", "p_brand", "p_name")
    val w = Window.partitionBy("p_brand").orderBy(desc("part_revenue"), asc("p_partkey"))
    rev.join(p, col("l_partkey") === col("p_partkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "p_name", "part_revenue", "rn")
      .orderBy("p_brand", "rn")
  }

  /** CUBE grouping sets over orders with an explicit `grouping_id` —
    * the full 2ⁿ-subtotal lattice (ROLLUP's sibling covers only the
    * prefix sets). The id disambiguates a real NULL group key from a
    * subtotal row, which `coalesce('ALL')` alone cannot; at scale a
    * CUBE is one pass: Spark expands rows per grouping set BEFORE the
    * partial agg, so shuffle volume is O(sets × groups), never
    * O(sets × rows). */
  def cubeOrders(spark: SparkSession, sfDir: String): DataFrame =
    orders(spark, sfDir)
      .cube("o_orderstatus", "o_orderpriority")
      // grouping_id() is only resolvable inside the grouping-sets agg
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"), qsum(col("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"), col("sum_price"))
      .orderBy("gid", "status", "priority")

  /** Explicit GROUPING SETS — the generalization rollup/cube are sugar
    * for, with NON-hierarchical custom sets: per-status totals,
    * per-priority totals, and the grand total in ONE pass (no
    * (status, priority) cross cells — exactly what separates this from
    * [[cubeOrders]]). Spark plans one Expand (3 replicas) + one
    * aggregate; at scale that is one scan instead of the three
    * separate GROUP BYs a dashboard would otherwise union. */
  def groupingSetsOrders(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(grouping_id() AS INT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e2 AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, status, priority""".stripMargin)
  }

  /** Analytic-window bundle over each customer's order history: lag /
    * lead (prev/next order value), ntile quartile, percent_rank and
    * cume_dist, and a frame-bounded running sum — the window classes
    * the row_number()-only queries don't touch. One shuffle on
    * o_custkey; every function shares the same window spec, so
    * Catalyst evaluates them in a single Window operator. */
  def windowAnalyticsOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .select(col("o_custkey"), col("o_orderkey"),
        coalesce(lag("o_totalprice", 1).over(w), lit(0.0)).as("prev_price"),
        coalesce(lead("o_totalprice", 1).over(w), lit(0.0)).as("next_price"),
        ntile(4).over(w).cast("int").as("quartile"),
        rd(percent_rank().over(w), 4).as("pct_rank"),
        rd(cume_dist().over(w), 4).as("cum_dist"),
        rd(sum("o_totalprice").over(wRun), 2).as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** TPC-H Q6-style forecast revenue change: one tight scan-filter-agg
    * — the canonical pushdown showcase. All three predicates reach the
    * parquet scan as PushedFilters; the agg is a 1-row partial+final
    * pair, so nothing but two running sums ever shuffles. */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_items"),
        rd(qsum(col("l_extendedprice") * col("l_discount"), 6), 2).as("revenue"))

  /** TPC-H Q10-style returned-item ranking: which customers returned
    * the most revenue — lineitem('R') ⋈ orders ⋈ customer ⋈ broadcast
    * nation, grouped per customer, top 20 via TakeOrderedAndProject on
    * the QUANTIZED revenue (both engines sort identical 2-dp values, so
    * the cut is deterministic). The returnflag filter collapses the
    * fact side before any join. */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, sfDir)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(rd(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14-style promo revenue share per month: the
    * numerator/denominator-in-one-agg device (same as
    * [[q8MarketShare]]) at month grain — a conditional sum and a total
    * sum in a single pass, never two scans. The part join brings only
    * (p_partkey, p_type); output is |months| rows. */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .select(col("l_partkey"), date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .join(part(spark, sfDir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("month")
      .agg(
        qsum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0.0)), 6)
          .as("pv"),
        qsum(col("rev"), 6).as("tv"))
      .select(col("month"),
        rd(col("pv"), 2).as("promo_revenue"),
        rd(col("tv"), 2).as("total_revenue"),
        rd(col("pv") * lit(100.0) / col("tv"), 4).as("promo_share"))
      .orderBy("month")

  /** Order-status aging report: per status, order count, value total,
    * and the age distribution (days from order date to the corpus's
    * newest order — a deterministic "as of" anchor). The ops dashboard
    * behind backlog tracking: a P-status tail with high p90 age is
    * stuck fulfillment. One status-keyed agg; the anchor is a 1-row
    * scalar. */
  def orderStatusAging(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("d"))
    val asOf = ord.agg(max("d")).head().getDate(0) // 1-row scalar anchor
    ord.select(col("o_orderstatus"), col("o_totalprice"),
        datediff(lit(asOf), col("d")).as("age_days"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        rd(qsum(col("o_totalprice"), 2), 2).as("total_value"),
        expr("percentile(age_days, 0.5)").as("p50_age"),
        expr("percentile(age_days, 0.9)").as("p90_age"),
        max("age_days").as("max_age"))
      .orderBy("o_orderstatus")
  }

  /** Supplier-concentration report (Herfindahl–Hirschman index) per
    * brand: Σ share² over each brand's suppliers, share = supplier
    * revenue / brand revenue — near 1.0 means a single-supplier brand
    * (supply risk), near 1/n means even spread. Determinism: revenues
    * are exact-quantized; each share² quantizes at 8 dp and sums in
    * integer units, so the Σ is order-independent in both engines. Two
    * key-local aggs ((brand, supplier) then brand) — wordcount
    * currency over the join output. */
  def brandSupplierHhi(spark: SparkSession, sfDir: String): DataFrame = {
    val bs = lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(part(spark, sfDir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "l_suppkey")
      .agg(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("supp_rev"))
    val tot = bs.groupBy("p_brand").agg(qsum(col("supp_rev"), 6).as("brand_rev"))
    bs.join(tot, Seq("p_brand"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_suppliers"),
        qsum(rd(pow(col("supp_rev") / col("brand_rev"), 2), 8), 8).as("hhi_raw"))
      .select(col("p_brand"), col("n_suppliers"), rd(col("hhi_raw"), 4).as("hhi"))
      .orderBy("p_brand")
  }

  /** TPC-H Q15-style top supplier(s): revenue per supplier, then the
    * supplier(s) achieving the maximum — the correlated
    * `= (SELECT max(...))` pattern, decorrelated into one supplier agg
    * reused for BOTH the max scalar and the final filter (Catalyst
    * reuses the exchange; no second corpus pass). Ties all surface, as
    * in the spec query. Comparison happens on the 2-dp quantized
    * revenue, so the cut is engine-stable. */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = lineitem(spark, sfDir)
      .groupBy("l_suppkey")
      .agg(rd(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6), 2)
        .as("total_revenue"))
    val maxRev = rev.agg(max("total_revenue")).head().getDouble(0) // 1-row scalar
    rev.filter(col("total_revenue") === maxRev)
      .join(supplier(spark, sfDir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q19-style disjunctive discounted revenue: an OR of
    * brand/size/quantity conjunctions — the classic disjunction test.
    * The OR cannot push into either scan whole, but its COMMON
    * conjuncts can and do (quantity ≤ 30, size ≥ 1 reach
    * PushedFilters), and the per-branch residual evaluates post-join in
    * one codegen stage; the part side broadcasts. One output row per
    * matched brand keeps the result driver-sized. */
  def q19DisjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
    val p = part(spark, sfDir).select("p_partkey", "p_brand", "p_size")
      .filter(col("p_size") >= 1)
    val branch1 = col("p_brand") === "Brand#12" && col("p_size") <= 5 &&
      col("l_quantity") <= 11
    val branch2 = col("p_brand") === "Brand#23" && col("p_size") <= 10 &&
      col("l_quantity") >= 10 && col("l_quantity") <= 20
    val branch3 = col("p_brand") === "Brand#34" && col("p_size") <= 15 &&
      col("l_quantity") >= 20
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        rd(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6), 2)
          .as("revenue"))
      .orderBy("p_brand")
  }

  /** TPC-H Q17-style small-quantity revenue per brand: lineitems whose
    * quantity is below 0.2× their part's average quantity — the classic
    * correlated-scalar-subquery plan, decorrelated into one per-part
    * aggregate joined back to the fact table. The threshold predicate is
    * restated in exact integer arithmetic (`5·q·c < S` ⟺
    * `q < 0.2·S/c`; quantities are integral), so both engines evaluate
    * it without a single float round. Scale: the per-part (sum, count)
    * agg partial-aggregates map-side and shuffles O(|parts|) rows; the
    * join back keys on l_partkey (AQE broadcasts the agg side while it
    * fits; co-partitioned shuffle join beyond); final agg is
    * O(|brands|). */
  def q17SmallQuantityRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val perPart = li.groupBy("l_partkey").agg(
      sum(col("l_quantity")).cast("long").as("s_qty"), // integral doubles: exact
      count(lit(1)).as("n_li"))
    val brands = part(spark, sfDir).select("p_partkey", "p_brand")
    li.join(perPart, Seq("l_partkey"))
      .filter(lit(5L) * col("l_quantity").cast("long") * col("n_li") < col("s_qty"))
      .join(brands, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        rd(qsum(col("l_extendedprice"), 6), 2).as("revenue"))
      .orderBy("p_brand")
  }

  /** TPC-H Q18-style large-volume orders: orders whose total lineitem
    * quantity exceeds `minQty`, with their customer — the group-HAVING
    * semi-join pattern. Scale: the per-order quantity agg shuffles on
    * l_orderkey (the same key the orders join needs — one partitioning
    * reused); HAVING collapses the fact table to a handful of orders
    * before any dimension join, so the orders/customer joins see a
    * filtered, broadcastable side (AQE), never the raw fact table. */
  def q18LargeVolumeOrders(spark: SparkSession, sfDir: String,
      minQty: Double = 250.0): DataFrame = {
    val big = lineitem(spark, sfDir)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty")) // integral doubles: exact
      .filter(col("total_qty") > minQty)
    orders(spark, sfDir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty"))
      .orderBy("o_orderkey")
  }

  /** TPC-H Q8-style market share: revenue share of one nation's
    * suppliers per order-year within a region's customers, for one
    * part type — the deepest join tree in the suite (lineitem ⋈ part ⋈
    * orders ⋈ customer ⋈ supplier + two broadcast dims) feeding a
    * share-of-total. Numerator and denominator are conditional /
    * unconditional exact quantized sums in ONE aggregation pass (no
    * second scan, no join back), so the ratio is oracle-stable. */
  def q8MarketShare(spark: SparkSession, sfDir: String,
      regionName: String = "ASIA", partType: String = "PROMO",
      shareNation: String = "NATION_7"): DataFrame = {
    val p = part(spark, sfDir).filter(col("p_type") === partType).select("p_partkey")
    val li = lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderdate")
    val cust = customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val supp = supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val natC = nation(spark, sfDir).select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val natS = nation(spark, sfDir).select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val reg = region(spark, sfDir).filter(col("r_name") === regionName).select("r_regionkey")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .select(year(col("o_orderdate")).as("o_year"), col("supp_nation"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
      .groupBy("o_year")
      .agg(
        qsum(when(col("supp_nation") === shareNation, col("volume"))
          .otherwise(lit(0.0)), 6).as("nation_volume"),
        qsum(col("volume"), 6).as("total_volume"))
      .select(col("o_year"),
        rd(col("nation_volume"), 2).as("nation_volume"),
        rd(col("total_volume"), 2).as("total_volume"),
        rd(col("nation_volume") / col("total_volume"), 4).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q2-style minimum-cost supplier: for each part in a
    * size/type slice, the supplier(s) offering the lowest effective
    * unit price — the classic correlated `= (SELECT min ...)` per
    * group, decorrelated into a per-part min joined back on equality.
    * The schema here has no `partsupp`, so the supply relation is
    * derived from `lineitem` and the offered price is
    * `l_extendedprice / l_quantity` (per-row IEEE division is
    * bit-identical across engines; quantized to 4 dp before the min so
    * the equality join-back is engine-stable). Scale: the part filter
    * prunes at the scan, so the lineitem join sees a broadcastable part
    * side; the per-part min shuffles O(|filtered parts × suppliers|)
    * rows, and the join back reuses the same l_partkey key. */
  def q2MinCostSupplier(spark: SparkSession, sfDir: String,
      partType: String = "SMALL", partSize: Int = 15): DataFrame = {
    val p = part(spark, sfDir)
      .filter(col("p_type") === partType && col("p_size") === partSize)
      .select("p_partkey", "p_name")
    val offers = lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        rd(col("l_extendedprice") / col("l_quantity"), 4).as("unit_price"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "p_name", "l_suppkey", "unit_price")
      .distinct() // one offer row per (part, supplier, price)
    val best = offers.groupBy(col("p_partkey").as("bp_key"))
      .agg(min("unit_price").as("min_price"))
    offers
      .join(best, col("p_partkey") === col("bp_key") &&
        col("unit_price") === col("min_price"))
      .join(supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("unit_price"))
      .orderBy(desc("s_acctbal"), asc("s_name"), asc("p_partkey"))
  }

  /** TPC-H Q7-style volume shipping: bilateral trade between two
    * nations — revenue where the customer sits in one and the supplier
    * in the other, per ship year. The two nation lookups are separate
    * broadcast joins against role-aliased copies of the bounded dim;
    * the fact-side joins shuffle on their natural keys only. The
    * cross-pair filter (`(c=A ∧ s=B) ∨ (c=B ∧ s=A)`) runs post-join in
    * one codegen stage. */
  def q7VolumeShipping(spark: SparkSession, sfDir: String,
      nationA: String = "NATION_3", nationB: String = "NATION_8"): DataFrame = {
    val natC = nation(spark, sfDir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val natS = nation(spark, sfDir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .filter((col("cust_nation") === nationA && col("supp_nation") === nationB) ||
              (col("cust_nation") === nationB && col("supp_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(rd(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6), 2)
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q9-style product-type profit by nation and year. No
    * `partsupp` here, so the cost model is defined as
    * `0.5 × p_retailprice × l_quantity` (half of retail — a fixed,
    * documented stand-in for `ps_supplycost`); profit is revenue minus
    * that cost, summed per (supplier nation, order year) for parts
    * whose name contains the probe substring. Per-row profit is pure
    * IEEE arithmetic (bit-stable), quantized at 4 dp into the exact
    * integer sum. The name filter cannot push as a parquet predicate
    * (substring match) but prunes before the fact join, keeping the
    * part side broadcastable. */
  def q9ProductProfit(spark: SparkSession, sfDir: String,
      nameProbe: String = "widget"): DataFrame = {
    val p = part(spark, sfDir)
      .filter(col("p_name").contains(nameProbe))
      .select("p_partkey", "p_retailprice")
    val natS = nation(spark, sfDir)
      .select(col("n_nationkey").as("sn_key"), col("n_name"))
    lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(rd(qsum(
        col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.5) * col("p_retailprice") * col("l_quantity"), 4), 2)
        .as("sum_profit"))
      .orderBy(asc("nation"), desc("o_year"))
  }

  /** TPC-H Q11-style important parts: per-part shipped value through
    * one nation's suppliers, keeping parts whose value exceeds a fixed
    * FRACTION of the nation's total — the scalar-subquery-threshold
    * pattern. Both the per-part values and the grand total are exact
    * integer-quantized sums, and the threshold multiply is one IEEE op,
    * so the cut is engine-stable. The fraction (not an absolute) keeps
    * the query meaningful at any SF. Scale: one shuffle on l_partkey
    * for the agg; the aggregated O(|parts|) frame is PERSISTED before
    * the 1-row total anchor, so the anchor job materializes it once and
    * the final filter reads the cache — the fact scan happens exactly
    * once. The filtered result is detached inside the try/finally
    * ([[graft.sources.ArtifactCache.detach]] — eager local checkpoint,
    * lineage truncated) so the cache entry is RELEASED before
    * returning (a long-lived session running the whole registry would
    * otherwise accumulate one leaked cache entry per call). The result
    * is report-sized by pigeonhole — at most ⌈1/fraction⌉ parts can
    * each exceed `fraction` of the total, so ≤ 500 rows at ANY scale
    * factor. */
  def q11ImportantParts(spark: SparkSession, sfDir: String,
      nationName: String = "NATION_3", fraction: Double = 0.002): DataFrame = {
    val supp = supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val nat = nation(spark, sfDir)
      .filter(col("n_name") === nationName).select("n_nationkey")
    val perPart = lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("l_partkey")
      .agg(qsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("value_raw"))
      .persist()
    try {
      // empty supply slice (possible at tiny SFs): sum aggregates to NULL
      // — threshold against +inf keeps the frame empty instead of NPE-ing
      val totalRow = perPart.agg(qsum(col("value_raw"), 6)).head()
      val cut =
        if (totalRow.isNullAt(0)) Double.PositiveInfinity
        else totalRow.getDouble(0) * fraction
      graft.sources.ArtifactCache.detach(
        perPart.filter(col("value_raw") > lit(cut))
          .select(col("l_partkey"), rd(col("value_raw"), 2).as("part_value"))
          .orderBy(desc("part_value"), asc("l_partkey")))
    } finally perPart.unpersist(): Unit
  }

  /** TPC-H Q12-style shipping-delay report: lineitems bucketed by how
    * long after the order date they shipped, counting high-priority
    * (1-URGENT / 2-HIGH) vs lower-priority lines per bucket — the
    * canonical Q12 shape with delay classes standing in for the absent
    * `l_shipmode`/receipt dates. Day arithmetic is integer (dates are
    * midnight-aligned), so bucketing is exact in both engines. One
    * fact-fact join on orderkey, then an O(3)-group agg. */
  def q12DelayClasses(spark: SparkSession, sfDir: String): DataFrame = {
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
      .join(orders(spark, sfDir).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        when(delay <= 30, "1_FAST")
          .when(delay <= 90, "2_MEDIUM")
          .otherwise("3_SLOW").as("delay_class"),
        col("o_orderpriority"))
      .groupBy("delay_class")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("delay_class")
  }

  /** TPC-H Q13-style customer order-count distribution: how many
    * customers placed exactly k qualifying orders, INCLUDING k = 0 —
    * the left-join-then-histogram pattern (an inner join would silently
    * drop the zero bucket). The priority exclusion stands in for the
    * canonical comment filter and rides the JOIN CONDITION, not a WHERE
    * (a post-join WHERE would also drop the zero-order customers).
    * Scale: both aggs are key-local; the second one is O(|customers|)
    * → O(distinct counts). */
  def q13OrderCountDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = customer(spark, sfDir).select("c_custkey")
      .join(orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderpriority"),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "4-NOT SPECIFIED",
        "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count")) // count() skips nulls
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** TPC-H Q16-style supplier variety: distinct suppliers per
    * (brand, type, size) slice, excluding one brand and suppliers with
    * negative balance — the NOT-IN-subquery pattern as a left-anti
    * join (the balance filter stands in for the canonical complaints
    * LIKE). The supply relation is derived from lineitem (no
    * partsupp). Scale: the anti join's right side is the bounded
    * supplier dim → broadcast; distinct-count shuffles (group, supp)
    * pairs, already collapsed map-side. */
  def q16SupplierVariety(spark: SparkSession, sfDir: String,
      excludeBrand: String = "Brand#1",
      sizes: Seq[Int] = Seq(1, 3, 9, 14, 19, 23, 36, 45)): DataFrame = {
    val p = part(spark, sfDir)
      .filter(col("p_brand") =!= excludeBrand && col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSupp = supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    lineitem(spark, sfDir).select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
  }

  /** TPC-H Q20-style over-indexed suppliers: suppliers whose shipped
    * quantity of one part family ('red …' parts) exceeds 1.1× the
    * average supplier's — the two-level-agg + scalar-threshold shape.
    * The canonical availqty threshold is restated RELATIVE to the mean
    * (an absolute cut would go degenerate as SF grows; a share-of-mean
    * is SF-invariant). Quantities are integral doubles → the per-
    * supplier sums are exact; the mean is one IEEE division off two
    * exact scalars. Scale: per-supplier agg shuffles O(|suppliers|)
    * rows; the mean anchors off that same tiny frame, which is
    * persisted so the fact scan runs once and RELEASED in the finally
    * — the over-indexed keys are detached via eager local checkpoint
    * ([[graft.sources.ArtifactCache.detach]]: distributed blocks, so
    * even a degenerate distribution that puts many suppliers above
    * `factor ×` the mean never lands on the driver; lineage truncated,
    * so the release is safe), and the dim join-back runs lazily off
    * the detached frame. */
  def q20DominantSuppliers(spark: SparkSession, sfDir: String,
      namePrefix: String = "red ", factor: Double = 1.1): DataFrame = {
    val p = part(spark, sfDir)
      .filter(col("p_name").startsWith(namePrefix)).select("p_partkey")
    val perSupp = lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(sum("l_quantity").cast("long").as("red_qty")) // integral: exact
      .persist() // O(|suppliers|): anchor job fills it, final read hits cache
    val dominant =
      try {
        val stats = perSupp.agg(sum("red_qty"), count(lit(1))).head()
        // no supplier shipped this family → NULL sum; +inf cut keeps it empty
        val mean =
          if (stats.isNullAt(0)) Double.PositiveInfinity
          else stats.getLong(0).toDouble / stats.getLong(1)
        graft.sources.ArtifactCache.detach(
          perSupp.filter(col("red_qty") > lit(factor * mean)))
      } finally perSupp.unpersist(): Unit
    // explicit broadcast: the detached frame is a LogicalRDD reporting
    // default (huge) size stats, so without the hint a non-AQE session
    // would plan this dim join-back as a full shuffle join (ADVICE r9);
    // the over-indexed slice is report-sized by construction
    broadcast(dominant)
      .join(supplier(spark, sfDir).select("s_suppkey", "s_name", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"), col("red_qty"))
      .orderBy(desc("red_qty"), asc("s_name"))
  }

  /** TPC-H Q21-style suppliers who kept orders waiting: in finished
    * multi-supplier orders, the supplier who was the ONLY late shipper
    * (shipped > 60 days after the order date). The canonical
    * EXISTS / NOT-EXISTS pair is decorrelated into one per-order
    * profile — (distinct suppliers, distinct late suppliers) — joined
    * back to the late lines; `n_supp > 1 ∧ n_late = 1` replays
    * "another supplier exists, no OTHER supplier was late" exactly.
    * Each qualifying (order, supplier) pair counts once. Scale: both
    * the profile agg and the join-back key on l_orderkey — ONE
    * partitioning reused; the EXISTS pair would have cost two more
    * fact-fact joins. */
  def q21WaitingSuppliers(spark: SparkSession, sfDir: String,
      lateDays: Int = 60, topK: Int = 20): DataFrame = {
    val li = lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(orders(spark, sfDir)
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > lateDays).as("late"))
    val profile = li.groupBy(col("l_orderkey").as("po_key"))
      .agg(countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
    li.filter(col("late"))
      .select("l_orderkey", "l_suppkey").distinct()
      .join(profile, col("l_orderkey") === col("po_key"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .join(supplier(spark, sfDir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(topK)
  }

  /** TPC-H Q22-style dormant high-value customers: customers with an
    * above-average positive balance and NO recent order, rolled up by
    * nation (standing in for the canonical phone country code). The
    * scalar average is the exact quantized mean (qavg's integer
    * device); recency is a left-anti join whose orders side is
    * date-pruned AT THE SCAN before the shuffle. */
  def q22DormantCustomers(spark: SparkSession, sfDir: String,
      sinceDate: String = "2000-01-01"): DataFrame = {
    val cust = customer(spark, sfDir)
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val thrRow = cust.filter(col("c_acctbal") > 0)
      .agg(qavg(col("c_acctbal"), 2)).head()
    // no positive balances → NULL mean; +inf threshold keeps it empty
    val thr =
      if (thrRow.isNullAt(0)) Double.PositiveInfinity
      else thrRow.getDouble(0)
    val recent = orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit(sinceDate).cast("timestamp"))
      .select("o_custkey")
    cust.filter(col("c_acctbal") > thr)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("numcust"),
        rd(qsum(col("c_acctbal"), 2), 2).as("totacctbal"))
      .orderBy("nation")
  }
}
