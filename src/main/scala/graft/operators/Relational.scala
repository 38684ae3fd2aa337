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
}
