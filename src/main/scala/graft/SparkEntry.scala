package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * pipeline extensions) registers here: a Spark query in [[queries]] and,
  * when ANSI-SQL-expressible, a DuckDB oracle in [[oracleSql]]. Column
  * names are aliased identically on both sides (the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's entire job — word-count + top-K (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    WordCount.topK(spark, "/root/testdata/sf0.001", 100)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference surface (SURVEY.md §2.1, O1-O12) ---
    "wordcount_topk" -> ((s, d) => WordCount.topK(s, d, 100)),
    "wordcount_full" -> ((s, d) => WordCount.full(s, d)),
    "letter_buckets" -> ((s, d) => WordCount.letterBuckets(s, d)),
    // --- relational surface (SURVEY.md §7.2 PR3; absent in reference §2.3) ---
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_region_revenue" -> (Relational.q5RegionRevenue _),
    "top_customers" -> (Relational.topCustomers _),
    "order_priority_exists" -> (Relational.orderPriorityExists _),
    "customers_no_orders" -> (Relational.customersNoOrders _),
    "nation_customer_stats" -> (Relational.nationCustomerStats _),
    "window_top_orders" -> (Relational.windowTopOrders _),
    "rollup_lineitem" -> (Relational.rollupLineitem _),
    "set_ops_active_customers" -> (Relational.setOpsActiveCustomers _),
    "scalar_functions" -> (Relational.scalarFunctions _),
    "brand_top_parts" -> (Relational.brandTopParts _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "wordcount_topk" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '[ \n]')) AS word FROM documents)
        |WHERE regexp_matches(word, '^[a-z]')
        |GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 100""".stripMargin,
    "wordcount_full" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '[ \n]')) AS word FROM documents)
        |WHERE regexp_matches(word, '^[a-z]')
        |GROUP BY word ORDER BY word ASC""".stripMargin,
    "letter_buckets" ->
      """SELECT substr(word, 1, 1) AS letter, COUNT(*) AS n_words,
        |       COUNT(DISTINCT word) AS n_distinct
        |FROM (SELECT unnest(string_split_regex(text, '[ \n]')) AS word FROM documents)
        |WHERE regexp_matches(word, '^[a-z]')
        |GROUP BY 1 ORDER BY letter ASC""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "top_customers" ->
      """SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS total_spend,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spend DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "order_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "customers_no_orders" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate < TIMESTAMP '1996-01-01')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "nation_customer_stats" ->
      """SELECT n_name, count(DISTINCT c_mktsegment) AS n_segments,
        |  count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "rollup_lineitem" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "set_ops_active_customers" ->
      """SELECT o_custkey FROM (
        |  (SELECT o_custkey FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |   INTERSECT
        |   SELECT o_custkey FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY o_custkey""".stripMargin,
    "scalar_functions" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(month(o_orderdate) AS INT) AS o_month,
        |  substr(o_orderpriority, 1, 1) AS prio_code,
        |  concat_ws('#', o_orderstatus, o_orderpriority) AS status_prio,
        |  CASE WHEN o_totalprice >= 300000 THEN 'high'
        |       WHEN o_totalprice >= 100000 THEN 'mid'
        |       ELSE 'low' END AS price_band,
        |  round(sqrt(o_totalprice), 4) AS sqrt_price,
        |  round(ln(o_totalprice + 1), 4) AS log_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "brand_top_parts" ->
      """SELECT p_brand, p_partkey, p_name, part_revenue, CAST(rn AS INT) AS rn
        |FROM (SELECT p_brand, p_partkey, p_name, part_revenue,
        |        row_number() OVER (PARTITION BY p_brand
        |                           ORDER BY part_revenue DESC, p_partkey ASC) AS rn
        |      FROM (SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_revenue
        |            FROM lineitem GROUP BY l_partkey)
        |        JOIN part ON l_partkey = p_partkey)
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
  )
}
