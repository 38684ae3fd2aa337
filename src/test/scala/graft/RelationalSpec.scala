package graft

import graft.operators.Relational

/** Plan-shape + invariant tests for the relational surface. Value-level
  * correctness is covered by the DuckDB oracle (SparkEntry.oracleSql). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("q1 groups to returnflag×linestatus combinations") {
    val rows = Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("bounded dims are broadcast in the physical plan") {
    val plan = Relational.customersNoOrders(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("anti join actually excludes: no overlap with 1995 purchasers") {
    val no95 = Relational.customersNoOrders(spark, sf)
    assert(no95.agg(org.apache.spark.sql.functions.sum("n_customers"))
      .as[Long].head() > 0, "date-filtered anti join should be non-empty")
  }

  test("window rank bounded at 3 per customer") {
    val df = Relational.windowTopOrders(spark, sf)
    assert(df.filter($"rn" > 3).count() === 0)
    val perCust = df.groupBy("o_custkey").count()
    assert(perCust.filter($"count" > 3).count() === 0)
  }

  test("rollup total row equals table count") {
    val rows = Relational.rollupLineitem(spark, sf).collect()
    val total = rows.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    val n = graft.sources.Tables.lineitem(spark, sf).count()
    assert(total.getLong(2) === n)
  }

  test("set ops: result disjoint from open-status customers") {
    val res = Relational.setOpsActiveCustomers(spark, sf).as[Long].collect().toSet
    val open = graft.sources.Tables.orders(spark, sf)
      .filter($"o_orderstatus" === "O").select("o_custkey").as[Long].collect().toSet
    assert(res.intersect(open).isEmpty)
  }

  test("q5 parquet scan is pruned to needed lineitem columns") {
    val formatted = Relational.q5RegionRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!formatted.contains("l_returnflag"), "q5 must not read unused columns")
  }
}
