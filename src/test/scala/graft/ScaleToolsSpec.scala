package graft

import org.apache.spark.sql.functions._
import graft.operators.{SkewTools, WordCount, Relational}
import graft.functions.TopKAggregate

class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("RDD reduceByKey formulation equals the DataFrame plan (reference MapReduce mapping)") {
    val viaRdd = WordCount.topKviaRDD(spark, sf, 50)
    val viaDf = WordCount.topK(spark, sf, 50).as[(String, Long)].collect().toSeq
    assert(viaRdd === viaDf)
  }

  test("salted join equals plain join (correctness under salting)") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    val ord = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ord, Seq("l_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      .as[(String, Double)].collect().toMap
    val salted = SkewTools.saltedJoin(li, ord, "l_orderkey",
        buckets = 7, saltSource = Seq("l_quantity"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      .as[(String, Double)].collect().toMap
    assert(salted === plain)
  }

  test("salted driver query equals the unsalted formulation") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type")
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("user_events"))
    val plain = ev.join(dim, Seq("user_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("user_events") >= 70, 1L).otherwise(0L)).as("n_heavy_events"),
        count_distinct(when(col("user_events") >= 70, col("user_id"))).as("n_heavy_users"))
      .orderBy("event_type").collect().map(_.toString).toSeq
    val salted = SkewTools.saltedUserEnrich(spark, sf)
      .collect().map(_.toString).toSeq
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("salt is deterministic and bounded") {
    val s = graft.sources.Tables.lineitem(spark, sf)
      .select(SkewTools.salt(8, col("l_orderkey"), col("l_linenumber")).as("s"))
    val vals = s.distinct().as[Long].collect()
    assert(vals.forall(v => v >= 0 && v < 8))
  }

  test("heap top-k aggregator equals the window formulation") {
    val win = Relational.windowTopOrders(spark, sf).collect().map(_.toString).toSeq
    val heap = TopKAggregate.topOrdersPerCustomer(spark, sf).collect().map(_.toString).toSeq
    assert(heap === win)
  }

  test("heap top-k shuffles partial buffers, not the full table") {
    val plan = TopKAggregate.topOrdersPerCustomer(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected partial aggregation before the shuffle:\n$plan")
  }
}
