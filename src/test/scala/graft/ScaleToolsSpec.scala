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

  test("CMS-guarded hot-key detector equals the ungated exact computation") {
    val got = SkewTools.heavyUsers(spark, sf)
      .as[(Long, Long)].collect().toSeq
    // brute force WITHOUT the sketch: same mean-relative threshold rule
    val counts = graft.sources.Tables.events(spark, sf)
      .select("user_id").as[Long].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    val thr = math.max(1L,
      math.ceil(1.2 * total / counts.size).toLong)
    val expect = counts.filter(_._2 >= thr).toSeq
      .sortBy { case (k, c) => (-c, k) }
    assert(got === expect, "CMS guard must be semantics-free (no false negatives)")
    assert(got.nonEmpty, "fixture must contain above-mean-activity users")
    assert(got.size < counts.size,
      "the cut must actually separate hot keys from the key population")
  }

  test("heavy-keys guard prunes the count shuffle to candidate keys") {
    // the CMS probe (the plan's only UDF) must sit BELOW the count
    // exchange — i.e. print AFTER it in the top-down tree — so the
    // shuffle carries candidate keys only. An index comparison against
    // a bare "Filter" would match the scan's PushedFilters line and
    // assert nothing.
    val plan = SkewTools.heavyUsers(spark, sf)
      .queryExecution.executedPlan.toString
    val udfIdx = plan.indexOf("UDF")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(udfIdx >= 0, s"CMS guard UDF missing from plan:\n$plan")
    assert(exchangeIdx >= 0 && udfIdx > exchangeIdx,
      s"guard must evaluate below the count shuffle:\n$plan")
  }

  test("heap top-k shuffles partial buffers, not the full table") {
    val plan = TopKAggregate.topOrdersPerCustomer(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected partial aggregation before the shuffle:\n$plan")
  }
}
