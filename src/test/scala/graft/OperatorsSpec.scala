package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Similarity}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("range join: bucketed formulation equals naive quadratic join") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
    val a = ev.select($"user_id", $"event_id".as("ea"), $"us".as("ua"))
    val b = ev.select($"user_id", $"event_id".as("eb"), $"us".as("ub"))
    val naive = a.join(b, Seq("user_id"))
      .filter($"ea" < $"eb" && abs($"ub" - $"ua") <= 300000000L)
      .select($"ea", $"eb").as[(Long, Long)].collect().toSet
    val bucketed = Events.nearbyEventPairs(spark, sf)
      .select($"event_a", $"event_b").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(bucketed.nonEmpty)
  }

  test("stratified sample: deterministic and proportionally correct") {
    val s1 = Events.stratifiedSample(spark, sf).collect().map(_.toString).toSeq
    val s2 = Events.stratifiedSample(spark, sf).collect().map(_.toString).toSeq
    assert(s1 === s2, "fixed seed must reproduce exactly")
    val counts = Events.stratifiedSample(spark, sf)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    val totals = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(counts("purchase") === totals("purchase"), "fraction 1.0 keeps all")
    assert(!counts.contains("signup"), "fraction 0.0 keeps none")
    val clickFrac = counts("click").toDouble / totals("click")
    assert(clickFrac > 0.35 && clickFrac < 0.65, s"click fraction ~0.5, got $clickFrac")
  }

  test("IVF recall beats LSH on this corpus and respects nprobe structure") {
    val brute = Similarity.bruteForceTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall collapsed: $recall") // measured ~0.8
  }

  test("unpivot emits one row per (flag, metric) with matching values") {
    val rows = Events.lineitemUnpivot(spark, sf).collect()
    val flags = graft.sources.Tables.lineitem(spark, sf)
      .select("l_returnflag").distinct().count()
    assert(rows.length === flags * 3)
    assert(rows.map(_.getString(1)).distinct.sorted ===
      Array("mean_discount", "total_price", "total_qty"))
  }
}
