package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Events}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of golden: latest right row at-or-before each left row, per key") {
    val clicks = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, ts("2024-01-01 09:30:00"), 5.0),
      (10L, ts("2024-01-01 11:00:00"), 7.0),
      (20L, ts("2024-01-01 09:00:00"), 9.0) // exact tie: <= matches
    ).toDF("user_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("ts").as("p_ts"), col("value"))

    val got = AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts",
        Map("p_ts" -> "last_ts", "value" -> "last_value"))
      .orderBy("event_id")
      .select("event_id", "last_ts", "last_value")
      .collect()

    assert(got(0).getTimestamp(1) === ts("2024-01-01 09:30:00"))
    assert(got(0).getDouble(2) === 5.0)
    assert(got(1).getTimestamp(1) === ts("2024-01-01 11:00:00"))
    assert(got(1).getDouble(2) === 7.0)
    assert(got(2).getTimestamp(1) === ts("2024-01-01 09:00:00"), "equal ts must match (<=)")
    assert(got(2).getDouble(2) === 9.0)
  }

  test("NULL payload fields never splice values from older right rows") {
    val clicks = Seq((1L, 10L, ts("2024-01-01 10:30:00"))).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, ts("2024-01-01 09:00:00"), Some(5.0)),
      (10L, ts("2024-01-01 10:00:00"), Option.empty[Double]) // newer row, NULL value
    ).toDF("user_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("ts").as("p_ts"), col("value"))
    val got = AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts",
      Map("p_ts" -> "last_ts", "value" -> "last_value")).head()
    assert(got.getTimestamp(3) === ts("2024-01-01 10:00:00"),
      "must match the NEWEST right row")
    assert(got.isNullAt(4),
      "its NULL value must come through, not the older row's 5.0")
  }

  test("tiebreak column resolves equal-timestamp right rows deterministically") {
    val clicks = Seq((1L, 10L, ts("2024-01-01 11:00:00"))).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, ts("2024-01-01 10:00:00"), 101L, 5.0),
      (10L, ts("2024-01-01 10:00:00"), 102L, 7.0) // same ts, higher id wins
    ).toDF("user_id", "ts", "pid", "value")
      .select(col("user_id"), col("ts"), col("pid"), col("value"))
    val got = AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts",
      Map("value" -> "last_value"), tiebreak = Some("pid")).head()
    assert(got.getDouble(3) === 7.0)
  }

  test("left rows with no prior right row get nulls (left join semantics)") {
    val clicks = Seq((1L, 10L, ts("2024-01-01 08:00:00"))).toDF("event_id", "user_id", "ts")
    val purchases = Seq((10L, ts("2024-01-01 09:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("ts").as("p_ts"), col("value"))
    val got = AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts",
      Map("p_ts" -> "last_ts", "value" -> "last_value")).collect()
    assert(got.length === 1 && got(0).isNullAt(3) && got(0).isNullAt(4))
  }

  test("as-of plan shuffles once: a single Exchange for both sides") {
    val plan = AsOfJoin.clickAttribution(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected union-sort shape (1 data shuffle + top-level sort), got:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "as-of must not fall back to a product join")
  }

  test("native as-of exec: plan uses AsOfJoinExec, no window, no product") {
    val plan = AsOfJoin.clickAttributionNative(spark, sf)
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix: the custom operator
    // prints as "AsOfJoin [leftKeys], [rightKeys], ..."
    assert(plan.contains("AsOfJoin ["), s"custom exec must plan:\n$plan")
    assert(!plan.contains("Window"), "the merge pass replaces the window carry")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    // two data shuffles (one per side) + at most one top-level ordering
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"expected 2 key shuffles + final sort, got:\n$plan")
  }

  test("native as-of equals the composition form on real data") {
    val a = AsOfJoin.clickAttribution(spark, sf).collect().toSeq
    val b = AsOfJoin.clickAttributionNative(spark, sf).collect().toSeq
    assert(a.nonEmpty && a === b)
  }

  test("native as-of golden: tie match, tiebreak, no-match nulls, null right time") {
    val clicks = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // matches 09:30 row
      (2L, 10L, ts("2024-01-01 12:00:00")), // matches 11:00 tie pair -> max pid
      (3L, 20L, ts("2024-01-01 09:00:00")), // equal-ts right row matches (<=)
      (4L, 30L, ts("2024-01-01 09:00:00")), // right rows all later -> nulls
      (5L, 40L, ts("2024-01-01 09:00:00"))  // key absent on right -> nulls
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, Some(ts("2024-01-01 09:30:00")), 101L, 5.0),
      (10L, Some(ts("2024-01-01 11:00:00")), 102L, 6.0),
      (10L, Some(ts("2024-01-01 11:00:00")), 103L, 7.0), // tie: higher pid wins
      (10L, Option.empty[Timestamp], 104L, 8.0),          // null time never matches
      (20L, Some(ts("2024-01-01 09:00:00")), 105L, 9.0),
      (30L, Some(ts("2024-01-01 10:00:00")), 106L, 1.0)
    ).toDF("p_user_id", "p_ts", "pid", "p_value")
    val got = graft.plans.AsOfJoinNative.asOf(
        clicks, purchases,
        leftKeys = Seq("user_id"), rightKeys = Seq("p_user_id"),
        leftTime = "ts", rightTime = "p_ts", rightTiebreak = Some("pid"))
      .orderBy("event_id")
      .select("event_id", "p_ts", "p_value")
      .collect()
    assert(got.length === 5)
    assert(got(0).getTimestamp(1) === ts("2024-01-01 09:30:00") && got(0).getDouble(2) === 5.0)
    assert(got(1).getTimestamp(1) === ts("2024-01-01 11:00:00") && got(1).getDouble(2) === 7.0,
      "equal-timestamp rows must resolve to the greatest tiebreak")
    assert(got(2).getTimestamp(1) === ts("2024-01-01 09:00:00") && got(2).getDouble(2) === 9.0,
      "equal ts must match (<=)")
    assert(got(3).isNullAt(1) && got(3).isNullAt(2), "future-only right rows: nulls")
    assert(got(4).isNullAt(1) && got(4).isNullAt(2), "absent key: nulls")
  }

  test("native as-of tolerance: in-window matches attach, stale ones null out") {
    val clicks = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // purchase 30 min prior: in window
      (2L, 10L, ts("2024-01-01 23:00:00")), // latest purchase 13.5h stale: null
      (3L, 20L, ts("2024-01-01 09:00:00"))  // exact tie: distance 0, in window
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, ts("2024-01-01 09:30:00"), 5.0),
      (20L, ts("2024-01-01 09:00:00"), 9.0)
    ).toDF("p_user_id", "p_ts", "p_value")
    val got = graft.plans.AsOfJoinNative.asOf(
        clicks, purchases,
        leftKeys = Seq("user_id"), rightKeys = Seq("p_user_id"),
        leftTime = "ts", rightTime = "p_ts",
        tolerance = Some(6L * 3600 * 1000000)) // 6h in micros
      .orderBy("event_id").select("event_id", "p_ts", "p_value").collect()
    assert(got(0).getTimestamp(1) === ts("2024-01-01 09:30:00") &&
      got(0).getDouble(2) === 5.0)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2),
      "a match outside the window must null out, not fall back")
    assert(got(2).getTimestamp(1) === ts("2024-01-01 09:00:00"),
      "zero distance sits inside any window")
  }

  test("native forward as-of: earliest at-or-after match, window, tie, nulls") {
    val clicks = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // next purchase 10:30: matches
      (2L, 10L, ts("2024-01-01 12:00:00")), // next is 20:00, 8h away: out of 6h window
      (3L, 20L, ts("2024-01-01 09:00:00")), // equal-ts pair: min tiebreak wins
      (4L, 30L, ts("2024-01-01 09:00:00"))  // only EARLIER purchases: null
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, ts("2024-01-01 09:30:00"), 101L, 1.0), // before click 1: ignored (forward)
      (10L, ts("2024-01-01 10:30:00"), 102L, 2.0),
      (10L, ts("2024-01-01 20:00:00"), 103L, 3.0),
      (20L, ts("2024-01-01 09:00:00"), 104L, 4.0),
      (20L, ts("2024-01-01 09:00:00"), 105L, 5.0),
      (30L, ts("2024-01-01 08:00:00"), 106L, 6.0)
    ).toDF("p_user_id", "p_ts", "pid", "p_value")
    val got = graft.plans.AsOfJoinNative.asOf(
        clicks, purchases,
        leftKeys = Seq("user_id"), rightKeys = Seq("p_user_id"),
        leftTime = "ts", rightTime = "p_ts",
        rightTiebreak = Some("pid"),
        tolerance = Some(6L * 3600 * 1000000),
        forward = true)
      .orderBy("event_id").select("event_id", "p_ts", "pid", "p_value").collect()
    assert(got(0).getTimestamp(1) === ts("2024-01-01 10:30:00") &&
      got(0).getDouble(3) === 2.0, "earliest at-or-after wins, prior rows ignored")
    assert(got(1).isNullAt(1), "next match beyond the window must null out")
    assert(got(2).getLong(2) === 104L && got(2).getDouble(3) === 4.0,
      "equal-time forward ties resolve to the smallest tiebreak")
    assert(got(3).isNullAt(1), "only-earlier purchases: no forward match")
  }

  test("oracle precondition: the fixture has no duplicate (user, ts) purchases") {
    // the attribution oracles rely on DuckDB's ASOF tie pick never
    // being exercised: on equal (user_id, ts) purchases the native
    // operator resolves deterministically (greatest tiebreak backward,
    // smallest forward) while DuckDB's choice is unspecified. Assert
    // the precondition so a future data refresh that introduces ties
    // fails HERE with a message, not as a silent oracle hash mismatch.
    val dups = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .groupBy("user_id", "ts").count()
      .filter($"count" > 1).count()
    assert(dups === 0L,
      "duplicate (user_id, ts) purchases would make the ASOF oracle's tie pick unspecified")
  }

  test("oracle precondition: the fixture has no NULL as-of keys or times") {
    // the native operator's key equality is deliberately null-safe
    // (null keys group together, matching the window formulation)
    // while DuckDB's ASOF equi-condition REJECTS null keys — the two
    // agree only while the fixture carries none. Assert it here so a
    // data refresh introducing null user_id/ts fails with a message
    // instead of an opaque oracle hash mismatch.
    val ev = graft.sources.Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase"))
    assert(ev.filter($"user_id".isNull).count() === 0L,
      "null user_id would match null-safely in the native as-of but not in DuckDB ASOF")
    assert(ev.filter($"ts".isNull).count() === 0L,
      "null ts rows never match in the native as-of; DuckDB would drop them differently")
  }

  test("native nearest as-of: one merge pass, per-direction tolerance, ties backward") {
    val clicks = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // back 1h, fwd 10min -> fwd
      (2L, 20L, ts("2024-01-01 10:00:00")), // both 1h away -> tie -> back
      (3L, 30L, ts("2024-01-01 10:00:00")), // back 7h (out of 6h tol), fwd 5h -> fwd
      (4L, 40L, ts("2024-01-01 10:00:00")), // both out of window -> null
      (5L, 50L, ts("2024-01-01 10:00:00"))  // no purchases -> null
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, ts("2024-01-01 09:00:00"), 101L, 1.0),
      (10L, ts("2024-01-01 10:10:00"), 102L, 2.0),
      (20L, ts("2024-01-01 09:00:00"), 103L, 3.0),
      (20L, ts("2024-01-01 11:00:00"), 104L, 4.0),
      (30L, ts("2024-01-01 03:00:00"), 105L, 5.0),
      (30L, ts("2024-01-01 15:00:00"), 106L, 6.0),
      (40L, ts("2024-01-01 01:00:00"), 107L, 7.0),
      (40L, ts("2024-01-01 23:00:00"), 108L, 8.0)
    ).toDF("p_user_id", "p_ts", "pid", "p_value")
    val joined = graft.plans.AsOfJoinNative.asOf(
      clicks, purchases,
      leftKeys = Seq("user_id"), rightKeys = Seq("p_user_id"),
      leftTime = "ts", rightTime = "p_ts",
      rightTiebreak = Some("pid"),
      tolerance = Some(6L * 3600 * 1000000),
      nearest = true)
    // single-pass contract: exactly ONE AsOfJoinExec in the plan (the
    // composed form planned two)
    val plan = joined.queryExecution.executedPlan.toString
    assert("AsOfJoin \\[".r.findAllIn(plan).length === 1,
      s"nearest must plan one merge pass, not a composition:\n$plan")
    val got = joined.orderBy("event_id")
      .select("event_id", "pid", "p_value").collect()
    assert(got(0).getLong(1) === 102L, "closer forward candidate wins")
    assert(got(1).getLong(1) === 103L, "equal distance resolves backward")
    assert(got(2).getLong(1) === 106L,
      "out-of-window backward must not block an in-window forward")
    assert(got(3).isNullAt(1), "both directions out of window: null")
    assert(got(4).isNullAt(1), "no purchases: null")
  }

  test("native nearest equals a brute-force reference on randomized data") {
    val rnd = new scala.util.Random(4321)
    val clicks = (1 to 400).map { i =>
      (i.toLong, (rnd.nextInt(30) + 1).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L))
    }
    val purchases = (1 to 300).map { i =>
      ((rnd.nextInt(40) + 1).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        1000L + i, rnd.nextDouble())
    }
    val got = graft.plans.AsOfJoinNative.asOf(
        clicks.toDF("event_id", "user_id", "ts"),
        purchases.toDF("p_user_id", "p_ts", "pid", "p_value"),
        leftKeys = Seq("user_id"), rightKeys = Seq("p_user_id"),
        leftTime = "ts", rightTime = "p_ts",
        rightTiebreak = Some("pid"), nearest = true)
      .select("event_id", "pid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val byUser = purchases.groupBy(_._1)
    clicks.foreach { case (eid, uid, cts) =>
      val ps = byUser.getOrElse(uid, Seq.empty)
      // backward: latest at-or-before, greatest pid on ties; forward:
      // earliest at-or-after, smallest pid; closer wins, ties backward
      val back = ps.filter(_._2.getTime <= cts.getTime)
        .sortBy(p => (p._2.getTime, p._3)).lastOption
      val fwd = ps.filter(_._2.getTime >= cts.getTime)
        .sortBy(p => (p._2.getTime, p._3)).headOption
      val expect = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (cts.getTime - b._2.getTime <= f._2.getTime - cts.getTime) Some(b._3)
          else Some(f._3)
        case (Some(b), None) => Some(b._3)
        case (None, Some(f)) => Some(f._3)
        case _ => None
      }
      assert(got(eid) === expect, s"event $eid (user $uid at $cts)")
    }
  }

  test("nearest drivers: native and composed forms agree on the golden cases") {
    // build an events-shaped frame and drive the operators through a
    // temp parquet dir so the production entry points are what's tested
    val dirPath = java.nio.file.Files.createTempDirectory("graft-asof-near")
    val dir = dirPath.toString
    val rows = Seq(
      // user 1: backward 1h away, forward 10min away -> forward wins
      (1L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (2L, 1L, ts("2024-01-01 09:00:00"), "purchase", 1.0),
      (3L, 1L, ts("2024-01-01 10:10:00"), "purchase", 2.0),
      // user 2: both exactly 1h away -> tie -> backward
      (4L, 2L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (5L, 2L, ts("2024-01-01 09:00:00"), "purchase", 3.0),
      (6L, 2L, ts("2024-01-01 11:00:00"), "purchase", 4.0),
      // user 3: only a forward purchase exists
      (7L, 3L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (8L, 3L, ts("2024-01-01 12:00:00"), "purchase", 5.0),
      // user 4: no purchases at all
      (9L, 4L, ts("2024-01-01 10:00:00"), "click", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    try {
      def run(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
      val got = run(AsOfJoin.clickNearestPurchase(spark, dir))
      assert(got(1L) === Some(2.0), "closer forward match must win")
      assert(got(4L) === Some(3.0), "equal distance resolves backward (pandas)")
      assert(got(7L) === Some(5.0), "forward-only still matches")
      assert(got(9L) === None, "no purchases: null")
      assert(run(AsOfJoin.clickNearestPurchaseComposed(spark, dir)) === got,
        "single-pass native and two-pass composed nearest must agree")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("native as-of self-join on one source keeps sides distinct") {
    // both sides derive from the SAME DataFrame — duplicate exprIds
    // across sides would corrupt binding without the DSL's re-alias
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (2L, 10L, ts("2024-01-01 09:00:00"), "purchase", 42.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = graft.plans.AsOfJoinNative.asOf(
        ev.filter($"event_type" === "click").select("event_id", "user_id", "ts"),
        ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user_id"), $"ts".as("p_ts"), $"value".as("p_value")),
        leftKeys = Seq("user_id"), rightKeys = Seq("p_user_id"),
        leftTime = "ts", rightTime = "p_ts")
      .select("event_id", "p_value").head()
    assert(got.getLong(0) === 1L && got.getDouble(1) === 42.0)
  }

  test("approx distinct users within 10% of exact") {
    Events.approxDistinctUsers(spark, sf).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("sketch rollup: union-of-daily HLLs within 5% of exact, equal to the direct sketch") {
    import org.apache.spark.sql.functions._
    val rows = Events.distinctUsersViaSketchRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, days, approx, exact) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(days > 1, s"$t must actually merge multiple daily sketches")
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"$t: sketch $approx vs exact $exact")
    }
    // the mergeability contract itself: unioning per-day sketches must
    // give EXACTLY the estimate of sketching the whole stream directly
    // (HLL registers merge losslessly) — this is what makes the daily
    // sketches reusable artifacts
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("cast(hll_sketch_estimate(hll_sketch_agg(user_id)) as bigint)")
        .as("direct_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === direct(r.getString(0)),
        s"${r.getString(0)}: merged estimate must equal the direct sketch estimate")
    }
  }
}
