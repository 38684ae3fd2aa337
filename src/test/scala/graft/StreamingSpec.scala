package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.{Ev, UserRunning}
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 10:15:00"), 1, "view", 2.0),
    Ev(3, ts("2024-01-01 10:45:00"), 2, "click", 3.0))
  private val batch2 = Seq(
    Ev(4, ts("2024-01-01 11:05:00"), 1, "click", 4.0),
    Ev(5, ts("2024-01-01 11:20:00"), 2, "view", 5.0))

  test("streaming windowed counts equal the batch computation (update-to-complete parity)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("win_out")
        .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
      val batch = (batch1 ++ batch2).toDF()
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"),
          graft.functions.Deterministic.rd(
            graft.functions.Deterministic.qsum($"value", 6), 4).as("sum_value"))
        .select($"w.start".as("window_start"), $"event_type", $"n", $"sum_value")
        .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream/batch rounding parity at a half-up boundary, split across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("boundary_out")
      .outputMode("complete").start()
    try {
      // 0.00004 + 0.00001 sums to the exact 4-dp half-up boundary 0.00005;
      // a double sum is off by an ulp in an order-dependent direction and
      // can round to 0.0000 or 0.0001 depending on micro-batch split —
      // the quantized sum (40 + 10 = 50 millionths) always rounds 0.0001
      mem.addData(Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 0.00004))
      q.processAllAvailable()
      mem.addData(Ev(2, ts("2024-01-01 10:15:00"), 1, "click", 0.00001))
      q.processAllAvailable()
      val streamed = spark.table("boundary_out").collect()
      assert(streamed.length === 1)
      assert(streamed(0).getDouble(3) === 0.0001,
        "quantized streaming sum must half-up round the exact boundary")
      // identical to the batch operator's formula on the same rows
      val batchVal = Seq(Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 0.00004),
          Ev(2, ts("2024-01-01 10:15:00"), 1, "click", 0.00001)).toDF()
        .agg(graft.functions.Deterministic.rd(
          graft.functions.Deterministic.qsum($"value", 6), 4)).collect()(0).getDouble(0)
      assert(streamed(0).getDouble(3) === batchVal)
    } finally q.stop()
  }

  test("file-source streaming: readEvents over parquet equals the batch window agg") {
    // stream the real events table file-by-file into the windowed agg
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    val src = graft.sources.Tables.events(spark, sf).limit(500)
    src.write.mode("overwrite").parquet(dir.toString)
    val q = EventStream.windowedCounts(EventStream.readEvents(spark, dir.toString))
      .writeStream.format("memory").queryName("file_win_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_win_out")
        .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
      val batch = spark.read.parquet(dir.toString)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"),
          graft.functions.Deterministic.rd(
            graft.functions.Deterministic.qsum($"value", 6), 4).as("sum_value"))
        .select($"w.start".as("window_start"), $"event_type", $"n", $"sum_value")
        .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("watermark drops late data deterministically") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // append mode: only watermark-closed windows are emitted
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past the 10:00 window (+10 min delay)
      mem.addData(Ev(2, ts("2024-01-01 13:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // this event is 2h51m late — behind the watermark, must be dropped
      mem.addData(Ev(3, ts("2024-01-01 10:09:00"), 1, "click", 99.0))
      q.processAllAvailable()
      mem.addData(Ev(4, ts("2024-01-01 16:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("late_out")
        .filter($"window_start" === ts("2024-01-01 10:00:00")).collect()
      assert(out.length === 1)
      assert(out(0).getLong(2) === 1L, "late event must not be counted")
      assert(out(0).getDouble(3) === 1.0, "late event's value must not appear")
    } finally q.stop()
  }

  test("file sink with checkpoint: append-mode windows land as parquet, restart resumes") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-fsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val mem = MemoryStream[Ev]
    val q1 = EventStream.startFileSink(mem.toDF(), out, ckpt)
    try {
      mem.addData(batch1: _*); q1.processAllAvailable()
      mem.addData(Ev(9, ts("2024-01-01 14:00:00"), 3, "view", 1.0)) // closes 10:00/11:00 windows
      q1.processAllAvailable()
    } finally q1.stop()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst > 0, "watermark-closed windows must be committed to parquet")
    // restart from the same checkpoint: no reprocessing, new data appends
    val q2 = EventStream.startFileSink(mem.toDF(), out, ckpt)
    try {
      mem.addData(Ev(10, ts("2024-01-01 18:00:00"), 3, "view", 1.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() >= afterFirst, "restart must not lose committed output")
    assert(rows.groupBy("window_start", "event_type").count()
      .filter($"count" > 1).count() === 0, "no window duplicated across restarts")
  }

  test("checkpoint recovery: query killed mid-drain resumes and matches the batch result") {
    // The first thing a real deployment exercises: a stateful query dies
    // partway through its input and is restarted from the checkpoint.
    // Session state is the hardest case — sessions SPAN the kill point,
    // so a resume with lost state would emit split/wrong sessions. The
    // choreography: events sliced into 3 time-ordered files + a far-
    // future sentinel (advances the watermark so every real session
    // closes in append mode), query killed after the first micro-batch,
    // restarted from the same checkpoint, drained; the parquet output
    // must equal the batch session aggregation over ALL input.
    val inDir = java.nio.file.Files.createTempDirectory("graft-rec-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-rec-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rec-ckpt").toString
    try {
      val ev = graft.sources.Tables.events(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val Array(lo, hi) = ev.agg(min("ts"), max("ts")).collect()
        .flatMap(r => Array(r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
      // place the kill-point cut BETWEEN two consecutive same-user
      // events that are inside one session (<20-min apart), nearest the
      // middle of the corpus — guaranteeing at least one session spans
      // the cut, so the resumed run provably needs recovered state
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val mid = lo + (hi - lo) / 2
      val pair = ev.withColumn("prev", lag("ts", 1).over(w))
        .filter($"prev".isNotNull)
        .select(unix_timestamp($"prev").as("p"), unix_timestamp($"ts").as("t"))
        .filter($"t" - $"p" >= 2 && $"t" - $"p" < 1200)
        .withColumn("d", abs(($"p" + $"t") / 2 * 1000 - mid))
        .orderBy("d").limit(1).collect()(0)
      val cut1 = new Timestamp((pair.getLong(0) + pair.getLong(1)) / 2 * 1000)
      val cut2 = new Timestamp(cut1.getTime + (hi - cut1.getTime) / 2)
      val sentinelTs = new Timestamp(hi + 2 * 3600 * 1000L)
      val slices = Seq(
        ev.filter($"ts" <= lit(cut1)),
        ev.filter($"ts" > lit(cut1) && $"ts" <= lit(cut2)),
        ev.filter($"ts" > lit(cut2))
          .unionByName(Seq((-999L, sentinelTs, -999L, "sentinel", 0.0))
            .toDF("event_id", "ts", "user_id", "event_type", "value")))
      // one file per slice, written in time order so discovery order =
      // event-time order and the watermark never drops a slice
      slices.zipWithIndex.foreach { case (s, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"graft-rec-sl$i").toString
        s.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = java.nio.file.Paths.get(inDir, f"slice-$i%03d.parquet")
        java.nio.file.Files.move(part.toPath, dest)
        // pin strictly increasing mtimes: FileStreamSource discovers by
        // modification time, and same-millisecond slices would drain in
        // arbitrary order (a late-discovered early slice lands behind
        // the watermark)
        assert(dest.toFile.setLastModified((i + 1) * 60000L))
        graft.sources.ArtifactCache.deleteRecursively(new java.io.File(tmp))
      }
      val schema = spark.read.parquet(inDir).schema
      def startQuery(availableNow: Boolean) = {
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val w = EventStream.sessionAgg(src).writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt).outputMode("append")
        (if (availableNow)
          w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        else
          w.trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(3000)))
          .start()
      }
      // phase 1: process the first micro-batch (file 0), then KILL
      val q1 = startQuery(availableNow = false)
      try {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (q1.recentProgress.forall(_.numInputRows == 0) &&
            System.nanoTime() < deadline) Thread.sleep(100)
        assert(q1.recentProgress.exists(_.numInputRows > 0),
          "first micro-batch never committed")
      } finally q1.stop()
      // phase 2: restart from the checkpoint; drain everything left.
      // (AvailableNow runs the extra no-data batch that flushes state
      // after the sentinel advances the watermark.)
      val q2 = startQuery(availableNow = true)
      q2.awaitTermination()
      val streamed = spark.read.parquet(outDir)
        .filter($"user_id" =!= -999L)
        .orderBy("user_id", "session_start")
        .collect().map(_.toString).toSeq
      val batch = EventStream.sessionAgg(spark.read.parquet(inDir))
        .filter($"user_id" =!= -999L)
        .orderBy("user_id", "session_start")
        .collect().map(_.toString).toSeq
      assert(streamed.nonEmpty)
      assert(streamed === batch,
        "resumed query must reproduce the batch sessions exactly (state recovered, no reprocessing)")
      // sessions genuinely span the kill point: at least one session's
      // [start, last] straddles the first slice boundary, so the resumed
      // run NEEDED recovered state to build it
      val spanning = spark.read.parquet(outDir)
        .filter($"user_id" =!= -999L)
        .filter($"session_start" <= lit(cut1) && $"session_last" > lit(cut1))
        .count()
      assert(spanning > 0, "test corpus must produce kill-point-spanning sessions")
    } finally {
      Seq(inDir, outDir, ckpt).foreach(d =>
        graft.sources.ArtifactCache.deleteRecursively(new java.io.File(d)))
    }
  }

  test("multi-restart endurance: 3 kill/resume cycles stay exactly-once and match batch") {
    // Recovery beyond a single kill: the stateful session query is
    // killed and resumed repeatedly over a maxFilesPerTrigger=1 drain,
    // and after EVERY cycle the file sink must show no duplicated
    // session (the _spark_metadata commit log is the exactly-once
    // mechanism this asserts) and monotonically growing output; the
    // final drain must equal the batch aggregation over all input.
    val inDir = java.nio.file.Files.createTempDirectory("graft-end-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-end-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-end-ckpt").toString
    try {
      val ev = graft.sources.Tables.events(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
      // getTime is ms-truncated vs the corpus's microsecond stamps:
      // round the max up 1 ms so the last slice includes the true
      // maximum event (same rule as graft.StreamEndurance)
      val Array(lo, hi) = ev.agg(min("ts"), max("ts")).collect()
        .flatMap(r => Array(r.getTimestamp(0).getTime, r.getTimestamp(1).getTime + 1))
      // 6 even time slices + a far-future sentinel in the last file so
      // append mode flushes every real session at the end
      val nSlices = 6
      val sentinelTs = new Timestamp(hi + 2 * 3600 * 1000L)
      val bounds = (0 to nSlices).map(i => lo + (hi - lo) * i / nSlices)
      val slices = (0 until nSlices).map { i =>
        val fromBound =
          if (i == 0) lit(true) else $"ts" > lit(new Timestamp(bounds(i)))
        val base = ev.filter(fromBound)
          .filter($"ts" <= lit(new Timestamp(bounds(i + 1))))
        if (i == nSlices - 1)
          base.unionByName(Seq((-999L, sentinelTs, -999L, "sentinel", 0.0))
            .toDF("event_id", "ts", "user_id", "event_type", "value"))
        else base
      }
      slices.zipWithIndex.foreach { case (s, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"graft-end-sl$i").toString
        s.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = java.nio.file.Paths.get(inDir, f"slice-$i%03d.parquet")
        java.nio.file.Files.move(part.toPath, dest)
        // FileStreamSource discovers by modification time; slices written
        // within the same millisecond would be drained in arbitrary order
        // and a late-discovered early slice lands behind the watermark —
        // pin strictly increasing mtimes so discovery order = time order
        assert(dest.toFile.setLastModified((i + 1) * 60000L))
        graft.sources.ArtifactCache.deleteRecursively(new java.io.File(tmp))
      }
      val schema = spark.read.parquet(inDir).schema
      def startQuery(availableNow: Boolean) = {
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val w = EventStream.sessionAgg(src).writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt).outputMode("append")
        (if (availableNow)
          w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        else
          w.trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(500)))
          .start()
      }
      def sinkSessions(): Seq[(Long, Timestamp)] =
        scala.util.Try(spark.read.parquet(outDir)
          .filter($"user_id" =!= -999L)
          .select("user_id", "session_start")
          .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq)
          .getOrElse(Seq.empty)
      var committedSoFar = 0
      var cyclesWithInput = 0
      for (_ <- 1 to 3) {
        val q = startQuery(availableNow = false)
        try {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (q.recentProgress.forall(_.numInputRows == 0) &&
              System.nanoTime() < deadline) Thread.sleep(50)
          if (q.recentProgress.exists(_.numInputRows > 0)) cyclesWithInput += 1
        } finally q.stop() // kill mid-drain
        val sessions = sinkSessions()
        assert(sessions.size === sessions.distinct.size,
          s"cycle output duplicated a session: ${sessions.size} rows, ${sessions.distinct.size} distinct")
        assert(sessions.size >= committedSoFar,
          "committed output must never shrink across restarts")
        committedSoFar = sessions.size
      }
      assert(cyclesWithInput >= 2,
        "endurance needs at least two cycles that genuinely resumed mid-input")
      // Watermark-restore subtlety (found by this test, verified in a
      // spark-shell replay): if a kill lands right after the batch that
      // carried the sentinel commits — before the NEXT batch writes its
      // offsets — the sentinel's max-event-time exists only in the dead
      // query's in-memory tracker. The restart restores the watermark
      // from the last committed batch's offset metadata (the PRE-sentinel
      // value) and never re-reads the consumed sentinel file, so with no
      // new data the final sessions sit in state forever and the drain
      // comes up short. Production streams re-advance the watermark with
      // the next arriving data; a finite-corpus drain must do the same.
      // The rule is packaged as EventStream.drainToCompletion (r10):
      // drain, detect short termination from the residual state-store
      // rows, inject a FRESH post-restart sentinel, re-drain — this
      // spec now runs ON the helper instead of restating the protocol.
      EventStream.drainToCompletion(
        () => startQuery(availableNow = true),
        injectSentinel = attempt => {
          val tmp2 = java.nio.file.Files.createTempDirectory("graft-end-s2").toString
          Seq((-999L, new Timestamp(hi + (3 + attempt) * 3600 * 1000L),
              -999L, "sentinel", 0.0))
            .toDF("event_id", "ts", "user_id", "event_type", "value")
            .coalesce(1).write.mode("overwrite").parquet(tmp2)
          val part2 = new java.io.File(tmp2).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dest2 = java.nio.file.Paths.get(inDir,
            f"slice-${nSlices + attempt}%03d.parquet")
          java.nio.file.Files.move(part2.toPath, dest2)
          // strictly-increasing mtimes, same rule as the kill slices
          assert(dest2.toFile.setLastModified((nSlices + 1 + attempt) * 60000L))
          graft.sources.ArtifactCache.deleteRecursively(new java.io.File(tmp2))
        })
      val streamed = spark.read.parquet(outDir)
        .filter($"user_id" =!= -999L)
        .orderBy("user_id", "session_start")
        .collect().map(_.toString).toSeq
      val batch = EventStream.sessionAgg(spark.read.parquet(inDir))
        .filter($"user_id" =!= -999L)
        .orderBy("user_id", "session_start")
        .collect().map(_.toString).toSeq
      assert(streamed.nonEmpty)
      assert(streamed === batch,
        "after N restarts the drained sink must equal the batch sessions exactly")
    } finally {
      Seq(inDir, outDir, ckpt).foreach(d =>
        graft.sources.ArtifactCache.deleteRecursively(new java.io.File(d)))
    }
  }

  test("foreachBatch receives each micro-batch with its id") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = EventStream.startForeachBatch(mem.toDF()) { (df, id) =>
      seen += ((id, df.count()))
    }
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(seen.map(_._1).distinct.size === seen.size, "batch ids are unique")
    assert(seen.map(_._2).sum > 0, "batches carry aggregated rows")
  }

  test("stream-stream join: purchases attach to clicks within the 1h window, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = EventStream.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      purchases.addData(Ev(100, ts("2024-01-01 09:30:00"), 1, "purchase", 5.0))
      clicks.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0))
      q.processAllAvailable()
      // cross-batch: a click arriving later still joins the earlier purchase
      clicks.addData(Ev(2, ts("2024-01-01 10:20:00"), 1, "click", 0.0))
      // out of window: purchase 2h before this click
      clicks.addData(Ev(3, ts("2024-01-01 11:40:00"), 1, "click", 0.0))
      // different user: no match
      clicks.addData(Ev(4, ts("2024-01-01 10:00:00"), 2, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_out").orderBy("click_id").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L),
        "clicks 1,2 join; click 3 out of window; click 4 wrong user")
      assert(rows.forall(_.getLong(3) === 100L))
    } finally q.stop()
  }

  test("last-click attribution: latest-click state, ts ties, window cutoff, cross-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.lastClickAttribution(mem.toDS())
      .writeStream.format("memory").queryName("lca_out")
      .outputMode("append").start()
    try {
      // batch 1 tops out at 10:30 so its watermark (10:20) stays BELOW
      // batch 2's on-time purchase — with event-time state eviction the
      // operator inherits the standard late-row drop, so a "cross-batch"
      // fixture must actually be on time
      mem.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
        Ev(2, ts("2024-01-01 10:10:00"), 1, "click", 0.0),   // later click wins
        Ev(3, ts("2024-01-01 10:10:00"), 1, "click", 0.0),   // ts tie: larger id wins
        Ev(10, ts("2024-01-01 10:30:00"), 1, "purchase", 5.0),
        Ev(20, ts("2024-01-01 09:00:00"), 2, "purchase", 1.0), // user 2 has no click
        // same-ts click and purchase: click processes first, attributable
        Ev(30, ts("2024-01-01 10:00:00"), 3, "click", 0.0),
        Ev(31, ts("2024-01-01 10:00:00"), 3, "purchase", 2.0))
      q.processAllAvailable()
      // cross-batch: the latest-click STATE carries; a later purchase
      // within the window of the remembered click still attributes,
      // while one past the window (12:30 vs click 10:10) drops
      mem.addData(
        Ev(12, ts("2024-01-01 10:40:00"), 1, "purchase", 9.0),
        Ev(11, ts("2024-01-01 12:30:00"), 1, "purchase", 7.0))
      q.processAllAvailable()
      val rows = spark.table("lca_out").orderBy("purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(4)))
      assert(rows.toSeq === Seq((10L, 3L), (12L, 3L), (31L, 30L)),
        "purchase->click: tie-winning click 3 attributes 10 and cross-batch 12; " +
          "same-ts click 30 attributes 31; out-of-window 11 and clickless 20 drop")
    } finally q.stop()
  }

  test("last-click attribution never attributes FORWARD: on-time purchase below the stored click drops") {
    // Cross-batch hazard (ADVICE r11): batch 1's last click (10:30)
    // overwrites the 10:00 click; batch 2 delivers an ON-TIME purchase
    // at 10:25 — above the restored watermark (10:20), below the stored
    // click. With only the lower window bound it would attribute to the
    // FUTURE 10:30 click, violating the latest-click-AT-OR-BEFORE
    // contract (and the oracle's c.ts <= p.ts predicate). The fix drops
    // it: its proper click (10:00) was overwritten — the documented
    // single-pass trade — but no row may ever carry click_ts > purchase_ts.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.lastClickAttribution(mem.toDS())
      .writeStream.format("memory").queryName("lca_fwd_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
        Ev(2, ts("2024-01-01 10:30:00"), 1, "click", 0.0))
      q.processAllAvailable()
      mem.addData(
        Ev(10, ts("2024-01-01 10:25:00"), 1, "purchase", 5.0), // below stored click: drop
        Ev(11, ts("2024-01-01 10:45:00"), 1, "purchase", 7.0)) // above it: attributes to 2
      q.processAllAvailable()
      val rows = spark.table("lca_fwd_out").orderBy("purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(4)))
      assert(rows.toSeq === Seq((11L, 2L)),
        "purchase 10 must drop (stored click is in its future); 11 attributes normally")
    } finally q.stop()
  }

  test("attribution-join guard prices candidates from the bucket histogram exactly") {
    // user 1: 3 clicks in the 10:00 hour bucket; purchases 2 in-bucket
    // + 1 in the adjacent 11:00 bucket → 3 × (2 + 1) = 9 candidates.
    // user 2's click and purchase sit 3 buckets apart → contributes 0.
    val ev = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 10:10:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 10:50:00"), 1L, "click", 0.0),
      (4L, ts("2024-01-01 10:20:00"), 1L, "purchase", 1.0),
      (5L, ts("2024-01-01 10:40:00"), 1L, "purchase", 2.0),
      (6L, ts("2024-01-01 11:30:00"), 1L, "purchase", 3.0),
      (7L, ts("2024-01-01 09:30:00"), 2L, "click", 0.0),
      (8L, ts("2024-01-01 12:30:00"), 2L, "purchase", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventStream.clickPurchaseCandidateCountOf(ev, 60) === 9L)
    // a same-timestamp hot key (the skew shape: clones share ONE
    // bucket) prices as clicks × purchases exactly
    val hot = Seq.tabulate(100)(i =>
        (i.toLong, ts("2024-01-01 10:00:00"), 1L,
          if (i < 40) "click" else "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventStream.clickPurchaseCandidateCountOf(hot, 60) === 40L * 60L)
    // and the state-scan price equals the same product on the hot shape
    assert(EventStream.clickPurchaseStateProductOf(hot) === 40L * 60L)
    // the two prices are DIFFERENT quantities: a click and purchase far
    // apart in time produce ZERO windowed candidates but a state product
    // of 1 (the purchase probe still scans the stored click) — the skew
    // shape scaled down (9 M windowed vs ~4×10⁸ worst-key stored)
    val apart = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 20:00:00"), 1L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventStream.clickPurchaseCandidateCountOf(apart, 60) === 0L)
    assert(EventStream.clickPurchaseStateProductOf(apart) === 1L)
  }

  test("attribution-join guard: refusal by mechanism names the linear interface; estimate bounds output") {
    // the corpus guard price must bound the true match count from above
    // (the windowed component alone already does; the state component
    // can only raise it) — over-pricing allowed, under-pricing never
    val price = math.max(
      EventStream.clickPurchaseCandidateCount(spark, sf),
      EventStream.clickPurchaseStateProduct(spark, sf))
    val matches = EventStream.clickAttributionViaStream(spark, sf).count()
    assert(price >= matches, s"guard price $price must bound $matches matches")
    // a budget below the price refuses BEFORE any stream starts,
    // from the guard (exception type), naming the linear escape hatch
    val e = intercept[graft.operators.PairExplosionException] {
      EventStream.clickAttributionViaStream(spark, sf,
        maxCandidatePairs = price - 1).count()
    }
    assert(e.getMessage.contains("lastClickAttribution"))
    assert(e.getMessage.contains("SPARK_GRAFT_MAX_PAIRS"))
    assert(e.getMessage.contains("state-scan product"))
    // exactly at the price → admitted (the guard is > not >=)
    assert(EventStream.clickAttributionViaStream(spark, sf,
      maxCandidatePairs = price).count() === matches)
  }

  test("stream-static join enriches events with a broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val profile = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = EventStream.enrichWithUserProfile(mem.toDF(), profile)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 10:01:00"), 3, "click", 1.0)) // no profile
      q.processAllAvailable()
      val rows = spark.table("enrich_out").orderBy("event_id").collect()
      assert(rows(0).getString(rows(0).fieldIndex("tier")) === "gold")
      assert(rows(1).isNullAt(rows(1).fieldIndex("tier")), "unknown user keeps null tier")
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.dedupedEvents(
        mem.toDF().withColumnRenamed("ts", "ts").select(
          $"event_id", $"ts", $"user_id", $"event_type", $"value"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(1, ts("2024-01-01 10:00:30"), 1, "click", 2.0)) // dup in-batch
      q.processAllAvailable()
      mem.addData(Ev(1, ts("2024-01-01 10:01:00"), 1, "click", 3.0)) // dup cross-batch
      mem.addData(Ev(2, ts("2024-01-01 10:02:00"), 1, "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").orderBy("event_id").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
      assert(rows(0).getDouble(4) === 1.0, "first occurrence wins")
    } finally q.stop()
  }

  test("stateful running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val rows = spark.table("running_out").as[UserRunning].collect()
      // last emission per user carries the cumulative totals
      val last = rows.groupBy(_.user_id).map { case (u, rs) =>
        u -> rs.maxBy(_.n_events)
      }
      assert(last(1L) === UserRunning(1L, 3L, 7.0))
      assert(last(2L) === UserRunning(2L, 2L, 8.0))
    } finally q.stop()
  }

  test("custom-state sessionizer: in-batch gap split + event-time timeout close") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.sessionizeWithTimeout(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("custom_sess_out")
      .outputMode("append").start()
    try {
      // one batch with an in-batch gap: 10:00,10:05 then 11:30 (85m gap)
      mem.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Ev(3, ts("2024-01-01 11:30:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val afterBatch1 = spark.table("custom_sess_out")
        .as[EventStream.ClosedSession].collect()
      assert(afterBatch1.map(s => (s.n_events, s.session_start)).toSeq ===
        Seq((2L, ts("2024-01-01 10:00:00"))), "in-batch gap closes first session")
      // advance watermark far past 11:30+30m → timeout closes the open session
      mem.addData(Ev(4, ts("2024-01-01 15:00:00"), 2, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(5, ts("2024-01-01 16:00:00"), 2, "click", 1.0))
      q.processAllAvailable()
      val all = spark.table("custom_sess_out")
        .as[EventStream.ClosedSession].filter(_.user_id == 1L).collect()
      assert(all.map(_.n_events).sorted.toSeq === Seq(1L, 2L),
        "timeout must emit the 11:30 singleton session")
    } finally q.stop()
  }

  test("custom-state sessionizer handles late events: in-gap extends start, far-late is its own session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.sessionizeWithTimeout(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("late_sess_out")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, ts("2024-01-01 12:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // 11:55 is late but inside the 10-min watermark: reaches state and
      // extends the session start backwards. 09:00 is far behind the
      // watermark: dropped by Spark before the state function (the
      // state-side far-late branch stays as defense for longer delays).
      mem.addData(
        Ev(2, ts("2024-01-01 11:55:00"), 1, "click", 1.0),
        Ev(3, ts("2024-01-01 09:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val closedEarly = spark.table("late_sess_out")
        .as[EventStream.ClosedSession].collect()
      assert(closedEarly.isEmpty, "far-late event is watermark-dropped, nothing closes yet")
      // close the open session via timeout and check the extended start
      mem.addData(Ev(4, ts("2024-01-01 15:00:00"), 2, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(5, ts("2024-01-01 16:00:00"), 2, "click", 1.0))
      q.processAllAvailable()
      val u1 = spark.table("late_sess_out")
        .as[EventStream.ClosedSession].filter(_.user_id == 1L).collect()
      assert(u1.length === 1)
      assert(u1(0).session_start === ts("2024-01-01 11:55:00"),
        "in-gap late event must extend session start backwards")
      assert(u1(0).n_events === 2L)
    } finally q.stop()
  }

  test("streaming session counts produce gap-separated sessions after watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.sessionCounts(mem.toDF())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val rows = spark.table("sess_out").orderBy("user_id", "session_start").collect()
      // user 1: 10:05+10:15 in one session (10min gap), 11:05 separate;
      // user 2: 10:45 and 11:20 separate (35min gap)
      assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
        Seq((1L, 2L), (1L, 1L), (2L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("file-source streaming tumbling equals the batch operator on real data") {
    // the driver-contract path: readStream over the events parquet,
    // AvailableNow to completion — must reproduce Events.tumblingHourly
    // row for row (same oracle as events_tumbling)
    val streamed = EventStream.tumblingViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = graft.operators.Events.tumblingHourly(spark, sf)
      .orderBy("window_start", "event_type")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("file-source streaming sliding window equals the batch operator on real data") {
    // overlapping windows come from the window operator's state, not
    // input duplication — must reproduce Events.slidingHourly row for
    // row (same oracle as events_sliding)
    val streamed = EventStream.slidingViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = graft.operators.Events.slidingHourly(spark, sf)
      .orderBy("window_start")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("file-source streaming sessionize equals the batch operator on real data") {
    // stateful session_window with merge state, drained to completion —
    // must reproduce Events.sessionize row for row (same oracle)
    val streamed = EventStream.sessionizeViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = graft.operators.Events.sessionize(spark, sf)
      .orderBy("user_id", "session_start")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("file-source stream-stream join equals the batch join on real data") {
    // two-sided join state (a streaming self-join on the events source),
    // drained to completion — must reproduce the batch range join
    import graft.functions.Deterministic.rd
    val streamed = EventStream.clickAttributionViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    val ev = graft.sources.Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"), rd(col("value"), 4).as("purchase_value"))
    val batch = c.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") - expr("interval 1 hour") &&
          col("purchase_ts") <= col("click_ts"))
      .select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")
      .orderBy("click_id", "purchase_id")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("file-source streaming dedup equals the batch DISTINCT on real data") {
    // dropDuplicates state drained to completion: the emitted key set
    // must equal the batch DISTINCT regardless of arrival order
    val streamed = EventStream.dedupViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")).as("hour_start"))
      .distinct()
      .orderBy("user_id", "event_type", "hour_start")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // and dedup actually removed something (keys repeat in the corpus)
    val raw = graft.sources.Tables.events(spark, sf).count()
    assert(streamed.length < raw)
  }

  test("RocksDB state store drains output-identical to the default in-heap store") {
    // Large drains switch providers on the source-bytes probe
    // (EventStream.drainStateProvider — the r10 100×-sweep OOM fix);
    // the provider must be an implementation detail. Force RocksDB at
    // fixture scale via the session conf (the drain only overrides the
    // conf ABOVE the probe threshold, so the forced value reaches the
    // query) and require bit-identical output from the stateful drain
    // classes: dropDuplicates state and windowed-agg state.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val inHeapDedup = EventStream.dedupViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    val inHeapTumbling = EventStream.tumblingViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocksDedup = EventStream.dedupViaStream(spark, sf)
        .collect().map(_.toString).toSeq
      val rocksTumbling = EventStream.tumblingViaStream(spark, sf)
        .collect().map(_.toString).toSeq
      assert(rocksDedup.nonEmpty && rocksDedup === inHeapDedup)
      assert(rocksTumbling.nonEmpty && rocksTumbling === inHeapTumbling)
    } finally spark.conf.unset(key)
  }

  test("file-source stream-static enrich equals the batch join on real data") {
    import graft.functions.Deterministic.{qsum, rd}
    val streamed = EventStream.staticEnrichViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    val ev = graft.sources.Tables.events(spark, sf)
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("user_events"))
    val batch = ev.join(dim, Seq("user_id"))
      .withColumn("band",
        when(col("user_events") >= 70, lit("heavy")).otherwise(lit("light")))
      .groupBy("event_type", "band")
      .agg(count(lit(1)).as("n"), rd(qsum(col("value"), 6), 4).as("sum_value"))
      .orderBy("event_type", "band")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("file-source stream-static doc dedup equals the batch index probe, statelessly") {
    import graft.operators.TextAnalysis.normText
    val streamed = EventStream.docDedupViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    val docs = graft.sources.Tables.documents(spark, sf)
    val prior = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(normText(col("text"))).as("fingerprint"), col("doc_id"))
      .groupBy("fingerprint").agg(min("doc_id").as("dup_of"))
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), md5(normText(col("text"))).as("fingerprint"))
      .join(prior, Seq("fingerprint"), "left_outer")
      .select(col("doc_id"), col("fingerprint"), col("dup_of"),
        col("dup_of").isNull.as("is_new"))
      .orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // every odd doc gets exactly one verdict — nothing dropped, nothing
    // duplicated by micro-batching (the query holds no state to get wrong)
    val nOdd = docs.filter(col("doc_id") % 2 === 1).count()
    assert(streamed.size.toLong === nOdd)
  }

  test("file-source stream-static CHUNK dedup equals the batch stored-index probe, statelessly") {
    // the streaming twin shares chunkVerdictsFrom/chunkNoveltyRollup
    // and the stored chunkKeeperIndex with the batch operator, so this
    // parity must hold row-for-row — including the foreachBatch per-doc
    // rollup being complete (a doc's chunk rows never span batches)
    val streamed = graft.streaming.EventStream.chunkDedupViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = graft.operators.Dedup.chunkDedupIncremental(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // one verdict per odd doc — nothing dropped or duplicated
    val nOdd = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1).count()
    assert(streamed.size.toLong === nOdd)
  }

  test("streaming classifier inference matches the batch scorer on the arriving half") {
    // stream-static scoring against the stored weight artifact: the
    // stream's foreachBatch runs the SAME classifierScoreWith code
    // path as the batch query, so parity must be exact row-for-row
    val streamed = graft.streaming.EventStream
      .classifierScoreViaStream(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = graft.operators.TextAnalysis.classifierScore(spark, sf)
      .filter(col("doc_id") % 2 === 1).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // one verdict per arriving doc — nothing dropped or duplicated
    val nOdd = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1).count()
    assert(streamed.size.toLong === nOdd)
  }

  test("docdedup endurance protocol: kill/resume over sliced documents stays exactly-once (fixture scale)") {
    // the SAME code path StreamEndurance's docdedup mode runs against a
    // longdoc corpus (slice by doc_id, fingerprint + dropDuplicates
    // state, kill/resume cycles, final sink == batch distinct
    // fingerprints) — pinned here at fixture scale so a protocol
    // regression fails in CI rather than only in the scaled dev run.
    // Every invariant lives inside runDocDedup as a require().
    StreamEndurance.runDocDedup(spark, sf, cycles = 3)
  }

  test("chunkdedup endurance protocol: kill/resume proves the foreachBatch spool's replay idempotence (fixture scale)") {
    // the batch-keyed overwrite claim in runToCompletion's spool sink,
    // exercised for real: a resumed micro-batch re-runs under the SAME
    // batchId and must overwrite its own subdir, so after every kill
    // the sink holds at most one verdict per doc and the final result
    // equals the registered batch probe. Invariants live inside
    // runChunkDedup as require()s; the scaled run is the dev main.
    StreamEndurance.runChunkDedup(spark, sf, cycles = 3)
  }

  test("row-scaled spool drain: an empty drain reads back as an empty frame with the plan schema") {
    // the parquet spool only has files if a batch emitted rows; the
    // read-back uses the plan's explicit schema so a drain with zero
    // output (here: no odd doc_ids arrive) yields an empty frame
    // instead of a schema-inference failure on an empty directory
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-drain-").toString
    Seq((2L, "alpha beta"), (4L, "gamma delta")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = EventStream.docDedupViaStream(spark, dir)
      assert(out.columns.toSeq === Seq("doc_id", "fingerprint", "dup_of", "is_new"))
      assert(out.count() === 0L)
    } finally graft.sources.ArtifactCache.deleteRecursively(new java.io.File(dir))
  }
}
