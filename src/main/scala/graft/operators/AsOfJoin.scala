package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Deterministic.rd
import graft.sources.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively
  * (DuckDB/Pandas/kdb all ship one). For each left row, attach the
  * latest right row with the same key and `right.ts <= left.ts`.
  *
  * Implementation is the scalable union-sort formulation, NOT a range
  * self-join: tag both sides, hash-partition by key, sort each partition
  * by (ts, side), and carry the most recent right-side payload forward
  * with `last(_, ignoreNulls = true)` over an unbounded-preceding
  * window. Cost: ONE shuffle of |L|+|R| rows and a per-partition sort —
  * versus the naive `L ⋈ R on key AND r.ts <= l.ts` which explodes to
  * O(|L|·|R|) per key before aggregation. At 100 TB the union-sort is
  * the only viable shape; it is also skew-safe per key group since the
  * window never materializes more than the running last value.
  *
  * Right rows sort BEFORE left rows at equal ts (side 0 < side 1), so
  * `<=` ties match — same convention as DuckDB's ASOF JOIN, which
  * serves as the oracle.
  */
object AsOfJoin {

  /** Generic as-of join.
    *
    * The right row's payload travels as ONE nullable struct, carried
    * forward atomically with a single `last(ignoreNulls)` — carrying the
    * columns independently would splice values from DIFFERENT right rows
    * whenever a payload field is legitimately NULL.
    *
    * @param left      left rows (probe side)
    * @param right     right rows (reference side)
    * @param keyCols   equi-key column names present on both sides
    * @param tsCol     event-time column name present on both sides
    * @param payload   right-side columns to attach (renamed as given)
    * @param tiebreak  optional right-side column ordering rows that share
    *                  (key, ts) — the greatest wins; without it such ties
    *                  are matched arbitrarily (as in DuckDB's ASOF)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payload: Map[String, String],
      tiebreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = payload.toSeq // (rightCol, outName)
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map { case (in, out) =>
        org.apache.spark.sql.types.StructField(out, right.schema(in).dataType)
      })

    // a non-integral tiebreak would cast to NULL and silently disable
    // the promised determinism — fail loudly instead
    tiebreak.foreach { tb =>
      val dt = right.schema(tb).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
          dt == org.apache.spark.sql.types.IntegerType,
        s"tiebreak column '$tb' must be integral, got ${dt.catalogString}")
    }

    val lp = left
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
      .withColumn("__payload", lit(null).cast(payloadType))
      .select(leftCols.map(col) ++ Seq(col("__side"), col("__tb"), col("__payload")): _*)
    val rp = right
      .withColumn("__side", lit(0))
      .withColumn("__tb", tiebreak.map(col).getOrElse(lit(0L)).cast("long"))
      .withColumn("__payload",
        struct(rightPayload.map { case (in, out) => col(in).as(out) }: _*))
      .select(keyCols.map(col) ++
        Seq(col(tsCol)) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__side"), col("__tb"), col("__payload")): _*)
      .select(lp.columns.map(col): _*) // align column order

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lp.unionByName(rp)
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map { case (_, out) => col(s"__matched.$out").as(out) }: _*)
  }

  /** Driver-contract query: for every click, the user's most recent
    * purchase at-or-before the click (classic attribution join). */
  def clickAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    asOf(clicks, purchases, Seq("user_id"), "ts",
      Map("purchase_ts" -> "last_purchase_ts", "purchase_value" -> "last_purchase_value"),
      tiebreak = Some("event_id"))
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"),
        col("last_purchase_ts"), rd(col("last_purchase_value"), 4).as("last_purchase_value"))
      .orderBy("event_id")
  }

  /** Click and (prefixed) purchase projections shared by every
    * attribution variant — one definition so the query family stays
    * comparable twins (schema/pruning edits apply everywhere at once).
    * NOTE the oracle-parity precondition the tiebreak protects:
    * duplicate (user_id, ts) purchases would leave DuckDB's ASOF tie
    * pick unspecified while the native operator resolves
    * deterministically (greatest tiebreak backward, smallest forward)
    * — `AsOfJoinSpec` asserts the fixture has no such ties, so a data
    * refresh that introduces them fails loudly instead of hash-red. */
  private def clicksOf(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
  private def purchasesOf(ev: DataFrame, pfx: String): DataFrame =
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as(s"${pfx}_user_id"), col("ts").as(s"${pfx}_ts"),
        col("event_id").as(s"${pfx}_event_id"), col("value").as(s"${pfx}_value"))

  /** Shared body of the three single-direction native variants. */
  private def nativeAttribution(spark: SparkSession, sfDir: String,
      tolerance: Option[Long], forward: Boolean,
      tsName: String, valName: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    graft.plans.AsOfJoinNative.asOf(
        clicksOf(ev), purchasesOf(ev, "p"),
        leftKeys = Seq("user_id"), rightKeys = Seq("p_user_id"),
        leftTime = "ts", rightTime = "p_ts",
        rightTiebreak = Some("p_event_id"),
        tolerance = tolerance, forward = forward)
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"),
        col("p_ts").as(tsName), rd(col("p_value"), 4).as(valName))
      .orderBy("event_id")
  }

  /** The same attribution join through the NATIVE whole-operator path
    * ([[graft.plans.AsOfJoinNative]]: custom LogicalPlan → Strategy →
    * merge-pass SparkPlan). Same output, same DuckDB oracle as
    * [[clickAttribution]] — the hash compare proves the custom physical
    * operator equals both the window formulation and DuckDB's ASOF
    * JOIN. The plan trades the union+window for one co-partitioned
    * merge: two key-hash exchanges (one per side), two sorts, O(1)
    * per-key state. */
  def clickAttributionNative(spark: SparkSession, sfDir: String): DataFrame =
    nativeAttribution(spark, sfDir, tolerance = None, forward = false,
      "last_purchase_ts", "last_purchase_value")

  /** Bounded-lookback attribution: only a purchase within `window` of
    * the click counts (pandas `merge_asof(tolerance=...)` semantics —
    * the form real attribution runs, where last year's purchase should
    * NOT claim today's click). Exercises the native operator's
    * tolerance: the latest prior purchase is found first and the window
    * check applies to IT, so an out-of-window latest yields NULLs even
    * when an older in-corpus purchase exists — which is what makes the
    * oracle a plain ASOF JOIN with a post-hoc window CASE. */
  def clickAttributionRecent(spark: SparkSession, sfDir: String,
      window: java.time.Duration = java.time.Duration.ofHours(6)): DataFrame =
    nativeAttribution(spark, sfDir,
      tolerance = Some(window.toNanos / 1000), // timestamp units: micros
      forward = false, "last_purchase_ts", "last_purchase_value")

  /** Conversion attribution — the FORWARD as-of: for each click, the
    * user's NEXT purchase within the conversion window ("did this click
    * convert, and to what"). The mirror image of [[clickAttributionRecent]]
    * through the same native operator with `forward = true`; the oracle
    * is DuckDB's ASOF with the inequality flipped (`p.ts >= c.ts`) and
    * the same post-hoc window CASE. */
  def clickConversion(spark: SparkSession, sfDir: String,
      window: java.time.Duration = java.time.Duration.ofHours(6)): DataFrame =
    nativeAttribution(spark, sfDir,
      tolerance = Some(window.toNanos / 1000),
      forward = true, "conversion_ts", "conversion_value")

  /** Nearest-purchase attribution — pandas `merge_asof`
    * `direction='nearest'` through the native operator's SINGLE-pass
    * nearest mode: one co-partitioned merge where the forward
    * candidate is the un-consumed right head of the backward pass
    * (see [[graft.plans.AsOfJoinPlan]]), so the plan carries ONE
    * exchange+sort pair per side. Replaces the round-8 composition of
    * separate backward+forward joins, which was correct but planned
    * two full exchange+sort pairs over the purchases side — 2× the
    * shuffle I/O for the same rows (the composed form survives as
    * [[clickNearestPurchaseComposed]], the differential-spec twin). */
  def clickNearestPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    graft.plans.AsOfJoinNative.asOf(
        clicksOf(ev), purchasesOf(ev, "p"),
        leftKeys = Seq("user_id"), rightKeys = Seq("p_user_id"),
        leftTime = "ts", rightTime = "p_ts",
        rightTiebreak = Some("p_event_id"), nearest = true)
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"),
        col("p_ts").as("nearest_ts"), rd(col("p_value"), 4).as("nearest_value"))
      .orderBy("event_id")
  }

  /** The round-8 two-pass composition of nearest (backward join, then
    * forward join, then a row-local distance CASE) — kept as the
    * independent implementation the randomized differential spec
    * checks [[clickNearestPurchase]] against. */
  def clickNearestPurchaseComposed(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = clicksOf(ev)
    def purchases(pfx: String) = purchasesOf(ev, pfx)
    val back = graft.plans.AsOfJoinNative.asOf(
      clicks, purchases("b"),
      leftKeys = Seq("user_id"), rightKeys = Seq("b_user_id"),
      leftTime = "ts", rightTime = "b_ts",
      rightTiebreak = Some("b_event_id"))
    val both = graft.plans.AsOfJoinNative.asOf(
      back, purchases("f"),
      leftKeys = Seq("user_id"), rightKeys = Seq("f_user_id"),
      leftTime = "ts", rightTime = "f_ts",
      rightTiebreak = Some("f_event_id"), forward = true)
    // closer match wins; equal distance → backward (pandas convention).
    // Distances in exact long microseconds, so the pick replays in SQL.
    val db = unix_micros(col("ts")) - unix_micros(col("b_ts"))
    val df_ = unix_micros(col("f_ts")) - unix_micros(col("ts"))
    val useBack = col("f_ts").isNull || (col("b_ts").isNotNull && db <= df_)
    both.select(col("event_id"), col("user_id"), col("ts").as("click_ts"),
        when(useBack, col("b_ts")).otherwise(col("f_ts")).as("nearest_ts"),
        rd(when(useBack, col("b_value")).otherwise(col("f_value")), 4)
          .as("nearest_value"))
      .orderBy("event_id")
  }
}
