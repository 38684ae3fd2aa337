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
    * @param left      left rows (probe side)
    * @param right     right rows (reference side)
    * @param keyCols   equi-key column names present on both sides
    * @param tsCol     event-time column name present on both sides
    * @param payload   right-side columns to attach (renamed as given)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = payload.toSeq // (rightCol, outName)

    val l = left
      .withColumn("__side", lit(1))
      .select(leftCols.map(col) ++
        Seq(col("__side")) ++
        rightPayload.map { case (_, out) => lit(null).as(s"__r_$out") }: _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(keyCols.map(col) ++
        Seq(col(tsCol)) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__side")) ++
        rightPayload.map { case (in, out) => col(in).as(s"__r_$out") }: _*)
      .select(l.columns.map(col): _*) // align column order

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .select(col("*") +: rightPayload.map { case (_, out) =>
        last(col(s"__r_$out"), ignoreNulls = true).over(w).as(out)
      }: _*)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightPayload.map { case (_, out) => col(out) }: _*)
  }

  /** Driver-contract query: for every click, the user's most recent
    * purchase at-or-before the click (classic attribution join). */
  def clickAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    asOf(clicks, purchases, Seq("user_id"), "ts",
      Map("purchase_ts" -> "last_purchase_ts", "purchase_value" -> "last_purchase_value"))
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"),
        col("last_purchase_ts"), rd(col("last_purchase_value"), 4).as("last_purchase_value"))
      .orderBy("event_id")
  }
}
