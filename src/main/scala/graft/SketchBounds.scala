package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{Events, Stats}

/** Dev tool: re-run the four sketch error-bound contracts (the specs'
  * assertions for the `no_oracle` queries — StatsSpec's HLL <10% and GK
  * rank guarantee, AsOfJoinSpec's rollup <5%) against an ARBITRARY data
  * directory, so the bounds can be verified at the ScaleUp stress
  * scales the fixture-pinned specs never reach. The sketch rows are the
  * only registry entries whose justification is an error bound rather
  * than a DuckDB hash; this makes that justification scale with the
  * rest of the evidence (25×/100× instead of sf0.1 only).
  *
  * Usage: runMain graft.SketchBounds <dataDir>
  * Prints one line per check with the measured max relative error /
  * max rank drift and the bound; exits nonzero if any bound is broken.
  */
object SketchBounds {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-sketch-bounds")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var failed = false
    def report(name: String, measured: Double, bound: Double, detail: String): Unit = {
      val ok = measured <= bound
      if (!ok) failed = true
      println(f"[sketch-bounds] $name%-28s measured=$measured%.5f bound=$bound%.5f ${if (ok) "OK" else "BROKEN"} ($detail)")
    }

    // 1. events_approx_distinct: HLL++ (rsd=0.05) per event_type vs the
    //    inline exact witness — the StatsSpec 10% contract.
    val ad = Events.approxDistinctUsers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val adErr = ad.map { case (_, a, e) => math.abs(a - e).toDouble / e }.max
    report("events_approx_distinct", adErr, 0.10,
      s"${ad.length} event types, exact up to ${ad.map(_._3).max}")

    // 2. events_distinct_rollup: union-of-daily HLL sketches vs exact —
    //    the AsOfJoinSpec 5% contract (mergeability must not cost
    //    accuracy beyond the sketch's own error).
    val dr = Events.distinctUsersViaSketchRollup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val drErr = dr.map { case (_, a, e) => math.abs(a - e).toDouble / e }.max
    report("events_distinct_rollup", drErr, 0.05,
      s"${dr.length} event types, exact up to ${dr.map(_._3).max}")

    // 3. stats_lineitem_columns_approx: per-column HLL n_distinct vs the
    //    exact explode twin — StatsSpec's 10% (with its max(1, ·) floor
    //    folded in by using the relative form only when exact > 10).
    val exact = Stats.lineitemColumnStats(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Stats.lineitemColumnStatsApprox(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    val colErr = approx.map { case (c, a) =>
      val e = exact(c).toDouble
      math.abs(a - e) / math.max(e, 10.0)
    }.max
    report("stats_lineitem_columns", colErr, 0.10,
      s"${approx.length} columns, max exact distinct ${exact.values.max}")

    // 4. stats_equidepth_histogram_approx: GK (accuracy=10000) bucket
    //    depths vs ideal n/10 — StatsSpec's rank guarantee with the same
    //    4x boundary-tie slack, expressed as a fraction of n so one
    //    number reads across scales.
    val eq = Stats.orderValueEquidepthApprox(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val n = eq.map(_._2).sum
    val drift = eq.map { case (_, cnt) => math.abs(cnt - n / 10).toDouble / n }.max
    report("stats_equidepth_gk", drift, 8.0 / 10000.0 + 10.0 / n,
      s"n=$n, depths ${eq.map(_._2).min}..${eq.map(_._2).max}")

    spark.stop()
    if (failed) sys.exit(1)
  }
}
