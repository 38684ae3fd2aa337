package graft

/** Plan lint over EVERY registered query: catches accidental cartesian
  * products and driver-side explosions for current and future entries.
  * Queries that are quadratic BY DESIGN (exact all-pairs baselines) are
  * allow-listed explicitly — adding a new product join anywhere else
  * fails this suite. */
class PlanLintSpec extends SparkSpec {

  // exact all-pairs scans (documented baselines; the scale paths are
  // their LSH/IVF/banded siblings) and bounded dimension products
  // (hours × event types in the gap-filled series). dedup_embedding is
  // no longer exempt: the blocked self-join plans as two hash joins.
  // The PQ pair are broadcast-queries × streaming-corpus BY DESIGN too:
  // ADC scores every query against every CODE row (8 ints + 1 double
  // per vector, 32× smaller than the floats) in one corpus pass with
  // no shuffle — the |Q|·N product is the scoring itself, made cheap.
  // embedding_decontamination is the same broadcast-queries × streaming-
  // corpus product as ann_range_search: the |eval|·N scoring IS the
  // exact check, with a map-side partial max so nothing shuffles.
  // ann_incremental_assign is the same broadcast-C × delta product as
  // the IVF assignment pass it replays: |delta|·16 rounded cosines IS
  // the nearest-centroid rule, with no corpus shuffle.
  // ann_index_health is a C×C product over the 16-row centroid
  // artifact — the separation audit IS the pairwise compare; the
  // corpus is never touched.
  // ann_topk_ivfpq's product is ONLY its probe stage: |Q| broadcast
  // queries × the 16-row centroid artifact (ivf_topk's exact device);
  // the corpus-sized code scan below it is an equi-join on cluster.
  // stats_equidepth_histogram (and its GK-sketch _approx twin)
  // broadcasts a ONE-row boundary list onto the scan — the bucketing
  // fold is row-local; nothing quadratic.
  // ann_knn_join's product is its probe stage only: the corpus ×
  // broadcast C≈√N centroid artifact (the nearest-centroid rule, N·√N
  // rounded cosines, map-only); the neighbor search below it is an
  // equi-join on cluster.
  private val byDesignQuadratic = Set(
    "ann_topk_brute", "ann_topk_ivf", "ann_range_search",
    "events_dense_hourly", "ann_topk_pq_adc", "ann_topk_pq",
    "embedding_decontamination", "ann_incremental_assign",
    "ann_index_health", "ann_recall_curve", "ann_topk_ivfpq",
    "ann_topk_ivfpq_rerank", "stats_equidepth_histogram",
    "stats_equidepth_histogram_approx", "ann_knn_join")

  test("no registered query plans an accidental product join") {
    val offenders = SparkEntry.queries.toSeq.collect {
      case (name, fn) if !byDesignQuadratic(name) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val bad = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        (name, bad)
    }.filter(_._2).map(_._1)
    assert(offenders.isEmpty, s"product joins in: $offenders")
  }

  test("every query's plan builds and has output columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no output columns")
    }
  }

  test("every oracle key has a matching query key") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
}
