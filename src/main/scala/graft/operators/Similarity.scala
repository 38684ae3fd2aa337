package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Deterministic.rd
import graft.functions.VectorOps._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (dim 64, `array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact baseline. Query set × corpus cross join
  *    with the query side broadcast — at 100 TB the corpus side streams
  *    through executors exactly once, no shuffle of the corpus at all;
  *    per-partition top-k heaps (TakeOrderedAndProject after the window
  *    filter) keep driver traffic at k rows per query.
  *  - [[lshTopK]]: the scale path — sign-random-projection (SimHash for
  *    vectors) bucketing. Each vector computes a 16-bit signature from
  *    fixed random hyperplanes; candidates are pairs sharing any of four
  *    4-bit bands; ranking happens only within candidates. Cost drops
  *    from O(|Q|·N) to O(collisions); recall is tested against the
  *    brute-force baseline.
  */
object Similarity {

  /** Fixed random hyperplanes (seed 42): 64 planes × 64 dims → a 64-bit
    * signature banded as 16 bands × 4 bits. Sized for this corpus's
    * worst case: it is near-uniform (top-10 neighbors sit at cosine
    * ≈0.35–0.5, i.e. ~65–70°, where the per-plane agreement probability
    * is only ~0.61–0.65), so recall ≥0.8 needs 1−(1−p⁴)¹⁶ — sixteen
    * 4-bit bands. The price is a high candidate rate (~60% of the
    * corpus per query here); on clustered real embeddings the same
    * banding yields both high recall and low candidate rate. When the
    * corpus has no similarity structure, IVF (ivfTopK) is the better
    * cost/recall dial — both are registered. */
  private val NumPlanes = 64
  private val NumBands = 16
  private val BandBits = NumPlanes / NumBands // 4
  private val Dim = 64
  private lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  /** Exact top-k cosine neighbors for each query vector (vec_id <
    * numQueries), excluding self. Deterministic: ranked by rounded
    * cosine, ties by neighbor id. */
  def bruteForceTopK(spark: SparkSession, sfDir: String,
      k: Int = 10, numQueries: Int = 20): DataFrame = {
    val emb = normalizedEmbeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("e_q"), col("nrm").as("n_q"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("e").as("e_c"), col("nrm").as("n_c"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        rd(cosine(col("e_q"), col("n_q"), col("e_c"), col("n_c")), 4).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** 64-bit sign-random-projection signature per embedding. */
  def signatures(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = normalizedEmbeddings(spark, sfDir)
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(col("e"), planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    emb.withColumn("sig", bits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** The SRP signature INDEX: (vec_id, sig) materialized once per corpus
    * snapshot and read back by every query (write-then-reuse, same
    * surface as the dedup pair table). At scale the index is ids +
    * 8-byte signatures — a tiny fraction of the corpus — and queries
    * join it back to the vectors they actually rank, instead of
    * recomputing 64 hyperplane dot products per vector per query. */
  def signatureIndex(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.ArtifactCache.readOrWrite(spark, "srp-sig",
      s"$sfDir|$NumPlanes", s"$sfDir/embeddings.parquet")(
      signatures(spark, sfDir).select("vec_id", "sig"))

  /** Nearest-centroid assignment: (vec_id, e, nrm, cluster) for every
    * vector, ranked by rounded cosine (ties to the lower cent_id) — the
    * one deterministic assignment rule shared by training, indexing and
    * probing, so the DuckDB oracle can replay all three identically. */
  private def assignToCentroids(vecs: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(desc("csim"), asc("cent_id"))
    vecs.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("e"), col("nrm"), col("cent_id"),
        rd(cosine(col("e"), col("nrm"), col("e_cent"), col("n_cent")), 6).as("csim"))
      .withColumn("arn", row_number().over(w))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("e"), col("nrm"), col("cent_id").as("cluster"))
  }

  /** Deterministic k-means training for the IVF coarse quantizer:
    * centroids initialize as the first `numCentroids` vectors and take
    * `iters` Lloyd steps (assign to nearest centroid by rounded cosine,
    * recompute each centroid as the element-wise mean of its members).
    *
    * Every arithmetic step is cross-engine exact so a DuckDB oracle can
    * replay the whole training loop: assignment ranks on rd(cosine, 6);
    * the mean is the qavg quantized form (per-row floor to 1e-6 units,
    * exact BIGINT sum — order- and partition-count-independent); the new
    * norm is the LTR double sum of squares. A cluster that loses all
    * members simply drops out (both engines emit no group).
    *
    * Cost at scale: per iteration one broadcast-C map pass over N vectors
    * plus a (C×dim)-key aggregation — linear, no shuffle of the vectors
    * themselves beyond the 64-rows-per-vector dim explode. The trained
    * centroids are `localCheckpoint`ed: C rows, reused by both the index
    * and probe sides without replaying the training lineage. */
  def trainedCentroids(spark: SparkSession, sfDir: String,
      numCentroids: Int = 16, iters: Int = 2): DataFrame = {
    val emb = normalizedEmbeddings(spark, sfDir)
    var cent = emb.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("e_cent"), col("nrm").as("n_cent"))
    for (_ <- 1 to iters) {
      val assigned = assignToCentroids(emb, cent)
      val dimMeans = assigned
        .select(col("cluster"), posexplode(col("e")))
        .groupBy(col("cluster"), col("pos"))
        .agg(graft.functions.Deterministic.qavg(col("col").cast("double"), 6).as("val"))
      cent = dimMeans
        .groupBy(col("cluster").as("cent_id"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("val")))),
          s => s.getField("val")).as("e_cent"))
        .withColumn("n_cent", l2Norm(col("e_cent")))
    }
    cent.localCheckpoint()
  }

  /** The trained IVF coarse quantizer as a stored artifact: (cent_id,
    * e_cent, n_cent), trained once per corpus snapshot and read back by
    * indexing and probing alike. C rows — broadcast-sized by design. */
  def centroidIndex(spark: SparkSession, sfDir: String,
      numCentroids: Int = 16, iters: Int = 2): DataFrame =
    graft.sources.ArtifactCache.readOrWrite(spark, "ivf-centroids",
      s"$sfDir|$numCentroids|$iters", s"$sfDir/embeddings.parquet")(
      trainedCentroids(spark, sfDir, numCentroids, iters))

  /** The IVF assignment INDEX: (vec_id, cluster) against the stored
    * centroids, materialized once per corpus snapshot. Queries join it
    * back to the vectors by id — the posting-list shape of a real IVF
    * index (ids per cell), not a copy of the corpus. */
  def assignmentIndex(spark: SparkSession, sfDir: String,
      numCentroids: Int = 16, iters: Int = 2): DataFrame =
    graft.sources.ArtifactCache.readOrWrite(spark, "ivf-assign",
      s"$sfDir|$numCentroids|$iters", s"$sfDir/embeddings.parquet")(
      assignToCentroids(normalizedEmbeddings(spark, sfDir),
        centroidIndex(spark, sfDir, numCentroids, iters)
          .select(col("cent_id"), col("e_cent"), col("n_cent")))
        .select(col("vec_id"), col("cluster")))

  /** IVF-style ANN: coarse quantization with k-means-trained centroids
    * (deterministic seeded training, see [[trainedCentroids]]), vectors
    * assigned to their nearest centroid, queries probing the `nprobe`
    * nearest cells. Unlike LSH this is fully SQL-expressible — the
    * oracle replays training, assignment and search end-to-end.
    * Cost: assignment is |N|×C (tiny C), search is |Q|×(probed cells) —
    * the classic recall/cost dial via nprobe. The default nprobe=8/16
    * is sized for this near-uniform synthetic corpus (recall@10 ≈ 0.92;
    * neighbors spread across cells, so half the cells must be probed);
    * clustered real embeddings reach the same recall at much lower
    * nprobe — the dial, not the plan, changes. */
  def ivfTopK(spark: SparkSession, sfDir: String, k: Int = 10,
      numQueries: Int = 20, numCentroids: Int = 16, nprobe: Int = 8,
      trainIters: Int = 2): DataFrame = {
    val emb = normalizedEmbeddings(spark, sfDir)
    // both halves of the index are stored artifacts (train/assign once
    // per corpus snapshot); the query only joins vectors back by id
    val cent = centroidIndex(spark, sfDir, numCentroids, trainIters)
    val assigned = assignmentIndex(spark, sfDir, numCentroids, trainIters)
      .join(emb, Seq("vec_id"))
      .select(col("vec_id"), col("e"), col("nrm"), col("cluster"))
    // probe list: nprobe nearest centroids per query
    val wProbe = Window.partitionBy("query_id").orderBy(desc("csim"), asc("cent_id"))
    val probes = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("e_q"), col("nrm").as("n_q"))
      .crossJoin(broadcast(cent))
      .select(col("query_id"), col("e_q"), col("n_q"), col("cent_id"),
        rd(cosine(col("e_q"), col("n_q"), col("e_cent"), col("n_cent")), 6).as("csim"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("e_q"), col("n_q"), col("cent_id").as("cluster"))
    // search only the probed cells
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    probes.join(assigned
        .select(col("vec_id").as("neighbor_id"), col("e").as("e_c"),
          col("nrm").as("n_c"), col("cluster")), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        rd(cosine(col("e_q"), col("n_q"), col("e_c"), col("n_c")), 4).as("cosine"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Prototypicality profile (the SSL-prototypes pruning signal,
    * Sorscher et al. 2022 "Beyond neural scaling laws"): each vector's
    * cosine to its OWN cell centroid, plus its rank within the cell.
    * High-cosine members are prototypical (safe to prune when data is
    * abundant); low-cosine members are the hard/outlier examples worth
    * keeping. Rounds out the embedding-curation story on the same
    * stored quantizer: IVF search probes cells, SemDeDup dedups within
    * cells, this scores membership itself.
    *
    * Scale shape: C centroids broadcast, one map pass over the corpus
    * (no vector shuffle), then one window keyed by cluster. C is the
    * parallelism of the window stage — production runs C in the tens
    * of thousands (same dial as IVF), so cells are both small and
    * numerous. Oracle replays training + assignment + scoring in SQL,
    * ranking on the ROUNDED cosine so both engines break ties
    * identically (then by vec_id). */
  def prototypicality(spark: SparkSession, sfDir: String,
      numCentroids: Int = 16, trainIters: Int = 2): DataFrame = {
    val emb = normalizedEmbeddings(spark, sfDir)
    val cent = centroidIndex(spark, sfDir, numCentroids, trainIters)
      .select(col("cent_id").as("cluster"), col("e_cent"), col("n_cent"))
    val w = Window.partitionBy("cluster").orderBy(desc("proto_cos"), asc("vec_id"))
    assignmentIndex(spark, sfDir, numCentroids, trainIters)
      .join(emb, Seq("vec_id"))
      .join(broadcast(cent), Seq("cluster"))
      .select(col("vec_id"), col("cluster"),
        rd(cosine(col("e"), col("nrm"), col("e_cent"), col("n_cent")), 4)
          .as("proto_cos"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .orderBy("cluster", "rk")
  }

  /** Cosine RANGE search: every corpus vector within similarity `tau` of
    * each query vector — the radius-query twin of top-k (retrieval wants
    * "the best k"; dedup/recall audits want "everything this close").
    * Same scale shape as [[bruteForceTopK]]: the query side is broadcast
    * and the corpus streams through executors exactly once with the
    * threshold filter fused into the scan projection — no corpus shuffle,
    * no rank window (range search needs no ordering to decide membership;
    * the final sort is presentation only). For standing high-volume query
    * sets, the banded/IVF paths bound the candidate set the same way they
    * do for top-k. */
  def rangeSearch(spark: SparkSession, sfDir: String,
      tau: Double = 0.3, numQueries: Int = 20): DataFrame = {
    val emb = normalizedEmbeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("e_q"), col("nrm").as("n_q"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("e").as("e_c"), col("nrm").as("n_c"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        rd(cosine(col("e_q"), col("n_q"), col("e_c"), col("n_c")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
      .orderBy("query_id", "neighbor_id")
  }

  /** ANN top-k via LSH banding: 16 bands × 4 bits; pairs sharing any band
    * are candidates; exact cosine ranks candidates only. Same output
    * schema as brute force; recall < 1 by construction (≥0.8 asserted
    * in SimilaritySpec against the brute-force baseline). */
  def lshTopK(spark: SparkSession, sfDir: String,
      k: Int = 10, numQueries: Int = 20): DataFrame = {
    // read the stored signature index; join vectors back by id
    val sig = normalizedEmbeddings(spark, sfDir)
      .join(signatureIndex(spark, sfDir), Seq("vec_id"))
    def banded(df: DataFrame, prefix: String): DataFrame =
      df.select(col("vec_id").as(s"${prefix}_id"), col("e").as(s"e_$prefix"),
          col("nrm").as(s"n_$prefix"), col("sig"))
        .select(col(s"${prefix}_id"), col(s"e_$prefix"), col(s"n_$prefix"),
          posexplode(expr(
            s"transform(sequence(0, ${NumBands - 1}), b -> (sig >> (b * $BandBits)) & ${(1 << BandBits) - 1})")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_val")
    val q = banded(sig.filter(col("vec_id") < numQueries), "query")
    val c = banded(sig, "neighbor")
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    q.join(c, Seq("band", "band_val"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        rd(cosine(col("e_query"), col("n_query"), col("e_neighbor"), col("n_neighbor")), 4).as("cosine"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .orderBy("query_id", "rank")
  }
}
