package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.rd
import graft.sources.Tables

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: blobs travel as opaque `binary` columns next to typed
  * metadata, and decode/feature-extraction runs per-partition over a
  * typed Dataset — the Spark-side plumbing (schema, encoders, partition
  * batching, feature schema) is real and tested.
  *
  * The actual codec call is STUBBED (this container ships no image/audio
  * libraries): [[decodeStub]] derives deterministic pseudo-features from
  * the bytes. In production the body of decodeStub is the only thing
  * that changes (JNI/FFmpeg/libjpeg call per element); the dataflow —
  * `Dataset[MediaBlob].mapPartitions(_.map(decode))` — is exactly how
  * the real thing runs, with one decoder init per partition, not per
  * row.
  *
  * Scale: blobs never shuffle — featurization is a map-only stage; only
  * the small typed feature rows move downstream. At 100 TB of media the
  * scan parallelism comes from parquet row-groups and
  * `files.maxPartitionBytes`, and decode cost dominates, which is why
  * the per-partition (not per-row) iteration matters.
  */
object Multimodal {

  case class MediaBlob(doc_id: Long, modality: String, blob: Array[Byte])
  case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, sample_rate: Int, checksum: String)

  /** Blob table derived from `documents`: the text bytes stand in for
    * media payloads (modality assigned round-robin). In a real pipeline
    * this is a parquet table with a true binary column; everything
    * downstream treats `blob` as opaque bytes either way. */
  def blobTable(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        encode(col("text"), "UTF-8").as("blob"))
      .as[MediaBlob]
  }

  /** STUB decode — deterministic pseudo-features from the raw bytes.
    * Production replaces this body with the real codec; the signature
    * and everything around it stay. */
  def decodeStub(b: MediaBlob): MediaFeatures = {
    val n = b.blob.length
    val first = b.blob.headOption.map(_ & 0xff).getOrElse(0)
    val isVisual = b.modality == "image" || b.modality == "video"
    val md = java.security.MessageDigest.getInstance("MD5")
    val checksum = md.digest(b.blob).map("%02x".format(_)).mkString
    MediaFeatures(
      doc_id = b.doc_id,
      modality = b.modality,
      n_bytes = n,
      width = if (isVisual) 64 + ((n * 3 + first) % 1856) else 0,
      height = if (isVisual) 64 + ((n * 5 + first) % 1016) else 0,
      n_frames = b.modality match {
        case "video" => 1 + (n % 240)
        case "image" => 1
        case _       => 0
      },
      sample_rate = if (b.modality == "audio") 8000 + (first % 8) * 4000 else 0,
      checksum = checksum)
  }

  /** Feature extraction: one decoder pass per partition over the typed
    * blob stream. */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition init goes here in production (decoder contexts,
      // native buffers); the stub needs none
      it.map(decodeStub)
    }
  }

  /** Driver-contract query: featurize the corpus, total order. */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(blobTable(spark, sfDir)).orderBy("doc_id").toDF()

  /** Frame-sampling + resize PLAN for the video slice: for each video,
    * the uniform frame indices a decoder should fetch (floor(k·n/ns),
    * ns = min(targetFrames, n_frames) — the standard uniform-sample
    * formula) with their timestamps, and the aspect-preserving resize
    * target (long side capped at `maxDim`, other side by exact integer
    * division). This is the planning half of video ingestion: pure
    * integer arithmetic over the feature rows — the manifest is
    * computed WITHOUT touching blob bytes, so at 100 TB the expensive
    * seek+decode runs once per PLANNED frame instead of per stored
    * frame, and the plan itself is a map-only stage the oracle replays
    * exactly (no codecs, no floats). The decode that consumes this
    * manifest is [[extractFeatures]]'s per-partition rung. */
  def frameSamplePlan(spark: SparkSession, sfDir: String,
      targetFrames: Int = 8, maxDim: Int = 224, fps: Int = 24): DataFrame = {
    val vids = extractFeatures(blobTable(spark, sfDir)).toDF()
      .filter(col("modality") === "video")
      .withColumn("ns", least(lit(targetFrames), col("n_frames")))
    vids
      .select(col("doc_id"), col("n_frames"), col("width"), col("height"),
        explode(expr("transform(sequence(0, ns - 1), k -> (k * n_frames) div ns)"))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        expr(s"CAST((frame_idx * 1000) div $fps AS INT)").as("ts_ms"),
        expr(s"""CAST(CASE WHEN width <= $maxDim AND height <= $maxDim THEN width
                 WHEN width >= height THEN $maxDim
                 ELSE (width * $maxDim) div height END AS INT)""").as("out_w"),
        expr(s"""CAST(CASE WHEN width <= $maxDim AND height <= $maxDim THEN height
                 WHEN width >= height THEN (height * $maxDim) div width
                 ELSE $maxDim END AS INT)""").as("out_h"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Exact payload dedup over the opaque blob column: content-checksum
    * groups — the multimodal twin of [[graft.operators.Dedup.exact]]
    * (same group-per-fingerprint shape), and the first pass of any
    * media ingestion: identical BYTES are identical content no matter
    * which modality label they arrived under, so the group also counts
    * distinct modalities (a >1 value flags mislabeled payloads). Only
    * the 16-byte checksum shuffles; blob bytes never leave their
    * partition. */
  def blobDedup(spark: SparkSession, sfDir: String): DataFrame =
    blobDedupOf(blobTable(spark, sfDir).toDF())

  /** [[blobDedup]] over any (doc_id, modality, blob) frame. */
  def blobDedupOf(blobs: DataFrame): DataFrame =
    blobs
      .select(col("doc_id"), col("modality"), md5(col("blob")).as("checksum"))
      .groupBy("checksum")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"),
        countDistinct(col("modality")).as("n_modalities"))
      .orderBy("canonical_id")

  /** Rollup over extracted features — the typical "what's in this
    * corpus" audit: per modality, count/bytes/dimension stats. */
  def modalitySummary(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(blobTable(spark, sfDir)).toDF()
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n_blobs"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        rd(avg("width"), 4).as("avg_width"),
        rd(avg("height"), 4).as("avg_height"),
        max("n_frames").as("max_frames"))
      .orderBy("modality")
}
