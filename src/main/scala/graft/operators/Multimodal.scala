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
