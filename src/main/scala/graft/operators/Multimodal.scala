package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.rd
import graft.sources.Tables

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: blobs travel as opaque `binary` columns next to typed
  * metadata, and decode/feature-extraction runs per-partition over a
  * typed Dataset — the Spark-side plumbing (schema, encoders, partition
  * batching, feature schema) is real and tested.
  *
  * The blob is a REAL byte format — the GRFT container:
  * {{{
  *   offset  size  field
  *   0       4     magic 0x47524654 ("GRFT"), big-endian
  *   4       1     version (0x01)
  *   5       1     modality code (0=image, 1=audio, 2=video)
  *   6       4     width        (big-endian int)
  *   10      4     height
  *   14      4     n_frames
  *   18      4     sample_rate
  *   22      4     payload length
  *   26      n     payload bytes
  *   26+n    16    MD5 of the payload
  * }}}
  * [[decode]] parses and VALIDATES the container for real: magic,
  * version, length accounting, and the payload checksum are all
  * checked, and the dims come off the header bytes, not a formula. What
  * stays synthetic is only the payload (document text bytes stand in
  * for compressed media, since this environment ships no codec
  * libraries) and the header values, which the encoder derives
  * deterministically from the payload so the driver's SQL oracle can
  * replay the expected features end to end. In production the payload
  * parse becomes the JNI/FFmpeg/libjpeg call; the container walk,
  * dataflow — `Dataset[MediaBlob].mapPartitions(_.map(decode))` — and
  * one-decoder-init-per-partition shape are exactly how the real thing
  * runs.
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

  /** GRFT container framing constants (layout in the object Scaladoc). */
  val Magic = 0x47524654 // "GRFT"
  val Version = 1
  val HeaderLen = 26
  val TrailerLen = 16

  private val codeOf = Map("image" -> 0, "audio" -> 1, "video" -> 2)
  private val modalityOf = codeOf.map(_.swap)

  /** Magic as the 8-hex-char string the SQL pack/parse expressions use
    * (single source of truth with the int constant). */
  private val MagicHex = "%08X".format(Magic)

  /** Expression: payload length parsed from a GRFT container column
    * (4 big-endian bytes at offset 22; substr is 1-based). */
  private def payloadLenExpr(blob: Column): Column =
    conv(hex(blob.substr(lit(HeaderLen - 3), lit(4))), 16, 10)

  /** Expression: does the container column open with the GRFT magic? */
  private def magicOkExpr(blob: Column): Column =
    hex(blob.substr(lit(1), lit(4))) === lit(MagicHex)

  /** Expression: big-endian int parsed from 4 container bytes at the
    * given 0-based offset (substr is 1-based). */
  private def beIntExpr(blob: Column, offset: Int): Column =
    conv(hex(blob.substr(lit(offset + 1), lit(4))), 16, 10)

  /** Aspect-preserving resize target (long side capped at `maxDim`,
    * other side by exact integer division) as (out_w, out_h) SQL
    * expressions over `width`/`height` columns — shared by the frame
    * PLAN and its EXEC so the two can never disagree. */
  private def resizeExprs(maxDim: Int): (Column, Column) = (
    expr(s"""CAST(CASE WHEN width <= $maxDim AND height <= $maxDim THEN width
             WHEN width >= height THEN $maxDim
             ELSE (width * $maxDim) div height END AS INT)"""),
    expr(s"""CAST(CASE WHEN width <= $maxDim AND height <= $maxDim THEN height
             WHEN width >= height THEN (height * $maxDim) div width
             ELSE $maxDim END AS INT)"""))

  /** Header feature values, derived deterministically from the payload
    * (this is the synthetic stand-in for what a real encoder would know
    * about its media): (width, height, n_frames, sample_rate). */
  private def headerDims(modality: String, payload: Array[Byte]): (Int, Int, Int, Int) = {
    val n = payload.length
    val first = payload.headOption.map(_ & 0xff).getOrElse(0)
    val isVisual = modality == "image" || modality == "video"
    (if (isVisual) 64 + ((n * 3 + first) % 1856) else 0,
      if (isVisual) 64 + ((n * 5 + first) % 1016) else 0,
      modality match {
        case "video" => 1 + (n % 240)
        case "image" => 1
        case _       => 0
      },
      if (modality == "audio") 8000 + (first % 8) * 4000 else 0)
  }

  /** JVM-side container encoder — the byte-for-byte twin of the SQL
    * construction in [[blobTable]] (MultimodalSpec asserts they agree),
    * and the writer a single-node ingest tool would use. */
  def packContainer(modality: String, payload: Array[Byte]): Array[Byte] = {
    val (w, h, f, r) = headerDims(modality, payload)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(payload)
    java.nio.ByteBuffer.allocate(HeaderLen + payload.length + TrailerLen)
      .putInt(Magic).put(Version.toByte)
      .put(codeOf(modality).toByte)
      .putInt(w).putInt(h).putInt(f).putInt(r)
      .putInt(payload.length)
      .put(payload).put(md5)
      .array()
  }

  /** Blob table derived from `documents`: each text's bytes are packed
    * into a GRFT container (modality assigned round-robin). The
    * container is assembled with pure SQL expressions — header ints as
    * zero-padded hex, `unhex` to bytes, binary `concat` — so the pack
    * runs codegen'd inside the scan stage and the driver's oracle can
    * reproduce every byte. In a real pipeline this is a parquet table
    * with a true binary column; everything downstream treats `blob` as
    * opaque bytes either way. */
  def blobTable(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    def be32(c: Column): Column = lpad(hex(c), 8, "0")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n", length(col("payload")))
      .withColumn("first", when(col("n") === 0, lit(0))
        .otherwise(conv(hex(substring(col("payload"), 1, 1)), 16, 10).cast("int")))
      .withColumn("visual", col("modality").isin("image", "video"))
    docs
      .withColumn("width",
        when(col("visual"), lit(64) + (col("n") * 3 + col("first")) % 1856).otherwise(0))
      .withColumn("height",
        when(col("visual"), lit(64) + (col("n") * 5 + col("first")) % 1016).otherwise(0))
      .withColumn("n_frames",
        when(col("modality") === "video", lit(1) + col("n") % 240)
          .when(col("modality") === "image", lit(1)).otherwise(0))
      .withColumn("sample_rate",
        when(col("modality") === "audio", lit(8000) + (col("first") % 8) * 4000)
          .otherwise(0))
      .select(col("doc_id"), col("modality"),
        concat(
          unhex(concat(
            lit(MagicHex), lit("%02X".format(Version)),
            when(col("modality") === "image", "00")
              .when(col("modality") === "audio", "01").otherwise("02"),
            be32(col("width")), be32(col("height")),
            be32(col("n_frames")), be32(col("sample_rate")),
            be32(col("n")))),
          col("payload"),
          unhex(md5(col("payload")))).as("blob"))
      .as[MediaBlob]
  }

  /** Parse + validate a GRFT container. Every structural invariant is
    * checked — magic, version, known modality code, agreement with the
    * metadata column, length accounting, and the payload MD5 against
    * the trailer — so a corrupted or truncated blob fails loudly here
    * instead of producing silently wrong features (a real pipeline
    * routes these to a quarantine sink; MultimodalSpec asserts single-
    * byte corruption is caught). `n_bytes` is the PAYLOAD length — the
    * content size, not the container overhead. */
  def decode(b: MediaBlob): MediaFeatures = {
    def bad(msg: String) =
      throw new IllegalArgumentException(s"doc ${b.doc_id}: $msg")
    if (b.blob.length < HeaderLen + TrailerLen) bad("truncated container")
    val buf = java.nio.ByteBuffer.wrap(b.blob)
    if (buf.getInt(0) != Magic) bad(f"bad magic 0x${buf.getInt(0)}%08x")
    if (buf.get(4) != Version.toByte) bad(s"unsupported version ${buf.get(4)}")
    val modality = modalityOf.getOrElse(buf.get(5) & 0xff,
      bad(s"unknown modality code ${buf.get(5)}"))
    if (modality != b.modality)
      bad(s"container says $modality, metadata says ${b.modality}")
    val plen = buf.getInt(22)
    if (plen != b.blob.length - HeaderLen - TrailerLen)
      bad(s"payload length $plen vs ${b.blob.length - HeaderLen - TrailerLen} actual")
    val payload = java.util.Arrays.copyOfRange(b.blob, HeaderLen, HeaderLen + plen)
    val sum = java.security.MessageDigest.getInstance("MD5").digest(payload)
    if (!java.util.Arrays.equals(sum,
        java.util.Arrays.copyOfRange(b.blob, HeaderLen + plen, b.blob.length)))
      bad("payload checksum mismatch")
    MediaFeatures(b.doc_id, modality, plen,
      buf.getInt(6), buf.getInt(10), buf.getInt(14), buf.getInt(18),
      sum.map("%02x".format(_)).mkString)
  }

  /** Feature extraction: one decoder pass per partition over the typed
    * blob stream. */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition init goes here in production (decoder contexts,
      // native buffers); MessageDigest in [[decode]] is cheap enough
      // per element that hoisting it here bought nothing measurable
      it.map(decode)
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
    val (outW, outH) = resizeExprs(maxDim)
    vids
      .select(col("doc_id"), col("n_frames"), col("width"), col("height"),
        explode(expr("transform(sequence(0, ns - 1), k -> (k * n_frames) div ns)"))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        expr(s"CAST((frame_idx * 1000) div $fps AS INT)").as("ts_ms"),
        outW.as("out_w"), outH.as("out_h"))
      .orderBy("doc_id", "frame_idx")
  }

  /** EXECUTE the frame-sample manifest: slice each video's GRFT payload
    * into the per-frame blobs [[frameSamplePlan]] planned. Frame `k` of
    * an `n_frames`-frame payload owns the byte range
    * `[k·plen div n_frames, (k+1)·plen div n_frames)` — the same exact
    * integer arithmetic family as the plan, so the ranges tile the
    * payload with no gaps or overlaps, and concatenating all `n_frames`
    * slices reconstructs it byte-for-byte (MultimodalSpec asserts both,
    * plus agreement with the manifest row-for-row).
    *
    * This is the write half of the media path the plan deferred: where
    * the manifest never touches payload bytes, the exec reads them —
    * but ONLY as a map-only stage. Everything is codegen'd SQL
    * expressions over the binary column (header ints via substr+hex,
    * the slice via dynamic substr, md5 of the slice): no UDF, no join
    * back to the manifest (the frame indices are re-derived in the same
    * stage, so payload bytes are never replicated through a shuffle),
    * and the only thing that leaves the scan stage is the derived frame
    * rows themselves. In production the md5 column is where the real
    * frame transcode lands; the slicing, offsets, and batch shape are
    * the real thing. Emits (doc_id, frame_idx, ts_ms, out_w, out_h,
    * frame_offset, frame_bytes, frame_md5). */
  def frameSampleExec(spark: SparkSession, sfDir: String,
      targetFrames: Int = 8, maxDim: Int = 224, fps: Int = 24): DataFrame =
    frameSampleExecOf(blobTable(spark, sfDir).toDF(), targetFrames, maxDim, fps)

  /** [[frameSampleExec]] over any (doc_id, modality, blob) frame. */
  def frameSampleExecOf(blobs: DataFrame,
      targetFrames: Int = 8, maxDim: Int = 224, fps: Int = 24): DataFrame = {
    val blob = col("blob")
    val (outW, outH) = resizeExprs(maxDim)
    blobs
      .filter(col("modality") === "video")
      .select(col("doc_id"),
        beIntExpr(blob, 6).cast("int").as("width"),
        beIntExpr(blob, 10).cast("int").as("height"),
        beIntExpr(blob, 14).cast("int").as("n_frames"),
        payloadLenExpr(blob).cast("int").as("plen"),
        blob.substr(lit(HeaderLen + 1), payloadLenExpr(blob).cast("int")).as("payload"))
      .withColumn("ns", least(lit(targetFrames), col("n_frames")))
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
        col("plen"), col("payload"),
        explode(expr("transform(sequence(0, ns - 1), k -> (k * n_frames) div ns)"))
          .as("frame_idx"))
      // widen plen before the multiply: frame_idx(≤239) × a multi-MB
      // payload overflows 32-bit int (ANSI mode throws at ~9 MB); the
      // div result is ≤ plen again, so the slice positions stay int-safe
      .withColumn("fstart", expr("(frame_idx * CAST(plen AS BIGINT)) div n_frames"))
      .withColumn("flen", expr("((frame_idx + 1) * CAST(plen AS BIGINT)) div n_frames - fstart"))
      .withColumn("frame",
        col("payload").substr(col("fstart").cast("int") + 1, col("flen").cast("int")))
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        expr(s"CAST((frame_idx * 1000) div $fps AS INT)").as("ts_ms"),
        outW.as("out_w"), outH.as("out_h"),
        col("fstart").cast("long").as("frame_offset"),
        col("flen").cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Exact payload dedup over the blob column: content-checksum groups
    * — the multimodal twin of [[graft.operators.Dedup.exact]] (same
    * group-per-fingerprint shape), and the first pass of any media
    * ingestion. CONTENT-addressed, not container-addressed: the
    * expression below parses the GRFT header for the payload length and
    * checksums the payload slice, so identical content under different
    * container wrappers (a re-labeled modality, a re-encoded header)
    * still dedups together — identical BYTES are identical content no
    * matter what the wrapper says, so the group also counts distinct
    * modalities (a >1 value flags mislabeled payloads). The parse is
    * pure codegen'd expressions (substr + hex/conv), no UDF. Only the
    * 16-byte checksum shuffles; blob bytes never leave their
    * partition. */
  def blobDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val blob = col("blob")
    val payload = blob.substr(lit(HeaderLen + 1), payloadLenExpr(blob).cast("int"))
    blobDedupOf(blobTable(spark, sfDir).toDF()
      .select(col("doc_id"), col("modality"), payload.as("blob")))
  }

  /** [[blobDedup]] over any (doc_id, modality, blob) frame. */
  def blobDedupOf(blobs: DataFrame): DataFrame =
    blobs
      .select(col("doc_id"), col("modality"), md5(col("blob")).as("checksum"))
      .groupBy("checksum")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"),
        countDistinct(col("modality")).as("n_modalities"))
      .orderBy("canonical_id")

  /** Container-level audit parsed STRAIGHT OFF THE BINARY COLUMN with
    * SQL expressions — no decode pass, no UDF: per modality, blob
    * counts, container vs payload byte totals (payload length read from
    * the header at offset 22, magic verified at offset 0) and the
    * framing overhead. This is the lake-side "how much of my media
    * table is wrapper" question, answerable from the bytes alone at
    * scan speed; a magic-check count doubling as a corpus-wide format
    * health probe. Map-only until the 3-row modality aggregate. */
  def containerAudit(spark: SparkSession, sfDir: String): DataFrame =
    containerAuditOf(blobTable(spark, sfDir).toDF())

  /** [[containerAudit]] over any (modality, blob) frame. */
  def containerAuditOf(blobs: DataFrame): DataFrame = {
    val blob = col("blob")
    blobs
      .select(col("modality"),
        length(blob).cast("long").as("cbytes"),
        payloadLenExpr(blob).cast("long").as("pbytes"),
        magicOkExpr(blob).as("magic_ok"))
      .groupBy("modality")
      .agg(count(lit(1)).as("n_blobs"),
        sum("cbytes").as("total_container_bytes"),
        sum("pbytes").as("total_payload_bytes"),
        (sum("cbytes") - sum("pbytes")).as("total_overhead_bytes"),
        sum(when(col("magic_ok"), 1).otherwise(0)).cast("long").as("n_valid_magic"),
        max("pbytes").as("max_payload_bytes"))
      .orderBy("modality")
  }

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
