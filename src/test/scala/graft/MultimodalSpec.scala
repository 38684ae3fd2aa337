package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaBlob, MediaFeatures}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def pack(m: String, payload: String) =
    Multimodal.packContainer(m, payload.getBytes("UTF-8"))

  test("container decode: deterministic, modality-correct feature shapes") {
    val img = Multimodal.decode(MediaBlob(0, "image", pack("image", "abcd")))
    val aud = Multimodal.decode(MediaBlob(1, "audio", pack("audio", "abcd")))
    val vid = Multimodal.decode(MediaBlob(2, "video", pack("video", "abcd")))
    assert(img.width > 0 && img.height > 0 && img.n_frames === 1 && img.sample_rate === 0)
    assert(aud.width === 0 && aud.sample_rate >= 8000 && aud.n_frames === 0)
    assert(vid.n_frames > 0 && vid.width > 0)
    assert(img.n_bytes === 4, "n_bytes is the payload length, not container size")
    assert(img.checksum === aud.checksum, "checksum depends only on payload bytes")
    assert(Multimodal.decode(MediaBlob(0, "image", pack("image", "abcd"))) === img)
  }

  test("empty payload does not crash the decoder") {
    val f = Multimodal.decode(MediaBlob(9, "image", pack("image", "")))
    assert(f.n_bytes === 0 && f.width === 64)
  }

  test("container validation: corruption and mislabeling are caught, not mis-decoded") {
    def corrupt(bytes: Array[Byte], at: Int): Array[Byte] = {
      val c = bytes.clone(); c(at) = (c(at) ^ 0x5a).toByte; c
    }
    val good = pack("video", "some payload bytes")
    // flip one payload byte -> checksum mismatch
    val badPayload = corrupt(good, Multimodal.HeaderLen + 3)
    val e1 = intercept[IllegalArgumentException](
      Multimodal.decode(MediaBlob(1, "video", badPayload)))
    assert(e1.getMessage.contains("checksum"))
    // flip a magic byte
    val e2 = intercept[IllegalArgumentException](
      Multimodal.decode(MediaBlob(2, "video", corrupt(good, 0))))
    assert(e2.getMessage.contains("magic"))
    // truncated container
    val e3 = intercept[IllegalArgumentException](
      Multimodal.decode(MediaBlob(3, "video", good.take(20))))
    assert(e3.getMessage.contains("truncated"))
    // container/metadata modality disagreement
    val e4 = intercept[IllegalArgumentException](
      Multimodal.decode(MediaBlob(4, "image", good)))
    assert(e4.getMessage.contains("metadata"))
    // payload-length field lies about the actual size
    val badLen = good.clone()
    badLen(25) = (badLen(25) ^ 1).toByte
    val e5 = intercept[IllegalArgumentException](
      Multimodal.decode(MediaBlob(5, "video", badLen)))
    assert(e5.getMessage.contains("length"))
  }

  test("SQL container pack is byte-identical to the JVM encoder") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val blobs = Multimodal.blobTable(spark, sf)
      .filter(_.doc_id < docs.keys.max + 1)
      .collect().filter(b => docs.contains(b.doc_id))
    assert(blobs.nonEmpty)
    blobs.foreach { b =>
      val expected = Multimodal.packContainer(b.modality,
        docs(b.doc_id).getBytes("UTF-8"))
      assert(java.util.Arrays.equals(b.blob, expected),
        s"doc ${b.doc_id}: SQL pack differs from JVM pack")
    }
  }

  test("typed pipeline: every document becomes exactly one feature row") {
    val blobs = Multimodal.blobTable(spark, sf)
    val feats = Multimodal.extractFeatures(blobs)
    assert(feats.count() === blobs.count())
    val modalities = feats.select("modality").distinct().as[String].collect().toSet
    assert(modalities === Set("image", "audio", "video"))
  }

  test("featurization is map-only: no shuffle in the physical plan") {
    val plan = Multimodal.extractFeatures(Multimodal.blobTable(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"featurize must not shuffle:\n$plan")
  }

  test("frame plan: uniform in-range indices, aspect-preserving resize") {
    val feats = Multimodal.extractFeatures(Multimodal.blobTable(spark, sf))
      .toDF().filter(org.apache.spark.sql.functions.col("modality") === "video")
      .collect().map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4), r.getInt(5)))).toMap
    val plan = Multimodal.frameSamplePlan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(plan.nonEmpty)
    plan.groupBy(_._1).foreach { case (id, rows) =>
      val (w, h, nFrames) = feats(id)
      // exactly min(8, n_frames) strictly increasing indices, all in range
      val idxs = rows.map(_._2).toSeq
      assert(idxs.length === math.min(8, nFrames), s"doc $id sample count")
      assert(idxs === idxs.sorted && idxs.distinct.length === idxs.length,
        s"doc $id indices must strictly increase")
      assert(idxs.forall(i => i >= 0 && i < nFrames), s"doc $id index out of range")
      rows.foreach { case (_, idx, tsMs, ow, oh) =>
        assert(tsMs === idx * 1000 / 24)
        assert(ow >= 1 && ow <= 224 && oh >= 1 && oh <= 224,
          s"doc $id resize out of bounds: ${ow}x$oh")
        assert(ow == w || oh == h || ow == 224 || oh == 224)
        // aspect ratio preserved within integer-floor tolerance
        if (w > 224 || h > 224)
          assert(math.abs(ow.toDouble / oh - w.toDouble / h) <
            math.max(w.toDouble / h, 1.0) * 0.05,
            s"doc $id aspect drift: ${ow}x$oh vs ${w}x$h")
      }
    }
    // videos that fit are passed through unresized
    plan.groupBy(_._1).foreach { case (id, rows) =>
      val (w, h, _) = feats(id)
      if (w <= 224 && h <= 224)
        rows.foreach { case (_, _, _, ow, oh) => assert(ow === w && oh === h) }
    }
  }

  test("frame exec: slices match JVM byte arithmetic and agree with the manifest") {
    import org.apache.spark.sql.functions.col
    val texts = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 2)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    val exec = Multimodal.frameSampleExec(spark, sf).collect()
    assert(exec.nonEmpty)
    // every exec row's offset/length/md5 reproduces the JVM slice of the
    // same payload — the byte-arithmetic golden for the write path
    exec.foreach { r =>
      val (id, idx) = (r.getLong(0), r.getInt(1))
      val payload = texts(id)
      val nFrames = 1 + payload.length % 240
      val start = idx * payload.length / nFrames
      val end = (idx + 1) * payload.length / nFrames
      assert(r.getLong(5) === start.toLong, s"doc $id frame $idx offset")
      assert(r.getLong(6) === (end - start).toLong, s"doc $id frame $idx length")
      val slice = java.util.Arrays.copyOfRange(payload, start, end)
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(slice)
        .map("%02x".format(_)).mkString
      assert(r.getString(7) === md5, s"doc $id frame $idx checksum")
    }
    // fully-sampled videos (n_frames <= target): the slices TILE the
    // payload — no gaps, no overlaps, total bytes == payload bytes
    val full = exec.groupBy(_.getLong(0)).filter { case (id, rows) =>
      rows.length == 1 + texts(id).length % 240
    }
    assert(full.nonEmpty, "fixture should contain at least one short video")
    full.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      val plen = texts(id).length.toLong
      assert(sorted.map(_.getLong(6)).sum === plen, s"doc $id total frame bytes")
      sorted.foldLeft(0L) { (expectStart, r) =>
        assert(r.getLong(5) === expectStart, s"doc $id contiguous tiling")
        expectStart + r.getLong(6)
      }
    }
    // manifest agreement: exec rows carry exactly the plan's
    // (doc_id, frame_idx, ts_ms, out_w, out_h) — plan and exec can't drift
    val planRows = Multimodal.frameSamplePlan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSet
    val execHead = exec
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSet
    assert(execHead === planRows)
  }

  test("frame exec: multi-MB payload offsets stay exact (32-bit overflow regression)") {
    // frame_idx(≤239) × a multi-MB payload length overflows 32-bit int
    // in the offset arithmetic unless plen is widened first — under
    // Spark's default ANSI mode the unwidened form THROWS here. Payload
    // sized so n_frames = 240 and the top sampled index (210) puts
    // idx·plen ≈ 2.52e9 > Int.MaxValue.
    val plen = 12000239 // ≡ 239 (mod 240) → n_frames = 240
    val payload = Array.tabulate(plen)(i => (i % 251).toByte)
    val blobs = Seq(Multimodal.MediaBlob(1L, "video",
      Multimodal.packContainer("video", payload))).toDS().toDF()
    val rows = Multimodal.frameSampleExecOf(blobs).collect()
    assert(rows.length === 8)
    rows.foldLeft(-1L) { (prev, r) =>
      val (off, len) = (r.getLong(5), r.getLong(6))
      assert(off > prev && off >= 0 && len > 0 && off + len <= plen.toLong,
        s"frame ${r.getInt(1)} slice [$off, ${off + len}) out of bounds")
      off
    }
    // last sampled frame's checksum reproduces the JVM slice
    val last = rows.last
    val (s, e) = (last.getLong(5).toInt, (last.getLong(5) + last.getLong(6)).toInt)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(java.util.Arrays.copyOfRange(payload, s, e))
      .map("%02x".format(_)).mkString
    assert(last.getString(7) === md5)
  }

  test("a >16 MB blob survives decode, audit, dedup, and frame exec (offset-width fixture)") {
    // VERDICT r9 #7: the ANSI int overflow in frame-offset arithmetic
    // was reachable only with payloads ≥ ~9 MB and no standard fixture
    // exercised that size — this blob makes the whole class mechanical.
    // 17,000,239 ≡ 239 (mod 240) → n_frames = 240, top sampled index
    // 210 puts idx·plen ≈ 3.6e9 ≫ Int.MaxValue in any unwidened form.
    val plen = 17000239
    val payload = Array.tabulate(plen)(i => ((i * 31 + 7) % 251).toByte)
    val container = Multimodal.packContainer("video", payload)
    val payloadMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString
    // decode: header-true features, checksum over all 17 MB
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.MediaBlob(1L, "video", container)).toDS()).collect()
    assert(feats.length === 1)
    assert(feats(0).n_bytes === plen)
    assert(feats(0).checksum === payloadMd5)
    // audit: container accounting exact at this size (pbytes parsed
    // from the 32-bit header field, cbytes from the binary length)
    val blobs2 = Seq((1L, "video", container), (2L, "video", container))
      .toDF("doc_id", "modality", "blob")
    val audit = Multimodal.containerAuditOf(blobs2).collect()
    assert(audit.length === 1)
    assert(audit(0).getLong(1) === 2L, "n_blobs")
    assert(audit(0).getLong(3) === 2L * plen, "payload bytes")
    assert(audit(0).getLong(2) - audit(0).getLong(3) === audit(0).getLong(4),
      "overhead = container - payload")
    assert(audit(0).getLong(5) === 2L, "magic valid on both")
    // dedup: byte-identical 17 MB payloads group (md5 over the blob)
    // the production payload slice (Multimodal.blobDedup): 1-based
    // offset HeaderLen + 1 — a wrong offset here would feed a shifted
    // window (header remnants + trailer bytes) and silently stop
    // verifying the real extraction
    val payloadCol = blobs2.select($"doc_id", $"modality",
      org.apache.spark.sql.functions.expr(
        s"substring(blob, ${Multimodal.HeaderLen + 1}, $plen)").as("blob"))
    val groups = Multimodal.blobDedupOf(payloadCol).collect()
    assert(groups.length === 1)
    assert((groups(0).getLong(1), groups(0).getLong(2)) === ((1L, 2L)))
    // frame exec: 8 sampled slices, offsets exact and in-bounds, last
    // slice checksum reproduces the JVM byte arithmetic
    val exec = Multimodal.frameSampleExecOf(
      Seq(Multimodal.MediaBlob(1L, "video", container)).toDS().toDF()).collect()
    assert(exec.length === 8)
    exec.foreach { r =>
      val (off, len) = (r.getLong(5), r.getLong(6))
      assert(off >= 0 && len > 0 && off + len <= plen.toLong,
        s"frame ${r.getInt(1)} slice [$off, ${off + len}) out of bounds")
    }
    val last = exec.last
    val (s, e) = (last.getLong(5).toInt, (last.getLong(5) + last.getLong(6)).toInt)
    val sliceMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(java.util.Arrays.copyOfRange(payload, s, e))
      .map("%02x".format(_)).mkString
    assert(last.getString(7) === sliceMd5)
  }

  test("oracle precondition: fixture texts are pure ASCII (byte slice == char slice)") {
    // the frame-exec DuckDB oracle slices the VARCHAR where Spark slices
    // payload BYTES; they agree iff every text is single-byte chars. A
    // data refresh breaking this surfaces here, not as an opaque red hash.
    import org.apache.spark.sql.functions._
    val nonAscii = graft.sources.Tables.documents(spark, sf)
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii === 0L, "frame-exec oracle requires ASCII-only fixture text")
  }

  test("container audit: byte accounting parsed from the binary column reconciles") {
    import org.apache.spark.sql.functions._
    val audit = Multimodal.containerAudit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(audit.keySet === Set("audio", "image", "video"))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("pb"))
    val expect = docs
      .withColumn("m", when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video"))
      .groupBy("m").agg(count(lit(1)).as("n"), sum("pb").as("pb"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    audit.foreach { case (m, (n, cbytes, pbytes, overhead, validMagic)) =>
      val (en, epb) = expect(m)
      assert(n === en, s"$m count")
      assert(pbytes === epb, s"$m payload bytes parsed from headers")
      assert(overhead === n * 42, s"$m framing overhead")
      assert(cbytes === pbytes + overhead, s"$m container accounting")
      assert(validMagic === n, s"$m every container carries the magic")
    }
  }

  test("blob dedup: groups byte-identical payloads across modalities") {
    val blobs = Seq(
      (10L, "image", "same bytes"), (11L, "audio", "same bytes"),
      (12L, "video", "same bytes"),                       // 3-copy group, 3 modalities
      (20L, "image", "pair"), (21L, "image", "pair"),     // 2-copy group, 1 modality
      (30L, "audio", "unique"))                           // singleton: absent
      .toDF("doc_id", "modality", "txt")
      .select($"doc_id", $"modality", org.apache.spark.sql.functions.encode($"txt", "UTF-8").as("blob"))
    val out = Multimodal.blobDedupOf(blobs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // (canonical, n_copies, n_modalities): 3-copy cross-modal group,
    // 2-copy single-modal group, singleton
    assert(out === Set((10L, 3L, 3L), (20L, 2L, 1L), (30L, 1L, 1L)))
    // corpus form: one group per distinct payload, groups re-total the corpus
    val corpus = Multimodal.blobDedup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("text").as[String].collect()
    assert(corpus.length === texts.distinct.length)
    assert(corpus.map(_._2).sum === texts.length.toLong)
  }
}
