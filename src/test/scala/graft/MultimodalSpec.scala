package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaBlob, MediaFeatures}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub: deterministic, modality-correct feature shapes") {
    val img = Multimodal.decodeStub(MediaBlob(0, "image", "abcd".getBytes))
    val aud = Multimodal.decodeStub(MediaBlob(1, "audio", "abcd".getBytes))
    val vid = Multimodal.decodeStub(MediaBlob(2, "video", "abcd".getBytes))
    assert(img.width > 0 && img.height > 0 && img.n_frames === 1 && img.sample_rate === 0)
    assert(aud.width === 0 && aud.sample_rate >= 8000 && aud.n_frames === 0)
    assert(vid.n_frames > 0 && vid.width > 0)
    assert(img.checksum === aud.checksum, "checksum depends only on bytes")
    assert(Multimodal.decodeStub(MediaBlob(0, "image", "abcd".getBytes)) === img)
  }

  test("empty blob does not crash the decoder") {
    val f = Multimodal.decodeStub(MediaBlob(9, "image", Array.emptyByteArray))
    assert(f.n_bytes === 0 && f.width === 64)
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
