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
}
