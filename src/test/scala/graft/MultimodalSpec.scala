package graft

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Multimodal.synthesize(spark, sf001)

  test("decode: every record yields features with consistent byte accounting") {
    val feats = Multimodal.decodeFeatures(corpus).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.ok)
      assert(f.n_bytes > 0)
      // checksum of n bytes each in [0,255]
      assert(f.checksum >= 0 && f.checksum <= f.n_bytes * 255)
    }
  }

  test("resize: fits the bounding box, preserves aspect decisions, shrinks payload") {
    val resized = Multimodal.resize(corpus, maxW = 64, maxH = 48).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.meta.declaredWidth <= 64 && r.meta.declaredHeight <= 48)
      assert(r.meta.declaredWidth >= 1 && r.meta.declaredHeight >= 1)
      assert(r.payload.length <= math.max(1, r.meta.declaredWidth * r.meta.declaredHeight))
    }
    // deterministic: same input → same output
    val again = Multimodal.resize(corpus, maxW = 64, maxH = 48).collect()
    assert(resized.map(_.payload.toSeq).toSeq == again.map(_.payload.toSeq).toSeq)
  }

  test("frame-sample: explode shape with stride, frame indices in bounds") {
    val frames = Multimodal.sampleFrames(corpus, frameBytes = 16, stride = 2).collect()
    assert(frames.nonEmpty)
    val byId = frames.groupBy(_.id)
    byId.values.foreach { fs =>
      val idxs = fs.map(_.frameIdx).sorted.toSeq
      assert(idxs == idxs.distinct, "no duplicate frames")
      assert(idxs.forall(_ % 2 == 0), "stride respected")
    }
    // every frame checksum bounded by frame size
    assert(frames.forall(f => f.checksum >= 0 && f.checksum <= 16L * 255))
  }
}
