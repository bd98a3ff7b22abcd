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

  test("real PNG/JPEG decode: actual dimensions and pixel hash via javax.imageio") {
    // round-9 stretch: baseline PNG/JPEG readers ship with the JDK, so
    // those branches decode for REAL — declared metadata deliberately
    // lies (999×999) and the decoded features must report the truth
    def pngBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 31 + y * 17) % 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", pngBytes(7, 5),
        Multimodal.MediaMeta("image/png", 999, 999)),
      Multimodal.MediaRecord(2L, "image", pngBytes(3, 4),
        Multimodal.MediaMeta("image/png", 999, 999)),
      // corrupt payload claiming to be a PNG: must fail closed, not throw
      Multimodal.MediaRecord(3L, "image", Array[Byte](1, 2, 3, 4),
        Multimodal.MediaMeta("image/png", 999, 999)),
      // non-image modality stays on the labeled stub: declared dims pass through
      Multimodal.MediaRecord(4L, "video", Array[Byte](10, 20, 30),
        Multimodal.MediaMeta("fake/raw", 640, 480)),
      // a VALID PNG mislabeled image/jpeg: the sniffed format contradicts
      // the claim, so this is a format-corrupted record — fail closed
      Multimodal.MediaRecord(5L, "image", pngBytes(7, 5),
        Multimodal.MediaMeta("image/jpeg", 999, 999))).toDS()
    val feats = Multimodal.decodeFeatures(recs).collect().map(f => f.id -> f).toMap
    assert(feats(1L).ok && feats(1L).width == 7 && feats(1L).height == 5)
    assert(feats(2L).ok && feats(2L).width == 3 && feats(2L).height == 4)
    assert(!feats(3L).ok && feats(3L).width == 0 && feats(3L).height == 0)
    assert(feats(4L).ok && feats(4L).width == 640 && feats(4L).height == 480)
    assert(feats(4L).checksum == 60L, "stub branch must keep the byte-sum contract")
    assert(!feats(5L).ok && feats(5L).width == 0 && feats(5L).height == 0,
      "a payload whose sniffed format contradicts the claimed MIME must fail closed")
    // pixel hash is a real function of the pixels: distinct images differ,
    // and a re-decode is bit-identical
    assert(feats(1L).checksum != feats(2L).checksum)
    val again = Multimodal.decodeFeatures(recs).collect().map(f => f.id -> f).toMap
    assert(again(1L).checksum == feats(1L).checksum)
  }

  test("real WAV/AIFF decode: header fields and PCM hash via javax.sound.sampled") {
    // round-10 VERDICT task 3: the JDK ships WAV/AIFF readers, so audio
    // joins images on the REAL side of the codec line — same contract:
    // actual header fields (declared metadata deliberately lies), a
    // deterministic hash over the DECODED stream, fail-closed on
    // corrupt or mislabeled payloads
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def encode(tpe: AudioFileFormat.Type, rate: Float, channels: Int,
        frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, tpe == AudioFileFormat.Type.AIFF)
      val pcm = Array.tabulate[Byte](frames * 2 * channels)(i =>
        ((i * 37 + 11) % 251).toByte)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
        tpe, bos)
      bos.toByteArray
    }
    val wav = encode(AudioFileFormat.Type.WAVE, 8000f, 1, 800)
    val aiff = encode(AudioFileFormat.Type.AIFF, 44100f, 2, 300)
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio", wav, Multimodal.MediaMeta("audio/wav", 999, 999)),
      Multimodal.MediaRecord(2L, "audio", aiff, Multimodal.MediaMeta("audio/aiff", 999, 999)),
      // a VALID WAV mislabeled audio/aiff: sniffed type contradicts the
      // claim — format-corrupted record, fail closed
      Multimodal.MediaRecord(3L, "audio", wav, Multimodal.MediaMeta("audio/aiff", 999, 999)),
      // corrupt payload claiming to be a WAV: fail closed, not throw
      Multimodal.MediaRecord(4L, "audio", Array[Byte](1, 2, 3, 4),
        Multimodal.MediaMeta("audio/wav", 999, 999)),
      // an mp3-labeled record has no JDK codec: honest refusal on the
      // typed path (NOT a stub guess)
      Multimodal.MediaRecord(5L, "audio", wav, Multimodal.MediaMeta("audio/mpeg", 999, 999))).toDS()
    val feats = Multimodal.decodeAudioFeatures(recs).collect().map(f => f.id -> f).toMap
    assert(feats(1L).ok && feats(1L).sample_rate == 8000 &&
      feats(1L).channels == 1 && feats(1L).frames == 800L)
    assert(feats(2L).ok && feats(2L).sample_rate == 44100 &&
      feats(2L).channels == 2 && feats(2L).frames == 300L)
    assert(!feats(3L).ok && feats(3L).sample_rate == 0,
      "a payload whose sniffed type contradicts the claimed MIME must fail closed")
    assert(!feats(4L).ok)
    assert(!feats(5L).ok)
    // the hash is a real function of the decoded PCM: distinct audio
    // differs, and a re-decode is bit-identical
    assert(feats(1L).sample_hash != feats(2L).sample_hash)
    val again = Multimodal.decodeAudioFeatures(recs).collect().map(f => f.id -> f).toMap
    assert(again(1L).sample_hash == feats(1L).sample_hash)
    // the generic image-shaped path decodes audio for real too:
    // rate/channels stand in the width/height slots (documented mapping)
    val generic = Multimodal.decodeFeatures(recs).collect().map(f => f.id -> f).toMap
    assert(generic(1L).ok && generic(1L).width == 8000 && generic(1L).height == 1)
    assert(generic(1L).checksum == feats(1L).sample_hash)
    assert(!generic(3L).ok)
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

  // ---- F53: perceptual dHash near-dup (round 17) --------------------------

  private def gradientImg(w: Int, h: Int,
      f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }
  private def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }
  private def rec(id: Long, bytes: Array[Byte], mime: String) =
    Multimodal.MediaRecord(id, "image", bytes, Multimodal.MediaMeta(mime, 0, 0))

  test("dHash: real-decode path — exact copy 0 bits, re-encode/perturbation close, inversion far, failures drop") {
    val base = gradientImg(64, 64, (x, _) => x * 4)           // L→R ramp
    val perturbed = gradientImg(64, 64, (x, y) =>
      if (x < 8 && y < 8) 128 else x * 4)                     // one cell dented
    val inverted = gradientImg(64, 64, (x, _) => 255 - x * 4) // every gradient flips
    val recs = Seq(
      rec(1L, enc(base, "png"), "image/png"),
      rec(2L, enc(base, "png"), "image/png"),                 // exact copy
      rec(3L, enc(perturbed, "png"), "image/png"),
      rec(4L, enc(inverted, "png"), "image/png"),
      rec(5L, enc(base, "jpg"), "image/jpeg"),                // lossy re-encode
      rec(6L, Array[Byte](1, 2, 3), "image/png"),             // corrupt: drops
      rec(7L, enc(gradientImg(1, 1, (_, _) => 9), "png"), "image/png"), // tiny
      rec(8L, enc(gradientImg(3, 2, (x, y) => x * 40 + y), "png"), "image/png"))
      .toDS()
    val sigs = Multimodal.imageHashes(recs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!sigs.contains(6L), "undecodable payload must drop, not hash")
    assert(sigs.keySet == Set(1L, 2L, 3L, 4L, 5L, 7L, 8L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(1L, 2L) == 0)
    assert(ham(1L, 3L) <= 3, s"dented cell moved ${ham(1L, 3L)} bits")
    assert(ham(1L, 5L) <= 3, s"jpeg re-encode moved ${ham(1L, 5L)} bits")
    assert(ham(1L, 4L) > 30, s"inverted gradient only ${ham(1L, 4L)} bits away")
    // banding ≡ brute force at the threshold (recall exact by pigeonhole)
    val got = Multimodal.imageNearDupPairs(recs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ids = sigs.keySet.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      h = ham(i, j) if h <= 3
    } yield (i, j, h.toLong)).toSet
    assert(got == brute, s"got $got want $brute")
    assert(got.contains((1L, 2L, 0L)) && got.exists(p => p._1 == 1L && p._2 == 5L))
  }

  test("dHash: stub-format byte-stream branch pairs near-identical payloads; partitioning-invariant") {
    val b0 = Array.tabulate(720)(i => (i % 251).toByte)
    val b1 = b0.clone(); b1(5) = (b1(5) + 1).toByte // one byte off
    val far = Array.tabulate(720)(i => (i * 37 % 251).toByte)
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", b0, Multimodal.MediaMeta("fake/raw", 9, 8)),
      Multimodal.MediaRecord(2L, "image", b0.clone(), Multimodal.MediaMeta("fake/raw", 9, 8)),
      Multimodal.MediaRecord(3L, "image", b1, Multimodal.MediaMeta("fake/raw", 9, 8)),
      Multimodal.MediaRecord(4L, "image", far, Multimodal.MediaMeta("fake/raw", 9, 8)),
      Multimodal.MediaRecord(5L, "image", Array.empty[Byte],
        Multimodal.MediaMeta("fake/raw", 0, 0))) // empty stub: no signature
      .toDS()
    val sigs = Multimodal.imageHashes(recs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.keySet == Set(1L, 2L, 3L, 4L))
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 3)
    val got = Multimodal.imageNearDupPairs(recs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    val ids = sigs.keySet.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      h = ham(i, j) if h <= 3
    } yield (i, j, h.toLong)).toSet
    assert(got == brute, s"got $got want $brute")
    val re = Multimodal.imageNearDupPairs(recs.repartition(7), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(re == got)
  }

  test("audioHash64: real WAV decode — exact copy 0 bits, stereo re-layout 0 bits, dent close, reversal far; banding ≡ brute force") {
    def wav(samples: Array[Short], channels: Int = 1): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels,
        true, false)
      val bytes = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt,
        samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // amplitude envelope ramps up: |s(t)| grows with t (sign alternates)
    val n = 6500
    val base = Array.tabulate(n)(t =>
      (math.min(32000, t * 4) * (if (t % 2 == 0) 1 else -1)).toShort)
    val dented = base.clone()
    (1000 until 1100).foreach(t => dented(t) = 31000.toShort) // one cell hot
    val reversed = base.reverse
    val stereo = base.flatMap(s => Array(s, s)) // same envelope, 2 channels
    def arec(id: Long, b: Array[Byte], mime: String = "audio/wav") =
      Multimodal.MediaRecord(id, "audio", b, Multimodal.MediaMeta(mime, 0, 0))
    val recs = Seq(
      arec(1L, wav(base)), arec(2L, wav(base)),            // exact copy
      arec(3L, wav(dented)), arec(4L, wav(reversed)),
      arec(5L, wav(stereo, channels = 2)),
      arec(6L, Array[Byte](9, 9, 9)),                      // corrupt: drops
      arec(7L, wav(base), mime = "audio/aiff"),            // mislabeled: drops
      Multimodal.MediaRecord(8L, "audio", Array.tabulate(720)(_.toByte),
        Multimodal.MediaMeta("audio/mpeg", 0, 0)))         // stub branch
      .toDS()
    val sigs = Multimodal.audioHashes(recs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.keySet == Set(1L, 2L, 3L, 4L, 5L, 8L), sigs.keySet.toString)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(1L, 2L) == 0)
    assert(ham(1L, 5L) == 0, s"stereo re-layout moved ${ham(1L, 5L)} bits")
    assert(ham(1L, 3L) <= 3, s"dent moved ${ham(1L, 3L)} bits")
    assert(ham(1L, 4L) > 30, s"reversal only ${ham(1L, 4L)} bits away")
    val got = Multimodal.audioNearDupPairs(recs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ids = sigs.keySet.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      h = ham(i, j) if h <= 3
    } yield (i, j, h.toLong)).toSet
    assert(got == brute, s"got $got want $brute")
    val re = Multimodal.audioNearDupPairs(recs.repartition(5), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(re == got)
  }

  test("imageDedupGroups: chained near-dups form one cluster; undecodable records label themselves") {
    // stub-branch bytes engineered to chain: each step dents a different
    // region enough for ≤3 bits but A→C accumulates past the threshold
    def bytesOf(dents: Seq[(Int, Int)]): Array[Byte] = {
      val b = Array.tabulate(720)(i => (i % 199).toByte)
      // a 10-byte dent = exactly one 720/72-byte grid cell → flips at
      // most its two adjacent comparisons, keeping every hop ≤ 3
      dents.foreach { case (lo, v) =>
        (lo until math.min(720, lo + 10)).foreach(i => b(i) = v.toByte) }
      b
    }
    // one NEW dent per hop, disjoint regions → distinct grid cells, so
    // hamming accumulates along the chain while each hop stays small
    val dents = Seq((0, 250), (100, 250), (200, 250), (300, 250), (400, 250))
    val chain = (0 to 5).map(k => bytesOf(dents.take(k)))
    val recs = (chain.zipWithIndex.map { case (b, i) =>
      Multimodal.MediaRecord(i + 1L, "image", b,
        Multimodal.MediaMeta("fake/raw", 9, 8))
    } :+ Multimodal.MediaRecord(9L, "image", Array.empty[Byte],
      Multimodal.MediaMeta("fake/raw", 0, 0))).toDS()
    val sigs = Multimodal.imageHashes(recs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(sigs(x) ^ sigs(y))
    // the planted chain: every hop ≤ 3, the end-to-end hop > 3 (else the
    // test proves nothing about chaining)
    (1L to 5L).foreach(i =>
      assert(ham(i, i + 1) <= 3, s"hop $i: ${ham(i, i + 1)}"))
    assert(ham(1L, 6L) > 3, s"ends must exceed the threshold: ${ham(1L, 6L)}")
    val groups = Multimodal.imageDedupGroups(spark, recs, maxHamming = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the chain is fully adjacent-linked → all six cluster; the binding
    // asserts: the ends share a cluster DESPITE ham > 3 (chaining), and
    // the unhashable record is its own singleton
    assert(groups(1L)._1 == groups(6L)._1, groups.toString)
    assert(groups(1L) == ((1L, 6L)), groups.toString)
    assert(groups(9L) == ((9L, 1L)), groups.toString)
  }
}
