package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (builder brief): image/audio/video payloads are
  * opaque `binary` columns travelling next to typed metadata. The
  * Spark-side plumbing — schema, partition-wise batch decode, feature
  * schema — is real and tested; the codec itself is a clearly-marked
  * deterministic stub because no image/audio library exists in this
  * container (the production swap-in point is `decodeOne`).
  */
object Multimodal {

  final case class MediaMeta(format: String, declaredWidth: Int, declaredHeight: Int)
  final case class MediaRecord(id: Long, modality: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(id: Long, modality: String, n_bytes: Long,
      checksum: Long, width: Int, height: Int, ok: Boolean)

  /** Deterministic synthetic corpus: the document text bytes stand in for
    * an encoded image; metadata is derived from n_chars.
    */
  def synthesize(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        MediaRecord(id, "image", text.getBytes("UTF-8"),
          MediaMeta("fake/raw", (nChars % 640).toInt, (nChars % 480).toInt))
      }
  }

  /** ImageIO reader format names accepted per claimed MIME type —
    * decoding VERIFIES the payload is the format the metadata claims,
    * not merely something some reader can sniff. One source of truth:
    * [[RealImageFormats]] is this map's key set.
    */
  private val ImageFormatNames: Map[String, Set[String]] =
    Map("image/png" -> Set("png"), "image/jpeg" -> Set("jpeg", "jpg"))

  /** Formats [[decodeOne]] decodes FOR REAL via the JDK's `javax.imageio`
    * (baseline PNG/JPEG readers ship with the JVM — no external library
    * needed, round 9). Everything else stays on the labeled stub.
    */
  val RealImageFormats: Set[String] = ImageFormatNames.keySet

  /** Real baseline image decode: actual pixel dimensions and a
    * deterministic row-major hash over the ARGB values (bulk row reads —
    * one color-model conversion per ROW, not per pixel). The payload is
    * already an in-memory byte array, so the input stream is an explicit
    * `MemoryCacheImageInputStream` — no per-record temp file and no
    * mutation of the JVM-global `ImageIO.setUseCache` toggle a host
    * application may rely on. None when the payload is corrupt, no
    * reader exists, or the payload's sniffed format does not match the
    * CLAIMED format — a valid GIF labeled `image/png` is a
    * format-corrupted record, not a decode success.
    */
  /** Image payload → verified decoded image: the sniffed reader's format
    * name must match the CLAIMED format. Scans ALL sniff-matched readers
    * for one carrying the claimed name (round-10 ADVICE): a host app that
    * registers extra readers (e.g. TwelveMonkeys) can put a
    * differently-named reader FIRST for the same bytes — a
    * correctly-labeled payload must not fail closed just because of
    * registry ordering. A mislabeled payload still fails: no reader that
    * sniffs the bytes carries the claimed format's name.
    */
  private def readVerifiedImage(payload: Array[Byte],
      claimed: String): Option[java.awt.image.BufferedImage] =
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        val expected = ImageFormatNames.getOrElse(claimed, Set.empty)
        var matched: Option[javax.imageio.ImageReader] = None
        while (matched.isEmpty && readers.hasNext) {
          val r = readers.next()
          if (expected.contains(r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
            matched = Some(r)
          else r.dispose()
        }
        matched.map { reader =>
          try { reader.setInput(iis); reader.read(0) } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  private def decodeImage(payload: Array[Byte], claimed: String): Option[(Long, Int, Int)] =
    readVerifiedImage(payload, claimed).map { img =>
      val w = img.getWidth
      val ht = img.getHeight
      var h = 1125899906842597L // deterministic FNV-ish pixel hash
      val row = new Array[Int](w)
      var y = 0
      while (y < ht) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) { h = h * 31 + row(x); x += 1 }
        y += 1
      }
      (h, w, ht)
    }

  /** `javax.sound.sampled` file types accepted per claimed audio MIME —
    * same one-source-of-truth shape as [[ImageFormatNames]]: decoding
    * VERIFIES the payload is what the metadata claims.
    */
  private val AudioFileTypes: Map[String, Set[String]] =
    Map("audio/wav" -> Set("wave"), "audio/x-wav" -> Set("wave"),
      "audio/aiff" -> Set("aiff"), "audio/x-aiff" -> Set("aiff"))

  /** Formats [[decodeOne]] and [[decodeAudioFeatures]] decode FOR REAL
    * via the JDK's `javax.sound.sampled` (WAV/AIFF header + PCM readers
    * ship with the JVM — round 10, mirroring the round-9 ImageIO move).
    * Compressed audio (mp3/ogg/aac) and video stay on the labeled stub:
    * those codecs genuinely are not in this container.
    */
  val RealAudioFormats: Set[String] = AudioFileTypes.keySet

  /** Container identity from the RIFF/FORM magic (the WAV and AIFF
    * on-disk framing is public: RIFF…WAVE at bytes 0-3/8-11, FORM…AIFF
    * likewise) — a 12-byte check with NO locking, replacing
    * `AudioSystem.getAudioFileFormat` as the sniffer on the per-record
    * hot path. AIFC deliberately does not match (the prior sniffer
    * reported it as "aiff-c", which the accepted-type sets never
    * contained — behavior preserved). Structural validity beyond the
    * magic is still verified by the real reader, which throws on a
    * corrupt body.
    */
  private def sniffAudioContainer(p: Array[Byte]): Option[String] =
    if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
        p(11) == 'E') Some("wave")
    else if (p.length >= 12 && p(0) == 'F' && p(1) == 'O' && p(2) == 'R' &&
        p(3) == 'M' && p(8) == 'A' && p(9) == 'I' && p(10) == 'F' &&
        p(11) == 'F') Some("aiff")
    else None

  /** The JDK's real WAV/AIFF readers, resolved ONCE per JVM through the
    * public `javax.sound.sampled.spi.AudioFileReader` ServiceLoader SPI
    * and labeled by probing each with a one-time synthesized container.
    * Why: every `AudioSystem.getAudioFileFormat`/`getAudioInputStream`
    * call funnels through a JVM-global synchronized provider lookup plus
    * cross-provider exception churn — measured 72 µs/record on one
    * thread but ~90× WORSE per core under 32 executor threads (the lock
    * serializes the whole executor; the aud18 cert's 643k-WAV decode
    * pass sat at 4.9k recs/s). Calling the cached reader directly keeps
    * the identical JDK PCM decode with zero shared state on the hot
    * path.
    */
  private lazy val audioReaders: Map[String, javax.sound.sampled.spi.AudioFileReader] = {
    import javax.sound.sampled._
    def tiny(t: AudioFileFormat.Type): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 1, true, t != AudioFileFormat.Type.WAVE)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](130)), fmt, 65L), t, bos)
      bos.toByteArray
    }
    val readers = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val resolved = Map("wave" -> tiny(AudioFileFormat.Type.WAVE),
      "aiff" -> tiny(AudioFileFormat.Type.AIFF)).flatMap { case (k, probe) =>
      readers.find { r =>
        try { r.getAudioFileFormat(new java.io.ByteArrayInputStream(probe)); true }
        catch { case _: Exception => false }
      }.map(k -> _)
    }
    // round 19 (advice): fail LOUDLY when the JVM's SPI registry is
    // missing a baseline reader — a silent miss here would turn every
    // WAV/AIFF decode into a silent None (corpus-wide decode failure with
    // no signal). A JDK without these readers is a misconfigured host,
    // not a data problem; the failed lazy val re-throws per record, which
    // is the loud behavior we want.
    require(resolved.contains("wave") && resolved.contains("aiff"),
      s"audioReaders: the JVM's AudioFileReader SPI registry resolved no " +
        s"reader for ${Seq("wave", "aiff").filterNot(resolved.contains).mkString("/")} " +
        s"(${readers.size} providers present) — WAV/AIFF decode would fail " +
        "corpus-wide; refusing to continue silently")
    resolved
  }

  /** Claim-checked open: magic sniff → claimed-MIME match → the cached
    * real reader. None when the container contradicts the claim or no
    * reader exists; the reader still throws (caught by callers) on a
    * structurally corrupt body. Streams are plain mark/reset-capable
    * `ByteArrayInputStream`s — no temp files.
    */
  private def openAudioStream(payload: Array[Byte],
      claimed: String): Option[javax.sound.sampled.AudioInputStream] = {
    val expected = AudioFileTypes.getOrElse(claimed, Set.empty)
    sniffAudioContainer(payload).filter(expected.contains).flatMap(c =>
      audioReaders.get(c).map(_.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))))
  }

  /** Real WAV/AIFF decode: header fields (sample rate, channels, frame
    * count) plus a deterministic FNV-ish hash over the decoded PCM
    * stream bytes. None when the payload is corrupt, unreadable, or its
    * sniffed container does not match the CLAIMED format — a valid WAV
    * labeled `audio/aiff` is a format-corrupted record, exactly the
    * image-path contract.
    */
  private def decodeAudio(payload: Array[Byte],
      claimed: String): Option[(Long, Int, Int, Long)] =
    try {
      openAudioStream(payload, claimed).flatMap { ais =>
        try {
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          var h = 1125899906842597L // same FNV-ish constant as the pixel hash
          val buf = new Array[Byte](8192)
          var n = ais.read(buf)
          while (n > 0) {
            var i = 0
            while (i < n) { h = h * 31 + (buf(i) & 0xff); i += 1 }
            n = ais.read(buf)
          }
          Some((h, math.round(fmt.getSampleRate), fmt.getChannels, frames))
        } finally ais.close()
      }
    } catch { case _: Exception => None }

  // ---- F54 (round 17): audio near-dup via an energy-envelope hash --------

  /** 64-bit ENERGY-ENVELOPE difference hash for audio — the dHash idea
    * applied along time (the shape audio fingerprinting keys on:
    * Chromaprint/Shazam-family prints compare energy across adjacent
    * windows; this is the deterministic integer skeleton of that):
    * the decoded PCM sample stream's |amplitude| is averaged over 65
    * equal time ranges, bit i = cell(i+1) > cell(i). REAL for WAV/AIFF —
    * samples come from the verified `javax.sound.sampled` decode (16-bit
    * samples read as signed little/big per the stream format, 8-bit as
    * unsigned-centered) — with the same pinned arithmetic everywhere:
    * cell = Σ|sample| div count (empty ranges clamp left). Compressed
    * formats (no codec in this container) hash their raw byte stream
    * through the same envelope — the [[decodeOne]] stub convention. None
    * for undecodable/mislabeled real-format payloads and empty stubs
    * (the F2 NULL-sig rule).
    */
  def audioHash64(payload: Array[Byte], meta: MediaMeta): Option[Long] =
    if (RealAudioFormats(meta.format)) readPcmAbs(payload, meta.format)
      .filter(_.nonEmpty).map(envelopeBits)
    else if (payload.isEmpty) None
    else Some(envelopeBits(payload.map(b => (b & 0xff).toLong)))

  /** Verified decode → |sample| stream (all channels interleaved — a
    * stereo copy of a mono signal keeps its envelope shape). */
  private def readPcmAbs(payload: Array[Byte],
      claimed: String): Option[Array[Long]] =
    try {
      openAudioStream(payload, claimed).flatMap { ais =>
        try {
          val fmt = ais.getFormat
          val bytes = {
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = ais.read(buf)
            while (n > 0) { bos.write(buf, 0, n); n = ais.read(buf) }
            bos.toByteArray
          }
          val bits = fmt.getSampleSizeInBits
          val out =
            if (bits == 16) {
              val n = bytes.length / 2
              val a = new Array[Long](n)
              var i = 0
              while (i < n) {
                val lo = bytes(2 * i) & 0xff
                val hi = bytes(2 * i + 1) & 0xff
                val s =
                  if (fmt.isBigEndian) ((bytes(2 * i) << 8) | hi).toShort
                  else ((bytes(2 * i + 1) << 8) | lo).toShort
                a(i) = math.abs(s.toLong)
                i += 1
              }
              a
            } else bytes.map(b => math.abs((b & 0xff) - 128).toLong)
          Some(out)
        } finally ais.close()
      }
    } catch { case _: Exception => None }

  /** DERIVATIVE envelope → 64 bits (round 19, VERDICT r18 item 3): the
    * audio/video SECOND family — [[envelopeBits]] over the stream's
    * |first-difference| values (|v(i+1) − v(i)|). The derivative is a
    * genuinely different statistic from the value envelope, so two
    * different streams that chance-collide on value-cell comparisons
    * have no reason to collide on delta-cell comparisons; a LOCAL edit
    * still changes only the ≤ 2 deltas it touches (the property a
    * mean-threshold family lacks on flat-random streams — a tiny global
    * mean shift there flips ~9 of 64 bits, measured, and the verify
    * would kill TRUE near-dup edges); and uniform re-layouts (stereo
    * duplication: deltas interleave with zeros, every cell scales ~½;
    * sign flips: |s| unchanged) preserve the comparison pattern. Two
    * alternatives were measured and REJECTED: mean-threshold (above),
    * and a half-cell OFFSET grid — its boundary shift quantizes to ZERO
    * when the stream length ≈ the cell count (the media19 cert's
    * 65-frame videos: sig2 ≡ sig, verify vacuous, all +964 video chance
    * merges survived), and its 50%-overlapping cells left 39/259 audio
    * chance pairs verified. Streams with < 2 values pin to the constant
    * 0 signature (degenerate payloads verify trivially against each
    * other, never against structured ones).
    */
  private def derivEnvelopeBits(vals: Array[Long]): Long =
    if (vals.length < 2) 0L
    else envelopeBits(
      Array.tabulate(vals.length - 1)(i => math.abs(vals(i + 1) - vals(i))))

  /** Shared 1-D envelope → 64 bits: 65 equal ranges over the stream,
    * cell = Σ value div count, bit i = cell(i+1) > cell(i). */
  private def envelopeBits(vals: Array[Long]): Long = {
    val n = vals.length
    val cell = new Array[Long](65)
    var i = 0
    while (i < 65) {
      val lo = (i.toLong * n / 65).toInt
      val hi = math.max(lo + 1, ((i + 1).toLong * n / 65).toInt) min n
      var s = 0L
      var j = lo
      while (j < hi) { s += vals(j); j += 1 }
      cell(i) = if (hi > lo) s / (hi - lo) else (if (i > 0) cell(i - 1) else 0L)
      i += 1
    }
    var sig = 0L
    i = 0
    while (i < 64) {
      if (cell(i + 1) > cell(i)) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Per-record audio signatures: (id, sig) — partition-wise, zero
    * shuffle; records with no signature drop (the imageHashes shape). */
  def audioHashes(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap(r => audioHash64(r.payload, r.meta).map(s => (r.id, s)))
    }.toDF("doc_id", "sig")
  }

  /** F54: audio near-dup pairs at hamming ≤ `maxHamming` — the identical
    * sig-level rep-collapse + [[MinHash.hammingPairs64]] banding +
    * member expansion as [[imageNearDupPairs]]; one shared, spec-proven
    * join for every 64-bit perceptual family. */
  def audioNearDupPairs(records: Dataset[MediaRecord],
      maxHamming: Int = 3): DataFrame =
    sigNearDupPairs(audioHashes(records), maxHamming)

  /** The shared pair machinery over ANY (doc_id, sig) frame. */
  private[graft] def sigNearDupPairs(raw: DataFrame,
      maxHamming: Int): DataFrame = {
    val sigs = raw.localCheckpoint(eager = false)
    val groups = sigs.groupBy(col("sig")).agg(min(col("doc_id")).as("rep"))
    val repPairs = MinHash.hammingPairs64(
      groups.select(col("rep").as("doc_id"), col("sig")), maxHamming)
    val members = sigs
    val crossPairs = repPairs
      .join(members.select(col("sig").as("siga"), col("doc_id").as("ma"))
        .join(groups.select(col("sig").as("siga"), col("rep").as("a_id")), Seq("siga")),
        Seq("a_id"))
      .join(members.select(col("sig").as("sigb"), col("doc_id").as("mb"))
        .join(groups.select(col("sig").as("sigb"), col("rep").as("b_id")), Seq("sigb")),
        Seq("b_id"))
      .select(least(col("ma"), col("mb")).as("a_id"),
        greatest(col("ma"), col("mb")).as("b_id"), col("hamming"))
    val within = members.select(col("sig"), col("doc_id").as("a_id"))
      .join(members.select(col("sig"), col("doc_id").as("b_id")), Seq("sig"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(0L).as("hamming"))
    crossPairs.unionByName(within)
  }

  final case class AudioFeatures(id: Long, n_bytes: Long, sample_rate: Int,
      channels: Int, frames: Long, sample_hash: Long, ok: Boolean)

  /** Typed audio-feature extraction — the audio sibling of
    * [[decodeFeatures]], with the schema audio actually has (rate /
    * channels / frames) instead of width×height. Real for
    * [[RealAudioFormats]]; anything else is `ok = false` zeroes (an mp3
    * here is honest refusal, not a stub guess).
    */
  def decodeAudioFeatures(records: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        decodeAudio(r.payload, r.meta.format) match {
          case Some((h, rate, ch, frames)) =>
            AudioFeatures(r.id, r.payload.length.toLong, rate, ch, frames, h, ok = true)
          case None =>
            AudioFeatures(r.id, r.payload.length.toLong, 0, 0, 0L, 0L, ok = false)
        }
      }
    }
  }

  /** Codec: REAL for baseline PNG/JPEG ([[RealImageFormats]] →
    * `javax.imageio`, actual dimensions + pixel hash) and for WAV/AIFF
    * ([[RealAudioFormats]] → `javax.sound.sampled`, PCM-stream hash with
    * sample rate / channels standing in the width / height slots of this
    * image-shaped generic schema — [[decodeAudioFeatures]] is the typed
    * path with honest field names); `ok = false` with zeroed features
    * when the payload does not decode as claimed. A clearly-marked
    * deterministic STUB remains for compressed audio and video — no
    * media libraries in this container. A production deployment swaps
    * the stub branch for a library call (e.g. javacv); everything around
    * it (partition batching, schema, failure nullability) is production
    * plumbing either way.
    */
  private def decodeOne(payload: Array[Byte], meta: MediaMeta): (Long, Int, Int, Boolean) =
    if (RealImageFormats(meta.format))
      decodeImage(payload, meta.format).map { case (h, w, ht) => (h, w, ht, true) }
        .getOrElse((0L, 0, 0, false))
    else if (RealAudioFormats(meta.format))
      decodeAudio(payload, meta.format)
        .map { case (h, rate, ch, _) => (h, rate, ch, true) }
        .getOrElse((0L, 0, 0, false))
    else {
      // STUB branch: byte-sum checksum + declared dimensions
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      (sum, meta.declaredWidth, meta.declaredHeight, payload.nonEmpty)
    }

  /** Partition-wise decode: one codec context per partition (the expensive
    * init a real codec would amortize), records streamed through it.
    */
  def decodeFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real codecs init native context here, once per partition
      it.map { r =>
        val (checksum, w, h, ok) = decodeOne(r.payload, r.meta)
        MediaFeatures(r.id, r.modality, r.payload.length.toLong, checksum, w, h, ok)
      }
    }
  }

  /** Whole path as a DataFrame for ad-hoc use. */
  def features(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(synthesize(spark, dir)).toDF().orderBy(col("id"))

  /** STUB resize — deterministic fake: a real implementation calls the
    * image library's scaler on the decoded pixels. The plumbing contract
    * it honors is real: metadata updated in lockstep with the payload,
    * aspect decisions made per record, payload byte count scales with the
    * target area (so downstream size accounting — batching, shuffle
    * sizing — behaves like production).
    */
  def resize(records: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val w = math.max(1, r.meta.declaredWidth)
        val h = math.max(1, r.meta.declaredHeight)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        // fake pixel buffer: payload truncated/extended to the new area,
        // deterministic from the source bytes
        val area = math.min(nw * nh, r.payload.length max 1)
        val out = java.util.Arrays.copyOf(r.payload, area)
        r.copy(payload = out, meta = r.meta.copy(declaredWidth = nw, declaredHeight = nh))
      }
    }
  }

  // ---- F53 (round 17): image near-dup via perceptual dHash ---------------

  /** 64-bit perceptual DIFFERENCE hash (dHash — the LAION/DataComp-style
    * image-dedup fingerprint: robust to re-encoding and mild resizing
    * because it keys on the gradient STRUCTURE, not the bytes). REAL for
    * PNG/JPEG — pixels come from the verified `javax.imageio` decode —
    * with pinned integer arithmetic so the hash is engine- and
    * platform-deterministic:
    *   - luma = (299·R + 587·G + 114·B) div 1000 per pixel,
    *   - a 9×8 grid of cells, cell (r, c) = Σ luma over the pixel block
    *     rows [r·H div 8, (r+1)·H div 8) × cols [c·W div 9, (c+1)·W div 9)
    *     div the block's pixel count (empty blocks on tiny images clamp
    *     to one pixel),
    *   - bit r·8 + c = 1 iff cell(r, c+1) > cell(r, c).
    * Stub-format payloads (no codec in this container) hash their raw
    * byte stream through the same grid — 72 contiguous byte ranges
    * row-major, same comparison rule — the [[decodeOne]] stub convention:
    * a deterministic stand-in with the production plumbing around it
    * real. None for undecodable/mislabeled real-format payloads and
    * empty stubs (no signature — the F2 NULL-sig rule: absent, never a
    * sentinel that would false-pair all failures).
    */
  def dHash64(payload: Array[Byte], meta: MediaMeta): Option[Long] =
    if (RealImageFormats(meta.format))
      readVerifiedImage(payload, meta.format).map(dHashPixels)
    else if (payload.isEmpty) None
    else Some(dHashBytes(payload))

  private def dHashPixels(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val lumaRow = new Array[Int](w)
    // cell sums/counts, 8 rows × 9 cols
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    val rgb = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rgb, 0, w)
      var x = 0
      while (x < w) {
        val p = rgb(x)
        lumaRow(x) = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)) / 1000
        x += 1
      }
      val gr = math.min(7, y * 8 / h)
      x = 0
      while (x < w) {
        val gc = math.min(8, x * 9 / w)
        sums(gr)(gc) += lumaRow(x); cnts(gr)(gc) += 1
        x += 1
      }
      y += 1
    }
    // empty blocks (w < 9 or h < 8): clamp to the nearest filled cell's
    // value by borrowing the previous column/row — deterministic and
    // only reachable on tiny images
    val cell = Array.ofDim[Long](8, 9)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        cell(r)(c) =
          if (cnts(r)(c) > 0) sums(r)(c) / cnts(r)(c)
          else if (c > 0) cell(r)(c - 1)
          else if (r > 0) cell(r - 1)(c)
          else 0L
        c += 1
      }
      r += 1
    }
    gridBits(cell)
  }

  private def dHashBytes(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val cell = Array.ofDim[Long](8, 9)
    var i = 0 // cell index row-major over 72 contiguous byte ranges
    while (i < 72) {
      val lo = (i.toLong * n / 72).toInt
      val hi = math.max(lo + 1, ((i + 1).toLong * n / 72).toInt) min n
      var s = 0L
      var j = lo
      while (j < hi) { s += bytes(j) & 0xff; j += 1 }
      cell(i / 9)(i % 9) = if (hi > lo) s / (hi - lo) else cell(i / 9)(0)
      i += 1
    }
    gridBits(cell)
  }

  /** OFFSET-PHASE dHash over the verified decode's pixels — the second,
    * independently-constructed image family for the round-19 verify
    * stage: the [[dHashPixels]] 8×9 luma grid with every cell boundary
    * shifted by HALF a cell in both axes (pixels in the leading half-row/
    * half-column fold into cell 0 — deterministic), same right-neighbor
    * comparisons. Local edits flip only the comparisons they touch (the
    * property a mean-threshold aHash lacks — see [[derivEnvelopeBits]]'s
    * note), while the shifted cell CONTENTS decorrelate the collision
    * pattern from the primary family's. Same pinned integer luma math. */
  private def dHashPixelsOffset(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    val rgb = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rgb, 0, w)
      val kr = (y.toLong * 16 / h).toInt
      val gr = if (kr == 0) 0 else math.min(7, (kr - 1) / 2)
      var x = 0
      while (x < w) {
        val p = rgb(x)
        val luma = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)) / 1000
        val kc = (x.toLong * 18 / w).toInt
        val gc = if (kc == 0) 0 else math.min(8, (kc - 1) / 2)
        sums(gr)(gc) += luma; cnts(gr)(gc) += 1
        x += 1
      }
      y += 1
    }
    val cell = Array.ofDim[Long](8, 9)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        cell(r)(c) =
          if (cnts(r)(c) > 0) sums(r)(c) / cnts(r)(c)
          else if (c > 0) cell(r)(c - 1)
          else if (r > 0) cell(r - 1)(c)
          else 0L
        c += 1
      }
      r += 1
    }
    gridBits(cell)
  }

  /** Offset-phase byte-range dHash — the stub-format sibling of
    * [[dHashPixelsOffset]]: [[dHashBytes]]' 72 contiguous ranges shifted
    * by half a range. */
  private def dHashBytesOffset(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val cell = Array.ofDim[Long](8, 9)
    var i = 0
    while (i < 72) {
      val lo = ((2L * i + 1) * n / 144).toInt min n
      val hi = math.max(lo + 1, ((2L * i + 3) * n / 144).toInt) min n
      var s = 0L
      var j = lo
      while (j < hi) { s += bytes(j) & 0xff; j += 1 }
      cell(i / 9)(i % 9) = if (hi > lo) s / (hi - lo) else cell(i / 9)(0)
      i += 1
    }
    gridBits(cell)
  }

  /** BOTH image families from ONE decode (the aud18 lesson: never decode
    * a payload twice on the hot path): (dHash, offset-phase dHash) for
    * real formats, the byte-range twins for stub formats, None for
    * undecodable/mislabeled/empty (the F2 NULL-sig rule — both or
    * neither, so the verify stage never sees a half-signed record). */
  def imageSigPair(payload: Array[Byte], meta: MediaMeta): Option[(Long, Long)] =
    if (RealImageFormats(meta.format))
      readVerifiedImage(payload, meta.format)
        .map(img => (dHashPixels(img), dHashPixelsOffset(img)))
    else if (payload.isEmpty) None
    else Some((dHashBytes(payload), dHashBytesOffset(payload)))

  /** Both audio families from one decode: primary = envelope over the
    * |sample| stream; secondary = the derivative envelope when the
    * stream is long enough ([[MinSecondaryValues]]) and the cell-local
    * parity hash over the SAMPLES ([[cellHashSampleBits]]) otherwise —
    * the same short-stream dispatch as [[videoSigPair]], which a
    * sub-130-sample clip needs for the same measured reason (fewer
    * deltas than envelope cells makes the derivative a second linear
    * functional of the values the primary compares). The short-stream
    * hash runs over the DECODED samples, not the container bytes, so a
    * WAV and an AIFF of identical PCM still verify as the duplicate the
    * decode-based primary says they are. */
  def audioSigPair(payload: Array[Byte], meta: MediaMeta): Option[(Long, Long)] = {
    val decoded =
      if (RealAudioFormats(meta.format))
        readPcmAbs(payload, meta.format).filter(_.nonEmpty)
      else if (payload.isEmpty) None
      else Some(payload.map(b => (b & 0xff).toLong))
    decoded.map { v =>
      val sig2 =
        if (v.length >= MinSecondaryValues) derivEnvelopeBits(v)
        else cellHashSampleBits(v)
      (envelopeBits(v), sig2)
    }
  }

  private def gridBits(cell: Array[Array[Long]]): Long = {
    var sig = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cell(r)(c + 1) > cell(r)(c)) sig |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    sig
  }

  /** Per-record dHash signatures: (id, sig) — a partition-wise map, zero
    * shuffle (the decodeFeatures shape); records with no signature drop.
    */
  def imageHashes(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap(r => dHash64(r.payload, r.meta).map(s => (r.id, s)))
    }.toDF("doc_id", "sig")
  }

  /** F53: image near-dup pairs at hamming ≤ `maxHamming` over the dHash
    * signatures — the [[MinHash.hammingPairs64]] Manku banding (recall
    * exact by the pigeonhole theorem), with the same sig-level
    * rep-collapse the SimHash family carries: exact byte-copies (and any
    * re-encodes that hash identically) share EVERY band key, so one
    * representative per distinct signature enters the band join and
    * members expand back afterwards (within-sig pairs are hamming 0 by
    * construction) — a 10⁶-copy hot image costs one banded row, not 10¹²
    * join rows. Returns (a_id, b_id, hamming), a_id < b_id.
    */
  def imageNearDupPairs(records: Dataset[MediaRecord],
      maxHamming: Int = 3): DataFrame =
    sigNearDupPairs(imageHashes(records), maxHamming)

  /** F53 composed with F11's clustering: image dedup GROUPS — connected
    * components over the banded hamming relation (near-dup images CHAIN,
    * the same reason every other near-dup family ships a groups
    * composition), every record labeled (doc_id, cluster_id,
    * cluster_size). Records with no signature (undecodable) label
    * themselves — every input id gets a cluster row. Edges are the
    * simhashDedupGroups LINEAR form, not the all-pairs expansion: rep
    * pairs over distinct signatures PLUS member→rep star edges, so a
    * 10⁶-copy hot image contributes 10⁶ − 1 star edges (one CC group),
    * never 10¹² pair rows — labels identical, spec-pinned.
    */
  def imageDedupGroups(spark: SparkSession, records: Dataset[MediaRecord],
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    sigDedupGroups(spark, records.map(_.id).toDF("doc_id"),
      imageHashes(records), maxHamming)
  }

  /** F54 groups: the audio sibling — same linear rep+star CC shape. */
  def audioDedupGroups(spark: SparkSession, records: Dataset[MediaRecord],
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    sigDedupGroups(spark, records.map(_.id).toDF("doc_id"),
      audioHashes(records), maxHamming)
  }

  /** Shared groups machinery over ANY (doc_id, sig) frame + the full id
    * list (unhashable records label themselves). */
  private[graft] def sigDedupGroups(spark: SparkSession, ids: DataFrame,
      raw: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = raw.localCheckpoint(eager = false)
    val groups = sigs.groupBy(col("sig")).agg(min(col("doc_id")).as("rep"))
    val repPairs = MinHash.hammingPairs64(
      groups.select(col("rep").as("doc_id"), col("sig")), maxHamming)
      .select(col("a_id"), col("b_id"))
    val star = sigs.join(groups, Seq("sig"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("a_id"), col("rep").as("b_id"))
    Dedup.withClusterSize(Dedup.connectedComponents(spark, ids,
      repPairs.unionByName(star)))
  }

  // ---- F57b (round 18): video near-dup over the frame-sample stub --------

  /** Pinned frame size for the stub video codec: [[sampleFrames]]' slicing
    * at 1 KiB per "frame". A real keyframe extractor replaces the slicing;
    * everything downstream (checksum sequence → envelope → banding) is the
    * production shape either way. */
  val VideoFrameBytes: Int = 1024

  /** 64-bit video signature: the [[envelopeBits]] difference hash over the
    * per-frame checksum SEQUENCE — the same "shape along time" idea as
    * [[audioHash64]], one level up (frames instead of samples). Decode is
    * the honest STUB ([[sampleFrames]]' fixed-size slicing — no video
    * codec exists in this container), so byte-identical copies and
    * frame-REGION edits behave exactly like the real thing (copy = 0
    * bits, a dented frame run flips ≤ 2 adjacent comparisons) while
    * re-encodes do NOT match — the documented stub limitation; a real
    * deployment swaps the slicer for keyframe extraction and keeps this
    * hash. None for payloads with no complete frame (the F2 NULL-sig
    * rule).
    */
  def videoHash64(payload: Array[Byte]): Option[Long] = {
    val nFrames = payload.length / VideoFrameBytes
    if (nFrames == 0) None
    else Some(envelopeBits(Array.tabulate(nFrames) { f =>
      var sum = 0L
      var i = f * VideoFrameBytes
      val end = i + VideoFrameBytes
      while (i < end) { sum += payload(i) & 0xff; i += 1 }
      sum
    }))
  }

  /** Streams with fewer values than this get their SECONDARY family
    * computed at a finer granularity when one exists (round 20, VERDICT
    * r19 item 4): below 2 values per envelope cell (2 × 65), the
    * derivative envelope's cells each hold ≤ 1 delta, so cell
    * comparisons reduce to single-value comparisons of the SAME values
    * the primary envelope already compared — near-vacuous as an
    * independent verify (the media19 cert's 65-frame videos: +18 video
    * chance merges survived the frame-granular secondary; `Adhoc
    * media20` reruns the identical corpus with the byte-granular
    * secondary and the video residual drops to 0).
    */
  private[graft] val MinSecondaryValues: Int = 130

  /** Cell-local parity hash → 64 bits: bit i = one avalanche-mixed bit
    * of a multiplicative fold over the bytes of cell i (64 equal
    * ranges) — the round-20 SHORT-STREAM secondary family. Locality is
    * by construction (an edit flips only the cells whose bytes it
    * touches — a one-frame dent spans ≤ 2 of the 64 cells), copies are
    * trivially 0 bits, and chance bits are independent fair coins for
    * ANY pair of differing streams because the avalanche finalizer
    * destroys linear structure before the bit is taken (the raw fold's
    * low bit alone would be a LINEAR function of the bytes' low bits —
    * exactly the cross-family coupling this replaces; see
    * [[videoSigPair]] for the measured failure). The trade, stated
    * honestly: a cell differing in even ONE byte flips its bit with
    * probability ½, so this family verifies byte-local edits and exact
    * copies — not re-encodes, which the stub video families never
    * matched anyway (the F57b documented limitation).
    */
  /** Full murmur3 fmix64 — BOTH multiply stages. The audioshort20 probe
    * measured the single-multiply shortcut leaking: a constant +5 level
    * shift gives every cell's fold a constant pre-mix delta, and one
    * multiply + xorshift left enough correlation that a shifted pair
    * landed 5 bits apart (p ≈ 4·10⁻¹² under a fair coin — structure,
    * not luck). Two multiply stages restore the fair-coin behavior
    * (same probe re-measured: shifted pairs ≥ 16 bits). */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= -49064778989728563L // 0xff51afd7ed558ccd
    x ^= x >>> 33; x *= -4265267296055464877L // 0xc4ceb9fe1a85ec53
    x ^= x >>> 33
    x
  }

  private def cellHashBits(bytes: Array[Byte]): Long = {
    val n = bytes.length
    var sig = 0L
    var i = 0
    while (i < 64) {
      val lo = (i.toLong * n / 64).toInt
      val hi = math.max(lo + 1, ((i + 1).toLong * n / 64).toInt) min n
      var h = 1125899906842597L // the pixel-hash FNV-ish constant
      var j = lo
      while (j < hi) { h = h * 31 + (bytes(j) & 0xff); j += 1 }
      if ((fmix64(h) & 1L) != 0L) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** [[cellHashBits]] over a decoded VALUE stream (the audio
    * short-stream secondary): same 64 equal cell ranges, same
    * multiplicative fold + avalanche finalizer per cell, folding each
    * full sample value instead of a byte — so the family keys on the
    * decode-derived samples (WAV ≡ AIFF of the same PCM) while keeping
    * the nonlinearity that decouples it from the envelope primary. */
  private def cellHashSampleBits(vals: Array[Long]): Long = {
    val n = vals.length
    var sig = 0L
    var i = 0
    while (i < 64) {
      val lo = (i.toLong * n / 64).toInt
      val hi = math.max(lo + 1, ((i + 1).toLong * n / 64).toInt) min n
      var h = 1125899906842597L
      var j = lo
      while (j < hi) { h = h * 31 + vals(j); j += 1 }
      if ((fmix64(h) & 1L) != 0L) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Both video families from one payload pass: the primary is always
    * the frame-checksum envelope (the banding key — locality in FRAMES
    * is what a real keyframe extractor preserves); the secondary is the
    * derivative envelope over the frame-checksum sequence when the
    * stream is long enough ([[MinSecondaryValues]]) and the cell-local
    * parity hash over the RAW BYTE stream ([[cellHashBits]]) otherwise.
    *
    * Short-stream design, MEASURED not assumed (`Adhoc media20probe`,
    * 120k 65-frame streams): the first cut — a byte-granular DERIVATIVE
    * ENVELOPE — was rejected because its 65 cells align byte-exactly
    * with the 65 frames, so each secondary cell is a per-frame |delta|
    * mean: a second linear functional of the very frame bytes whose
    * sums the primary compares. On primary-colliding pairs the two
    * families' descent patterns stayed correlated (chance secondary
    * distances centered ~15 bits instead of ~32, 61 pairs within the
    * k₂ = 6 cut → +45 chance merges at 770k — WORSE than the
    * frame-granular +18 it was meant to fix). The cell-hash family has
    * no linear structure to couple through: the same probe measures
    * chance candidates at ~32 ± 4 bits with 0 pairs ≤ 6, while a
    * one-frame dent spans ≤ 2 cells (Round20OpsSpec pins ≤ 2 bits) and
    * planted recall stays exact (`Adhoc media20`). A real keyframe
    * extractor swaps into the FRAME side only; the byte-stream
    * fallback reads the container bytes, which exist in any deployment.
    */
  def videoSigPair(payload: Array[Byte]): Option[(Long, Long)] = {
    val nFrames = payload.length / VideoFrameBytes
    if (nFrames == 0) None
    else {
      val sums = Array.tabulate(nFrames) { f =>
        var sum = 0L
        var i = f * VideoFrameBytes
        val end = i + VideoFrameBytes
        while (i < end) { sum += payload(i) & 0xff; i += 1 }
        sum
      }
      val sig2 =
        if (nFrames >= MinSecondaryValues) derivEnvelopeBits(sums)
        else cellHashBits(payload)
      Some((envelopeBits(sums), sig2))
    }
  }

  /** Per-record video signatures — the [[audioHashes]] shape. */
  def videoHashes(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap(r => videoHash64(r.payload).map(s => (r.id, s)))
    }.toDF("doc_id", "sig")
  }

  /** F57b: video near-dup pairs — the shared img17-certified machinery. */
  def videoNearDupPairs(records: Dataset[MediaRecord],
      maxHamming: Int = 3): DataFrame =
    sigNearDupPairs(videoHashes(records), maxHamming)

  /** F57b groups: the video sibling — same linear rep+star CC shape. */
  def videoDedupGroups(spark: SparkSession, records: Dataset[MediaRecord],
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    sigDedupGroups(spark, records.map(_.id).toDF("doc_id"),
      videoHashes(records), maxHamming)
  }

  // ---- Round 18 (VERDICT r17 item 4): media dedup in the curation facade --

  /** Modality-tagged perceptual signatures for a MIXED media corpus:
    * (doc_id, modality, sig) — image records through [[dHash64]], audio
    * through [[audioHash64]], one partition-wise map, zero shuffle. The
    * modality column is load-bearing: the two hash families live in
    * DIFFERENT 64-bit spaces (a pixel-grid dHash must never band- or
    * equi-join an energy envelope), so every downstream join carries
    * (modality, sig), not sig alone. Records of other modalities and
    * undecodable payloads emit a NULL sig (the F2 NULL-sig rule: nothing
    * to compare, never a match).
    */
  def mediaSigs(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val sig = r.modality match {
          case "image" => dHash64(r.payload, r.meta)
          case "audio" => audioHash64(r.payload, r.meta)
          case "video" => videoHash64(r.payload)
          case _ => None
        }
        (r.id, r.modality, r.payload, r.meta, sig)
      }
    }.toDF("id", "modality", "payload", "meta", "sig")
  }

  /** The delivered-corpus signature frame the streaming media screen
    * anti-joins against — (modality, sig) distinct, the media sibling of
    * `Graft.corpusFingerprints`. Write it (partitioned/appended) from
    * the delivered corpus; the stream-static join re-resolves it per
    * micro-batch, so an external appender keeps the screen current
    * without a stream restart.
    */
  def mediaSigFingerprints(records: Dataset[MediaRecord]): DataFrame =
    mediaSigs(records).filter(col("sig").isNotNull)
      .select(col("modality"), col("sig")).distinct()

  private val HashedModalities = Set("image", "audio", "video")

  /** TWO-family modality-tagged signatures (round 19, VERDICT r18 item
    * 3): (id, modality, sig, sig2) — `sig` is the difference-hash family
    * ([[dHash64]]/[[audioHash64]]/[[videoHash64]], the banding key),
    * `sig2` the independently-constructed verify family: offset-phase
    * dHash for images ([[dHashPixelsOffset]]) and the derivative
    * envelope for audio/video streams ([[derivEnvelopeBits]]); streams
    * shorter than [[MinSecondaryValues]] get the cell-local parity hash
    * instead — over the raw container bytes for video
    * ([[videoSigPair]], round 20) and over the decoded samples for
    * audio ([[cellHashSampleBits]], the same round-20 dispatch — short
    * clips would otherwise keep the near-vacuous coupled derivative).
    * Mean-threshold (aHash) was measured and
    * REJECTED for this slot — see derivEnvelopeBits' note. One
    * partition-wise
    * map, ONE decode per record (both hashes from the same pixels/
    * samples/frames — the aud18 no-double-decode rule). Both sigs NULL
    * together (undecodable / unknown modality / empty) — the verify
    * stage never sees a half-signed record.
    */
  def mediaSigs2(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val pair = r.modality match {
          case "image" => imageSigPair(r.payload, r.meta)
          case "audio" => audioSigPair(r.payload, r.meta)
          case "video" => videoSigPair(r.payload)
          case _ => None
        }
        (r.id, r.modality, pair.map(_._1), pair.map(_._2))
      }
    }.toDF("id", "modality", "sig", "sig2")
  }

  /** The verified groups machinery over a two-family (doc_id, sig, sig2)
    * frame + the full id list: candidate pairs come from banding the
    * PRIMARY sig (recall exact by pigeonhole, rep-collapsed on the
    * (sig, sig2) pair), and a CC edge forms only when the pair's
    * SECONDARY sigs are also within `verifyHamming` bits. The two
    * families are only PARTIALLY independent — offset cells share half
    * their bytes/samples with primary cells — so the cut is set by
    * MEASUREMENT, not an independence assumption: on the 770k media19
    * cert corpus, planted local edits sit at secondary distance ≤ 2
    * while primary-colliding CHANCE pairs start at 7 (`Adhoc
    * media19probe` prints the full histogram), so the default
    * verifyHamming = 6 keeps every true edge with 3× headroom and kills
    * every measured chance merge. Within an identical (sig, sig2) group
    * the verify is trivially satisfied (0 bits in both); star edges
    * keep the linear rep+star CC shape.
    */
  private[graft] def sigDedupGroupsVerified(spark: SparkSession,
      ids: DataFrame, raw: DataFrame, maxHamming: Int,
      verifyHamming: Int): DataFrame = {
    require(verifyHamming >= 0 && verifyHamming <= 63,
      s"verifyHamming must be in [0, 63], got $verifyHamming")
    val sigs = raw.localCheckpoint(eager = false)
    // Rep-collapse is per (sig, sig2) PAIR, not per sig alone, so several
    // reps sharing one primary sig can re-enter hammingPairs64 and share
    // every band key. The re-expansion is bounded by the secondary
    // family's diversity within one primary sig — re-encodes of one
    // payload that agree in the primary family rarely split the
    // secondary, so the multiplier stays O(1) in practice (media19/20
    // certs: no band-bucket blowup at 770k with 18% planted dup mass).
    // If a cert ever shows primary-sig skew here, collapse per sig first
    // and expand to (sig, sig2) reps only for the verify join.
    val groups = sigs.groupBy(col("sig"), col("sig2"))
      .agg(min(col("doc_id")).as("rep"))
    val s2 = groups.select(col("rep"), col("sig2"))
    val repPairs = MinHash.hammingPairs64(
        groups.select(col("rep").as("doc_id"), col("sig")), maxHamming)
      .join(s2.select(col("rep").as("a_id"), col("sig2").as("s2a")), Seq("a_id"))
      .join(s2.select(col("rep").as("b_id"), col("sig2").as("s2b")), Seq("b_id"))
      .filter(bit_count(col("s2a").bitwiseXOR(col("s2b"))) <= verifyHamming)
      .select(col("a_id"), col("b_id"))
    val star = sigs.join(groups, Seq("sig", "sig2"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("a_id"), col("rep").as("b_id"))
    Dedup.withClusterSize(Dedup.connectedComponents(spark, ids,
      repPairs.unionByName(star)))
  }

  /** Mixed-corpus VERIFIED dedup groups: [[mediaDedupGroups]] with the
    * round-19 second-family verify on every candidate pair. One
    * signature pass ([[mediaSigs2]]); per-modality clustering in
    * separate signature spaces; unsigned records label themselves. */
  def mediaDedupGroupsVerified(spark: SparkSession,
      records: Dataset[MediaRecord], maxHamming: Int = 3,
      verifyHamming: Int = 6): DataFrame = {
    val slim = mediaSigs2(records)
      .select(col("id").as("doc_id"), col("modality"), col("sig"), col("sig2"))
      .localCheckpoint(eager = false)
    HashedModalities.toSeq.sorted.map { m =>
      sigDedupGroupsVerified(spark,
        slim.filter(col("modality") === m).select(col("doc_id")),
        slim.filter(col("modality") === m && col("sig").isNotNull)
          .select(col("doc_id"), col("sig"), col("sig2")),
        maxHamming, verifyHamming)
    }.reduce(_ unionByName _)
      .unionByName(slim.filter(!col("modality").isin(HashedModalities.toSeq: _*))
        .select(col("doc_id"), col("doc_id").as("cluster_id"),
          lit(1L).as("cluster_size")))
  }

  /** Mixed-corpus dedup groups: [[imageDedupGroups]] ∪
    * [[audioDedupGroups]] ∪ [[videoDedupGroups]], each modality
    * clustered in its own signature space; records of other modalities
    * label themselves singletons (no hash family defined — honest
    * pass-through, not a guess). Every input id gets exactly one
    * (doc_id, cluster_id, cluster_size) row; cluster_id is the
    * component's min member id.
    */
  def mediaDedupGroups(spark: SparkSession, records: Dataset[MediaRecord],
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val oth = records.filter(r => !HashedModalities(r.modality))
    imageDedupGroups(spark, records.filter(r => r.modality == "image"), maxHamming)
      .unionByName(audioDedupGroups(spark, records.filter(r => r.modality == "audio"), maxHamming))
      .unionByName(videoDedupGroups(spark, records.filter(r => r.modality == "video"), maxHamming))
      .unionByName(oth.map(_.id).toDF("doc_id")
        .select(col("doc_id"), col("doc_id").as("cluster_id"),
          lit(1L).as("cluster_size")))
  }

  /** The batch MediaDedup curation stage: drop every record that is a
    * near-dup NON-representative (cluster member with id above the
    * min), keeping one exemplar per perceptual cluster — the media
    * sibling of the text pipeline's exact/near-dup stages, with the
    * same audited (kept, dropped) counts.
    *
    * Round 19 reshape (VERDICT r18 items 3 + 6):
    *   - VERIFIED merges: every banded candidate pair must also agree in
    *     the second, independently-constructed hash family within
    *     `verifyHamming` bits ([[sigDedupGroupsVerified]]) — the
    *     chance-merge guard the media18 cert priced (+18/+259/+964
    *     single-family chance merges at 10⁵–10⁶ records; the measured
    *     secondary-distance gap — plants ≤ 2 bits, chance ≥ 7 — lets
    *     the k₂ = 6 cut kill them all). Identical payloads agree in
    *     both families trivially, so planted recall is untouched
    *     (spec + cert).
    *   - SLIM audit: ONE partition-wise [[mediaSigs2]] pass hashes every
    *     record (one decode each), and every audit count runs over the
    *     checkpointed (id, modality, sig, sig2) frame — fingerprint
    *     width, never payload bytes (the r18 verdict's "what's wrong"
    *     item 2). Payloads are touched exactly twice: the hash pass and
    *     the final kept semi-join.
    */
  def mediaDedupAudited(spark: SparkSession, records: Dataset[MediaRecord],
      maxHamming: Int = 3, verifyHamming: Int = 6)
      : (Dataset[MediaRecord], Seq[Graft.StageCount]) = {
    val (kept, audit, _) =
      mediaDedupLedgered(spark, records, maxHamming, verifyHamming)
    (kept, audit)
  }

  /** [[mediaDedupAudited]] plus the per-record provenance ledger (round
    * 19, VERDICT r18 item 4): (kept, audit, (doc_id, stage, verdict))
    * where each input record gets exactly one ledger row — dropped at
    * its modality's near-dup stage, or kept at pipeline end (the
    * [[Graft.curationLedger]] semantics). The ledger reuses the
    * checkpointed slim signature frame and the per-modality groups the
    * audit already built — joins over fingerprint-width frames, zero
    * extra decode or payload passes.
    */
  def mediaDedupLedgered(spark: SparkSession, records: Dataset[MediaRecord],
      maxHamming: Int = 3, verifyHamming: Int = 6)
      : (Dataset[MediaRecord], Seq[Graft.StageCount], DataFrame) = {
    import spark.implicits._
    val recs = records.localCheckpoint(eager = false)
    val slim = mediaSigs2(recs)
      .select(col("id").as("doc_id"), col("modality"), col("sig"), col("sig2"))
      .localCheckpoint(eager = false)
    def reps(g: DataFrame): DataFrame =
      g.filter(col("doc_id") === col("cluster_id")).select(col("doc_id"))
    val nIn = slim.count()
    val stageNames = Seq(
      ("image_neardup", "image"), ("audio_neardup", "audio"),
      ("video_neardup", "video"))
    val byModality = stageNames.map { case (stage, m) =>
      val sub = slim.filter(col("modality") === m)
      val groups = sigDedupGroupsVerified(spark, sub.select(col("doc_id")),
        sub.filter(col("sig").isNotNull)
          .select(col("doc_id"), col("sig"), col("sig2")),
        maxHamming, verifyHamming).localCheckpoint(eager = false)
      val dropped = sub.select(col("doc_id"))
        .join(reps(groups), Seq("doc_id"), "left_anti")
      (stage, reps(groups), dropped, sub.count() - reps(groups).count())
    }
    val keepIds = byModality.map(_._2)
      .reduce(_ unionByName _)
      .unionByName(slim
        .filter(!col("modality").isin(HashedModalities.toSeq: _*))
        .select(col("doc_id")))
    val kept = recs.toDF().join(
        keepIds.withColumnRenamed("doc_id", "id"), Seq("id"), "left_semi")
      .as[MediaRecord]
    val audit = byModality.scanLeft(Graft.StageCount("input", nIn, 0L)) {
      case (prev, (stage, _, _, dropped)) =>
        Graft.StageCount(stage, prev.kept - dropped, dropped)
    }
    val ledger = byModality.map { case (stage, _, dropped, _) =>
      dropped.select(col("doc_id"), lit(stage).as("stage"),
        lit("dropped").as("verdict"))
    }.reduce(_ unionByName _)
      .unionByName(keepIds.select(col("doc_id"),
        lit(stageNames.last._1).as("stage"), lit("kept").as("verdict")))
    (kept, audit, ledger)
  }

  /** Streaming media screen — the `curateStream` sibling for media
    * records, the F28 standing-corpus pattern: drop arrivals whose
    * (modality, sig) is already in the DELIVERED corpus's signature
    * frame ([[mediaSigFingerprints]]) via a stream-static LEFT ANTI
    * join — stateless from the stream's perspective, the static side
    * re-resolved per micro-batch. Signature equality catches exact
    * copies, re-encodes, and (for audio) stereo re-layouts — everything
    * that hashes to the identical 64 bits; ≤ k-bit near-matches stay
    * batch-side, exactly as curateStream's note keeps the Jaccard half
    * of F28 batch-side (a banded stream-static candidate join would
    * need a per-arrival aggregate, i.e. watermarked state, for a
    * screen that must stay stateless). Undecodable arrivals carry a
    * NULL sig and pass through (a NULL key never equi-joins — the
    * nearDupSuppress null-text convention). Works identically on a
    * batch frame, which is how the spec pins results.
    */
  def mediaDedupStream(arrivals: Dataset[MediaRecord],
      corpusSigs: DataFrame): Dataset[MediaRecord] = {
    import arrivals.sparkSession.implicits._
    mediaSigs(arrivals)
      .join(corpusSigs.select(col("modality"), col("sig")),
        Seq("modality", "sig"), "left_anti")
      .select(col("id"), col("modality"), col("payload"), col("meta"))
      .as[MediaRecord]
  }

  /** The BANDED delivered-corpus signature frame the round-19 NEAR-match
    * streaming screen joins against: (modality, band, key, sig) — every
    * distinct (modality, sig) exploded into its maxHamming + 1 Manku
    * bands ([[MinHash.bandKeys64]]). Write it (partitioned/appended)
    * from the delivered corpus exactly like [[mediaSigFingerprints]];
    * (maxHamming + 1)× the rows of the exact frame, still
    * fingerprint-width.
    */
  def mediaSigBands(records: Dataset[MediaRecord],
      maxHamming: Int = 3): DataFrame =
    mediaSigFingerprints(records)
      .select(col("modality"), col("sig"),
        explode(MinHash.bandKeys64(col("sig"), maxHamming)).as("bk"))
      .select(col("modality"), col("bk.band").as("band"),
        col("bk.key").as("key"), col("sig"))

  private[graft] final case class ScreenCand(id: Long, modality: String,
      payload: Array[Byte], meta: MediaMeta, matched: Boolean)

  /** Streaming NEAR-match media screen (round 19, VERDICT r18 item 5):
    * drop arrivals within `maxHamming` bits of ANY delivered signature
    * of the same modality — the stateful upgrade over
    * [[mediaDedupStream]]'s exact-64-bit screen (which admits a 1-bit
    * re-encode by design). Shape: arrivals hash partition-wise, each
    * sig explodes into its maxHamming + 1 band keys, a stream-STATIC
    * left-outer join on (modality, band, key) surfaces candidate corpus
    * sigs (pigeonhole: a true ≤ k-bit match MUST share a band), each
    * candidate verifies `bit_count(xor) ≤ k`, and a
    * flatMapGroupsWithState keyed by arrival id (the E8 machinery —
    * per-batch groups, no state retained, NoTimeout) admits the record
    * iff NO candidate verified. NULL-sig arrivals band as (-1, 0),
    * which joins nothing and passes through (the exact screen's
    * convention). Works identically on a batch frame, which is how the
    * spec pins stream ≡ batch ≡ the sigNearDupPairs verdicts.
    *
    * Cost note: the payload rides the (maxHamming + 1) band rows into
    * the join and the group shuffle — acceptable for a screen stage; a
    * payload-free variant would need a second stream-stream join by id,
    * which Structured Streaming prices higher than the ride.
    */
  def mediaDedupStreamNear(arrivals: Dataset[MediaRecord],
      corpusBands: DataFrame, maxHamming: Int = 3): Dataset[MediaRecord] = {
    import arrivals.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val nullBand = array(struct(lit(-1).as("band"), lit(0L).as("key")))
    val banded = mediaSigs(arrivals)
      .select(col("id"), col("modality"), col("payload"), col("meta"),
        col("sig"),
        explode(when(col("sig").isNotNull,
          MinHash.bandKeys64(col("sig"), maxHamming)).otherwise(nullBand))
          .as("bk"))
      .select(col("id"), col("modality"), col("payload"), col("meta"),
        col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    val joined = banded
      .join(corpusBands.select(col("modality"), col("band"), col("key"),
        col("sig").as("corpus_sig")), Seq("modality", "band", "key"),
        "left_outer")
      .select(col("id"), col("modality"), col("payload"), col("meta"),
        (col("corpus_sig").isNotNull &&
          bit_count(col("sig").bitwiseXOR(col("corpus_sig"))) <= maxHamming)
          .as("matched"))
      .as[ScreenCand]
    joined.groupByKey(_.id)
      .flatMapGroupsWithState[Boolean, MediaRecord](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, _) =>
          var first: ScreenCand = null
          var hit = false
          rows.foreach { r =>
            if (first == null) first = r
            if (r.matched) hit = true
          }
          if (hit) Iterator.empty
          else Iterator.single(
            MediaRecord(first.id, first.modality, first.payload, first.meta))
      }
  }

  final case class FrameSample(id: Long, frameIdx: Int, checksum: Long)

  /** STUB frame-sample — treats the payload as a "video" of fixed-size
    * frames and emits every `stride`-th frame's checksum. Real codecs
    * replace the slicing with keyframe extraction; the explode shape
    * (one input row → N frame rows, computed partition-wise with no
    * shuffle) is the production plumbing being exercised.
    */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int,
      stride: Int): Dataset[FrameSample] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val nFrames = r.payload.length / math.max(1, frameBytes)
      (0 until nFrames by math.max(1, stride)).map { f =>
        var sum = 0L
        var i = f * frameBytes
        val end = i + frameBytes
        while (i < end) { sum += r.payload(i) & 0xff; i += 1 }
        FrameSample(r.id, f, sum)
      }
    }
  }
}
