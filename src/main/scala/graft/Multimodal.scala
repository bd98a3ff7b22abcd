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
  private def decodeImage(payload: Array[Byte], claimed: String): Option[(Long, Int, Int)] =
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        val expected = ImageFormatNames.getOrElse(claimed, Set.empty)
        // scan ALL sniff-matched readers for one whose format name matches
        // the CLAIMED format (round-10 ADVICE): a host app that registers
        // extra readers (e.g. TwelveMonkeys) can put a differently-named
        // reader FIRST for the same bytes — a correctly-labeled payload
        // must not fail closed just because of registry ordering. A
        // mislabeled payload still fails: no reader that sniffs the bytes
        // carries the claimed format's name.
        var matched: Option[javax.imageio.ImageReader] = None
        while (matched.isEmpty && readers.hasNext) {
          val r = readers.next()
          if (expected.contains(r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
            matched = Some(r)
          else r.dispose()
        }
        matched match {
          case None => None
          case Some(reader) =>
            try {
              reader.setInput(iis)
              val img = reader.read(0)
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
              Some((h, w, ht))
            } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

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

  /** Real WAV/AIFF decode: header fields (sample rate, channels, frame
    * count) plus a deterministic FNV-ish hash over the decoded PCM
    * stream bytes. None when the payload is corrupt, unreadable, or its
    * sniffed file type does not match the CLAIMED format — a valid WAV
    * labeled `audio/aiff` is a format-corrupted record, exactly the
    * image-path contract. The payload is in memory, so streams are
    * plain `ByteArrayInputStream`s (mark/reset-capable, as
    * `AudioSystem` requires) — no temp files.
    */
  private def decodeAudio(payload: Array[Byte],
      claimed: String): Option[(Long, Int, Int, Long)] =
    try {
      import javax.sound.sampled.AudioSystem
      val expected = AudioFileTypes.getOrElse(claimed, Set.empty)
      val sniffed = AudioSystem
        .getAudioFileFormat(new java.io.ByteArrayInputStream(payload))
        .getType.toString.toLowerCase(java.util.Locale.ROOT)
      if (!expected.contains(sniffed)) None
      else {
        val ais = AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
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
