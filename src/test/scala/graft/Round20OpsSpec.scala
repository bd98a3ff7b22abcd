package graft

import org.apache.spark.sql.functions._

/** Round-20 additions, per the round-19 verdict: the byte-granular
  * short-stream media secondary (item 4), frozen-model persistence
  * (item 1 — see ModelPersistenceSpec/FreshSessionSpec), the F60 URL
  * family (item 2 — see UrlsSpec), container ingestion (item 3 — see
  * ContainerSpec), the strict curation-ledger guard (item 5), and the
  * codegen link_chars kernel (item 7).
  */
class Round20OpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- item 4: byte-granular secondary for short video streams -----------

  private val vidMeta = Multimodal.MediaMeta("video/mp4", 0, 0)
  private val fb = Multimodal.VideoFrameBytes

  /** Two DIFFERENT 65-frame videos with IDENTICAL per-frame sums: A's
    * frame f is the constant v_f; B's frame f alternates v_f ± a_f
    * byte-by-byte (symmetric, so the frame sum is unchanged) with the
    * amplitude a_f cycling 10/25/40 by frame. The primary family
    * (frame-sum envelope) cannot tell them apart, and neither could the
    * round-19 frame-granular secondary (frame-sum DELTAS are also
    * identical) — exactly the near-vacuous-verify shape behind the
    * media19 cert's +18 video chance merges. The cell-local parity
    * hash reads the differing byte layouts directly and separates them.
    */
  private def sameFrameSumPair: (Array[Byte], Array[Byte]) = {
    def vf(f: Int): Int = 60 + (f * 3) % 150
    def af(f: Int): Int = 10 + (f % 3) * 15
    val a = Array.tabulate[Byte](65 * fb)(i => vf(i / fb).toByte)
    val b = Array.tabulate[Byte](65 * fb) { i =>
      val f = i / fb
      (if (i % 2 == 0) vf(f) - af(f) else vf(f) + af(f)).toByte
    }
    (a, b)
  }

  test("short-video secondary: identical frame sums no longer verify-collide") {
    val (pa, pb) = sameFrameSumPair
    val recs = Seq(
      Multimodal.MediaRecord(1L, "video", pa, vidMeta),
      Multimodal.MediaRecord(2L, "video", pb, vidMeta)).toDS()
    val sigs = Multimodal.mediaSigs2(recs).orderBy("id")
      .select("sig", "sig2").collect()
    // the hazard: primary family identical (frame sums equal per index)
    assert(sigs(0).getLong(0) === sigs(1).getLong(0), "primary must collide")
    // the round-19 frame-granular secondary was ALSO identical here —
    // the cell-hash one differs widely
    assert(java.lang.Long.bitCount(
      sigs(0).getLong(1) ^ sigs(1).getLong(1)) > 10,
      s"short-stream secondary must separate: ${sigs(0)} vs ${sigs(1)}")
    val unverified = Multimodal.mediaDedupGroups(spark, recs, 3)
      .agg(max(col("cluster_size"))).head().getLong(0)
    val verified = Multimodal.mediaDedupGroupsVerified(spark, recs, 3, 6)
      .agg(max(col("cluster_size"))).head().getLong(0)
    assert(unverified === 2L && verified === 1L)
  }

  test("short-video secondary keeps planted copy + one-frame dent edges") {
    // the media20 plant shape: byte-copy and a whole-frame dent on a
    // 65-frame video. The dent's 1024 bytes span ≤ 2 of the 64
    // cell-hash cells (1040 bytes each), so ≤ 2 secondary bits flip —
    // well inside the verifyHamming = 6 cut (asserted exactly here).
    val base = Array.tabulate[Byte](65 * fb)(i => ((i * 37 + 11) % 251).toByte)
    val dented = base.clone()
    (10 * fb until 11 * fb).foreach(i => dented(i) = 0xFF.toByte)
    val recs = Seq(
      Multimodal.MediaRecord(1L, "video", base, vidMeta),
      Multimodal.MediaRecord(2L, "video", base.clone(), vidMeta),
      Multimodal.MediaRecord(3L, "video", dented, vidMeta)).toDS()
    val sigs = Multimodal.mediaSigs2(recs).orderBy("id")
      .select("sig", "sig2").collect()
    assert(sigs(0).getLong(1) === sigs(1).getLong(1)) // copy: sig2 equal
    val dentBits = java.lang.Long.bitCount(sigs(0).getLong(1) ^ sigs(2).getLong(1))
    assert(dentBits <= 2, s"one-frame dent flipped $dentBits secondary bits")
    val groups = Multimodal.mediaDedupGroupsVerified(spark, recs, 3, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(1L) === 1L && groups(2L) === 1L && groups(3L) === 1L,
      groups.toString)
  }

  // ---- item 7: codegen link_chars (anchor_chars kernel) -------------------

  test("anchor_chars kernel ≡ the HOF fold, bit-for-bit, on edge-heavy anchors") {
    graft.functions.VectorFunctions.register(spark)
    val contents = Seq(
      "",                                             // no anchors
      "<a href=\"/\">home</a>",                       // one plain anchor
      "<a>bare</a> text <a href=\"x\">καλημέρα 世界</a>", // multi-byte inner text
      "<a href=\"#\"></a>",                           // empty inner text
      "<a\nhref=\"x\">with\nnewlines</a>",            // (?s) never matches '<a\n' — no [ ]
      "<a href=\"x\">nested <b>never</b></a>",        // [^<] stops at nested tag
      "<apple>not an anchor</apple> <a >spaced attr</a>",
      (1 to 50).map(k => s"<a href='$k'>link number $k</a>").mkString(" "))
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("id", "content")
    val rows = contents.select(
        call_function("anchor_chars", col("content")).as("kernel"),
        Html.linkCharsFoldCol(col("content")).as("fold"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("anchor_chars stays inside whole-stage codegen (CODEGEN_ONLY)") {
    val strict = spark.newSession()
    strict.conf.set("spark.sql.codegen.fallback", "false")
    strict.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    graft.functions.VectorFunctions.register(strict)
    // spark.range (a LocalTableScan plans no codegen stage to assert on);
    // reference the kernel TWICE in one projection — the freshName pin
    val docs = strict.range(50).selectExpr(
      "concat('<a href=\"/\">link ', id, '</a> tail') AS content")
    val out = docs.select(
      call_function("anchor_chars", col("content")).as("a"),
      call_function("anchor_chars", col("content")).as("b"))
    val got = out.agg(sum(col("a")), sum(col("b"))).head()
    assert(got.getLong(0) === got.getLong(1) && got.getLong(0) > 0L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("anchor_chars")), plan.take(500))
  }

  test("long videos keep the frame-granular secondary (real-decode swap path)") {
    // at ≥ MinSecondaryValues frames the secondary must come from the
    // frame-checksum sequence alone: two byte layouts with identical
    // frame sums then share sig2 (a real keyframe extractor sees frames,
    // not container bytes — the family a deployment swaps in)
    def vf(f: Int): Int = 40 + (f * 7) % 180
    val n = Multimodal.MinSecondaryValues
    val a = Array.tabulate[Byte](n * fb)(i => vf(i / fb).toByte)
    val b = Array.tabulate[Byte](n * fb) { i =>
      val v = vf(i / fb)
      (if (i % fb < fb / 2) v - 20 else v + 20).toByte
    }
    val recs = Seq(
      Multimodal.MediaRecord(1L, "video", a, vidMeta),
      Multimodal.MediaRecord(2L, "video", b, vidMeta)).toDS()
    val sigs = Multimodal.mediaSigs2(recs).orderBy("id")
      .select("sig", "sig2").collect()
    assert(sigs(0).getLong(0) === sigs(1).getLong(0))
    assert(sigs(0).getLong(1) === sigs(1).getLong(1),
      "frame-granular secondary must ignore in-frame byte layout")
  }
}
