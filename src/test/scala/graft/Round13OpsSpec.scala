package graft

import org.apache.spark.sql.functions._

/** Round-13 additions, part 1 — the three ADVICE items: strip_accents
  * mark-category parity (asserted in Round12OpsSpec's parity test),
  * Tables.events' session-timezone independence, and cmsHeavyHitters'
  * native-type probing for non-integral keys.
  */
class Round13OpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- Tables.events: no session-timezone dependence or mutation -----

  test("events NTZ→epoch cast is session-timezone-free and mutates no session conf") {
    val tzKey = "spark.sql.session.timeZone"
    val utcRows = Tables.events(spark, sf001)
      .select(col("event_id"), col("ts")).orderBy(col("event_id")).limit(50).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val before = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "Asia/Tokyo")
      val tokyoRows = Tables.events(spark, sf001)
        .select(col("event_id"), col("ts")).orderBy(col("event_id")).limit(50).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(tokyoRows.sameElements(utcRows),
        "epoch-nanos contract must not shift with the caller's session timezone")
      assert(spark.conf.get(tzKey) == "Asia/Tokyo",
        "Tables.events must not silently rewrite the caller's session timezone")
    } finally spark.conf.set(tzKey, before)
  }

  // ---- cmsHeavyHitters: native-type probe ----------------------------

  test("cmsHeavyHitters probes string keys natively (no long cast)") {
    val df = (Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(100)("gamma") ++ (0 until 200).map(i => s"tail_$i"))
      .toDF("k")
    val out = Relational.cmsHeavyHitters(spark, df, "k", k = 3,
      eps = 0.001, confidence = 0.99).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("alpha", "beta", "gamma"))
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      // CMS never undercounts; with eps=0.001 over 1100 rows the
      // overcount bound is ~2, so the estimate must be ≈ exact
      assert(est >= exact && est <= exact + 3,
        s"${r.getString(0)}: exact=$exact est=$est")
    }
  }

  test("cmsHeavyHitters keeps the integral path's long output column") {
    val df = (Seq.fill(50)(7L) ++ Seq.fill(30)(9L) ++ (0L until 20L)).toDF("k")
    val out = Relational.cmsHeavyHitters(spark, df, "k", k = 2)
    assert(out.schema("k").dataType == org.apache.spark.sql.types.LongType)
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(7L, 9L))
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
  }

  // ---- F26: kernel scoring ≡ join formulation ------------------------

  test("langid kernel scoring ≡ the join formulation on a messy seeded corpus") {
    // adversarial corpus for the equivalence: word inventories OVERLAP
    // across languages (shared trigrams must credit every profile that
    // contains them), multibyte words exercise the char-offset walk,
    // repeated words force the per-doc distinct, zero-length and <3-char
    // docs hit the eligibility filter, and an out-of-inventory doc gets
    // the ("", 0) empty prediction
    val rnd = new scala.util.Random(13)
    val langsV = Seq("aa", "bb", "cc")
    val vocab = Map(
      "aa" -> Seq("the", "thé", "que", "quiet", "日本語"),
      "bb" -> Seq("que", "quo", "thé", "boub", "zz"),
      "cc" -> Seq("xyz", "zyx", "the", "日本語", "ab"))
    val docs = ((0 until 240).map { i =>
      val lang = langsV(i % 3)
      val words = Seq.fill(rnd.nextInt(10))(vocab(lang)(rnd.nextInt(5)))
      (i.toLong, lang, words.mkString(" "))
    } :+ ((240L, "aa", "PPP QQQ RRR PPP"))).toDF("doc_id", "lang", "text")
    val kernel = TextOps.langIdProfileOf(docs, topN = 6).collect().map(_.toString)
    val join = TextOps.langIdProfileJoinOf(docs, topN = 6).collect().map(_.toString)
    assert(kernel.nonEmpty && kernel.sameElements(join),
      s"kernel/join divergence:\n${kernel.zip(join).filter(p => p._1 != p._2).take(5).mkString("\n")}")
  }

  test("cmsHeavyHitters rejects non-hashable key types up front") {
    val df = Seq(1.5, 2.5, 1.5).toDF("k")
    val e = intercept[IllegalArgumentException] {
      Relational.cmsHeavyHitters(spark, df, "k")
    }
    assert(e.getMessage.contains("unsupported key type"))
  }
}
