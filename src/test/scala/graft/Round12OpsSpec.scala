package graft

import org.apache.spark.sql.functions._

/** Round-12 additions: corpus-learned trigram-profile language ID (F26),
  * the Ed-Join location-adaptive prefix kernel, and the CC/LSH plan
  * reshapes (single-execution edge plan, unordered LSH edge feed).
  */
class Round12OpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- F26: learned language ID --------------------------------------

  /** Three planted "languages" with disjoint character inventories, so
    * the trigram profiles are fully separable and held-out accuracy must
    * be perfect — any wiring error (seed leak, tie-break drift, join
    * dropping docs) shows up as a misclassification.
    */
  private def plantedCorpus(n: Int) = {
    // character inventories are DISJOINT across languages, so no trigram
    // (space-joined ones included) can appear in two profiles
    val vocab = Map(
      "aa" -> Seq("aiea", "eiae", "aeia", "iaea"),
      "bb" -> Seq("boub", "obub", "bubo", "oubo"),
      "cc" -> Seq("cxzc", "xczx", "zcxz", "czxc"))
    val rnd = new scala.util.Random(12)
    (0 until n).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val words = Seq.fill(8)(vocab(lang)(rnd.nextInt(4)))
      (i.toLong, lang, words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
  }

  test("langIdProfileOf classifies held-out docs perfectly on separable languages") {
    val docs = plantedCorpus(120)
    val out = TextOps.langIdProfileOf(docs).collect()
    assert(out.length == 120)
    val wrong = out.filter(r => !r.getBoolean(4))
    assert(wrong.isEmpty, s"misclassified: ${wrong.take(5).mkString(", ")}")
    // predicted == lang for every row implies profiles learned per lang
    assert(out.forall(r => r.getString(2) == r.getString(1)))
    assert(out.forall(r => r.getLong(3) > 0L), "every doc overlaps its own profile")
  }

  test("langIdProfileOf: zero-overlap docs survive with empty prediction") {
    // doc 90 (held out; 90 % 4 != 0) has characters no profile contains
    val docs = plantedCorpus(90)
      .unionByName(Seq((90L, "aa", "zzz qqq xxx www yyy zzz qqq xxx")).toDF("doc_id", "lang", "text"))
    val row = TextOps.langIdProfileOf(docs).filter(col("doc_id") === 90).head
    assert(row.getString(2) == "" && row.getLong(3) == 0L && !row.getBoolean(4))
  }

  test("langIdProfileOf prediction is deterministic under tie (score DESC, lang DESC)") {
    // two identical "languages": every doc ties across both profiles and
    // must resolve to the DESC-larger lang name on both engines
    // lang blocks of 4 so the doc_id%4==0 seed sees BOTH languages
    val docs = (0L until 40L).map(i =>
      (i, if (i % 8 < 4) "xx" else "yy", "same same same same text text"))
      .toDF("doc_id", "lang", "text")
    val preds = TextOps.langIdProfileOf(docs).select(col("predicted")).distinct().collect()
    assert(preds.map(_.getString(0)).toSeq == Seq("yy"))
  }

  // ---- adaptive_prefix_values (Ed-Join location filter) ---------------

  test("adaptive_prefix_values stops once positions force > maxDist edits") {
    functions.VectorFunctions.register(spark)
    // text "abcdefgh", q=3: grams at 0..5. Feed values in a known order:
    // gram(0) and gram(5) are q=3 apart → 2 non-overlapping windows → at
    // maxDist=1 the walk must stop after those two values.
    val text = "abcdefgh"
    def g(s: String, off: Int, q: Int): Long = {
      val b = s.getBytes("UTF-8")
      // mirror the kernel's hash (31-fold + splitmix finalize) via the
      // public expression instead of reimplementing: extract from
      // char_qgram_hashes of the single gram's substring
      Seq((s.substring(off, off + q), 1)).toDF("t", "i")
        .select(call_function("char_qgram_hashes", col("t"), lit(q)))
        .head.getSeq[Long](0).head
    }
    val v0 = g(text, 0, 3) // pos 0
    val v5 = g(text, 5, 3) // pos 5
    val v2 = g(text, 2, 3) // pos 2 — must NOT be reached
    val kept = Seq((text, Array(v0, v5, v2)))
      .toDF("t", "vals")
      .select(call_function("adaptive_prefix_values",
        col("t"), col("vals"), lit(3), lit(1)))
      .head.getSeq[Long](0)
    assert(kept == Seq(v0, v5), s"expected stop after 2 spread grams, got $kept")
    // overlapping grams (pos 0 and 1) are one window — walk continues
    val v1 = g(text, 1, 3)
    val kept2 = Seq((text, Array(v0, v1, v5)))
      .toDF("t", "vals")
      .select(call_function("adaptive_prefix_values",
        col("t"), col("vals"), lit(3), lit(1)))
      .head.getSeq[Long](0)
    assert(kept2 == Seq(v0, v1, v5))
    // duplicate values in the input collapse (value closure is value-wise)
    val kept3 = Seq((text, Array(v0, v0, v5)))
      .toDF("t", "vals")
      .select(call_function("adaptive_prefix_values",
        col("t"), col("vals"), lit(3), lit(1)))
      .head.getSeq[Long](0)
    assert(kept3 == Seq(v0, v5))
  }

  // ---- C13b: Count-Min heavy hitters ---------------------------------

  test("cmsHeavyHitters: one-sided error within the sketch bound on a planted skew") {
    // planted zipf-ish skew: key 1 dominates, long uniform tail
    val n = 20000
    val rows = (0 until n).map { i =>
      val key = if (i % 4 == 0) 1L else (i % 997).toLong + 10L
      (i.toLong, key)
    }.toDF("event_id", "user_id")
    val eps = 0.005
    val out = Relational.cmsHeavyHitters(spark, rows, "user_id",
      k = 10, eps = eps, confidence = 0.99, seed = 7).collect()
    assert(out.length == 10)
    // the planted heavy hitter ranks first with its exact count
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == n / 4)
    out.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CMS must never undercount: $r")
      assert(over <= (3 * eps * n).toLong,
        s"overcount beyond the sketch bound: $r")
    }
    // determinism: same seed → identical frame across runs/partitionings
    val again = Relational.cmsHeavyHitters(spark, rows.repartition(7), "user_id",
      k = 10, eps = eps, confidence = 0.99, seed = 7).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "cell-wise-additive merge must be partitioning-independent")
  }

  // ---- byte_levenshtein reference laws -------------------------------

  test("byte_levenshtein law: matches a textbook full DP on random multibyte strings") {
    functions.VectorFunctions.register(spark)
    // independent reference: the classic O(n·m) Wagner–Fischer over the
    // UTF-8 bytes, no banding, no early exit
    def ref(a: String, b: String): Long = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val dp = Array.tabulate(x.length + 1)(i => i)
      for (j <- 1 to y.length) {
        var prevDiag = dp(0)
        dp(0) = j
        for (i <- 1 to x.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prevDiag + (if (x(i - 1) == y(j - 1)) 0 else 1))
          prevDiag = t
        }
      }
      dp(x.length).toLong
    }
    val rnd = new scala.util.Random(1212)
    val alphabet = "abé日́ "
    val strs = (0 until 60).map { _ =>
      Seq.fill(rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val pairs = for (a <- strs; b <- strs if a.hashCode <= b.hashCode) yield (a, b)
    val sample = rnd.shuffle(pairs).take(300)
    val got = sample.toDF("a", "b")
      .select(col("a"), col("b"),
        call_function("byte_levenshtein", col("a"), col("b"), lit(-1)).as("d"),
        call_function("byte_levenshtein", col("b"), col("a"), lit(-1)).as("dr"))
      .collect()
    got.foreach { r =>
      val (a, b, d, dr) = (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(d == ref(a, b), s"('$a','$b'): got $d want ${ref(a, b)}")
      assert(d == dr, "symmetry")
    }
  }

  // ---- F27: Unicode normalization kernels ----------------------------

  test("nfc_normalize folds decomposed to composed; strip_accents matches the DuckDB dialect") {
    functions.VectorFunctions.register(spark)
    val decomp = "cafe\u0301 re\u0301sume\u0301 nai\u0308ve"
    val comp = "caf\u00e9 r\u00e9sum\u00e9 na\u00efve"
    assert(decomp != comp, "literals must be byte-different renderings")
    val row = Seq((decomp, comp)).toDF("d", "c")
      .select(
        call_function("nfc_normalize", col("d")).as("nfc"),
        call_function("strip_accents", col("d")).as("sd"),
        call_function("strip_accents", col("c")).as("sc"),
        // DuckDB-verified: marks-free specials pass through untouched
        call_function("strip_accents", lit("ø Ⅻ ﬁ")).as("keep"),
        // DuckDB-verified round 13: Mc (U+093E, U+0903) and Me (U+20DD)
        // marks are stripped too, not just Mn — utf8proc STRIPMARK drops
        // every mark category ('का'→'क', 'a⃝'→'a', 'bः'→'b')
        call_function("strip_accents", lit("का a⃝ bः")).as("mcme"))
      .head
    assert(row.getString(0) == comp, "NFC must compose the combining marks")
    assert(row.getString(1) == "cafe resume naive" && row.getString(2) == "cafe resume naive",
      "both renderings strip to the same marks-free string")
    assert(row.getString(3) == "ø Ⅻ ﬁ",
      "strip_accents keeps marks-free specials (DuckDB/utf8proc dialect)")
    assert(row.getString(4) == "क a b",
      "strip_accents drops Mc and Me marks like utf8proc STRIPMARK, not only Mn")
    // nulls propagate
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(call_function("nfc_normalize", col("b")),
        call_function("strip_accents", col("b"))).head
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  // ---- CC / LSH plan reshapes ----------------------------------------

  test("lshCandidates ordered=false returns the same pair set as the ordered form") {
    val emb = Tables.embeddings(spark, sf001)
    val a = Similarity.lshCandidates(spark, emb, minCos = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Similarity.lshCandidates(spark, emb, minCos = 0.35, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("q_langid_profile plan: per-row kernel scoring, zero corpus shuffle") {
    // round 13: the profile is frozen into a driver-held model at
    // construction time (the bounded fit step), so the RETURNED plan is
    // scan → project(langid_score) → output sort — no join, no aggregate,
    // no window, no corpus-sized exchange of any kind
    val plan = TextOps.qLangIdProfile.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("langid_score"),
      s"scoring must run the codegen kernel:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("HashAggregate") &&
      !plan.contains("Window"),
      s"kernel scoring path must be a pure per-row map + sort:\n$plan")
  }

  test("q_unicode_normalize plan: per-row map, no shuffle but the output sort") {
    val plan = TextOps.qUnicodeNormalize.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"),
      s"normalization must stay a scan -> project pipeline:\n$plan")
  }

  test("connectedComponents labels unchanged by the single-execution edge cut") {
    // 300-chain + clique + singletons: the shapes the CC loop's folding
    // tricks are tuned for; labels must be the per-component min ids
    val chain = (0L until 300L).sliding(2).map(s => (s(0), s(1))).toSeq
    val clique = for (a <- 400L until 410L; b <- (a + 1) until 410L) yield (a, b)
    val edges = (chain ++ clique).toDF("a_id", "b_id")
    val nodes = ((0L until 300L) ++ (400L until 412L)).toDF("doc_id")
    val m = Dedup.connectedComponents(spark, nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 300L).forall(m(_) == 0L))
    assert((400L until 410L).forall(m(_) == 400L))
    assert(m(410L) == 410L && m(411L) == 411L)
  }
}
