package graft

import org.apache.spark.sql.functions._

/** Round-20 cross-session serving proof (VERDICT r19 item 1 "done"
  * criteria — the model-persistence sibling of [[FreshSessionSpec]]'s
  * first-touch gate): models saved in one session LOAD AND SCORE in a
  * brand-new session state — `spark.newSession()` shares the context
  * but has its OWN function registry, so none of the graft kernels
  * (`lm_score`, `nb_score`, …) exist there until `load` registers them
  * (the round-19 ADVICE trap, closed by [[ModelIO.load]]). Also pins
  * the gate-level story: a curation gate built from a LOADED model
  * keeps exactly the same documents as the gate that fit in-memory.
  */
class ModelServingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir = tmpDir("graft-fresh")

  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat and the dog sat too", "a"),
    (2L, "καλημέρα κόσμε καλημέρα κόσμε", "a"),
    (3L, "der hund und die katze und der hund", "b"),
    (4L, "the quick brown fox jumps over the lazy dog again", "b"),
    (5L, "spam spam buy now spam spam buy now", "a"))
    .toDF("doc_id", "text", "source")

  // toDF on a Seq binds to the implicits' session; this helper builds the
  // same frame explicitly in a given session
  private def docsIn(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Seq(
      (1L, "the cat sat on the mat and the dog sat too", "a"),
      (2L, "καλημέρα κόσμε καλημέρα κόσμε", "a"),
      (3L, "der hund und die katze und der hund", "b"),
      (4L, "the quick brown fox jumps over the lazy dog again", "b"),
      (5L, "spam spam buy now spam spam buy now", "a"))
      .toDF("doc_id", "text", "source")
  }

  private def oneDoc(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Seq((1L, "a b a b a")).toDF("doc_id", "text")
  }

  test("a fresh session lacks the kernels until load registers them") {
    val lm = TextOps.bigramLmFit(corpus, buckets = 32)
    val p = s"$dir/lm.bin"
    lm.save(spark, p)
    val fresh = spark.newSession()
    val freshDocs = oneDoc(fresh)
    // before load: the frozen score column cannot even analyze — the
    // session-local temp function does not exist in this session
    intercept[org.apache.spark.sql.AnalysisException] {
      freshDocs.select(lm.sumMicrosCol(col("text"))).collect()
    }
    // load registers the kernels and returns the identical model
    val loaded = TextOps.BigramLm.load(fresh, p)
    assert(loaded === lm)
    val got = freshDocs.select(loaded.sumMicrosCol(col("text"))).head().getLong(0)
    // the base session (kernels long registered) agrees bit-exactly
    val want = oneDoc(spark)
      .select(lm.sumMicrosCol(col("text"))).head().getLong(0)
    assert(got === want)
  }

  test("every model family loads and scores identically in a fresh session") {
    val fresh = spark.newSession()
    val freshDocs = docsIn(fresh)

    val lang = TextOps.langIdFit(
      Seq(("en", "the cat and the dog sat"), ("el", "καλημέρα κόσμε παλι"))
        .toDF("lang", "text"), topN = 10)
    lang.save(spark, s"$dir/lang.bin")
    val langL = TextOps.LangIdProfile.load(fresh, s"$dir/lang.bin")
    assert(freshDocs.select(langL.predictCol(col("text"))).collect().toSeq ===
      corpus.select(lang.predictCol(col("text"))).collect().toSeq)

    val nb = TextOps.nbFit(Seq(("keep", "the cat sat"), ("drop", "spam buy now"))
      .toDF("label", "text"), vocabN = 20)
    nb.save(spark, s"$dir/nb.bin")
    val nbL = TextOps.NbTextModel.load(fresh, s"$dir/nb.bin")
    assert(freshDocs.select(nbL.scoreCol(col("text"))).collect().toSeq ===
      corpus.select(nb.scoreCol(col("text"))).collect().toSeq)

    val tri = TextOps.trigramLmFit(corpus, buckets = 32)
    tri.save(spark, s"$dir/tri.bin")
    val triL = TextOps.TrigramLm.load(fresh, s"$dir/tri.bin")
    assert(freshDocs.select(triL.sumMicrosCol(col("text"))).collect().toSeq ===
      corpus.select(tri.sumMicrosCol(col("text"))).collect().toSeq)

    val ng = TextOps.ngramLmFit(corpus, order = 4, buckets = 32)
    ng.save(spark, s"$dir/ng.bin")
    val ngL = TextOps.NgramLm.load(fresh, s"$dir/ng.bin")
    assert(freshDocs.select(ngL.sumMicrosCol(col("text"))).collect().toSeq ===
      corpus.select(ng.sumMicrosCol(col("text"))).collect().toSeq)

    val ds = TextOps.dsirFit(corpus, corpus.filter(col("doc_id") <= 2L),
      buckets = 32, seed = 3L)
    ds.save(spark, s"$dir/ds.bin")
    val dsL = TextOps.DsirModel.load(fresh, s"$dir/ds.bin")
    assert(freshDocs.select(dsL.keepCol(col("text"), col("doc_id"))).collect().toSeq ===
      corpus.select(ds.keepCol(col("text"), col("doc_id"))).collect().toSeq)

    val cal = TextOps.calibrationFit(
      corpus.withColumn("s", length(col("text")).cast("double")), "s",
      "source", buckets = 8)
    cal.save(spark, s"$dir/cal.bin")
    val calL = TextOps.CalibrationModel.load(fresh, s"$dir/cal.bin")
    assert(freshDocs.withColumn("s", length(col("text")).cast("double"))
        .select(calL.pctCol(col("s"), col("source"))).collect().toSeq ===
      corpus.withColumn("s", length(col("text")).cast("double"))
        .select(cal.pctCol(col("s"), col("source"))).collect().toSeq)

    val bpe = TextOps.bpeFit(corpus, numMerges = 10, vocabN = 50)
    bpe.save(spark, s"$dir/bpe.bin")
    val bpeL = TextOps.BpeModel.load(fresh, s"$dir/bpe.bin")
    assert(freshDocs.select(bpeL.countCol(col("text"))).collect().toSeq ===
      corpus.select(bpe.countCol(col("text"))).collect().toSeq)

    val emb = spark.range(0, 32).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)), i =>
        (pmod(hash(col("id") * 7 + i), lit(100)) / 10).cast("float"))
        .as("embedding"))
    val km = Similarity.kmeansFitExact(emb, k = 3, iters = 2)
    km.save(spark, s"$dir/km.bin")
    val kmL = Similarity.KmeansModel.load(fresh, s"$dir/km.bin")
    val freshEmb = fresh.range(0, 32).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)), i =>
        (pmod(hash(col("id") * 7 + i), lit(100)) / 10).cast("float"))
        .as("embedding"))
    assert(freshEmb.select(kmL.assignCol(col("embedding"))).collect().toSeq ===
      emb.select(km.assignCol(col("embedding"))).collect().toSeq)
  }

  test("curateStream gates built from LOADED models ≡ the in-memory gates") {
    val seed = Seq(("en", "the cat and the dog sat on the mat"),
      ("el", "καλημέρα κόσμε παλι και παλι")).toDF("lang", "text")
    val inMem = Graft.LangGate(seed, Set("en"), topN = 10)
    inMem.profile.save(spark, s"$dir/gate.bin")

    val fresh = spark.newSession()
    val loadedGate = Graft.LangGate.frozen(
      TextOps.LangIdProfile.load(fresh, s"$dir/gate.bin"), Set("en"))
    val t0 = new java.sql.Timestamp(1700000000000L)
    def stream(s: org.apache.spark.sql.SparkSession) =
      docsIn(s).withColumn("ts", lit(t0)).select("doc_id", "ts", "text")
    val loose = Graft.QualityGate(minTokens = 1, maxTokens = 1000,
      maxStopwordRatio = 1.0)
    val gotFresh = Graft.curateStream(stream(fresh), Nil, quality = loose,
        minEst = 0.99, langGate = Some(loadedGate))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gotMem = Graft.curateStream(stream(spark), Nil, quality = loose,
        minEst = 0.99, langGate = Some(inMem))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotFresh === gotMem && gotFresh.nonEmpty, s"$gotFresh vs $gotMem")

    // the classifier gate, same contract
    val nbSeed = Seq(("keep", "the cat sat on the mat"),
      ("drop", "spam buy now spam")).toDF("label", "text")
    val cMem = Graft.ClassifierGate(nbSeed, Set("keep"), vocabN = 20)
    cMem.model.save(spark, s"$dir/cgate.bin")
    val cLoaded = Graft.ClassifierGate.frozen(
      TextOps.NbTextModel.load(fresh, s"$dir/cgate.bin"), Set("keep"))
    val cFresh = Graft.curateStream(stream(fresh), Nil, quality = loose,
        minEst = 0.99, classifier = Some(cLoaded))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cBase = Graft.curateStream(stream(spark), Nil, quality = loose,
        minEst = 0.99, classifier = Some(cMem))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cFresh === cBase && cFresh.nonEmpty, s"$cFresh vs $cBase")
  }

  test("BATCH curation serves CalibratedKeep.frozen and DsirKeep.frozen (r20 review)") {
    // the r20 review caught both batch paths dispatching on the
    // reference frame alone: a frozen() gate (reference = None,
    // preFit = Some) fell into EXACT pool-rank mode — silently ignoring
    // the loaded calibration model, and NPE-ing on DsirKeep's null
    // target. This corpus is built to DISCRIMINATE the modes: every
    // pool score sits above the frozen reference's range (frozen pct =
    // 10⁶ → all kept), while the exact pool rank at the same cut drops
    // the pool's own bottom.
    val loose = Graft.QualityGate(minTokens = 1, maxTokens = 1000,
      maxStopwordRatio = 1.0)
    val pool = Seq(
      (1L, "dddd", "a"),                                // octet_length 4
      (2L, "eeee eeee", "a"),                           //              9
      (3L, "ffff ffff ffff ffff", "a"))                 //             19
      .toDF("doc_id", "text", "source")
    val score = octet_length(col("text")).cast("double")
    val ref = Seq((10L, "x", "a"), (11L, "yyy", "a"))   // scores 1, 3
      .toDF("doc_id", "text", "source")
    val ckRef = Graft.CalibratedKeep(score, 600000L, "source",
      reference = Some(ref), buckets = 32)
    val pCal = s"$dir/cal_batch.bin"
    ckRef.model.save(spark, pCal)
    val ckFrozen = Graft.CalibratedKeep.frozen(score, 600000L,
      TextOps.CalibrationModel.load(spark, pCal))
    def calKept(ck: Graft.CalibratedKeep): Long =
      Graft.curateCorpusAudited(spark, pool, Nil, quality = loose,
        calibrated = Some(ck))._2.find(_.stage == "calibrated_keep").get.kept
    val keptRef = calKept(ckRef)
    val keptFrozen = calKept(ckFrozen)
    assert(keptFrozen === keptRef && keptFrozen === 3L,
      s"frozen batch gate must serve the LOADED distribution: $keptFrozen vs $keptRef")
    // the exact mode on the same pool+cut keeps fewer — proving the
    // frozen result above cannot be exact-mode in disguise
    val keptExact = calKept(
      Graft.CalibratedKeep(score, 600000L, "source", buckets = 32))
    assert(keptExact < 3L, s"exact pool rank kept $keptExact — corpus no " +
      "longer discriminates the modes")

    // DsirKeep: frozen() carries target = null; the old dispatch handed
    // it to dsirResample (NPE). Now: serves the model, ≡ the
    // rawReference-mode twin with the identical model.
    val raw = Seq((20L, "the the the cat cat", "a"),
      (21L, "dog dog dog dog", "a")).toDF("doc_id", "text", "source")
    val target = Seq((30L, "cat cat cat cat cat", "a"))
      .toDF("doc_id", "text", "source")
    val dkRef = Graft.DsirKeep(target, buckets = 64, seed = 7L,
      rawReference = Some(raw))
    val pDsir = s"$dir/dsir_batch.bin"
    dkRef.model.save(spark, pDsir)
    val dkFrozen = Graft.DsirKeep.frozen(
      TextOps.DsirModel.load(spark, pDsir))
    def dsirKeeps(dk: Graft.DsirKeep): Set[Long] = {
      val (_, audit, ledger) = Graft.curateCorpusLedgered(spark, pool, Nil,
        quality = loose, dsir = Some(dk))
      assert(audit.exists(_.stage == "dsir_resample"))
      ledger.filter(col("verdict") === "kept")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(dsirKeeps(dkFrozen) === dsirKeeps(dkRef))
  }
}
