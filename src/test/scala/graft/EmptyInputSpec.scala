package graft

import org.apache.spark.sql.functions.{col, octet_length}

/** Degenerate-input robustness: every document/embedding operator must
  * return an EMPTY result (not throw) on an empty corpus — the shape an
  * executor sees constantly at 100 TB, where file splits and filtered
  * partitions are routinely empty. Exercises the full graded path
  * (parquet scan of a zero-row table with the production schema →
  * transform), including the iterative CC loop's zero-round exit and the
  * prefix-filter join over nothing.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = tmpDir("empty_sf")
    Tables.documents(spark, sf001).limit(0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sf001).limit(0)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // events written post-normalization (ts already the epoch-nanos long
    // contract), which Tables.events passes through unchanged on re-read
    Tables.events(spark, sf001).limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("document/embedding operators return empty results on an empty corpus") {
    val names = Seq(
      "q_f1_dedup_first", "q_f6_tokenize", "q_quality_score", "q_langid",
      "q_repetition", "q_pii_redact", "q_f7_tfidf", "q_f13_contamination",
      "q_f2_minhash_sig", "q_f2_minhash_pairs", "q_f2_simhash",
      "q_ngram_jaccard", "q_f3_cosine_topk", "q_f3_cosine_neardup",
      "q_f4_knn", "q_f5_ivf_ann", "q_f5_lsh_neardup", "q_f11_dedup_groups",
      "q_f12_quantize",
      "q_f10_multimodal", "q22_explode", "q_f13b_contamination_ac", "q_f21_semantic_dedup",
      "q_f16_dup_substrings", "q_f17_chunking", "q_f18_stratified_sample",
      "q_f19_lm_quality", "q_f20_pack_sequences", "q_f21b_semantic_dedup_lsh",
      "q_f22_ngram_decontam",
      // round 12
      "q_edit_neardup", "q_edit_dedup_groups", "q_langid_profile",
      "q_unicode_normalize", "q_compress_ratio", "q_cms_heavy_hitters",
      // round 13
      "q_weighted_sample",
      // round 14 (groups over an empty pair set: CC seeds from zero nodes)
      "q_f2_simhash_pairs", "q_simhash_dedup_groups",
      // round 14: delta dedup of an empty split; A-ES/BM25 over no docs
      "q_incremental_dedup", "q_weighted_topk", "q_bm25_topk",
      // round 14: span removal / keep-best dedup / token-budget mix
      // over no docs (q_nb_quality is absent by design: its fit fails
      // LOUDLY on an empty seed — the LangGate convention)
      "q_strip_spans", "q_dedup_keep_best", "q_token_budget_mix",
      // round 14 late: upsampling mix + order shuffle of an empty corpus
      // (q_f36_kmeans / q_f36b_semdedup_clustered are absent by design:
      // kmeansFitExact fails LOUDLY when the corpus has fewer vectors
      // than k — the nbFit/LangGate convention, pinned in Round14OpsSpec)
      "q_epoch_mix", "q_shuffle_shards",
      // round 14 late: overlap diagnostics + curriculum order over no docs
      "q_f37_eval_overlap", "q_f38_source_overlap", "q_f39_curriculum_shards",
      // round 15: fusion of empty runs, mining over an empty query batch
      // AND corpus, grouped split / repetition report / calibration /
      // soft-dedup weights of nothing — all empty, never a throw
      "q_f40_rrf_fusion", "q_f41_hard_negatives", "q_f42_grouped_split",
      "q_f43_gopher_rep", "q_f44_score_calibration", "q_f45_soft_dedup",
      // round 16: clustered soft-dedup weights / containment pairs /
      // BM25⊕dense fusion of an empty corpus (q_f41b and q_f46 are
      // absent by design: kmeansFitExact and the DSIR fits fail LOUDLY
      // on empty inputs — the q_f36/nbFit convention)
      "q_f45b_soft_dedup_clustered", "q_f47_containment",
      "q_f40b_rrf_bm25_dense",
      // round 16: temperature budgets/mix of an empty corpus — an empty
      // budget table and an empty fill, never a throw
      "q_f48_temperature_budgets", "q_f48b_temperature_mix",
      // round 17: containment verdicts of an empty corpus — no edges, no
      // docs, empty verdict frame (q_f46b and q_f19b are absent by
      // design: the DSIR and bigram-LM fits fail LOUDLY on empty inputs
      // — the q_f36/nbFit convention); paragraph dedup of no paragraphs
      "q_f47b_containment_verdicts", "q_f49_paragraph_dedup",
      "q_f49b_paragraph_clean",
      // round 18: the composed manifest of an empty corpus — empty
      // budget/weight tables, an empty fill, never a throw (q_f19d and
      // q_f19e are absent by design: the LM fits fail LOUDLY on empty
      // inputs — the q_f19b convention)
      "q_mix_manifest")
    names.foreach { n =>
      val cnt = SparkEntry.queries(n)(spark, emptyDir).count()
      assert(cnt == 0, s"$n returned $cnt rows on empty input")
    }
  }

  test("the audited curation pipeline survives an empty corpus with all-zero gates") {
    val docs = Tables.documents(spark, emptyDir)
    val (out, audit) = Graft.curateCorpusAudited(spark, docs,
      screenPhrases = Seq("anything"))
    assert(out.count() == 0)
    assert(audit.map(_.stage) == Seq("input", "exact_dedup", "neardup_dedup",
      "quality_gate", "contamination"))
    assert(audit.forall(a => a.kept == 0 && a.dropped == 0), s"audit was $audit")
    // round 13: the optional normalize + language-gate stages also
    // survive the empty corpus (the gate's profile fits on its own
    // non-empty labeled seed, independent of the corpus)
    import spark.implicits._
    val seed = Seq(("aa", "aiea eiae aeia iaea aiea eiae")).toDF("lang", "text")
    val (out2, audit2) = Graft.curateCorpusAudited(spark, docs,
      screenPhrases = Seq("anything"),
      normalize = Some(Graft.Normalize()),
      langGate = Some(Graft.LangGate(seed, Set("aa"))))
    assert(out2.count() == 0)
    assert(audit2.map(_.stage) == Seq("input", "unicode_normalize",
      "exact_dedup", "neardup_dedup", "quality_gate", "lang_gate",
      "contamination"))
    assert(audit2.forall(a => a.kept == 0 && a.dropped == 0), s"audit2 was $audit2")
  }

  test("round-14 operators survive empty/degenerate frames") {
    import spark.implicits._
    // bloomSemiJoin with an EMPTY keys frame: count() = 0 → sized at the
    // 1000 floor, bloom admits nothing, semi join over zero keys = empty
    val big = spark.range(0, 50).select(col("id").as("k"))
    val noKeys = Seq.empty[Long].toDF("k")
    assert(Relational.bloomSemiJoin(big, "k", noKeys, "k").count() == 0)
    // and an empty BIG side stays empty without building anything odd
    val noBig = Seq.empty[Long].toDF("k")
    val keys = Seq(1L, 2L).toDF("k")
    assert(Relational.bloomSemiJoin(noBig, "k", keys, "k").count() == 0)
    // weightedBernoulli on an empty frame keeps the schema contract
    val out = TextOps.weightedBernoulli(
      Seq.empty[(Long, Long)].toDF("doc_id", "w"), "doc_id", "w", 100L)
    assert(out.columns.contains("p_millionths") && out.count() == 0)
    // the weighted_sample curation stage composes over the empty corpus
    val docs = Tables.documents(spark, emptyDir)
    val (out3, audit3) = Graft.curateCorpusAudited(spark, docs, Nil,
      weighted = Some(Graft.WeightedKeep(octet_length(col("text")).cast("long"), 100L)))
    assert(out3.count() == 0 && audit3.last.stage == "weighted_sample" &&
      audit3.last.kept == 0 && audit3.last.dropped == 0)
    // F32: a valid model scores an EMPTY corpus to zero rows, and the
    // classifier_gate stage composes over the empty corpus with zero
    // counts (the seed is external, so the fit still succeeds; an empty
    // SEED is the loud-failure case, specced in Round14OpsSpec)
    val nbSeed = Seq(("keep", "alpha beta"), ("drop", "zeta")).toDF("label", "text")
    val nbModel = TextOps.nbFit(nbSeed)
    assert(docs.filter(col("text").isNotNull)
      .select(nbModel.scoreCol(col("text"))).count() == 0)
    val (out4, audit4) = Graft.curateCorpusAudited(spark, docs, Nil,
      classifier = Some(Graft.ClassifierGate(nbSeed, keep = Set("keep"))))
    assert(out4.count() == 0 &&
      audit4.exists(s => s.stage == "classifier_gate" && s.kept == 0 && s.dropped == 0))
    // simhash groups over an all-NULL-text corpus: every doc a singleton
    val nulls = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val g = MinHash.simhashDedupGroups(spark, nulls, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g == Map(1L -> 1L, 2L -> 2L))
  }

  test("round-19 operators tolerate the empty corpus") {
    import spark.implicits._
    val emptyPages = Seq.empty[(Long, String)].toDF("doc_id", "html")
    assert(Html.htmlBlocks(emptyPages).count() == 0)
    assert(Html.htmlExtract(emptyPages).count() == 0)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // ledger over an empty pipeline: zero rows, never a throw
    assert(Graft.curationLedger(
      Seq("input" -> emptyDocs, "gate" -> emptyDocs)).count() == 0)
    val (_, audit, ledger) = Graft.curateCorpusLedgered(spark, emptyDocs, Nil)
    assert(ledger.count() == 0 && audit.head.kept == 0)
    // verified media groups / ledger over an empty corpus
    val emptyRecs = spark.emptyDataset[Multimodal.MediaRecord]
    assert(Multimodal.mediaDedupGroupsVerified(spark, emptyRecs).count() == 0)
    val (kept, mAudit, mLedger) = Multimodal.mediaDedupLedgered(spark, emptyRecs)
    assert(kept.count() == 0 && mLedger.count() == 0 && mAudit.head.kept == 0)
    // auto-order on a token-less corpus: the FIT would fail loudly, but
    // the decision itself degrades to the order-2 floor (zero occupancy
    // at every level estimates zero types ≤ any budget → deepest order
    // fits — so pin the documented behavior: maxOrder wins on EMPTY
    // occupancy, and the subsequent fit fails loudly)
    assert(TextOps.lmAutoOrder(emptyDocs, 4, 100L, 64) == 4)
    val e = intercept[IllegalArgumentException] {
      TextOps.ngramLmFitAuto(emptyDocs, 4, 100L, 64)
    }
    assert(e.getMessage.contains("no tokens"))
  }

  test("LangGate fails fast on a seed that yields an empty profile") {
    import spark.implicits._
    val emptySeed = Seq.empty[(String, String)].toDF("lang", "text")
    val docs = Seq((1L, "some doc text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Graft.curateCorpusAudited(spark, docs, Nil,
        langGate = Some(Graft.LangGate(emptySeed, Set("aa"))))
    }
    assert(e.getMessage.contains("empty profile"))
  }
}
