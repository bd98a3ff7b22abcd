package graft

import org.apache.spark.sql.functions._

/** Null-value robustness: a crawl-scale corpus carries NULL text/lang
  * rows (failed fetches, undetected languages). Every document operator
  * must tolerate them — no crash, and the null-text doc either drops out
  * (it has no content) or surfaces with null-valued derived columns,
  * never poisoning other rows.
  */
class NullInputSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val d = tmpDir("null_docs")
    Seq[(Long, Option[String], Option[String])](
      (1L, None, Some("en")),                               // null text
      (2L, Some("a real document with enough tokens to shingle and chunk " +
        "alpha beta gamma delta epsilon zeta eta theta"), Some("en")),
      (3L, Some(""), None),                                 // empty text, null lang
      (4L, Some("short doc"), Some("de")))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("planted"))
      .withColumn("n_chars", coalesce(length(col("text")).cast("long"), lit(0L)))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("document operators tolerate NULL text and NULL lang rows") {
    val names = Seq(
      "q_f1_dedup_count", "q_f1_dedup_first", "q_f6_tokenize",
      "q_quality_score", "q_langid", "q_repetition", "q_pii_redact",
      "q_f13_contamination", "q_f13b_contamination_ac",
      "q_f2_minhash_sig", "q_f2_minhash_pairs", "q_f2_simhash",
      "q_ngram_jaccard", "q_f16_dup_substrings", "q_f17_chunking",
      "q_f18_stratified_sample", "q_f19_lm_quality", "q_f20_pack_sequences",
      "q_normalize", "q_split_hash", "q_token_count", "q_fingerprint",
      "q_f9_docstats", "q_f22_ngram_decontam",
      // round 14: the null-text doc must not multiply (F34) and must
      // still get a shard/position (F35 places by id, not content)
      "q_epoch_mix", "q_shuffle_shards",
      // round 14: overlap diagnostics — null text never windows;
      // curriculum order places every scored doc
      "q_f37_eval_overlap", "q_f38_source_overlap", "q_f39_curriculum_shards",
      // round 15: fusion keys on lang (null-lang docs filtered), the
      // grouped split places even null-text docs (CC nodes by id), the
      // repetition report and the soft-dedup weights drop null text,
      // calibration scores n_chars
      // (q_f41 is absent: the null fixture carries no embeddings table)
      "q_f40_rrf_fusion", "q_f42_grouped_split", "q_f43_gopher_rep",
      "q_f44_score_calibration", "q_f45_soft_dedup",
      // round 16: clustered weights place null-text docs too (CC nodes
      // are ids; a shingle-less doc is its own singleton, weight 10⁶);
      // containment drops null/short texts (no shingles, no pairs)
      "q_f45b_soft_dedup_clustered", "q_f47_containment",
      // round 16: temperature budgets/mix drop null-text/null-source rows
      "q_f48_temperature_budgets", "q_f48b_temperature_mix",
      // round 17: containment verdicts label every doc (null text = no
      // shingles = no edges = kept); the DSIR resample scores the docs
      // that have grams and always keeps its anchor doc; paragraph dedup
      // and the bigram LM drop null-text (and < 2-token) docs
      "q_f47b_containment_verdicts", "q_f46b_dsir_resample",
      "q_f49_paragraph_dedup", "q_f49b_paragraph_clean", "q_f19b_bigram_lm",
      // round 18: the trigram / 5-gram LMs drop null-text (and
      // < order-token) docs; the composed manifest drops null-text rows
      // inside its F33 fill
      "q_f19d_trigram_lm", "q_f19e_5gram_lm", "q_mix_manifest",
      // round 19: the HTML queries manufacture pages only from non-null
      // text; the ledger attributes every non-null doc exactly once
      "q_f58_html_extract", "q_f58b_html_blocks", "q_f59_curation_ledger")
    names.foreach { n =>
      val rows = SparkEntry.queries(n)(spark, dir).collect()
      assert(rows.length <= 8, s"$n exploded to ${rows.length} rows")
      // the real docs must never be lost to a null neighbor
      val ids = rows.flatMap(r =>
        if (r.schema.fieldNames.contains("doc_id") && !r.isNullAt(r.fieldIndex("doc_id")))
          Some(r.getLong(r.fieldIndex("doc_id"))) else None).toSet
      if (ids.nonEmpty)
        assert(ids.contains(2L) || !Seq("q_f6_tokenize", "q_normalize").contains(n),
          s"$n lost the healthy doc: $ids")
    }
  }

  test("streaming near-dup suppression passes null-text docs through") {
    import graft.streaming.StreamOps.Doc
    val docs = Seq(
      Doc(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), null),
      Doc(2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"),
        "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF()
    val out = graft.streaming.StreamOps.nearDupSuppress(docs, minEst = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L), s"null-text doc must pass through, got $out")
  }
}
