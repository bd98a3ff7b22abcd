package graft

import org.apache.spark.sql.functions._

/** Round-5 facade surface: the audited curation pipeline — per-stage
  * kept/dropped counts and the parameterized quality gate — asserted on
  * planted documents written as a real parquet `documents` table.
  */
class Round5OpsSpec extends SparkSpec {

  import spark.implicits._

  private def plantedDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("r5docs")
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def healthy(tag: String): String = (1 to 30).map(i => s"$tag$i").mkString(" ")

  test("curateCorpusAudited reports one kept/dropped row per gate, in pipeline order") {
    val nearDup = healthy("a").replace("a7", "MUTANT")
    val contaminated = healthy("b").replace("b15", "alpha beta gamma")
    val d = plantedDocs(Seq(
      (1L, healthy("a")),      // survivor
      (2L, healthy("a")),      // exact dup of 1 → dropped at exact_dedup
      (3L, nearDup),           // near-dup of 1 → dropped at neardup_dedup
      (4L, contaminated),      // screened phrase → dropped at contamination
      (5L, "five short tokens only here"), // fails the 20-token gate
      (6L, healthy("c"))))     // survivor
    val docs = Tables.documents(spark, d)
    val (out, audit) = Graft.curateCorpusAudited(spark, docs,
      Seq("alpha beta gamma", "nine ten eleven"))
    assert(audit == Seq(
      Graft.StageCount("input", 6, 0),
      Graft.StageCount("exact_dedup", 5, 1),
      Graft.StageCount("neardup_dedup", 4, 1),
      Graft.StageCount("quality_gate", 3, 1),
      Graft.StageCount("contamination", 2, 1)), s"audit was $audit")
    // the audited result is the same frame the un-audited pipeline returns
    val rows = out.as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 30L, 0L, 0L, 1L), (6L, 30L, 0L, 0L, 1L)))
    val plain = Graft.curateCorpus(spark, docs,
        Seq("alpha beta gamma", "nine ten eleven"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(plain == rows)
  }

  test("n-gram decontamination: a 10-token eval run is detected, clean and short docs are not") {
    val evalRun = (1 to 10).map(i => s"e$i").mkString(" ")
    val d = plantedDocs(Seq(
      (1L, s"$evalRun e11 e12"),   // eval split (doc_id < 5): 3 windows
      (2L, "short eval doc"),      // eval doc under 10 tokens: no windows
      (10L, s"x1 x2 $evalRun y1"), // train: window at pos 2 IS eval window 1
      (11L, (1 to 15).map(i => s"c$i").mkString(" ")), // train: clean
      (12L, "tiny five token train doc")))             // train: <10 tokens → absent
    val got = TextOps.qNgramDecontam.fn(spark, d)
      .as[(Long, Long, Long, Boolean, Double)].collect().toSeq
    // doc 10: 13 tokens → 4 windows; exactly one (e1…e10) appears in the
    // eval corpus — windows overlapping the run partially mix in x/y tokens
    assert(got == Seq(
      (10L, 4L, 1L, true, 0.25),
      (11L, 6L, 0L, false, 0.0)), s"got $got")
  }

  test("n-gram decontamination tolerates null text on both sides (frame-level form)") {
    graft.functions.VectorFunctions.register(spark)
    val train = Seq((10L, null: String),
      (11L, (1 to 12).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val eval = Seq((1L, null: String),
      (2L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextOps.ngramDecontamOf(train, eval)
      .as[(Long, Long, Long, Boolean, Double)].collect().toSeq
    // null rows contribute no windows; train doc 11's first window is the
    // whole eval doc 2 → 1 of its 3 windows overlaps
    assert(got == Seq((11L, 3L, 1L, true, 0.333333)), s"got $got")
  }

  test("self-decontamination law: screening a corpus against itself flags every window") {
    graft.functions.VectorFunctions.register(spark)
    // every window of every doc is, by construction, in the eval set —
    // so n_overlap must equal n_windows and every windowable doc is
    // contaminated; catches either side dropping/duplicating windows
    val docs = (1 to 20).map(i =>
      (i.toLong, (1 to (9 + i)).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.ngramDecontamOf(docs, docs)
      .as[(Long, Long, Long, Boolean, Double)].collect()
    // doc i has 9+i tokens → max(0, i) windows; doc 1 onward all have ≥1
    assert(got.length == 20)
    got.foreach { case (id, nw, nov, cont, frac) =>
      assert(nw == id && nov == nw && cont && frac == 1.0,
        s"doc $id: windows=$nw overlap=$nov contaminated=$cont frac=$frac")
    }
  }

  test("eval decontamination composes as an audited curation gate") {
    val d = plantedDocs(Seq((1L, healthy("a")), (6L, healthy("c"))))
    val docs = Tables.documents(spark, d)
    // eval corpus shares doc 6's first 10 tokens — doc 6 must fall at the
    // eval_decontam gate, after surviving every earlier stage
    val eval = Seq((100L, (1 to 10).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val (out, audit) = Graft.curateCorpusAudited(spark, docs,
      screenPhrases = Seq("never present"), evalDocs = Some(eval))
    assert(audit.last == Graft.StageCount("eval_decontam", 1, 1), s"audit was $audit")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // without an eval corpus the stage is absent entirely
    val (_, noEval) = Graft.curateCorpusAudited(spark, docs,
      screenPhrases = Seq("never present"))
    assert(!noEval.exists(_.stage == "eval_decontam"))
  }

  test("quality gate honors a caller-supplied stopword lexicon and bounds") {
    // 24 tokens, half of them "foo": ratio 0.5 — clean under the default
    // lexicon, dropped when the caller names "foo" a stopword
    val fooHeavy = (1 to 12).flatMap(i => Seq("foo", s"x$i")).mkString(" ")
    val d = plantedDocs(Seq((1L, fooHeavy), (2L, healthy("z"))))
    val docs = Tables.documents(spark, d)
    def survivors(q: Graft.QualityGate): Set[Long] =
      Graft.curateCorpus(spark, docs, screenPhrases = Seq("never present"),
        quality = q).select("doc_id").as[Long].collect().toSet
    assert(survivors(Graft.QualityGate()) == Set(1L, 2L))
    assert(survivors(Graft.QualityGate(stopwords = Seq("foo"))) == Set(2L))
    // bounds are knobs too: a 25-token ceiling drops the 30-token doc
    assert(survivors(Graft.QualityGate(maxTokens = 25)) == Set(1L))
  }
}
