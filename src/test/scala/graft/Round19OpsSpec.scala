package graft

import org.apache.spark.sql.functions._

/** Round-19 additions, per the round-18 verdict: the F58 HTML→text
  * extraction front door (planted-structure proofs: chrome/link-heavy/
  * short/script blocks dropped, prose kept byte-exact, entities decoded),
  * plus the curation-stage wiring.
  */
class Round19OpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- F58: HTML→text extraction ------------------------------------------

  private val plantedHtml =
    "<script>if (x < 3) { alert('&amp;'); }</script>" + // stripped whole
      "<style>p { color: red; }</style>" + // stripped whole
      "<nav><a href=\"/\">home</a> <a href=\"/a\">about</a></nav>" + // chrome
      "<h1>The Article Title Here</h1>" + // content
      "<p>First real paragraph with enough words to keep.</p>" + // content
      "<p><a href=\"/x\">click here for more great links</a></p>" + // link_heavy
      "<p>ok</p>" + // short (1 word)
      "<div>Entities: &lt;tag&gt; &amp; &quot;quoted&quot; &#39;s&nbsp;end</div>" + // content
      "<p>   </p>" + // empty after ws-normalize
      "<footer>copyright 2026 every right reserved</footer>" + // chrome
      "trailing junk with no block tag" // not a block

  test("F58 htmlBlocks: the planted page classifies block-by-block") {
    val pages = Seq((1L, plantedHtml)).toDF("doc_id", "html")
    val rows = Html.htmlBlocks(pages)
      .orderBy(col("block_pos"))
      .select("tag", "verdict", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(
      ("nav", "chrome", "home about"),
      ("h1", "content", "The Article Title Here"),
      ("p", "content", "First real paragraph with enough words to keep."),
      ("p", "link_heavy", "click here for more great links"),
      ("p", "short", "ok"),
      ("div", "content", "Entities: <tag> & \"quoted\" 's end"),
      ("p", "empty", ""),
      ("footer", "chrome", "copyright 2026 every right reserved")))
  }

  test("F58 htmlExtract: prose kept byte-exact, boilerplate gone") {
    val pages = Seq((1L, plantedHtml)).toDF("doc_id", "html")
    val r = Html.htmlExtract(pages).collect().head
    assert(r.getAs[Long]("n_blocks") === 8L)
    assert(r.getAs[Long]("n_content") === 3L)
    assert(r.getAs[String]("clean_text") ===
      "The Article Title Here\n" +
        "First real paragraph with enough words to keep.\n" +
        "Entities: <tag> & \"quoted\" 's end")
    assert(r.getAs[Long]("n_chars") ===
      r.getAs[String]("clean_text").length.toLong)
  }

  test("F58 link density: partial links below the threshold survive") {
    // 20 anchor chars over >100 text chars is ~16% < the 20% default
    val body = "word " * 20 + "tail"
    val pages = Seq(
      (1L, s"""<p><a href="/x">twenty anchor chars.</a> $body</p>"""),
      (2L, s"""<p><a href="/x">$body</a></p>""")).toDF("doc_id", "html")
    val v = Html.htmlBlocks(pages).orderBy("doc_id")
      .select("verdict").as[String].collect()
    assert(v.toSeq === Seq("content", "link_heavy"))
  }

  test("F58: a page with no block structure produces no row (step 7)") {
    val pages = Seq(
      (1L, "plain text, zero tags"),
      (2L, "<span>inline only</span> <b>bold</b>"),
      (3L, "<p>a real block with enough words here</p>"))
      .toDF("doc_id", "html")
    val out = Html.htmlExtract(pages).select("doc_id").as[Long].collect()
    assert(out.toSeq === Seq(3L))
    // NULL html: filtered, never a crash (the F2 null-input rule)
    val withNull = Seq((4L, null: String)).toDF("doc_id", "html")
    assert(Html.htmlExtract(withNull).count() === 0L)
  }

  test("F58: tag-name prefixes do not cross-match (<pre> is not <p>)") {
    val pages = Seq(
      (1L, "<pre>code block not in the model</pre>"),
      (2L, "<p>para with plenty of words to keep</p>")).toDF("doc_id", "html")
    val out = Html.htmlBlocks(pages).select("doc_id", "tag")
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((2L, "p")))
  }

  // ---- lm_score / gram_sum codegen kernels (VERDICT r18 item 2) -----------

  /** Edge-heavy corpus: empty text (one empty token), consecutive spaces
    * (empty middle tokens), leading/trailing spaces, multi-byte UTF-8,
    * below-order docs (NULL contract), exactly-order docs. */
  private val kernelCorpus = Seq(
    (1L, "the cat sat on the mat and the dog ran away"),
    (2L, "the  cat   sat"), // empty tokens between consecutive spaces
    (3L, " leading and trailing "),
    (4L, "über die brücke läuft öl"), // multi-byte UTF-8 tokens
    (5L, ""), // one empty token
    (6L, "solo"),
    (7L, "two tokens"),
    (8L, "exactly three tokens"),
    (9L, "four tokens right here"),
    (10L, "five tokens sit right here"))

  private def kernelVsFold(order: Int): Unit = {
    val df = kernelCorpus.toDF("doc_id", "text")
    val lm = TextOps.ngramLmFit(df, order, 64)
    val got = df.select(col("doc_id"), lm.sumMicrosCol(col("text")).as("k"),
      lm.sumMicrosFoldCol(col("text")).as("f")).collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2),
        s"order $order doc ${r.getLong(0)}: null mismatch")
      if (!r.isNullAt(1))
        assert(r.getLong(1) === r.getLong(2),
          s"order $order doc ${r.getLong(0)}")
    }
    // NULL exactly for docs below order tokens
    val nulls = got.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    val want = kernelCorpus.filter(_._2.split(" ", -1).length < order)
      .map(_._1).toSet
    assert(nulls === want, s"order $order null set")
  }

  test("lm_score kernel ≡ interpreted fold, bit-exact at orders 2/3/5") {
    kernelVsFold(2); kernelVsFold(3); kernelVsFold(5)
  }

  test("lm_score kernel ≡ BigramLm/TrigramLm folds (the graded shapes)") {
    val df = kernelCorpus.toDF("doc_id", "text")
    val b = TextOps.bigramLmFit(df, 64)
    val t = TextOps.trigramLmFit(df, 64)
    val rows = df.select(
      b.sumMicrosCol(col("text")).as("bk"),
      b.sumMicrosFoldCol(col("text")).as("bf"),
      t.sumMicrosCol(col("text")).as("tk"),
      t.sumMicrosFoldCol(col("text")).as("tf")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1) &&
        (r.isNullAt(0) || r.getLong(0) === r.getLong(1)))
      assert(r.isNullAt(2) === r.isNullAt(3) &&
        (r.isNullAt(2) || r.getLong(2) === r.getLong(3)))
    }
  }

  test("gram_sum kernel ≡ DsirModel interpreted fold, bit-exact") {
    val df = kernelCorpus.toDF("doc_id", "text")
    val target = df.filter(col("doc_id") <= 4L)
    val model = TextOps.dsirFit(df, target, buckets = 64)
    val rows = df.select(model.logRatioCol(col("text")).as("k"),
      model.logRatioFoldCol(col("text")).as("f")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("frozen DSIR gate output unchanged by the kernel swap") {
    val df = kernelCorpus.toDF("doc_id", "text")
    val target = df.filter(col("doc_id") <= 4L)
    val model = TextOps.dsirFit(df, target, buckets = 64)
    // the keep decision via the kernel path (keepCol → pLogCol →
    // logRatioCol) ≡ the same draw against the fold score
    val h = conv(substring(md5(concat(lit("0:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val drawLt = floor(log((h * 2 + 1) / lit(8589934592.0)) * 1e6).cast("long") <
      (model.logRatioFoldCol(col("text")) - lit(model.anchorMicros))
    val kernelKeep = df.filter(model.keepCol(col("text"), col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    val foldKeep = df.filter(drawLt).select("doc_id").as[Long].collect().toSet
    assert(kernelKeep === foldKeep)
  }

  test("lm_score stays inside whole-stage codegen") {
    // a LocalTableScan (Seq.toDF) has no codegen span at all — probe the
    // plan over a range-backed projection, the shape a corpus scan has
    val lm = TextOps.trigramLmFit(kernelCorpus.toDF("doc_id", "text"), 64)
    val df = spark.range(100).select(
      concat(lit("tok"), col("id"), lit(" b c d e")).as("text"))
    val plan = df.select(lm.sumMicrosCol(col("text"))).queryExecution
      .executedPlan.toString
    // the compact plan string marks WholeStageCodegen stages with `*(n)`;
    // the lm_score projection must sit inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("lm_score")), plan.take(500))
  }

  test("F58 curation stage: html_extract fronts the audited pipeline") {
    val docs = Seq(
      (1L, "<p>the quick brown fox jumps over the lazy dog</p>" +
        "<nav><a href=\"/\">one two three four five</a></nav>"),
      (2L, "<p>the quick brown fox jumps over the lazy dog</p>" +
        "<footer>chrome differs but content is identical</footer>"),
      (3L, "no block structure at all"),
      (4L, "<div>a unique surviving document with plenty of words</div>"))
      .toDF("doc_id", "text")
    val (_, audit) = Graft.curateCorpusAudited(spark, docs, Nil,
      quality = Graft.QualityGate(minTokens = 3, maxTokens = 1000,
        maxStopwordRatio = 1.0),
      html = Some(Graft.HtmlExtract()))
    val byStage = audit.map(sc => sc.stage -> sc).toMap
    assert(audit.head.stage === "input" && audit.head.kept === 4L)
    // doc 3 (no block structure) drops AT html_extract
    assert(byStage("html_extract").kept === 3L &&
      byStage("html_extract").dropped === 1L)
    // docs 1 and 2 extract to IDENTICAL clean text (chrome stripped) —
    // exact dedup sees through the differing boilerplate
    assert(byStage("exact_dedup").kept === 2L &&
      byStage("exact_dedup").dropped === 1L)
  }
}
