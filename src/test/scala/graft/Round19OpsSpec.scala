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
