package graft

import org.apache.spark.sql.functions._

/** F60 URL/domain curation (round 20, VERDICT r19 item 2): unit pins for
  * every canonicalization rule on hand-planted URLs (the oracle grades
  * the same rules statistically over the manufactured corpus; this spec
  * makes each rule's intent readable), the registered-domain heuristic,
  * the list gates, and the curation-stage wiring (batch ≡ stream gate,
  * ledger attribution).
  */
class UrlsSpec extends SparkSpec {

  import spark.implicits._

  private def canonOf(url: String): String =
    Seq(Tuple1(url)).toDF("url")
      .select(Urls.canonUrlCol(col("url"))).head().getString(0)

  private def domainOf(url: String): String =
    Seq(Tuple1(url)).toDF("url")
      .select(Urls.registeredDomainCol(Urls.hostCol(col("url"))))
      .head().getString(0)

  test("canonicalization: each pinned rule on a planted URL") {
    // scheme + host lowercase; path case preserved
    assert(canonOf("HTTP://WWW.Example.COM/Path/File") ===
      "http://www.example.com/Path/File")
    // fragment dropped, bare '#' included
    assert(canonOf("http://a.com/x#frag") === "http://a.com/x")
    assert(canonOf("http://a.com/x#") === "http://a.com/x")
    // default ports dropped, per scheme; others kept
    assert(canonOf("http://a.com:80/x") === "http://a.com/x")
    assert(canonOf("https://a.com:443/x") === "https://a.com/x")
    assert(canonOf("https://a.com:80/x") === "https://a.com:80/x")
    assert(canonOf("http://a.com:8080/x") === "http://a.com:8080/x")
    // empty path → '/', with and without query
    assert(canonOf("http://a.com") === "http://a.com/")
    assert(canonOf("http://a.com?b=2&a=1") === "http://a.com/?a=1&b=2")
    // tracking params stripped (utm_ prefix + pinned keys), rest sorted
    assert(canonOf("http://a.com/x?utm_source=s&b=2&a=1&gclid=g&fbclid=f") ===
      "http://a.com/x?a=1&b=2")
    // an emptied query drops its '?'
    assert(canonOf("http://a.com/x?utm_medium=m") === "http://a.com/x")
    // duplicate keys kept (both), valueless and empty-valued params kept,
    // empty params dropped; byte-order sort of whole 'k=v' strings
    assert(canonOf("http://a.com/x?a=1&a=0&&b=&c") ===
      "http://a.com/x?a=0&a=1&b=&c")
    // percent-encoding and query-value case preserved
    assert(canonOf("https://a.com/A/b%20c?K=V") === "https://a.com/A/b%20c?K=V")
  }

  test("registered domain: pinned multi-part suffixes, two labels, bare host") {
    assert(domainOf("http://blog.sub.example.co.uk/x") === "example.co.uk")
    assert(domainOf("http://shop.example.com.au/x") === "example.com.au")
    assert(domainOf("http://news.example.com/x") === "example.com")
    assert(domainOf("http://example.net/x") === "example.net")
    assert(domainOf("http://co.uk/") === "co.uk") // 2 labels: no 3rd to take
    assert(domainOf("http://localhost:8080/") === "localhost")
  }

  test("domainGate: blocklist, allowlist, and NULL urls") {
    val docs = Seq(
      (1L, "http://a.example.com/x"),
      (2L, "http://b.example.co.uk/x"),
      (3L, "https://c.example.net/x"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "url")
    val blocked = Urls.domainGate(docs, Seq("example.co.uk"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(blocked === Set(1L, 3L)) // 2 blocked, 4 NULL-dropped
    val allowed = Urls.domainGate(docs, Nil, Some(Seq("example.net")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(allowed === Set(3L))
    // gate output keeps the input schema (helper columns dropped)
    assert(Urls.domainGate(docs, Seq("x.y")).columns.toSeq ===
      docs.columns.toSeq)
  }

  test("domainCounts: the per-domain audit") {
    val docs = Seq(
      (1L, "http://a.example.com/x"), (2L, "http://b.example.com/y"),
      (3L, "http://a.example.com/z"), (4L, "http://c.example.net/w"))
      .toDF("doc_id", "url")
    val rows = Urls.domainCounts(docs).orderBy("registered_domain")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq(("example.com", 3L, 2L), ("example.net", 1L, 1L)))
  }

  test("UrlGate curation stage: batch pipeline ≡ streaming gate, ledger attributes url drops") {
    val docs = Seq(
      (1L, "good words here repeated good words here", "http://ok.example.com/a"),
      (2L, "more good words in this one too yes", "http://bad.example.co.uk/b"),
      (3L, "and a third document with plain words", "https://ok.example.net/c"),
      (4L, "a fourth document with no url at all", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "url")
    val gate = Graft.UrlGate(blocked = Seq("example.co.uk"))
    val loose = Graft.QualityGate(minTokens = 1, maxTokens = 100,
      maxStopwordRatio = 1.0)
    val (_, audit, ledger) = Graft.curateCorpusLedgered(spark, docs, Nil,
      quality = loose, urlGate = Some(gate))
    val urlRow = audit.find(_.stage == "url_gate").get
    assert(urlRow.kept === 2L && urlRow.dropped === 2L) // doc 2 blocked, doc 4 null
    val attributed = ledger.filter(col("verdict") === "dropped" &&
        col("stage") === "url_gate")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(attributed === Set(2L, 4L))
    // the streaming gate makes the identical decision
    val t0 = new java.sql.Timestamp(1700000000000L)
    val streamKept = Graft.curateStream(
        docs.withColumn("ts", lit(t0)).select("doc_id", "ts", "text", "url"),
        Nil, quality = loose, minEst = 0.99, urlGate = Some(gate))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamKept === Set(1L, 3L))
  }

  test("curationLedger strict mode throws on a non-subset stage list") {
    val a = Seq(1L, 2L, 3L).toDF("doc_id")
    val b = Seq(1L, 2L).toDF("doc_id")
    val alien = Seq(1L, 9L).toDF("doc_id") // 9 not in a — non-monotone
    // the monotone list passes strict and attributes exactly
    val ok = Graft.curationLedger(Seq("in" -> a, "gate" -> b), strict = true)
    assert(ok.filter(col("verdict") === "dropped").count() === 1L)
    // the non-subset list throws with the boundary named
    val e = intercept[IllegalArgumentException] {
      Graft.curationLedger(Seq("in" -> a, "gate" -> alien), strict = true)
    }
    assert(e.getMessage.contains("'gate'") && e.getMessage.contains("'in'"))
    // non-strict keeps the documented lenient behavior (existing specs)
    assert(Graft.curationLedger(Seq("in" -> a, "gate" -> alien)).count() > 0)
  }

  test("domainGate preserves caller columns named host/registered_domain") {
    // a web corpus may carry its OWN provenance `host` column — the gate
    // must derive its domain internally, never clobber or drop user data
    val docs = Seq(
      (1L, "https://spam.example.net/x", "crawler-host-1"),
      (2L, "https://ok.example.org/y", "crawler-host-2"))
      .toDF("doc_id", "url", "host")
    val out = Urls.domainGate(docs, blocked = Seq("example.net"))
    assert(out.columns.toSeq === Seq("doc_id", "url", "host"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((2L, "crawler-host-2")))
  }

  test("withCanon refuses to overwrite an existing canon-named column") {
    val docs = Seq((1L, "https://a.example.com/", "mine"))
      .toDF("doc_id", "url", "host")
    val e = intercept[IllegalArgumentException](Urls.withCanon(docs))
    assert(e.getMessage.contains("host"))
  }
}
