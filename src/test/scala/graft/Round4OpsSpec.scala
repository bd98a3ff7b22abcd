package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Round-4 operators: duplicated-substring detection (F16), token-window
  * chunking (F17), and stratified hash sampling (F18), asserted on planted
  * documents written as a real parquet `documents` table so the graded
  * query path (scan → transform) is the one tested.
  */
class Round4OpsSpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      .map("%02x".format(_)).mkString

  private def plantedDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("r4docs")
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("duplicated substrings: a shared 10-token run is flagged in both docs, unique docs stay clean") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val d = plantedDocs(Seq(
      (1L, s"$shared alpha beta gamma delta epsilon"), // shared run at pos 0
      (2L, s"zeta eta theta $shared"),                 // same run at pos 3
      (3L, (1 to 15).map(i => s"uniq$i").mkString(" ")))) // no shared window
    val got = TextOps.qDupSubstrings.fn(spark, d)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: 15 tokens → 6 windows; only the window starting at the run
    // start (pos 0) matches doc 2's — windows overlapping the run partially
    // mix in non-shared tokens
    assert(got(1L)._2 == 6L && got(1L)._3 == 1L)
    assert(got(2L)._2 == 4L && got(2L)._3 == 1L)
    assert(got(3L)._3 == 0L, "unique doc must have no duplicated windows")
    // a doc repeating its OWN window also counts (within-doc memorization)
    val rep = ((1 to 10) ++ (1 to 10)).map(i => s"r$i").mkString(" ")
    val d2 = plantedDocs(Seq((7L, rep)))
    val g2 = TextOps.qDupSubstrings.fn(spark, d2)
      .as[(Long, Long, Long, Double)].collect().head
    assert(g2._3 >= 2L, s"self-repeated window must be flagged, got $g2")
  }

  test("window_md5s kernel equals the declarative md5-of-joined-slice form") {
    graft.functions.VectorFunctions.register(spark)
    val docs = Tables.documents(spark, sf001).limit(200)
      .unionByName(Seq((9001L, "a b"), (9002L, ""), (9003L, "x y z"),
        (9004L, "a  b   c d")) // empty tokens from repeated spaces
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("p"))
        .withColumn("n_chars", length(col("text")).cast("long")))
    val w = 3
    val toks = split(col("text"), " ")
    val declarative = docs
      .withColumn("n", size(toks))
      .select(col("doc_id"),
        when(col("n") >= w, transform(sequence(lit(0), col("n") - w),
          i => md5(concat_ws(" ", slice(toks, i + 1, lit(w))))))
          .otherwise(array().cast("array<string>")).as("whs"))
    val kernel = docs.select(col("doc_id"),
      call_function("window_md5s", col("text"), lit(w)).as("whs"))
    assert(kernel.exceptAll(declarative).count() == 0 &&
      declarative.exceptAll(kernel).count() == 0)
  }

  test("chunking: stride-24 windows of 32 tokens tile each doc with a bounded tail") {
    val toks = (1 to 40).map(i => s"t$i")
    val d = plantedDocs(Seq((1L, toks.mkString(" ")), (2L, "tiny doc")))
    val got = TextOps.qChunking.fn(spark, d)
      .as[(Long, Long, Long, String)].collect()
    val doc1 = got.filter(_._1 == 1L).sortBy(_._2)
    // 40 tokens, size 32, stride 24 → chunks at 0 (32 toks) and 24 (16 toks)
    assert(doc1.map(c => (c._2, c._3)).toSeq == Seq((0L, 32L), (1L, 16L)))
    assert(doc1(0)._4 == md5hex(toks.slice(0, 32).mkString(" ")))
    assert(doc1(1)._4 == md5hex(toks.slice(24, 40).mkString(" ")))
    // a doc shorter than one chunk yields exactly one (short) chunk
    val doc2 = got.filter(_._1 == 2L)
    assert(doc2.map(c => (c._2, c._3)).toSeq == Seq((0L, 2L)))
    assert(doc2.head._4 == md5hex("tiny doc"))
  }

  test("LM quality: avg NLL and rare-token counts match the hand-computed unigram model") {
    // corpus: a a b | c c c  → N=6, V=3; p(w) = (c(w)+1)/(N+V)
    val d = plantedDocs(Seq((1L, "a a b"), (2L, "c c c")))
    def t6(x: Double): Double = math.floor(x * 1e6) / 1e6
    val pa = 3.0 / 9; val pb = 2.0 / 9; val pc = 4.0 / 9
    val exp1 = t6(-(math.log(pa) + math.log(pa) + math.log(pb)) / 3)
    val exp2 = t6(-(math.log(pc) * 3) / 3)
    val got = TextOps.qLmQuality.fn(spark, d)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // rare = corpus count below average (c·V < N): only b (1·3 < 6)
    assert(got(1L) == ((1L, 3L, 1L, exp1)))
    assert(got(2L) == ((2L, 3L, 0L, exp2)))
  }

  test("sequence packing: boundary-crossing docs span exactly the right sequences") {
    // stream: 1000 + 50 + 1024 tokens; SeqLen 1024 →
    //   doc 1: [0, 999]     → seq 0 only
    //   doc 2: [1000, 1049] → crosses the 1024 boundary: seqs 0–1
    //   doc 3: [1050, 2073] → seqs 1–2
    def toks(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val d = plantedDocs(Seq(
      (1L, toks(1000, "a")), (2L, toks(50, "b")), (3L, toks(1024, "c"))))
    val got = TextOps.qPackSequences.fn(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1000L, 0L, 0L, 1L),
      (2L, 50L, 0L, 1L, 2L),
      (3L, 1024L, 1L, 2L, 2L)))
  }

  test("curation pipeline: dedup, quality, contamination, and packing compose end to end") {
    def healthy(tag: String): String = (1 to 30).map(i => s"$tag$i").mkString(" ")
    val nearDup = healthy("a").replace("a7", "MUTANT") // 1 of 30 tokens differs
    val contaminated = healthy("b").replace("b15", "alpha beta gamma")
    val d = plantedDocs(Seq(
      (1L, healthy("a")),      // survivor (exact + near-dup cluster rep)
      (2L, healthy("a")),      // exact dup of 1 → dropped
      (3L, nearDup),           // near-dup of 1 (jaccard ≥ 0.6) → dropped
      (4L, contaminated),      // carries a screened phrase → dropped
      (5L, "five short tokens only here"), // fails the 20-token gate
      (6L, healthy("c"))))     // survivor
    val docs = Tables.documents(spark, d)
    val out = Graft.curateCorpus(spark, docs,
        Seq("alpha beta gamma", "nine ten eleven"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // survivors 1 and 6, 30 tokens each, both inside sequence 0
    assert(out == Seq((1L, 30L, 0L, 0L, 1L), (6L, 30L, 0L, 0L, 1L)),
      s"pipeline produced $out")
  }

  test("stratified sampling: membership is exactly the per-bucket hash threshold") {
    val docs = (1 to 200).map(i =>
      (i.toLong, (1 to (i % 90 + 10)).map(j => s"w${i}_$j").mkString(" ")))
    val d = plantedDocs(docs)
    val thr = Map("short" -> "3fff", "mid" -> "7fff", "long" -> "bfff")
    val expected = docs.flatMap { case (id, text) =>
      val bucket =
        if (text.length < 200) "short" else if (text.length < 350) "mid" else "long"
      if (md5hex(text).substring(0, 4) < thr(bucket)) Some(id) else None
    }.toSet
    assert(expected.nonEmpty && expected.size < docs.size,
      "fixture must exercise both kept and dropped docs")
    val got = TextOps.qStratifiedSample.fn(spark, d)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected)
  }
}
