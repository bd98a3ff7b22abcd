package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Round-3 operators: repetition signals (F14) and PII redaction (F15),
  * asserted on planted documents written as a real parquet `documents`
  * table so the graded query path (scan → transform) is the one tested.
  */
class Round3OpsSpec extends SparkSpec {

  import spark.implicits._

  private def plantedDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("r3docs")
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("planted"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("repetition signals: distinct ratio and top-bigram fraction on planted docs") {
    val d = plantedDocs(Seq(
      (1L, "a a a a"),                       // 4 toks, 1 distinct, "a a" ×3
      (2L, "w x y z"),                       // all distinct, every bigram once
      (3L, "spam spam spam spam spam ham"))) // heavy repetition
    val got = TextOps.qRepetition.fn(spark, d)
      .as[(Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((4L, 0.25, 3L, 1.0)))
    assert(got(2L) == ((4L, 1.0, 1L, math.floor(1.0 / 3 * 1e6) / 1e6)))
    assert(got(3L) == ((6L, math.floor(2.0 / 6 * 1e6) / 1e6, 4L, 0.8)))
  }

  test("Aho-Corasick contamination scan matches the contains formulation exactly") {
    // corners: phrase sharing a prefix with another, phrase that is a
    // suffix of another's interior, overlapping occurrences, miss
    val phrases = Seq("abc", "abcd", "bcd", "cde", "zzz")
    val docs = Seq(
      (1L, "xx abcd yy"),     // hits abc, abcd, bcd
      (2L, "abcde"),          // hits abc, abcd, bcd, cde
      (3L, "ab cd"),          // no hit
      (4L, "bcdbcd zzz"),     // hits bcd (twice) and zzz
      (5L, "")).toDF("doc_id", "text")
    val viaAC = TextOps.contaminationScanAC(docs, phrases).collect().map(_.toSeq)
    val viaContains = {
      val hits = phrases.map(p => col("text").contains(p))
      val firstHit = coalesce(phrases.map(p =>
        when(col("text").contains(p), lit(p))): _*)
      docs.select((col("doc_id") +:
        hits.zipWithIndex.map { case (h, i) => h.cast("int").as(s"hit$i") }) ++
        Seq(hits.map(_.cast("int")).reduce(_ + _).gt(0).as("contaminated"),
          firstHit.as("first_hit")): _*)
        .orderBy(col("doc_id")).collect().map(_.toSeq)
    }
    assert(viaAC.toSeq == viaContains.toSeq)
    // and on the real corpus with the graded phrase list: identical frames
    val corpus = Tables.documents(spark, sf001)
    val phrasesGraded = Seq("alpha beta gamma", "nine ten eleven", "omicron pi rho sigma")
    val acCorpus = TextOps.contaminationScanAC(corpus, phrasesGraded).collect().map(_.toSeq)
    val gradedCorpus = TextOps.qContamination.fn(spark, sf001).collect().map(_.toSeq)
    assert(acCorpus.toSeq == gradedCorpus.toSeq)
  }

  test("PII redaction: counts and redacted hash on planted docs") {
    val pii = "contact bob@example.com or 10.0.0.1 at 555-123-4567 ok"
    val clean = "no personal information in this sentence at all"
    val d = plantedDocs(Seq((1L, pii), (2L, clean)))
    val got = TextOps.qPiiRedact.fn(spark, d)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
        .map(b => f"$b%02x").mkString
    assert(got(1L) == ((1L, 1L, 1L,
      md5hex("contact <EMAIL> or <IP> at <PHONE> ok"))))
    assert(got(2L) == ((0L, 0L, 0L, md5hex(clean))))
  }
}
