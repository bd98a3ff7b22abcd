package graft

import org.apache.spark.sql.functions._

/** Round-20 frozen-model persistence (VERDICT r19 item 1): every
  * fit→freeze model round-trips through `save`/`load` with frozen
  * scores BIT-IDENTICAL on an edge-heavy corpus — multi-byte UTF-8,
  * empty strings, single-token docs, negative micros — plus loud
  * failure on kind mismatches and corrupt files. The cross-session
  * half of the story (load into a brand-new session state) is
  * ModelServingSpec.
  */
class ModelPersistenceSpec extends SparkSpec {

  import spark.implicits._

  private def path(name: String): String = tmpDir("graft-model") + s"/$name.bin"

  /** Edge-heavy scoring corpus: unicode (composed + astral), empty
    * text, single token, repeated tokens, long-ish prose. */
  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "a"),
    (2L, "καλημέρα κόσμε 世界 𝔘nicode façade", "a"),
    (3L, "", "b"),
    (4L, "x", "b"),
    (5L, "spam spam spam spam spam spam", "a"),
    (6L, "the the the and and of of of to to in in", "c"),
    (7L, "a slightly longer document with enough words to score " +
      "against every language model order in the family", "c"))
    .toDF("doc_id", "text", "source")

  private def scores(df: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.Column): Seq[(Long, Any)] =
    df.select(col("doc_id"), c.as("s")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.get(1))).toSeq

  test("LangIdProfile round-trips bit-identically") {
    val labeled = Seq(("en", "the cat sat on the mat and that was that"),
      ("el", "καλημέρα κόσμε καλημέρα κόσμε καλημέρα"),
      ("de", "der die das und der die das oder")).toDF("lang", "text")
    val m = TextOps.langIdFit(labeled, topN = 10)
    val p = path("langid")
    m.save(spark, p)
    val m2 = TextOps.LangIdProfile.load(spark, p)
    assert(m2 === m) // case-class equality: every field, every element
    assert(scores(corpus, m2.scoreCol(lower(col("text")))) ===
      scores(corpus, m.scoreCol(lower(col("text")))))
  }

  test("NbTextModel round-trips bit-identically") {
    val labeled = Seq(("keep", "good clean prose with words"),
      ("keep", "another fine document"),
      ("drop", "spam spam buy now"),
      ("drop", "junk junk junk")).toDF("label", "text")
    val m = TextOps.nbFit(labeled, vocabN = 50)
    val p = path("nb")
    m.save(spark, p)
    val m2 = TextOps.NbTextModel.load(spark, p)
    assert(m2 === m)
    assert(scores(corpus, m2.scoreCol(col("text"))) ===
      scores(corpus, m.scoreCol(col("text"))))
  }

  test("BigramLm / TrigramLm / NgramLm round-trip bit-identically") {
    val m2g = TextOps.bigramLmFit(corpus, buckets = 64)
    val p2 = path("bigram"); m2g.save(spark, p2)
    val r2 = TextOps.BigramLm.load(spark, p2)
    assert(r2 === m2g)
    assert(scores(corpus, r2.sumMicrosCol(col("text"))) ===
      scores(corpus, m2g.sumMicrosCol(col("text"))))

    val m3g = TextOps.trigramLmFit(corpus, buckets = 64)
    val p3 = path("trigram"); m3g.save(spark, p3)
    val r3 = TextOps.TrigramLm.load(spark, p3)
    assert(r3 === m3g)
    assert(scores(corpus, r3.sumMicrosCol(col("text"))) ===
      scores(corpus, m3g.sumMicrosCol(col("text"))))

    val m5g = TextOps.ngramLmFit(corpus, order = 5, buckets = 32)
    val p5 = path("ngram"); m5g.save(spark, p5)
    val r5 = TextOps.NgramLm.load(spark, p5)
    assert(r5 === m5g)
    assert(scores(corpus, r5.sumMicrosCol(col("text"))) ===
      scores(corpus, m5g.sumMicrosCol(col("text"))))
  }

  test("DsirModel round-trips bit-identically (incl. seed + anchor)") {
    val target = corpus.filter(col("doc_id") <= 2L)
    val m = TextOps.dsirFit(corpus, target, buckets = 64, seed = 7L)
    val p = path("dsir"); m.save(spark, p)
    val m2 = TextOps.DsirModel.load(spark, p)
    assert(m2 === m)
    assert(scores(corpus, m2.logRatioCol(col("text"))) ===
      scores(corpus, m.logRatioCol(col("text"))))
    assert(scores(corpus, m2.keepCol(col("text"), col("doc_id"))) ===
      scores(corpus, m.keepCol(col("text"), col("doc_id"))))
  }

  test("CalibrationModel round-trips bit-identically (IEEE-754 doubles)") {
    val ref = corpus.withColumn("score",
      length(col("text")).cast("double") / 3.0) // non-terminating doubles
    val m = TextOps.calibrationFit(ref, "score", "source", buckets = 16)
    val p = path("calib"); m.save(spark, p)
    val m2 = TextOps.CalibrationModel.load(spark, p)
    assert(m2 === m)
    val probe = corpus.withColumn("score",
      length(col("text")).cast("double") / 3.0)
    assert(scores(probe, m2.pctCol(col("score"), col("source"))) ===
      scores(probe, m.pctCol(col("score"), col("source"))))
  }

  test("KmeansModel round-trips bit-identically") {
    val emb = spark.range(0, 64).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), i =>
        (pmod(hash(col("id") * 31 + i), lit(1000)) / 100).cast("float"))
        .as("embedding"))
    val m = Similarity.kmeansFitExact(emb, k = 4, iters = 3)
    val p = path("kmeans"); m.save(spark, p)
    val m2 = Similarity.KmeansModel.load(spark, p)
    assert(m2 === m)
    val a1 = emb.select(col("vec_id"), m.bestCol(col("embedding")).as("b"))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val a2 = emb.select(col("vec_id"), m2.bestCol(col("embedding")).as("b"))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(a1 === a2)
  }

  test("BpeModel round-trips bit-identically (unicode merges)") {
    val m = TextOps.bpeFit(corpus, numMerges = 20, vocabN = 100)
    val p = path("bpe"); m.save(spark, p)
    val m2 = TextOps.BpeModel.load(spark, p)
    assert(m2 === m)
    assert(scores(corpus, m2.encodeCol(col("text"))) ===
      scores(corpus, m.encodeCol(col("text"))))
  }

  test("load fails loudly on kind mismatch, bad magic, and wrong version") {
    val m = TextOps.bigramLmFit(corpus, buckets = 16)
    val p = path("mismatch"); m.save(spark, p)
    val e1 = intercept[IllegalArgumentException] {
      TextOps.TrigramLm.load(spark, p)
    }
    assert(e1.getMessage.contains("bigram_lm") &&
      e1.getMessage.contains("trigram_lm"))
    val junk = path("junk")
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      "not a model".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      TextOps.BigramLm.load(spark, junk)
    }
    assert(e2.getMessage.contains("not a graft model file"))
  }

  test("corrupt collection counts and trailing bytes fail loudly (r20 review)") {
    // a negative length prefix must throw, not IndexedSeq.fill(-n) → an
    // EMPTY table that silently passes every document through the gate
    val pNeg = path("neg")
    ModelIO.save(spark, pNeg, "probe")(out => out.writeInt(-3))
    val e1 = intercept[IllegalArgumentException] {
      ModelIO.load(spark, pNeg, "probe")(in => ModelIO.readLongs(in))
    }
    assert(e1.getMessage.contains("negative collection count"))
    // bytes left after a clean parse are a corruption/codec-drift signal
    val pTrail = path("trail")
    ModelIO.save(spark, pTrail, "probe") { out =>
      ModelIO.writeLongs(out, Seq(1L, 2L)); out.writeByte(7)
    }
    val e2 = intercept[IllegalArgumentException] {
      ModelIO.load(spark, pTrail, "probe")(in => ModelIO.readLongs(in))
    }
    assert(e2.getMessage.contains("trailing bytes"))
  }

  test("a save of a load is byte-identical on disk (deterministic codec)") {
    val ref = corpus.withColumn("score", col("doc_id").cast("double") * 1.5)
    val m = TextOps.calibrationFit(ref, "score", "source", buckets = 8)
    val p1 = path("c1"); m.save(spark, p1)
    val m2 = TextOps.CalibrationModel.load(spark, p1)
    val p2 = path("c2"); m2.save(spark, p2)
    val b1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p1))
    val b2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))
    assert(java.util.Arrays.equals(b1, b2))
  }
}
