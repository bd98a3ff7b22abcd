package graft

import org.apache.spark.sql.functions._

class MinHashSpec extends SparkSpec {

  import spark.implicits._

  private val baseText = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon " +
    "one two three four five six seven eight nine ten " +
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty " +
    "aa bb cc dd ee ff gg hh ii jj " +
    "kk ll mm nn oo pp qq rr ss tt").trim

  test("exact duplicates get identical signatures and estimate 1.0") {
    val docs = Seq((1L, baseText), (2L, baseText), (3L, "totally different words here now"))
      .toDF("doc_id", "text")
    val sigs = MinHash.signatures(docs).as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    val pairs = MinHash.candidatePairs(docs, minEst = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }

  test("near-duplicates estimate close to their exact Jaccard") {
    // one word changed → 3 of 18 shingles differ
    val mutated = baseText.replace("omicron", "OMICRON")
    val docs = Seq((1L, baseText), (2L, mutated)).toDF("doc_id", "text")
    val sh = MinHash.shingles(docs).as[(Long, String)].collect().groupBy(_._1)
    val a = sh(1L).map(_._2).toSet; val b = sh(2L).map(_._2).toSet
    val exact = a.intersect(b).size.toDouble / a.union(b).size
    val est = MinHash.candidatePairs(docs, minEst = 0.0)
      .as[(Long, Long, Double)].collect().head._3
    assert(math.abs(est - exact) < 0.25, s"est $est vs exact $exact")
  }

  test("banded LSH finds no candidates among fully-distinct docs") {
    val docs = (1 to 8).map(i =>
      (i.toLong, (1 to 20).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    assert(MinHash.candidatePairs(docs, minEst = 0.3).count() == 0)
  }

  test("simhash of identical docs is identical, differs across docs") {
    val docs = Seq((1L, baseText), (2L, baseText), (3L, "other tokens entirely"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("mh_docs")
    val out = MinHash.qSimhash.fn(spark, sf001) // corpus signature run (rows>0)
    assert(out.count() > 0)
  }

  test("simhash64 kernel: near-dups land close in hamming distance, unrelated docs far") {
    graft.functions.VectorFunctions.register(spark)
    val nearDup = baseText.replace("omicron", "OMICRON")
    val unrelated = (1 to 70).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, baseText), (2L, baseText), (3L, nearDup), (4L, unrelated))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), call_function("simhash64", col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(2L), "identical docs must hash identically")
    assert(hamming(sh(1L), sh(3L)) <= 12,
      s"one-word mutation drifted ${hamming(sh(1L), sh(3L))} bits")
    assert(hamming(sh(1L), sh(4L)) >= 20,
      s"unrelated doc only ${hamming(sh(1L), sh(4L))} bits away")
  }

  test("degenerate corpus: two 2k-identical-doc groups produce the exact pair sets") {
    // exact dups share ALL bands — with per-bucket collect_list pair-gen
    // this was one task holding a 2k-element array and generating ~2M
    // structs on its heap. Now the md5 pre-pass admits ONE representative
    // per distinct text into banding (each band bucket holds ≤ 2 rows
    // here) and the within-group expansion is an equi-join on the text
    // key. Every within-group pair must appear at est 1.0; the two
    // unrelated groups must never cross.
    val n = 2000
    val other = (1 to 60).map(j => s"z$j").mkString(" ")
    val docs = ((1 to n).map(i => (i.toLong, baseText)) ++
      (1 to n).map(i => ((i + n).toLong, other))).toDF("doc_id", "text")
    val pairs = MinHash.candidatePairs(docs, minEst = 0.9)
    assert(pairs.count() == 2L * n * (n - 1) / 2)
    assert(pairs.filter(col("a_id") <= n && col("b_id") > n).count() == 0,
      "unrelated groups must not pair")
    assert(pairs.filter(col("est_jaccard") =!= 1.0).count() == 0)
  }

  test("docs too short to shingle get NULL signatures and never collide") {
    // every one of these has < 3 tokens → no 3-gram → no signature; with
    // the old all-sentinel signature they'd all be 'perfect' near-dups
    val docs = Seq((1L, "solo"), (2L, "two words"), (3L, "x"), (4L, ""),
      (5L, baseText)).toDF("doc_id", "text")
    val sigs = MinHash.signatures(docs)
    assert(sigs.filter(col("sig").isNull).count() == 4)
    assert(sigs.filter(col("sig").isNotNull).count() == 1)
    assert(MinHash.candidatePairs(docs, minEst = 0.1).count() == 0,
      "gram-less docs must not pair with each other")
  }
}
