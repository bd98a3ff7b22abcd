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
}
