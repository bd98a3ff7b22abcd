package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** Cross-validation of the hand-rolled sketch operators against MLlib's
  * implementations (spark-mllib is on the classpath) — two independent
  * implementations agreeing on planted near-duplicates is strong evidence
  * both are right.
  */
class MllibCrossCheckSpec extends SparkSpec {

  import spark.implicits._

  test("planted dups: our banded MinHash and MLlib MinHashLSH find the same pairs") {
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val planted = docs.filter($"doc_id" < 5)
      .select(($"doc_id" + 10000).as("doc_id"), $"text")
    val corpus = docs.unionByName(planted).cache()
    val expectedPairs = (0L until 5L).map(i => (i, i + 10000)).toSet

    // ours
    val ours = MinHash.candidatePairs(corpus, minEst = 0.9)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    expectedPairs.foreach(p => assert(ours.contains(p), s"ours missed $p"))

    // MLlib: shingles → hashed binary features → MinHashLSH similarity join
    val shingled = MinHash.shingles(corpus)
      .groupBy($"doc_id").agg(collect_list($"sh").as("shs"))
    val tf = new HashingTF().setInputCol("shs").setOutputCol("features")
      .setNumFeatures(1 << 18).transform(shingled)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L).fit(tf)
    val joined = lsh.approxSimilarityJoin(tf, tf, 0.2, "jaccardDist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter($"a" < $"b").as[(Long, Long)].collect().toSet
    expectedPairs.foreach(p => assert(joined.contains(p), s"MLlib missed $p"))
  }

  test("KMeans-IVF recalls most exact top-1 neighbors with nprobe=2") {
    val emb = Tables.embeddings(spark, sf001).select($"vec_id", $"embedding").cache()
    val queries = $"vec_id" < 30
    val ivf = Similarity.ivfKMeans(spark, emb, k = 8, nprobe = 2, topK = 1, queryPred = queries)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    // exact top-1 via the brute-force path
    val n = emb.count().toInt
    val exact = Similarity.qKnn.fn(spark, sf001)
      .filter($"rn" === 1 && $"q_id" < 30)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    val hits = exact.count { case (q, nId) => ivf.get(q).contains(nId) }
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.5, s"IVF nprobe=2 top-1 recall $recall (${hits}/${exact.size})")
  }
}
