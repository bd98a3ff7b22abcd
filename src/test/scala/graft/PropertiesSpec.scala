package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.rng.Seed

import graft.pipeline.KinesisSink._

/** ScalaCheck operator laws (SURVEY.md §5.4) — pure (no Spark) properties
  * run under ScalaCheck's own sbt framework.
  */
object SinkProps extends Properties("KinesisSink") {

  private val recGen = Gen.chooseNum(1, 200000).map(n => KinesisRecord("k", new Array[Byte](n)))

  property("batches never exceed 500 records / 5 MiB and preserve order") =
    Prop.forAll(Gen.listOfN(60, recGen)) { recs =>
      val bs = batches(recs.iterator).toVector
      bs.forall(_.size <= MaxRecordsPerRequest) &&
        bs.forall(_.map(r => r.data.length.toLong + r.partitionKey.length).sum <= MaxBytesPerRequest) &&
        bs.flatten == recs
    }

  property("shardFor is total, in-range, deterministic") =
    Prop.forAll(Gen.alphaNumStr, Gen.chooseNum(1, 64)) { (key, n) =>
      val s = shardFor(key, n)
      s >= 0 && s < n && s == shardFor(key, n)
    }

  property("retry delivers everything a flaky-but-recovering client accepts") =
    Prop.forAll(Gen.chooseNum(1, 40), Gen.chooseNum(0, 2)) { (n, failRounds) =>
      var round = 0
      val client = new PutRecordsClient {
        override def putRecords(shard: Int, records: Seq[KinesisRecord]): Seq[PutResult] = {
          round += 1
          records.zipWithIndex.map { case (_, i) =>
            if (round <= failRounds && i % 3 == 0) PutResult(None, Some("Throttled"))
            else PutResult(Some(1L), None)
          }
        }
      }
      val recs = (1 to n).map(i => KinesisRecord(i.toString, Array[Byte](1)))
      putWithRetry(client, 0, recs, maxAttempts = 5, sleep = _ => ()) == n
    }
}

/** Spark-backed laws using seeded deterministic Gen samples. */
class SparkLawsSpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("law: exact-dedup is idempotent (10 seeded corpora)") {
    val corpusGen = Gen.listOfN(30, Gen.oneOf("a b c", "d e f", "g h i", "j k l"))
    (1L to 10L).foreach { seed =>
      val texts = sample(corpusGen, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = docs.dropDuplicates("text")
      assert(once.dropDuplicates("text").count() == once.count())
      assert(once.count() == texts.distinct.size)
    }
  }

  test("law: identical docs share minhash signatures; disjoint docs mostly differ") {
    val docs = Seq(
      (1L, "p q r s t u v w x y z"),
      (2L, "p q r s t u v w x y z"),
      (3L, "aa bb cc dd ee ff gg hh ii jj kk")).toDF("doc_id", "text")
    val sigs = MinHash.signatures(docs).as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val matches = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(matches < MinHash.NumPerms / 2)
  }

  test("law: LSH candidates are ordered pairs with no duplicates") {
    val emb = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val cands = Similarity.lshCandidates(spark, emb, minCos = 0.0).collect()
    assert(cands.nonEmpty)
    assert(cands.forall(r => r.getLong(0) < r.getLong(1)))
    val pairs = cands.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
  }

  test("SQL surface: registered tables + fvec_dot are reachable from spark.sql") {
    Graft.registerTables(spark, sf001)
    val n = spark.sql("SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .as[Long].head()
    assert(n > 0)
    val d = spark.sql(
      """SELECT fvec_dot(embedding, embedding) AS nsq FROM embeddings ORDER BY vec_id LIMIT 1""")
      .as[Double].head()
    assert(d > 0.0)
    val ev = spark.sql("SELECT count(*) FROM events WHERE ts > 0").as[Long].head()
    assert(ev > 0)
  }
}
