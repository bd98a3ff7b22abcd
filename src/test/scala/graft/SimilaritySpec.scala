package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  test("FloatVecDot computes the double-accumulated dot product") {
    VectorFunctions.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(call_function("fvec_dot", col("a"), col("b")).as("d"))
    assert(df.as[Double].head() == 32.0)
    // SQL surface too
    df.sparkSession.sql("SELECT fvec_dot(array(cast(1.0 as float)), array(cast(2.0 as float)))")
      .collect()
  }

  test("RollingHash matches the hand-computed polynomial") {
    VectorFunctions.register(spark)
    assert(spark.sql("SELECT rolling_hash('ab')").as[Long].head() == 97L * 31 + 98)
    assert(spark.sql("SELECT rolling_hash('')").as[Long].head() == 0L)
    assert(spark.sql("SELECT rolling_hash(CAST(NULL AS STRING))").head().isNullAt(0))
  }

  test("brute-force top-k is well-formed") {
    val df = Similarity.qCosineTopk.fn(spark, sf001).collect()
    assert(df.length == 20)
    val sims = df.map(_.getDouble(2))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sorted.reverse.toSeq == sims.toSeq, "ordered by similarity desc")
  }

  test("kNN returns exactly k neighbors per query, self excluded") {
    val rows = Similarity.qKnn.fn(spark, sf001).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length == 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("LSH recalls planted exact duplicates and agrees with brute force") {
    val emb = Tables.embeddings(spark, sf001).select($"vec_id", $"embedding")
    // plant 5 exact duplicates with shifted ids
    val planted = emb.filter($"vec_id" < 5)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val corpus = emb.unionByName(planted)
    val cands = Similarity.lshCandidates(spark, corpus, minCos = 0.999)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { i =>
      assert(cands.contains((i, i + 10000)), s"planted dup pair $i missing")
    }
  }

  test("IVF ANN neighbors come from the probed cell and rank correctly") {
    val rows = Similarity.qIvfAnn.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.sorted.reverse.toSeq == sims.toSeq)
    }
  }
}
