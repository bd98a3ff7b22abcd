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

  test("IVF-KMeans top-3 recall: bounded at nprobe=2, exact at full probe") {
    val emb = Tables.embeddings(spark, sf001).select($"vec_id", $"embedding").cache()
    def ivfNbrs(nprobe: Int): Map[Long, Set[Long]] =
      Similarity.ivfKMeans(spark, emb, k = 16, nprobe = nprobe, topK = 3,
          queryPred = $"vec_id" < 30)
        .select($"q_id", $"n_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Similarity.qKnn.fn(spark, sf001)
      .filter($"q_id" < 30)
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(ivf: Map[Long, Set[Long]]): Double = {
      val hits = exact.iterator.map { case (q, nbrs) =>
        ivf.getOrElse(q, Set.empty).intersect(nbrs).size
      }.sum
      hits.toDouble / exact.valuesIterator.map(_.size).sum
    }
    // sf0.01 embeddings are near-uniform random — neighbors barely cluster,
    // so partial-probe recall is intrinsically modest (measured 0.378);
    // the bound pins it from collapsing, the full-probe law pins exactness
    val partial = recallOf(ivfNbrs(nprobe = 2))
    assert(partial >= 0.3, s"IVF k=16 nprobe=2 top-3 recall $partial")
    // probing every cell makes the candidate set the whole corpus, so the
    // result must equal brute force exactly — same trunc4 cosine, same
    // (cos DESC, n_id) tie-break
    val full = recallOf(ivfNbrs(nprobe = 16))
    assert(full == 1.0, s"full-probe IVF must match brute force, recall $full")
  }

  test("F21 scale path: LSH-edge clusters equal exact-edge clusters on planted cliques") {
    val base = Tables.embeddings(spark, sf001).select($"vec_id", $"embedding")
    // 6 planted cliques of 3: base vector i plus two near-identical copies
    // (one component nudged ±5% — cosine ≥ ~0.99 within a clique, far
    // above anything two random sf0.001 vectors reach at minCos = 0.9)
    def nudge(idShift: Long, dim: Int, f: Float) =
      base.filter($"vec_id" < 6).select(($"vec_id" + idShift).as("vec_id"),
        transform($"embedding",
          (v, i) => when(i === dim, v * lit(f)).otherwise(v)).as("embedding"))
    val corpus = base.unionByName(nudge(10000L, 0, 1.05f))
      .unionByName(nudge(20000L, 1, 0.95f))
    def clusters(useLsh: Boolean): Map[Long, Long] =
      Similarity.semanticClusters(spark, corpus, minCos = 0.9, useLsh = useLsh)
        .select($"vec_id", $"cluster_id").as[(Long, Long)].collect().toMap
    val exact = clusters(useLsh = false)
    val lsh = clusters(useLsh = true)
    // the 100 TB claim: swapping the brute-force edge build for the banded
    // sign-LSH equi-join leaves the component structure IDENTICAL
    assert(lsh == exact, {
      val diff = exact.keySet.filter(k => exact(k) != lsh.getOrElse(k, -1L))
      s"cluster mismatch on vec_ids $diff"
    })
    // and not vacuously: every planted clique really is one cluster
    (0L until 6L).foreach { i =>
      assert(exact(i) == exact(i + 10000) && exact(i) == exact(i + 20000),
        s"planted clique $i not connected in the exact path")
    }
  }

  test("moderate-threshold LSH edge recall: the gap is measured, and more bands buy it back") {
    // honest scope for the semanticClusters LSH claim (round-6 ADVICE #1):
    // at minCos = 0.35 a 4-band/4-bit scheme misses borderline edges by
    // design — collision probability per band is (1 − arccos θ/π)^4 ≈ 0.04
    // at θ = 0.35. This spec MEASURES that recall rather than asserting it
    // away, and checks the documented remedy: more planes (more bands at
    // fixed width) strictly widen the candidate set, because plane p's
    // hyperplane is a pure function of p — a 64-plane signature's first 4
    // bands ARE the 16-plane signature's bands. bandBits is PINNED to 4:
    // the band-prefix monotonicity law only holds at a fixed width, and
    // the round-8 auto default would pick the corpus-sized width instead.
    val emb = Tables.embeddings(spark, sf001).select($"vec_id", $"embedding")
    val exact = Similarity.exactCosineEdges(spark, emb, 0.35)
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "threshold 0.35 must produce edges on sf0.001")
    def lsh(nPlanes: Int): Set[(Long, Long)] =
      Similarity.lshCandidates(spark, emb, 0.35, nPlanes = nPlanes, bandBits = 4)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val r16 = lsh(16)
    val r64 = lsh(64)
    // verification is exact cosine, so LSH edges are always a SUBSET —
    // the failure mode is only ever missing edges, never wrong ones
    assert(r16.subsetOf(exact) && r64.subsetOf(exact))
    val rec16 = r16.size.toDouble / exact.size
    val rec64 = r64.size.toDouble / exact.size
    info(f"LSH edge recall at minCos=0.35: 16 planes = $rec16%.3f, " +
      f"64 planes = $rec64%.3f (${exact.size} exact edges)")
    assert(rec16 <= rec64, "more bands can never lose candidates")
    assert(rec64 > rec16 || rec16 == 1.0,
      "on this corpus 64 planes must measurably improve moderate-threshold recall")
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
