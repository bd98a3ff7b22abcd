package graft

import org.apache.spark.sql.functions._

/** First-touch registration gate. The engine's custom expressions are
  * session-scoped temp functions (`VectorFunctions.register`), so every
  * public API and every graded query must register what it analyzes —
  * ON THE SESSION IT IS HANDED — before building frames that reference
  * those functions. Two real escapes motivated the mechanical gate:
  * round 9's `ivfLoad` (a loaded index's first probe in a fresh job
  * failed to resolve `fvec_dot`/`collect_top_k`) and round 10's first
  * `pqFit` refactor (the normalized frame analyzed `fvec_dot` BEFORE
  * `fitCodebooks` registered it). Both were invisible to every other
  * suite because specs share one session and Verify runs all queries
  * sequentially on one session — any earlier registration masks a
  * missing one. `spark.newSession()` has its own function registry, so
  * running each entry point on a brand-new session per call is exactly
  * the "user's first call in their own job" contract.
  */
class FreshSessionSpec extends SparkSpec {

  test("every graded query resolves on a brand-new session (no cross-query registration masking)") {
    SparkEntry.specs.foreach { q =>
      val s2 = spark.newSession()
      val n =
        try q.fn(s2, sf001).count()
        catch {
          case e: Throwable =>
            fail(s"query ${q.name} failed on a fresh session (missing self-registration?): ${e.getMessage}")
        }
      assert(n >= 0)
    }
  }

  test("vector/PQ library APIs self-register on first touch of a fresh session") {
    // tiny corpus built per-case ON the fresh session: 24 vectors, dim 8
    def corpus(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      (0 until 24).map { i =>
        (i.toLong, Array.tabulate(8)(j => (((i * 7 + j * 3) % 11) - 5).toFloat))
      }.toDF("vec_id", "embedding")
    }
    def fresh() = spark.newSession()

    locally { // round 14: k-means fit/assign + clustered SemDeDup + overlap reports
      val s = fresh()
      val model = Similarity.kmeansFitExact(corpus(s), k = 2, iters = 1)
      val s2 = fresh()
      assert(model.assignBroadcast(corpus(s2)).count() == 24)
      val s3 = fresh()
      assert(Similarity.semanticClustersClustered(s3, corpus(s3),
        minCos = 0.9, k = 2).count() == 24)
      def textDocs(s0: org.apache.spark.sql.SparkSession) = {
        import s0.implicits._
        Seq((1L, "x", (1 to 9).map(i => s"t$i").mkString(" ")))
          .toDF("doc_id", "source", "text")
      }
      val s4 = fresh()
      assert(TextOps.evalOverlapReport(textDocs(s4), textDocs(s4)).count() == 1)
      val s5 = fresh()
      assert(TextOps.sourceOverlapMatrix(textDocs(s5)).count() == 0)
    }

    locally { // exact edges + semantic clusters, both edge paths
      val s = fresh()
      assert(Similarity.exactCosineEdges(s, corpus(s), 0.99).count() >= 0)
      val s2 = fresh()
      assert(Similarity.semanticClusters(s2, corpus(s2), 0.9).count() == 24)
      val s3 = fresh()
      assert(Similarity.semanticClusters(s3, corpus(s3), 0.9, useLsh = true).count() == 24)
    }
    locally { // IVF: fit is the entry; probe/assign/save/load on yet another session
      val s = fresh()
      val fitted = Similarity.ivfFit(s, corpus(s), k = 2, fitSample = 0)
      val dir = tmpDir("fresh_ivf")
      fitted.save(dir)
      val s2 = fresh()
      val loaded = Similarity.ivfLoad(s2, dir)
      assert(Similarity.ivfProbe(loaded, col("vec_id") < 3, nprobe = 1, topK = 2)
        .count() > 0)
      val s3 = fresh()
      val q = { import s3.implicits._
        Seq((100L, Array.tabulate(8)(_.toFloat))).toDF("q_id", "embedding") }
      assert(Similarity.ivfProbeVectors(Similarity.ivfLoad(s3, dir), q,
        nprobe = 1, topK = 2).count() > 0)
    }
    locally { // PQ: fit (absolute + residual), build, probe, load
      val s = fresh()
      val fitted = Similarity.ivfFit(s, corpus(s), k = 2, fitSample = 0)
      val model = Pq.pqFit(s, corpus(s), dim = 8, m = 2, ksub = 4)
      val sR = fresh()
      val fittedR = Similarity.ivfFit(sR, corpus(sR), k = 2, fitSample = 0)
      val modelR = Pq.pqFitResidual(fittedR, dim = 8, m = 2, ksub = 4)
      val dir = tmpDir("fresh_pq")
      Pq.ivfPqBuild(fittedR, modelR, residual = true).save(dir)
      assert(model.m == 2 && modelR.m == 2)
      val s2 = fresh()
      val q = { import s2.implicits._
        Seq((100L, Array.tabulate(8)(_.toFloat))).toDF("q_id", "embedding") }
      assert(Pq.ivfPqProbeVectors(Pq.ivfPqLoad(s2, dir), q,
        nprobe = 1, topK = 2).count() > 0)
    }
    locally { // quantization + brute-force kNN facade surfaces
      val s = fresh()
      assert(Similarity.lshCandidates(s, corpus(s), 0.9).count() >= 0)
    }
  }

  test("curation facade runs on a brand-new session (all stages engaged)") {
    // the full 7-stage composition, with semantic dedup AND eval
    // decontamination engaged, on a session whose registry has never
    // seen a graft function — covers the text/minhash/vector expression
    // registrations along every stage boundary
    val s2 = spark.newSession()
    val docs = Tables.documents(s2, sf001).limit(60)
    val emb = Tables.embeddings(s2, sf001).limit(60)
      .select(org.apache.spark.sql.functions.col("vec_id").as("doc_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val eval = Tables.documents(s2, sf001)
      .orderBy(org.apache.spark.sql.functions.col("doc_id").desc).limit(5)
    val (out, audit) = Graft.curateCorpusAudited(s2, docs,
      screenPhrases = Seq("alpha beta gamma"),
      evalDocs = Some(eval),
      semantic = Some(Graft.SemanticDedup(emb)))
    assert(out.count() >= 0 && audit.nonEmpty)
  }
}
