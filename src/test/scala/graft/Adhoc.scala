package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch scale-stress main (test scope — not shipped): replicate the
  * sf0.1 corpus 10× with per-copy mutations (~50k docs) and measure the
  * near-dup pipeline end-to-end. Usage: sbt "Test/runMain graft.Adhoc"
  */
object Adhoc {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"ADHOC $label rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
  }

  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    // 10 mutated copies of each sf0.1 doc: copy 0 is verbatim (a planted
    // exact/near dup of the original), copies 1..9 prepend a distinct
    // token (near-dup of the original at high jaccard)
    val base = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val scaled = base
      .crossJoin(spark.range(0, 10).select(col("id").as("copy")))
      .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(concat(lit("mut"), col("copy"), lit(" "), col("text"))).as("text"))
      .localCheckpoint(eager = true)
    println(s"corpus: ${scaled.count()} docs")

    if (args.headOption.contains("semdedup")) {
      // 10k-vector corpus: sf0.1 embeddings replicated 5× — copy 0
      // verbatim, copies 1–4 with one dimension scaled 3% (planted
      // 5-cliques at cosine ≥ ~0.999). Compares the graded exact-edge
      // path against the LSH-edge scale path for wall-clock AND cluster
      // equality at 5× the graded corpus.
      val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      val scaledE = emb
        .crossJoin(spark.range(0, 5).select(col("id").as("copy")))
        .select((col("vec_id") * 5 + col("copy")).as("vec_id"),
          when(col("copy") === 0, col("embedding"))
            .otherwise(transform(col("embedding"),
              (v, i) => when(i === (col("copy") - 1).cast("int"), v * lit(1.03f)).otherwise(v)))
            .as("embedding"))
        .localCheckpoint(eager = true)
      println(s"vectors: ${scaledE.count()}")
      for (rep <- 1 to 2) {
        time("semdedup_exact_10k") {
          Similarity.semanticClusters(spark, scaledE, 0.9).count()
        }
        time("semdedup_lsh_10k") {
          Similarity.semanticClusters(spark, scaledE, 0.9, useLsh = true).count()
        }
      }
      val ex = Similarity.semanticClusters(spark, scaledE, 0.9)
        .select(col("vec_id"), col("cluster_id").as("c_exact"))
      val ls = Similarity.semanticClusters(spark, scaledE, 0.9, useLsh = true)
        .select(col("vec_id"), col("cluster_id").as("c_lsh"))
      val mismatch = ex.join(ls, Seq("vec_id"))
        .filter(col("c_exact") =!= col("c_lsh")).count()
      val nontrivial = ex.groupBy(col("c_exact")).count().filter(col("count") > 1).count()
      println(s"ADHOC semdedup_equal mismatch=$mismatch nontrivial_clusters=$nontrivial")
      spark.stop()
      return
    }

    if (args.headOption.contains("megacc")) {
      // adversarial single-component stress: one 10k-doc CLIQUE (50M-edge
      // breadth — the boilerplate-blob shape) plus one 300-doc CHAIN
      // (depth — needs pointer-jumping, plain propagation would exhaust
      // maxIters). Proves the CC loop AND the round-7 cluster_size
      // aggregate+join reshape under the exact shapes they exist for.
      import spark.implicits._
      val n = 10000
      val nodes = spark.range(0, n + 300).select(col("id").as("doc_id"))
      val clique = spark.range(0, n).select(col("id").as("a_id"))
        .crossJoin(spark.range(0, n).select(col("id").as("b_id")))
        .filter(col("a_id") < col("b_id"))
      val chain = spark.range(n, n + 299)
        .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
      val edges = clique.unionByName(chain).localCheckpoint(eager = true)
      println(s"edges: ${edges.count()}")
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val (cc, rounds) = Dedup.connectedComponentsWithRounds(spark, nodes, edges)
        val sizes = Dedup.withClusterSize(cc)
          .groupBy(col("cluster_size")).count()
          .orderBy(col("cluster_size"))
          .as[(Long, Long)].collect().toSeq
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"ADHOC megacc rep=$rep rounds=$rounds secs=$secs%.2f sizes=$sizes")
        assert(sizes == Seq((300L, 300L), (n.toLong, n.toLong)),
          s"mega-component mis-clustered: $sizes")
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("ann100k")) {
      // ANN crossover pinning: 100k vectors (sf0.1 embeddings ×50, planted
      // 50-cliques at cosine ≥ ~0.999). Brute force here is the 5G-pair
      // cartesian (≈50 min extrapolating the measured curve) — the whole
      // point of the LSH path — so the 100k run takes the LSH path only
      // and is checked against CONSTRUCTION ground truth (stronger than
      // agreement with exact: every cluster must be exactly one planted
      // 50-clique). Exact runs at 20k to extend the measured exact curve.
      // 16-bit bands: at 100k vectors the default 4-bit keys (16 buckets)
      // would degenerate into all-pairs within buckets; 64 planes / 4
      // bands of 16 bits keep per-band collision ~1.5 rows per bucket.
      def planted(copies: Int): DataFrame =
        Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
          .crossJoin(spark.range(0, copies).select(col("id").as("copy")))
          .select((col("vec_id") * copies + col("copy")).as("vec_id"),
            when(col("copy") === 0, col("embedding"))
              .otherwise(transform(col("embedding"),
                (v, i) => when(i === ((col("copy") - 1) % 64).cast("int"),
                  v * lit(1.03f)).otherwise(v)))
              .as("embedding"))
          .localCheckpoint(eager = true)
      val e100k = planted(50)
      println(s"vectors: ${e100k.count()}")
      for (rep <- 1 to 2) {
        time(s"ann100k_lsh_cluster rep=$rep") {
          Similarity.semanticClusters(spark, e100k, 0.9,
            useLsh = true, nPlanes = 64, bandBits = 16).count()
        }
      }
      val cl = Similarity.semanticClusters(spark, e100k, 0.9,
        useLsh = true, nPlanes = 64, bandBits = 16)
      val mism = cl.filter(col("cluster_id") =!=
        (col("vec_id") - col("vec_id") % 50)).count()
      val ncl = cl.select("cluster_id").distinct().count()
      println(s"ADHOC ann100k_truth mismatched=$mism clusters=$ncl (expect 0 / 2000)")
      assert(mism == 0 && ncl == 2000)
      val e20k = planted(10)
      println(s"vectors: ${e20k.count()}")
      time("ann20k_exact_cluster") {
        Similarity.semanticClusters(spark, e20k, 0.9).count()
      }
      time("ann20k_lsh_cluster") {
        Similarity.semanticClusters(spark, e20k, 0.9,
          useLsh = true, nPlanes = 64, bandBits = 16).count()
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("curate")) {
      // end-to-end curation stress: the composed user-facing pipeline at
      // 50k docs, with the audit trail and total shuffle volume recorded
      val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
      val docs = scaled.withColumn("lang", lit("en"))
        .withColumn("source", lit("adhoc"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      for (rep <- 1 to 2) {
        Thread.sleep(2000) // listener bus is async — let prior events drain
        val s0 = shuffleWrite.get()
        val t0 = System.nanoTime()
        val (out, audit) = Graft.curateCorpusAudited(spark, docs,
          screenPhrases = Seq("alpha beta gamma", "the quick brown fox"))
        val packed = out.count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000) // drain trailing stage-completed events too
        audit.foreach(a => println(f"ADHOC curate_stage rep=$rep ${a.stage}%-14s kept=${a.kept} dropped=${a.dropped}"))
        println(f"ADHOC curate_50k rep=$rep packed_rows=$packed secs=$secs%.2f " +
          f"shuffle_written_mb=${(shuffleWrite.get() - s0) / 1e6}%.1f")
      }
      spark.stop()
      return
    }

    for (rep <- 1 to 2) {
      time("sig_50k") { MinHash.signatures(scaled).count() }
      time("lsh_pairs_50k") { MinHash.candidatePairs(scaled, 0.5).count() }
      time("shingle_explode_50k") { MinHash.hashedShingles(scaled).count() }
      time("cc_50k") {
        // edges from banded LSH candidates (est >= 0.8) — the scale path;
        // exact-jaccard edge gen at 50k docs is the n-gram self-join
        val edges = MinHash.candidatePairs(scaled, 0.8)
          .select(col("a_id"), col("b_id"))
        Dedup.connectedComponents(spark,
          scaled.select(col("doc_id")), edges).filter(col("doc_id") =!= col("cluster_id")).count()
      }
    }
    spark.stop()
  }
}
