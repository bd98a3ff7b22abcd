package graft

import org.apache.spark.sql.functions._

/** Storage-layout levers for the 100 TB deployment, exercised for real on
  * local data: bucketed co-located joins (no shuffle) and partition
  * pruning (sub-tree scans). These are the plan shapes the engine relies
  * on at scale; the assertions read the actual executed plans.
  */
class ScaleLayoutSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed tables join without an exchange (co-located join)") {
    Tables.orders(spark, sf001)
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables.customer(spark, sf001)
      .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
    joined.collect() // force execution so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // only the tiny groupBy may shuffle; the join itself must not
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"join should be co-located, plan had $exchanges exchanges:\n$plan")
    // sanity: result matches the unbucketed join
    val expected = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val got = joined.as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("runtime bloom filter from a selective build side prunes the probe scan") {
    // the 100 TB lever: a selective dimension filter propagates to the
    // fact side as an injected bloom-filter semi-filter BEFORE the join
    // shuffle, so most probe rows never enter the exchange. Thresholds
    // are lowered only because the local fixture is tiny — at real scale
    // the defaults (10 GB probe side) engage on their own.
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf001)
      val part = Tables.part(spark, sf001).filter($"p_size" === 1)
      val j = li.join(part, $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand").agg(sum($"l_quantity").as("q"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected an injected runtime bloom filter in:\n$plan")
      assert(j.collect().nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a planted hot key into multiple skew-join partitions") {
    // backs the BASELINE.md claim that a hot shingle degrades into an AQE
    // skew-split sort-merge join rather than one straggler task
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.coalescePartitions.enabled" ->
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // left: 200k rows, 90% on one hot key → one shuffle partition ~3 MB
      // while the median partition is tiny; right: one row per key
      val left = spark.range(0, 200000)
        .select(when($"id" < 180000, lit(7L)).otherwise($"id").as("k"), $"id".as("v"))
      val right = spark.range(0, 200000).select($"id".as("k"), lit(1L).as("w"))
      // no keyed agg downstream: a hash-distribution requirement on the
      // join output would make AQE decline the split (it would break
      // co-partitioning) — the production shape (shingle pair join) feeds
      // a partial agg, which tolerates the split
      val joined = left.join(right, Seq("k"))
      val rows = joined.collect() // executes → AQE finalizes this plan
      assert(rows.length == 200000)
      assert(rows.count(_.getLong(0) == 7L) == 180000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected an AQE skew-split join in:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("F16 hot window: a 20k-doc shared window meets no window-keyed join (skew-proof shape)") {
    // the degenerate-corpus case for substring dedup: ONE 10-token window
    // shared by 20k docs. The naive wins⋈occ(wh) join puts every hot
    // occurrence in a single join partition that AQE can NOT split (the
    // occ side is an aggregate above its exchange, so OptimizeSkewedJoin's
    // pattern doesn't match — verified here before the round-5 reshape).
    // The shipped shape routes the hot key only through hash AGGREGATES,
    // whose map-side partials amortize the skew across map tasks; the only
    // join left is ≤1 row per doc_id per side. Assert both the degenerate
    // correctness and that no window-keyed join survives in the plan.
    val dir = tmpDir("f16skew")
    val shared = (1 to 10).map(i => s"hot$i").mkString(" ")
    val hot = spark.range(0, 20000)
      .select($"id".as("doc_id"), lit(shared).as("text"))
    val ctl = spark.range(20000, 20100).select($"id".as("doc_id"),
      concat_ws(" ", (1 to 15).map(j => concat(lit("u"), $"id", lit(s"_$j"))): _*).as("text"))
    hot.unionByName(ctl)
      .withColumn("lang", lit("en")).withColumn("source", lit("planted"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // even with broadcast off (the 100 TB regime: per-doc aggregates too
      // big to broadcast), the only sort-merge join keys on doc_id
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = TextOps.qDupSubstrings.fn(spark, dir)
      val rows = q.collect() // executes → AQE finalizes the plan
      assert(rows.length == 20100)
      // every hot doc: exactly its 1 window, duplicated; controls clean
      val byId = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(byId(0L) == ((1L, 1L)) && byId(19999L) == ((1L, 1L)))
      assert(byId(20050L) == ((6L, 0L)))
      val plan = q.queryExecution.executedPlan.toString
      val joinKeys = "(?s)Join \\[(\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toSet
      assert(!joinKeys.contains("wh"),
        s"a window-keyed join crept back into the F16 plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("F11/F21 mega-cluster: cluster_size is an aggregate+join, no WindowExec over cluster_id") {
    // the degenerate-corpus case for dedup clustering: ONE component holding
    // (nearly) every doc — a boilerplate-heavy real corpus or an adversarial
    // near-dup blob. A count(*) OVER (PARTITION BY cluster_id) would funnel
    // the whole membership into a single WindowExec partition that buffers
    // every row and that AQE cannot split. The shipped shape
    // (Dedup.withClusterSize) computes the same column with a partial+final
    // aggregate on the slim key plus a join back. Plant a 20k-node star
    // (one component, diameter 2) plus a 300-node chain and assert both the
    // values and that no Window node survives in the executed plan.
    val n = 20000
    val nodes = spark.range(0, n + 300).select($"id".as("doc_id"))
    val star = spark.range(1, n).select(lit(0L).as("a_id"), $"id".as("b_id"))
    val chain = spark.range(n, n + 299)
      .select($"id".as("a_id"), ($"id" + 1).as("b_id"))
    val cc = Dedup.withClusterSize(
      Dedup.connectedComponents(spark, nodes, star.unionByName(chain)))
    val rows = cc.collect() // executes → AQE finalizes the plan
    assert(rows.length == n + 300)
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))).toMap
    assert(byId(0L) == ((0L, n.toLong)) && byId((n - 1).toLong) == ((0L, n.toLong)))
    assert(byId(n.toLong) == ((n.toLong, 300L)) &&
      byId((n + 299).toLong) == ((n.toLong, 300L)))
    val plan = cc.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"cluster_size must not be computed by a window at scale:\n$plan")
  }

  test("semanticClusters executes without any WindowExec (LSH and exact paths)") {
    // same property on the F21 surface itself: both edge builds feed the
    // shared component loop + withClusterSize, so neither plan may contain
    // a window over cluster_id (or anything else).
    val emb = spark.range(0, 60).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        j => ($"id" % 5 + j).cast("float")).as("embedding"))
    for (useLsh <- Seq(false, true)) {
      val out = Similarity.semanticClusters(spark, emb, minCos = 0.9, useLsh = useLsh)
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"semanticClusters(useLsh=$useLsh) plan contains a window:\n$plan")
    }
  }

  test("ANN candidate ranking executes without any WindowExec (IVF oracle + kMeans paths)") {
    // round-7 verdict #3: the IVF/LSH neighbor rankers used
    // Window.partitionBy(q_id) where q_f4 had already proven the
    // bounded-heap collect_top_k shape — a hot band bucket inflates
    // exactly the partition a ranking window buffers and sorts. Both ANN
    // paths (and the centroid argmax/probe selection, also windows until
    // round 8) are aggregates now; no Window node may survive execution.
    val ivf = Similarity.qIvfAnn.fn(spark, sf001)
    ivf.collect() // executes → AQE finalizes the plan
    val ivfPlan = ivf.queryExecution.executedPlan.toString
    assert(!ivfPlan.contains("Window"),
      s"q_f5_ivf_ann plan contains a window:\n$ivfPlan")
    val km = Similarity.ivfKMeans(spark,
      Tables.embeddings(spark, sf001).select($"vec_id", $"embedding"),
      k = 8, nprobe = 2, topK = 3, queryPred = $"vec_id" < 10)
    km.collect()
    val kmPlan = km.queryExecution.executedPlan.toString
    assert(!kmPlan.contains("Window"),
      s"ivfKMeans plan contains a window:\n$kmPlan")
  }

  test("partitioned parquet scans prune to the filtered partition") {
    val dir = tmpDir("part_events")
    Tables.events(spark, sf001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir).filter($"event_type" === "click")
    val n = df.count()
    assert(n > 0)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), "scan should carry partition filters")
    // the pruned scan must read strictly fewer files than the full table
    val all = spark.read.parquet(dir)
    val prunedFiles = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles }.getOrElse(-1L)
    val allFiles = all.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles }.getOrElse(-2L)
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned=$prunedFiles all=$allFiles")
  }

  // ---- round-16 plan pins: the claims PLANS.md records, made durable ----

  test("round-16 ops execute with the promised plan shapes (windows, heaps, collapses)") {
    val docs = Tables.documents(spark, sf001)
    def executed(df: org.apache.spark.sql.DataFrame): String = {
      df.collect(); df.queryExecution.executedPlan.toString
    }
    // F43: the whole repetition report runs window-free (conditional
    // struct-min argmax, never a per-doc rank)
    val p43 = executed(TextOps.gopherRepetitionReport(docs))
    assert(!p43.contains("Window"), s"F43 must stay window-free:\n$p43")
    // F45/F45b: soft-dedup weights are aggregate+join, never a window
    assert(!executed(TextOps.softDedupWeights(docs)).contains("Window"))
    // F44: the executed plan must carry the tie-run THIRD level — the
    // per-run id sub-bucket column partitions the row-level window
    val p44 = executed(TextOps.scoreCalibration(docs, "n_chars"))
    assert(p44.contains("__ib"),
      s"F44's id-sub-bucket level missing from the executed plan:\n$p44")
    // F41/F41b: candidate ranking is the bounded-heap partial aggregate
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val p41 = executed(Similarity.hardNegatives(spark, queries, emb, k = 3))
    assert(p41.contains("partial_collect_top_k"),
      s"F41 must rank through the partial bounded heap:\n$p41")
    val model = Similarity.KmeansModel(Seq(Seq.fill(64)(1000000L), Seq.fill(64)(1500000L)))
    val p41b = executed(Similarity.hardNegativesClustered(spark, queries, emb,
      k = 3, model, nprobe = 1))
    assert(p41b.contains("partial_collect_top_k") && p41b.contains("kmeans_best_q"),
      s"F41b must combine the assignment kernel with the partial heap:\n$p41b")
    // F46: the scoring plan is explode + literal lookup + ONE aggregate —
    // no join and no window may appear (the fits ran eagerly before)
    val p46 = executed(TextOps.dsirWeights(docs, docs.filter(col("lang") === "en")))
    assert(!p46.contains("Join") && !p46.contains("Window"),
      s"F46 scoring must be join- and window-free:\n$p46")
    // F47: candidates verify through the codegen merge kernel
    val p47 = executed(Dedup.containmentPairs(spark, docs, minC = 0.75))
    assert(p47.contains("sorted_intersect_count"),
      s"F47 must verify via the merge kernel:\n$p47")
  }

  test("round-17 ops execute with the promised plan shapes (per-row folds, rep-sets, slim joins)") {
    val docs = Tables.documents(spark, sf001)
    def executed(df: org.apache.spark.sql.DataFrame): String = {
      df.collect(); df.queryExecution.executedPlan.toString
    }
    // F19b batch: codegen explode + doc-keyed partial agg — no join or
    // window (the fit ran eagerly before); the frozen serving fold is
    // a BARE per-row projection (no exchange/join/generate at all)
    val p19b = executed(TextOps.lmBigramScores(docs))
    assert(!p19b.contains("Join") && !p19b.contains("Window"),
      s"F19b batch scoring must be join- and window-free:\n$p19b")
    val lm = TextOps.bigramLmFit(docs)
    val p19f = executed(docs.filter(col("text").isNotNull)
      .select(col("doc_id"), lm.sumMicrosCol(col("text")).as("s")))
    assert(!p19f.contains("Exchange") && !p19f.contains("Join") &&
      !p19f.contains("Window") && !p19f.contains("Generate"),
      s"F19b frozen serving must be a bare per-row fold:\n$p19f")
    // F46b: the resample adds no join/window beyond F46's scoring agg
    val p46b = executed(TextOps.dsirResample(docs, docs.filter(col("lang") === "en")))
    assert(!p46b.contains("Join") && !p46b.contains("Window"),
      s"F46b draw must stay join- and window-free:\n$p46b")
    // F49: the verdict projection must ride the rep-set join-back
    // (rep_id appears; the min_by collapse itself lives behind the
    // checkpointed reps frame), and the rollup never ranks through a
    // window
    val p49 = executed(Dedup.paragraphDedupOf(spark,
      Dedup.paragraphWindows(docs, 32), 0.6))
    assert(p49.contains("rep_id") && !p49.contains("Window"),
      s"F49 must label via the rep-set join-back, window-free:\n$p49")
    // F47b: verdict derivation is window-free (slim-edge joins + distincts)
    val p47b = executed(Dedup.containmentVerdicts(spark, docs, 0.75, col("n_chars")))
    assert(!p47b.contains("Window"),
      s"F47b verdicts must stay window-free:\n$p47b")
  }

  test("round-17 late ops execute with the promised plan shapes (per-row batteries and kernels)") {
    val docs = Tables.documents(spark, sf001)
    def executed(df: org.apache.spark.sql.DataFrame): String = {
      df.collect(); df.queryExecution.executedPlan.toString
    }
    // F55: the whole battery is ONE per-row projection — no exchange,
    // join, window, generate, or aggregate anywhere
    val p55 = executed(TextOps.gopherQualityReport(docs, minWords = 20L,
      requiredWords = Seq("the", "a")))
    assert(!p55.contains("Exchange") && !p55.contains("Join") &&
      !p55.contains("Window") && !p55.contains("Generate") &&
      !p55.contains("Aggregate"),
      s"F55 must be a bare per-row projection:\n$p55")
    // F52: frozen-model encoding is a bare per-row kernel (the fit ran
    // driver-side before plan time)
    graft.functions.VectorFunctions.register(spark)
    val bpe = TextOps.bpeFit(docs, numMerges = 20, vocabN = 100)
    val p52 = executed(docs.filter(col("text").isNotNull)
      .select(col("doc_id"), bpe.countCol(col("text")).as("n")))
    assert(!p52.contains("Exchange") && !p52.contains("Join") &&
      !p52.contains("Window") && !p52.contains("Generate"),
      s"F52 frozen encode must be a bare per-row kernel:\n$p52")
    // F50: line rules per-row, ONE doc-keyed exchange for the rollup,
    // no window/join
    val p50 = executed(TextOps.c4Clean(
      Dedup.paragraphWindows(docs, 10), minWords = 3, minSentences = 2))
    assert(!p50.contains("Window") && !p50.contains("Join"),
      s"F50 must be rules + one doc-keyed rollup, window/join-free:\n$p50")
    assert("Exchange".r.findAllIn(p50).length <= 2, // rollup (+AQE read)
      s"F50 must shuffle only on doc_id:\n$p50")
    // F53/F54: signatures are partition-wise maps — no exchange at all
    val media = Multimodal.synthesize(spark, sf001)
    val p53 = executed(Multimodal.imageHashes(media))
    assert(!p53.contains("Exchange") && !p53.contains("Join"),
      s"F53 signatures must be a shuffle-free map:\n$p53")
    val p54 = executed(Multimodal.audioHashes(media))
    assert(!p54.contains("Exchange") && !p54.contains("Join"),
      s"F54 signatures must be a shuffle-free map:\n$p54")
    // F51: the only windows in the diversification plan are the F44
    // cascade's value-scale/sub-bucket ones — never partitioned by the
    // bare cluster column (the cluster-sized-window hazard)
    val emb = Tables.embeddings(spark, sf001)
    val div = Similarity.prototypeDiversify(spark, emb,
      dropMillionths = 250000L, k = 4)
    val p51 = executed(div)
    val windowSpecs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(p51).toSeq
    assert(windowSpecs.nonEmpty &&
      windowSpecs.forall(w => !w.matches(".*cluster[^,]*, [^ ]*ordered.*") ||
        w.contains("__")),
      s"F51 windows must be the calibration cascade's, not cluster-sized:\n$windowSpecs")
  }
}
