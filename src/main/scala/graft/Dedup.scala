package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._
import graft.functions.VectorFunctions

/** Near-duplicate CLUSTERING (SURVEY.md §2.F, training-data pipeline):
  * turn pairwise near-dup evidence into dedup groups — the operation a
  * 100 TB corpus actually needs, since keeping "one of each pair" is wrong
  * when duplicates chain (A≈B, B≈C ⇒ {A,B,C} is one group).
  *
  * Algorithm: connected components by iterative min-label propagation —
  * each node repeatedly takes the smallest label among itself and its
  * neighbors until fixpoint. Convergence is O(component diameter)
  * rounds; near-dup components are shallow (duplicates of a common
  * source), so this terminates in a handful of rounds even at corpus
  * scale, each round one shuffle (join on the edge list) + one partial
  * aggregate. The loop is driver-COORDINATED but data never leaves the
  * cluster (same structure GraphX/GraphFrames use); lineage is cut per
  * round with localCheckpoint so plans stay bounded.
  *
  * The DuckDB oracle computes the same fixpoint as a recursive CTE
  * (transitive closure + min over reachable set) — an independent
  * formulation, which is what makes the hash-match meaningful.
  */
object Dedup {

  /** Symmetric near-dup edge list: exact word-3-gram Jaccard ≥ minJaccard
    * over hashed shingles.
    *
    * Prefix-filtered set-similarity join (the AllPairs/PPJoin scheme from
    * the published set-join literature): `shingle_hashes` returns each
    * doc's shingles sorted ascending — a canonical global order — and for
    * Jaccard ≥ t any qualifying pair must (a) have |A∩B| ≥ t·|A| and
    * ≥ t·|B|, hence size ratio min/max ≥ t, and (b) share at least one
    * element within each side's first |d| − ⌈t·|d|⌉ + 1 shingles. So the
    * candidate join explodes only that prefix (0.4·|d| at t = 0.6) instead
    * of every shingle — a ~6× smaller pair space than the full
    * shingle-equi-join — and exact verification is one codegen'd
    * `sorted_intersect_count` merge over the two full arrays per
    * surviving candidate, not a count-shuffle of every co-shingle row.
    * Same result set as the exhaustive join (the lemma is exact, not
    * probabilistic), which is why the recursive-CTE oracle still matches.
    */
  def jaccardEdges(s: SparkSession, d: String, minJaccard: Double): DataFrame =
    jaccardEdgesOf(s, documents(s, d), minJaccard)

  /** Same, over any (doc_id, text) frame — the spec layer plants dup
    * chains in memory and asserts the prefix-filtered plan emits exactly
    * the exhaustive join's edge set.
    */
  def jaccardEdgesOf(s: SparkSession, docs: DataFrame, minJaccard: Double): DataFrame =
    jaccardPairsOf(s, docs, minJaccard).select(col("a_id"), col("b_id"))

  /** Prefix-filtered thresholded similarity join returning the raw (un-
    * truncated) Jaccard value per qualifying pair — the value-carrying
    * form behind both [[jaccardEdgesOf]] and MinHash.qNgramJaccard.
    */
  def jaccardPairsOf(s: SparkSession, docs: DataFrame, minJaccard: Double): DataFrame = {
    VectorFunctions.register(s)
    val t = minJaccard
    val base = docs
      .select(col("doc_id"),
        call_function("shingle_hashes", col("text"), lit(MinHash.GramLen)).as("shs"))
      .select(col("doc_id"), col("shs"), size(col("shs")).cast("long").as("sz"))
      .filter(col("sz") > 0)
    val prefLen = (col("sz") - ceil(col("sz") * lit(t)) + 1).cast("int")
    val pre = base.select(col("doc_id"), col("sz"),
      explode(slice(col("shs"), lit(1), prefLen)).as("shh"))
    val cand = pre.select(col("doc_id").as("a_id"), col("sz").as("sa"), col("shh"))
      .join(pre.select(col("doc_id").as("b_id"), col("sz").as("sb"), col("shh")), Seq("shh"))
      .filter(col("a_id") < col("b_id") &&
        col("sb") >= col("sa") * lit(t) && col("sa") >= col("sb") * lit(t))
      .select(col("a_id"), col("b_id"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("a_id"), col("shs").as("a_shs"),
        col("sz").as("sa")), Seq("a_id"))
      .join(base.select(col("doc_id").as("b_id"), col("shs").as("b_shs"),
        col("sz").as("sb")), Seq("b_id"))
      .withColumn("i",
        call_function("sorted_intersect_count", col("a_shs"), col("b_shs")).cast("double"))
      .withColumn("jaccard", col("i") / (col("sa") + col("sb") - col("i")))
      .filter(col("jaccard") >= t)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Edit-distance near-dup pairs: every unordered doc pair within
    * `maxDist` Levenshtein edits, id-canonicalized (a_id < b_id).
    *
    * Candidate generation is LENGTH-BANDED, not all-pairs: one edit
    * changes a string's length by at most 1, so |len(a)−len(b)| ≤ maxDist
    * is a necessary condition, and with band width W = maxDist+1 any
    * qualifying pair sits in the same or adjacent band of floor(len/W).
    * Each doc joins as the right side under its own band and as the left
    * side under {band, band+1}; the (band<band | band=band ∧ id<id)
    * predicate makes every qualifying pair match in EXACTLY one bucket —
    * an equi-join with a 2× fan-out instead of a cross join, and no
    * dedup pass afterwards. Verification is Spark's threshold-bounded
    * `levenshtein(l, r, maxDist)` (banded O(maxDist·n) DP, codegen'd;
    * −1 beyond the threshold), so a far pair costs O(maxDist·len), not
    * O(len²). Result set is identical to the naive all-pairs filter,
    * which is exactly what the DuckDB oracle computes.
    *
    * At 100 TB this is the fuzzy-dedup shape for SHORT records (titles,
    * URLs, lines, OCR fragments): the band key distributes uniformly when
    * lengths do, and a hot band is an AQE-splittable equi-join bucket.
    * For long documents edit distance itself is the wrong metric — use
    * [[jaccardEdgesOf]] / MinHash banding instead.
    */
  def editDistancePairsOf(docs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val w = maxDist + 1
    val base = docs
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("len"))
      .withColumn("band", floor(col("len") / w))
    val l = base.select(col("doc_id").as("a_id"), col("text").as("a_text"),
      col("len").as("a_len"), col("band").as("a_band"),
      explode(array(col("band"), col("band") + 1)).as("jband"))
    val r = base.select(col("doc_id").as("b_id"), col("text").as("b_text"),
      col("len").as("b_len"), col("band").as("b_band"))
    l.join(r,
        col("jband") === col("b_band") &&
          (col("a_band") < col("b_band") ||
            (col("a_band") === col("b_band") && col("a_id") < col("b_id"))) &&
          abs(col("a_len") - col("b_len")) <= maxDist)
      .withColumn("dist", levenshtein(col("a_text"), col("b_text"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"), col("dist"))
  }

  /** The SCALE path for [[editDistancePairsOf]]: q-gram count/prefix-filter
    * candidate generation (the classic approximate-string-join scheme from
    * the published set-join literature — count filtering + sorted-prefix
    * filtering, the Ed-Join family without the location filter), then the
    * same threshold-bounded Levenshtein verification. EXACT: returns the
    * identical pair set (both filters are necessary-condition lemmas, not
    * probabilistic; Round11OpsSpec proves equivalence on seeded corpora).
    *
    * Why banding alone fails at scale: short records cluster tightly in
    * length, so a 1M-title corpus puts tens of thousands of strings in
    * every length band and the within-band pair space is quadratic. The
    * q-gram lemmas cut by CONTENT instead: one edit disturbs at most q of
    * a string's positional byte q-grams, so ed(a,b) ≤ D implies multiset
    * overlap |Ga ∩ Gb| ≥ max(|Ga|,|Gb|) − q·D — and any pair meeting that
    * overlap must share at least one gram within the first q·D + 1
    * elements of each side's gram multiset under ONE global total order
    * (the same prefix-filter lemma the F11 Jaccard join uses, with the
    * overlap threshold derived from edit distance instead of Jaccard). So
    * the candidate join explodes q·D + 1 grams per doc — independent of
    * document length and corpus size.
    *
    * The global order is (corpus frequency, gram) ASCENDING — the PPJoin
    * ordering — not raw hash order, and at scale that choice is the whole
    * ballgame: short natural records share ubiquitous grams ("the", "ing",
    * "tok"), and under hash order whichever ubiquitous gram draws a small
    * hash lands in nearly EVERY doc's prefix, collapsing the candidate
    * join into one quadratic hot bucket. Frequency order puts each doc's
    * RAREST grams in its prefix instead, so bucket sizes track gram
    * rarity by construction. Costs one extra aggregate + join (the gram
    * document-frequency table) — the standard two-pass any published
    * prefix-filter join pays.
    *
    * Strings too short for the lemma to prune (fewer than q·D + 1 + q·D
    * grams... precisely: |G| ≤ q·D, where the overlap bound is vacuous)
    * fall back to the banded path over the SHORT ZONE (len ≤ q−1+q·D+D,
    * every string a small one could pair with): banded pairs there are
    * kept only when at least one side is genuinely small, and the q-gram
    * join covers big×big — each qualifying pair lands in exactly one of
    * the two branches. The zone is bounded by construction (≤ ~10 chars
    * at q=3, D=2), so its quadratic-in-band cost is capped.
    */
  def editDistancePairsQGram(s: SparkSession, docs: DataFrame, maxDist: Int,
      q: Int = 3): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    VectorFunctions.register(s)
    val qd = q * maxDist
    val base = docs
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("len"),
        call_function("char_qgram_hashes", col("text"), lit(q)).as("g"))
      .withColumn("ng", size(col("g")).cast("long"))
    // |G| = max(0, bytelen−q+1); chars vs bytes differ on multibyte text,
    // so smallness is decided on ng (gram count), zone on the char length
    val big = base.filter(col("ng") > qd)
    val shortZone = docs.filter(length(col("text")) <= (q - 1) + qd + maxDist)
    // big×big via count+prefix filter, prefixes frequency-ordered: the
    // first qd+1 positions of each doc's gram multiset under the global
    // (corpus freq, gram) ascending order, realized as a bounded-heap
    // collect_top_k over the negated key (freq negated arithmetically,
    // gram by bitwise NOT — an overflow-proof order-reversing bijection
    // where -x breaks down at Long.MinValue). Duplicate values inside a
    // prefix are dropped before the explode: an equi-join on value gains
    // nothing from multiplicity.
    val gx = big.select(col("doc_id"), col("len"), explode(col("g")).as("gh"))
    val dfreq = gx.groupBy(col("gh")).agg(count(lit(1)).as("freq"))
    val pre = gx.join(dfreq, Seq("gh"))
      .select(col("doc_id"), col("len"),
        struct((-col("freq")).as("nf"), expr("~gh").as("ngh")).as("p"))
      .groupBy(col("doc_id"), col("len"))
      .agg(call_function("collect_top_k", col("p"), lit(qd + 1), lit(false)).as("top"))
      .select(col("doc_id"), col("len"), explode(col("top")).as("p"))
      .select(col("doc_id"), col("len"), expr("~p.ngh").as("gh"))
      .distinct()
    val cand = pre.select(col("doc_id").as("a_id"), col("len").as("la"), col("gh"))
      .join(pre.select(col("doc_id").as("b_id"), col("len").as("lb"), col("gh")), Seq("gh"))
      .filter(col("a_id") < col("b_id") && abs(col("la") - col("lb")) <= maxDist)
      .select(col("a_id"), col("b_id"))
      .distinct()
    val bigPairs = cand
      .join(big.select(col("doc_id").as("a_id"), col("text").as("a_text"),
        col("g").as("a_g"), col("ng").as("na")), Seq("a_id"))
      .join(big.select(col("doc_id").as("b_id"), col("text").as("b_text"),
        col("g").as("b_g"), col("ng").as("nb")), Seq("b_id"))
      // count filter before the DP: multiset overlap via the same sorted
      // merge kernel the Jaccard join verifies with
      .filter(call_function("sorted_intersect_count", col("a_g"), col("b_g")) >=
        greatest(col("na"), col("nb")) - lit(qd))
      .withColumn("dist", levenshtein(col("a_text"), col("b_text"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
    // short-zone pairs (≥1 genuinely small side) via the banded path
    val smallIds = base.filter(col("ng") <= qd).select(col("doc_id").as("s_id"))
    val zonePairs = editDistancePairsOf(shortZone, maxDist)
      .join(smallIds.select(col("s_id").as("a_id")).withColumn("a_small", lit(true)),
        Seq("a_id"), "left")
      .join(smallIds.select(col("s_id").as("b_id")).withColumn("b_small", lit(true)),
        Seq("b_id"), "left")
      .filter(col("a_small").isNotNull || col("b_small").isNotNull)
      .select(col("a_id"), col("b_id"), col("dist"))
    bigPairs.unionByName(zonePairs)
  }

  /** F-family graded query: edit-distance near-dup pairs over `documents`
    * at maxDist = 8 (the planted near-dup mutations sit at distance 4–8;
    * exact dups would appear as dist 0).
    */
  val qEditNearDup = Q(
    "q_edit_neardup",
    """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
      |FROM documents a JOIN documents b
      |  ON a.doc_id < b.doc_id
      | AND abs(length(a.text) - length(b.text)) <= 8
      |WHERE levenshtein(a.text, b.text) <= 8
      |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    editDistancePairsOf(documents(s, d), 8)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** doc_id → cluster_id (min doc_id in its connected component) for every
    * document; singletons label themselves.
    *
    * Driver-side job count is the real cost at small scale (BENCH r2:
    * job-submission overhead dominated), so the loop (a) folds the first
    * propagation into the seed — labels start as doc_id, so round 1 can
    * never converge and needs no check — and (b) runs `checkEvery`
    * propagation steps per materialize+count: min-label is monotone, so
    * overshooting the fixpoint is safe and the convergence check can be
    * amortized over k rounds. Each check is still ONE action (the count
    * materializes the lazy checkpoint). Throws if the loop exits without
    * converging — a silent exit would return wrong cluster_ids for any
    * component whose diameter exceeds the budget.
    */
  def connectedComponents(s: SparkSession, nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 25, checkEvery: Int = 2,
      contractAbove: Long = DefaultContractAbove,
      checkpointDir: Option[String] = None): DataFrame =
    connectedComponentsWithRounds(s, nodes, edges, maxIters, checkEvery,
      contractAbove, checkpointDir)._1

  /** Edge lists at or above this size get label-contracted between
    * convergence blocks; below it the rewrite's two joins + distinct cost
    * more stage overhead than the propagation they would save. ~1M rows
    * ≈ where the megacc stress showed per-round edge volume dominating.
    */
  val DefaultContractAbove: Long = 1000000L

  /** Test-only hook (Round9OpsSpec): invoked at the top of every
    * convergence block, standing in for the executor loss local[n]
    * cannot produce — the spec drops every persisted block here and
    * asserts the reliable-checkpoint loop completes with correct labels
    * (its rounds live as FILES under checkpointDir, not as executor
    * blocks) while the default localCheckpoint loop dies irrecoverably.
    * Never set outside tests — and fenced so it CANNOT fire outside
    * them: the hook is honored only when scalatest is on the classpath
    * (round-10 ADVICE: a leaked assignment — a spec failing before its
    * `finally`, a concurrent suite — must not silently drop every
    * persisted block in a production run; in a deployed job the fence
    * is structurally closed because no test classpath exists).
    */
  private[graft] var testBlockLossHook: Option[SparkSession => Unit] = None

  private lazy val onTestClasspath: Boolean =
    try { Class.forName("org.scalatest.Suite"); true }
    catch { case _: ClassNotFoundException => false }

  private def fireBlockLossHook(s: SparkSession): Unit =
    if (onTestClasspath) testBlockLossHook.foreach(_(s))

  /** [[connectedComponents]] plus the number of propagation rounds the
    * loop ran — the scale observability hook: at 100 TB the per-round
    * shuffle is the edge list, so rounds × edge volume is the cost model,
    * and a monitoring job wants the round count without re-deriving it
    * from Spark's job history.
    *
    * Edge CONTRACTION (round 7, `contractAbove`): each non-converged
    * block rewrites the big edge list as (lbl(u), lbl(v)), dropping
    * self-loops and duplicates. A component that has already collapsed
    * to one label contributes ZERO edges to every later round — without
    * this, the megacc stress (one 10k-clique + one 300-chain) dragged
    * the clique's 50M edges through all 17 rounds the chain needs.
    * Correct for min-label propagation: labels always name a node of the
    * same component (so contracted edges stay within components), the
    * component min always labels itself, two nodes sharing a label keep
    * sharing one at fixpoint (both chase the same pointer chain through
    * the every-other-step shortcut), and any surviving (La ≠ Lb) edge
    * strictly decreases a label on the next step — so the no-decrease
    * convergence check still certifies the per-component-min fixpoint.
    * DedupSpec forces contraction on planted graphs and asserts labels
    * identical to the uncontracted run.
    *
    * Fault tolerance (`checkpointDir`, round 8): the default lineage cut
    * is `localCheckpoint` — blocks live on EXECUTORS with their lineage
    * truncated, so on a real cluster losing ANY executor mid-loop loses
    * blocks that can never be recomputed and kills the job irrecoverably.
    * Fine on local[n] and for short loops; for a long-running 100 TB run,
    * pass a reliable `checkpointDir` (HDFS/S3) and every cut becomes a
    * reliable `checkpoint()` — each round's labels and the contracted
    * edge list survive executor loss at the cost of one distributed-FS
    * write per cut. Labels are bit-identical either way (DedupSpec).
    * Recovery semantics: with a reliable dir the loop holds NO state in
    * executor block storage — every block's inputs re-read from the
    * checkpoint files, so losing any (or every) executor mid-loop costs
    * only a recompute-from-files of the current block. Round9OpsSpec
    * simulates total block loss between blocks and asserts the reliable
    * loop completes with correct labels while the localCheckpoint loop
    * fails irrecoverably — the documented trade, now exercised.
    */
  def connectedComponentsWithRounds(s: SparkSession, nodes: DataFrame,
      edges: DataFrame, maxIters: Int = 25, checkEvery: Int = 2,
      contractAbove: Long = DefaultContractAbove,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    checkpointDir.foreach(s.sparkContext.setCheckpointDir)
    def cut(df: DataFrame, eager: Boolean): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = eager)
      else df.localCheckpoint(eager = eager)
    var sym = cut(edges.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionByName(edges.select(col("b_id").as("u"), col("a_id").as("v"))),
      eager = true)
    // cheap: counts the blocks the eager checkpoint just materialized
    var symBig = sym.count() >= contractAbove

    // one min-label propagation step; passes through any extra columns
    // (the improvement tracker rides along the k-step chain)
    def step(lbls: DataFrame): DataFrame = {
      val nmin = sym
        .join(lbls.select(col("u").as("v"), col("lbl").as("nlbl")), Seq("v"))
        .groupBy(col("u")).agg(min(col("nlbl")).as("nmin"))
      val rest = lbls.columns.filter(c => c != "u" && c != "lbl").toSeq.map(col)
      lbls.join(nmin, Seq("u"), "left")
        .select(col("u") +: least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl") +: rest: _*)
    }

    // pointer-jumping shortcut: lbl := min(lbl, lbl(lbl)). Every label IS
    // a node id of the same component (labels start as self-ids and only
    // ever adopt neighbor/label labels), so following the label's label
    // compresses label chains geometrically — the classic doubling trick
    // that turns O(diameter) propagation rounds into O(log diameter).
    // Cost: one |V|-row self-join on the slim (u, lbl) table, stage
    // overhead rather than data at any scale — so it runs every SECOND
    // step: shallow graphs (the common near-dup case, 3–5 steps) pay for
    // it once or twice, while a 300-node mutation CHAIN (real in
    // adversarial corpora) still converges in 13 steps where plain
    // propagation needs 299 and would exhaust maxIters (simulated; spec
    // asserts the 300-chain).
    def shortcut(lbls: DataFrame): DataFrame = {
      val rest = lbls.columns.filter(c => c != "u" && c != "lbl").toSeq.map(col)
      val ptr = lbls.select(col("u").as("ju"), col("lbl").as("jlbl"))
      lbls.join(ptr, col("lbl") === col("ju"), "left")
        .select(col("u") +: least(col("lbl"), coalesce(col("jlbl"), col("lbl"))).as("lbl") +: rest: _*)
    }

    // label-contract the edge list: edges between same-label nodes are
    // self-loops of the label graph and can never move a label again THIS
    // side of a merge, which also flows through label-nodes — see the
    // correctness note in the Scaladoc. Runs after the seed step (a
    // 1-step-collapsed mega-component sheds its edges before the block
    // loop ever runs) and after each non-converged block.
    def contract(lbls: DataFrame): Unit = {
      sym = cut(sym
        .join(lbls.select(col("u").as("cu"), col("lbl").as("clu")),
          col("u") === col("cu"))
        .join(lbls.select(col("u").as("cv"), col("lbl").as("clv")),
          col("v") === col("cv"))
        .select(col("clu").as("u"), col("clv").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct(),
        eager = true)
      symBig = sym.count() >= contractAbove
    }

    var labels = cut(step(nodes.select(col("doc_id").as("u"), col("doc_id").as("lbl"))),
      eager = true)
    if (symBig) contract(labels)
    var converged = false
    var iter = 1
    while (!converged && iter < maxIters) {
      fireBlockLossHook(s)
      val k = math.min(checkEvery, maxIters - iter)
      var stepped = labels.withColumn("prev", col("lbl"))
      for (i <- 1 to k) {
        stepped = step(stepped)
        if ((iter + i) % 2 == 0) stepped = shortcut(stepped)
      }
      val next = cut(stepped, eager = false)
      // labels only decrease: no change across k steps ⇒ fixpoint (a
      // state stable under neighbor-min alone is already per-component
      // constant at the min id; the shortcut can only reach it sooner)
      converged = next.filter(col("lbl") < col("prev")).count() == 0
      labels = next.select(col("u"), col("lbl"))
      iter += k
      if (!converged && symBig) contract(labels)
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters rounds — " +
          "a component's diameter exceeds the budget; raise maxIters")
    (labels.select(col("u").as("doc_id"), col("lbl").as("cluster_id")), iter)
  }

  // F11: dedup groups — every doc labeled with its component's min doc_id,
  // plus the component size. Oracle: recursive-CTE transitive closure.
  val qDedupGroups = Q(
    "q_f11_dedup_groups",
    """WITH RECURSIVE
      |sp AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
      |         generate_series(1, len(t) - 2),
      |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |       FROM sp),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
      |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |edges AS (SELECT a_id AS u, b_id AS v
      |          FROM inter JOIN sizes sa ON sa.doc_id = a_id
      |                     JOIN sizes sb ON sb.doc_id = b_id
      |          WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.6
      |          UNION ALL
      |          SELECT b_id, a_id
      |          FROM inter JOIN sizes sa ON sa.doc_id = a_id
      |                     JOIN sizes sb ON sb.doc_id = b_id
      |          WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.6),
      |reach AS (SELECT doc_id AS u, doc_id AS r FROM documents
      |          UNION
      |          SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
      |cc AS (SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u)
      |SELECT doc_id, cluster_id,
      |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      |FROM cc ORDER BY doc_id""".stripMargin) { (s, d) =>
    val cc = connectedComponents(s, documents(s, d),
      jaccardEdges(s, d, 0.6))
    withClusterSize(cc).orderBy(col("doc_id"))
  }

  /** Decorate a (…, cluster_id) frame with each cluster's member count.
    *
    * Deliberately NOT `count(*) OVER (PARTITION BY cluster_id)`: a window
    * partition cannot be split by AQE, so one mega-cluster (boilerplate-
    * heavy corpus, adversarial near-dup blob) would funnel its entire
    * membership into a single WindowExec partition that buffers every row —
    * the straggler class this module exists to avoid. A partial+final
    * aggregate on the slim (cluster_id) key plus a join back computes the
    * identical column with map-side combine, and AQE is free to broadcast
    * the (typically tiny) size table or split a skewed probe side.
    * ScaleLayoutSpec plants a mega-cluster and asserts no WindowExec over
    * cluster_id survives in the executed plan.
    */
  def withClusterSize(cc: DataFrame): DataFrame = {
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    val rest = cc.columns.filterNot(_ == "cluster_id").toSeq.map(col)
    cc.join(sizes, Seq("cluster_id"))
      .select(rest :+ col("cluster_id") :+ col("cluster_size"): _*)
  }

  def all: Seq[Q] = Seq(qDedupGroups, qEditNearDup)
}
