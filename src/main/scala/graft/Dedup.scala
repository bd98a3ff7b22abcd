package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    * over hashed shingles (same pair plan as q_ngram_jaccard).
    */
  def jaccardEdges(s: SparkSession, d: String, minJaccard: Double): DataFrame = {
    VectorFunctions.register(s)
    val base = documents(s, d).select(col("doc_id"),
      call_function("shingle_hashes", col("text"), lit(MinHash.GramLen)).as("shs"))
    val sh = base.select(col("doc_id"), explode(col("shs")).as("shh"))
    val sizes = base.select(col("doc_id"), size(col("shs")).cast("long").as("sz"))
    val inter = sh.select(col("doc_id").as("a_id"), col("shh"))
      .join(sh.select(col("doc_id").as("b_id"), col("shh")), Seq("shh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("sa")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("sb")), Seq("b_id"))
      .filter(col("i").cast("double") / (col("sa") + col("sb") - col("i")) >= minJaccard)
      .select(col("a_id"), col("b_id"))
  }

  /** doc_id → cluster_id (min doc_id in its connected component) for every
    * document; singletons label themselves.
    */
  def connectedComponents(s: SparkSession, nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 25): DataFrame = {
    val sym = edges.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionByName(edges.select(col("b_id").as("u"), col("a_id").as("v")))
      .localCheckpoint(eager = true)
    var labels = nodes.select(col("doc_id").as("u"), col("doc_id").as("lbl"))
      .localCheckpoint(eager = true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // each node's candidate label: min over its neighbors' labels
      val fromNeighbors = sym
        .join(labels.select(col("u").as("v"), col("lbl").as("nlbl")), Seq("v"))
        .groupBy(col("u")).agg(min(col("nlbl")).as("nmin"))
      // lazy checkpoint + one full action: the convergence count is the
      // job that materializes the round's checkpoint — one job per round
      // instead of an eager-checkpoint job plus a count job
      val next = labels.join(fromNeighbors, Seq("u"), "left")
        .select(col("u"), least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"),
          (col("nmin") < col("lbl")).as("improved"))
        .localCheckpoint(eager = false)
      converged = next.filter(col("improved")).count() == 0
      labels = next.select(col("u"), col("lbl"))
      iter += 1
    }
    labels.select(col("u").as("doc_id"), col("lbl").as("cluster_id"))
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
    cc.withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .orderBy(col("doc_id"))
  }

  def all: Seq[Q] = Seq(qDedupGroups)
}
