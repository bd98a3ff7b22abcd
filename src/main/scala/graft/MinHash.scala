package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._
import graft.functions.VectorFunctions

/** Near-duplicate detection over documents (SURVEY.md §2.F F2):
  * word-3-gram shingles → MinHash signatures → banded LSH candidate pairs,
  * plus SimHash and exact n-gram Jaccard. Everything is expressed as
  * DataFrame transforms (explode → agg → equi-join on band key), so at
  * 100 TB the candidate join shuffles on small band-hash keys rather than
  * comparing documents pairwise.
  *
  * MinHash/SimHash use xxhash64 (no DuckDB twin → no oracle; correctness is
  * property-tested in ScalaTest: MinHash estimate ≈ exact Jaccard, planted
  * duplicates collide). The exact n-gram Jaccard query IS oracle-graded.
  */
object MinHash {

  val NumPerms = 32
  val BandRows = 4 // 8 bands × 4 rows
  val GramLen = 3

  /** doc_id, sh (string) — distinct word-3-gram shingles. Reference
    * string-level form (used by the ScalaTest cross-checks); production
    * paths use [[hashedShingles]], which never materializes gram strings.
    */
  def shingles(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = transform(
      sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))
    docs.select(col("doc_id"), explode(array_distinct(grams)).as("sh"))
  }

  /** doc_id, shh (bigint) — distinct hashed word-3-gram shingles, one
    * codegen'd pass per document (functions.ShingleHashes). The
    * declarative split/transform/array_distinct/explode formulation
    * measured 4+ s at sf0.1 purely in interpreted lambda overhead.
    */
  def hashedShingles(docs: DataFrame): DataFrame = {
    VectorFunctions.registered(docs)
    docs.select(col("doc_id"),
      explode(call_function("shingle_hashes", col("text"), lit(GramLen))).as("shh"))
  }

  /** doc_id, sig: array of NumPerms min-hashes — a pure per-row map
    * (functions.MinHashSig), NO shuffle: the previous explode+groupBy
    * formulation shuffled every (doc, shingle) row; this scales
    * row-parallel on a cluster and measured ~10× faster at sf0.1.
    * `sig` is NULL for docs with fewer than GramLen tokens (no shingles →
    * no signature); LSH consumers must filter nulls before banding.
    */
  def signatures(docs: DataFrame): DataFrame = {
    VectorFunctions.registered(docs)
    docs.select(col("doc_id"),
      call_function("minhash_sig", col("text"), lit(NumPerms), lit(GramLen)).as("sig"))
  }

  /** Banded LSH candidate pairs with MinHash-estimated Jaccard ≥ minEst.
    *
    * Each doc's signature travels WITH its band rows, so candidate pairs
    * and their estimates are produced inside the (band, bucket) group —
    * no join back to the signature table, no cache to hold for the rest
    * of the session. Shuffle cost: bands × sig bytes per doc (the
    * standard LSH trade: pay sig duplication in the shuffle, save two
    * wide joins). The match-count itself is 32 plain column comparisons
    * after the explode — whole-stage-codegen'd, unlike a zip_with/
    * aggregate lambda (the measured-100×-slower anti-pattern,
    * BASELINE.md).
    */
  def candidatePairs(docs: DataFrame, minEst: Double): DataFrame = {
    // gram-less docs have NULL signatures — they can never near-dup, and
    // banding them would put every short doc in the same bucket
    val sigs = signatures(docs).filter(col("sig").isNotNull)
    val bands = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until NumPerms / BandRows).map(b =>
        xxhash64(lit(b) +: (0 until BandRows).map(r =>
          col("sig").getItem(b * BandRows + r)): _*)): _*)).as(Seq("band", "bkey")))
    // sort_array on array<struct> orders by the leading field (doc_id),
    // so in-group combos emit each pair once with a_id < b_id
    val bandLists = bands.groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("ds"))
      .filter(size(col("ds")) > 1)
    val pairGen = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
        struct(x.getField("doc_id").as("a_id"), y.getField("doc_id").as("b_id"),
          x.getField("sig").as("a_sig"), y.getField("sig").as("b_sig")))))
    val matches = (0 until NumPerms)
      .map(i => when(col("p.a_sig").getItem(i) === col("p.b_sig").getItem(i), 1).otherwise(0))
      .reduce(_ + _)
    bandLists
      .select(explode(pairGen).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        trunc4(matches.cast("double") / NumPerms).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
      // a pair colliding in several bands appears once per band — same
      // estimate each time; the groupBy is the dedup
      .groupBy(col("a_id"), col("b_id"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
      .orderBy(col("est_jaccard").desc, col("a_id"), col("b_id"))
  }

  // F2: MinHash signatures (no oracle — xxhash64). Deterministic rows-only.
  // The signature array is serialized to csv: the driver sorts every output
  // column in pandas even for rows-only checks, and array cells are
  // unhashable there.
  val qMinhashSig = Q.noOracle("q_f2_minhash_sig") { (s, d) =>
    signatures(documents(s, d))
      .select(col("doc_id"),
        array_join(transform(col("sig"), _.cast("string")), ",").as("sig_csv"))
      .orderBy(col("doc_id"))
  }

  // F2: banded-LSH near-dup candidate pairs (no oracle; empty when the
  // corpus has no near-dups — property tests plant duplicates).
  val qMinhashPairs = Q.noOracle("q_f2_minhash_pairs") { (s, d) =>
    candidatePairs(documents(s, d), 0.5)
  }

  // SimHash (64-bit) per document — single codegen'd pass per row
  // (functions.SimHash64): no token explode, no 32-column aggregate, no
  // shuffle except the final ORDER BY. The old explode+agg shape measured
  // 1.69 s at sf0.1; the kernel is a per-row map like minhash_sig.
  val qSimhash = Q.noOracle("q_f2_simhash") { (s, d) =>
    VectorFunctions.register(s)
    documents(s, d)
      .select(col("doc_id"), call_function("simhash64", col("text")).as("simhash"))
      .orderBy(col("doc_id"))
  }

  // Exact n-gram Jaccard — oracle-graded near-dup scoring. The pair space
  // is generated by the shingle equi-join (only docs sharing a shingle are
  // compared), then |A∩B| / (|A|+|B|-|A∩B|).
  val qNgramJaccard = Q(
    "q_ngram_jaccard",
    """WITH sp AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
      |         generate_series(1, len(t) - 2),
      |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |       FROM sp),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
      |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id)
      |SELECT a_id, b_id,
      |       floor(i * 1.0 / (sa.sz + sb.sz - i) * 10000)/10000 AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = a_id
      |JOIN sizes sb ON sb.doc_id = b_id
      |ORDER BY jaccard DESC, a_id, b_id
      |LIMIT 50""".stripMargin) { (s, d) =>
    // Pair space = shingle-hash equi-self-join (only docs sharing a
    // shingle are compared). The join + pair count stays entirely inside
    // whole-stage codegen — measured ~4× faster than generating combos
    // from collect_list'd doc arrays, whose flatten/transform/slice
    // lambdas run interpreted and allocate every candidate pair as a
    // struct on the heap. At cluster scale a hot shingle becomes an AQE
    // skew-split sort-merge join partition rather than one giant array
    // in a single task.
    VectorFunctions.register(s)
    val base = documents(s, d).select(col("doc_id"),
      call_function("shingle_hashes", col("text"), lit(GramLen)).as("shs"))
    val sh = base.select(col("doc_id"), explode(col("shs")).as("shh"))
    // per-doc distinct-shingle count falls out of the array length — no
    // groupBy shuffle
    val sizes = base.select(col("doc_id"), size(col("shs")).cast("long").as("sz"))
    val inter = sh.select(col("doc_id").as("a_id"), col("shh"))
      .join(sh.select(col("doc_id").as("b_id"), col("shh")), Seq("shh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("i"))
    // sizes is |docs| rows — tiny next to the pair table; AQE broadcasts it
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("sa")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("sb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        trunc4(col("i").cast("double") / (col("sa") + col("sb") - col("i"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
      .limit(50)
  }

  def all: Seq[Q] = Seq(qMinhashSig, qMinhashPairs, qSimhash, qNgramJaccard)
}
