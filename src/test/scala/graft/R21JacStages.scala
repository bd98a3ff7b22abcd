package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 scratch: per-subplan timing of the jaccard prefix join at
  * sf0.1 (t = 0.5) — where does q_ngram_jaccard's ~1.2 s go?
  */
object R21JacStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val t = 0.5
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val n = f
        println(f"JACSTAGE $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.3f s  rows=$n")
      }
    }
    def base = Tables.documents(spark, d).select(col("doc_id"),
        call_function("shingle_hashes", col("text"), lit(MinHash.GramLen)).as("shs"))
      .select(col("doc_id"), col("shs"), size(col("shs")).cast("long").as("sz"))
      .filter(col("sz") > 0)
    def pre = {
      val prefLen = (col("sz") - ceil(col("sz") * lit(t)) + 1).cast("int")
      base.select(col("doc_id"), col("sz"),
        posexplode(slice(col("shs"), lit(1), prefLen)).as(Seq("pp", "shh")))
    }
    // warm
    time("scan_only") { Tables.documents(spark, d).count() }
    time("base") { base.count() }
    time("pre") { pre.count() }
    val lb = base
    val ubJ = {
      val ub = least(col("sa") - col("pa"), col("sb") - col("pb"))
      ub.cast("double") / (col("sa") + col("sb") - ub)
    }
    def cand = pre.select(col("doc_id").as("a_id"), col("sz").as("sa"),
        col("pp").as("pa"), col("shh"))
      .join(pre.select(col("doc_id").as("b_id"), col("sz").as("sb"),
        col("pp").as("pb"), col("shh")), Seq("shh"))
      .filter(col("a_id") < col("b_id") &&
        col("sb") >= col("sa") * lit(t) && col("sa") >= col("sb") * lit(t) &&
        ubJ >= t)
      .select(col("a_id"), col("b_id"))
      .distinct()
    time("cand_distinct") { cand.count() }
    def full = cand
      .join(lb.select(col("doc_id").as("a_id"), col("shs").as("a_shs"),
        col("sz").as("sa")), Seq("a_id"))
      .join(lb.select(col("doc_id").as("b_id"), col("shs").as("b_shs"),
        col("sz").as("sb")), Seq("b_id"))
      .withColumn("i",
        call_function("sorted_intersect_count", col("a_shs"), col("b_shs")).cast("double"))
      .withColumn("jaccard", col("i") / (col("sa") + col("sb") - col("i")))
      .filter(col("jaccard") >= t)
    time("full") { full.count() }
    time("graded_full") { Dedup.jaccardPairsOf(spark, Tables.documents(spark, d), t).count() }
    // df-ascending prefix order (the containmentPairs shape): same lemma,
    // rare shingles in prefixes — candidate count + wall
    def sh = base.select(col("doc_id"), col("sz"), explode(col("shs")).as("shh"))
    def dfreq = sh.groupBy(col("shh")).agg(count(lit(1)).as("__df"))
    def ordAll = sh.join(dfreq, Seq("shh"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("__df"), col("shh")))).as("ord"))
    def preDf = {
      val prefLen = (col("sz") - ceil(col("sz") * lit(t)) + 1).cast("int")
      ordAll.select(col("doc_id"), col("sz"),
        posexplode(slice(col("ord"), lit(1), prefLen)).as(Seq("pp", "p")))
        .select(col("doc_id"), col("sz"), col("pp"), col("p.shh").as("shh"))
    }
    def candDf = preDf.select(col("doc_id").as("a_id"), col("sz").as("sa"),
        col("pp").as("pa"), col("shh"))
      .join(preDf.select(col("doc_id").as("b_id"), col("sz").as("sb"),
        col("pp").as("pb"), col("shh")), Seq("shh"))
      .filter(col("a_id") < col("b_id") &&
        col("sb") >= col("sa") * lit(t) && col("sa") >= col("sb") * lit(t) &&
        ubJ >= t)
      .select(col("a_id"), col("b_id"))
      .distinct()
    time("cand_df_distinct") { candDf.count() }
    def fullDf = candDf
      .join(lb.select(col("doc_id").as("a_id"), col("shs").as("a_shs"),
        col("sz").as("sa")), Seq("a_id"))
      .join(lb.select(col("doc_id").as("b_id"), col("shs").as("b_shs"),
        col("sz").as("sb")), Seq("b_id"))
      .withColumn("i",
        call_function("sorted_intersect_count", col("a_shs"), col("b_shs")).cast("double"))
      .withColumn("jaccard", col("i") / (col("sa") + col("sb") - col("i")))
      .filter(col("jaccard") >= t)
    time("full_df") { fullDf.count() }
    spark.stop()
  }
}
