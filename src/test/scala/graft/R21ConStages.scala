package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 scratch: per-subplan timing of containmentPairs at sf0.1
  * (t = 0.75, the graded q_f47 threshold).
  */
object R21ConStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val t = 0.75
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val n = f
      println(f"CONSTAGE $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.3f s rows=$n")
    }
    val docs = Tables.documents(spark, d)
    def base = docs.select(col("doc_id"),
        call_function("shingle_hashes", col("text"), lit(MinHash.GramLen)).as("shs"))
      .select(col("doc_id"), col("shs"), size(col("shs")).cast("long").as("sz"))
      .filter(col("sz") > 0)
    def sh = base.select(col("doc_id"), col("sz"), explode(col("shs")).as("shh"))
    def df = sh.groupBy(col("shh")).agg(count(lit(1)).as("__df"))
    def ordAll = sh.join(df, Seq("shh"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("__df"), col("shh")))).as("ord"))
    time("df") { df.count() }
    time("ordAll") { ordAll.count() }
    val ord2 = ordAll.localCheckpoint(eager = true)
    val prefLen = (col("sz") - ceil(col("sz") * lit(t)) + 1).cast("int")
    def inner = ord2
      .select(col("doc_id").as("inner_id"), col("sz").as("sa"),
        posexplode(slice(col("ord"), lit(1), prefLen)).as(Seq("pi", "p")))
      .select(col("inner_id"), col("sa"), col("pi"), col("p.shh").as("shh"))
    def outer = ord2
      .select(col("doc_id").as("outer_id"), col("sz").as("sb"),
        posexplode(col("ord")).as(Seq("po", "p")))
      .select(col("outer_id"), col("sb"), col("po"), col("p.shh").as("shh"))
    time("inner") { inner.count() }
    time("outer") { outer.count() }
    val ubC = least(col("sa") - col("pi"), col("sb") - col("po"))
    def joined = inner.join(outer, Seq("shh"))
      .filter(col("inner_id") =!= col("outer_id") &&
        col("sb").cast("double") >= col("sa") * lit(t) &&
        ubC.cast("double") / col("sa") >= t)
    time("join_raw") { joined.count() }
    def cand = joined.select(col("inner_id"), col("outer_id")).distinct()
    time("cand_distinct") { cand.count() }
    time("graded_full") { Dedup.containmentPairs(spark, docs, t).count() }
    spark.stop()
  }
}
