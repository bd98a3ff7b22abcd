package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 stage profiler for the jaccard prefix join (q_f11 family)
  * and the containment join (q_f47) at sf0.1.
  * Usage: sbt "Test/runMain graft.R20JacProf"
  */
object R20JacProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .localCheckpoint(eager = true)
    println(s"corpus: ${docs.count()}")

    def cut(df: org.apache.spark.sql.DataFrame, label: String) = {
      val t0 = System.nanoTime()
      val out = df.localCheckpoint(eager = true)
      val c = out.count()
      println(f"PROF $label rows=$c secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      out
    }

    val t = 0.6
    for (rep <- 1 to 2) {
      println(s"--- rep $rep jaccard t=$t")
      val base = cut(docs
        .select(col("doc_id"),
          call_function("shingle_hashes", col("text"), lit(MinHash.GramLen)).as("shs"))
        .select(col("doc_id"), col("shs"), size(col("shs")).cast("long").as("sz"))
        .filter(col("sz") > 0), "base")
      val prefLen = (col("sz") - ceil(col("sz") * lit(t)) + 1).cast("int")
      val pre = cut(base.select(col("doc_id"), col("sz"),
        explode(slice(col("shs"), lit(1), prefLen)).as("shh")), "pre")
      val cand = cut(pre.select(col("doc_id").as("a_id"), col("sz").as("sa"), col("shh"))
        .join(pre.select(col("doc_id").as("b_id"), col("sz").as("sb"), col("shh")), Seq("shh"))
        .filter(col("a_id") < col("b_id") &&
          col("sb") >= col("sa") * lit(t) && col("sa") >= col("sb") * lit(t))
        .select(col("a_id"), col("b_id"))
        .distinct(), "cand")
      val verified = cut(cand
        .join(base.select(col("doc_id").as("a_id"), col("shs").as("a_shs"),
          col("sz").as("sa")), Seq("a_id"))
        .join(base.select(col("doc_id").as("b_id"), col("shs").as("b_shs"),
          col("sz").as("sb")), Seq("b_id"))
        .withColumn("i",
          call_function("sorted_intersect_count", col("a_shs"), col("b_shs")).cast("double"))
        .withColumn("jaccard", col("i") / (col("sa") + col("sb") - col("i")))
        .filter(col("jaccard") >= t), "verify")
      // the real query for comparison
      val t0 = System.nanoTime()
      val full = Dedup.jaccardPairsOf(spark, docs, t).count()
      println(f"PROF full_jaccardPairsOf rows=$full secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      val t1 = System.nanoTime()
      val g = Dedup.connectedComponents(spark,
        docs.select(col("doc_id")), Dedup.jaccardEdgesOf(spark, docs, t))
      val gc = Dedup.withClusterSize(g).count()
      println(f"PROF full_f11_shape rows=$gc secs=${(System.nanoTime() - t1) / 1e9}%.2f")
      val t2 = System.nanoTime()
      val cp = Dedup.containmentPairs(spark, docs, 0.9).count()
      println(f"PROF full_containment rows=$cp secs=${(System.nanoTime() - t2) / 1e9}%.2f")
    }
    spark.stop()
  }
}
