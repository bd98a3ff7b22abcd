package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main (test scope — not shipped). */
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
    val s = spark
    Tables.documents(s, d).count() // warmup

    for (rep <- 1 to 2) {
      time("docs_scan") { Tables.documents(s, d).agg(sum(length(col("text")))).count() }
      time("shingles_hof") { MinHash.shingles(Tables.documents(s, d)).count() }
      val sh = MinHash.shingles(Tables.documents(s, d))
        .select(col("doc_id"), xxhash64(col("sh")).as("shh"))
      time("shingles_hashed") { sh.count() }
      time("sig_groupby") { MinHash.signatures(Tables.documents(s, d)).count() }
      time("selfjoin_pairs") {
        sh.select(col("doc_id").as("a_id"), col("shh"))
          .join(sh.select(col("doc_id").as("b_id"), col("shh")), Seq("shh"))
          .filter(col("a_id") < col("b_id"))
          .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("i")).count()
      }
      // combos variant (round-1 shape)
      time("combos_pairs") {
        val docLists = sh.groupBy(col("shh"))
          .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
          .filter(size(col("ds")) > 1)
        val pairGen = flatten(transform(col("ds"), (x, i) =>
          transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
            struct(x.as("a_id"), y.as("b_id")))))
        docLists.select(explode(pairGen).as("p"))
          .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
          .agg(count(lit(1)).as("i")).count()
      }
    }
    spark.stop()
  }
}
