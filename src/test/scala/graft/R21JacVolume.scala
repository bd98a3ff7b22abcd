package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 scratch: bucket-pair volume of the jaccard prefix join under
  * hash-ordered vs df-ordered prefixes at sf0.1 (t = 0.5, the graded
  * q_ngram_jaccard threshold). Volume = Σ_shh nl(shh)·nr(shh) — the pair
  * evaluations the candidate equi-join performs before its filters.
  */
object R21JacVolume {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val t = 0.5
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val base = docs.select(col("doc_id"),
        call_function("shingle_hashes", col("text"), lit(MinHash.GramLen)).as("shs"))
      .select(col("doc_id"), col("shs"), size(col("shs")).cast("long").as("sz"))
      .filter(col("sz") > 0).localCheckpoint(eager = true)
    val prefLen = (col("sz") - ceil(col("sz") * lit(t)) + 1).cast("int")
    // hash-ordered prefixes (current jaccardJoin shape)
    val preHash = base.select(col("doc_id"),
      explode(slice(col("shs"), lit(1), prefLen)).as("shh"))
    val volHash = preHash.groupBy("shh").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))).head().getLong(0)
    val rowsHash = preHash.count()
    // df-ordered prefixes (containmentPairs shape)
    val sh = base.select(col("doc_id"), col("sz"), explode(col("shs")).as("shh"))
    val df = sh.groupBy(col("shh")).agg(count(lit(1)).as("__df"))
    val ordPre = sh.join(df, Seq("shh"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("__df"), col("shh")))).as("ord"))
      .select(col("doc_id"),
        explode(expr("transform(slice(ord, 1, int(sz - ceil(sz * 0.5) + 1)), p -> p.shh)")).as("shh"))
    val volDf = ordPre.groupBy("shh").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))).head().getLong(0)
    val rowsDf = ordPre.count()
    println(s"JACVOL hash: rows=$rowsHash vol=$volHash   df: rows=$rowsDf vol=$volDf")
    spark.stop()
  }
}
