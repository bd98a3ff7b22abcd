package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object R20CandCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1").localCheckpoint(eager = true)
    val t = 0.75
    val base = docs.select(col("doc_id"),
        call_function("shingle_hashes", col("text"), lit(MinHash.GramLen)).as("shs"))
      .select(col("doc_id"), col("shs"), size(col("shs")).cast("long").as("sz"))
      .filter(col("sz") > 0).localCheckpoint(eager = true)
    val sh = base.select(col("doc_id"), col("sz"), explode(col("shs")).as("shh"))
    val df = sh.groupBy(col("shh")).agg(count(lit(1)).as("__df"))
    val prefLen = (col("sz") - ceil(col("sz") * lit(t)) + 1).cast("int")
    val ordAll = sh.join(df, Seq("shh"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("__df"), col("shh")))).as("ord"))
      .localCheckpoint(eager = true)
    val inner = ordAll.select(col("doc_id").as("inner_id"), col("sz").as("sa"),
        posexplode(slice(col("ord"), lit(1), prefLen)).as(Seq("pi", "p")))
      .select(col("inner_id"), col("sa"), col("pi"), col("p.shh").as("shh"))
    val outer = ordAll.select(col("doc_id").as("outer_id"), col("sz").as("sb"),
        posexplode(col("ord")).as(Seq("po", "p")))
      .select(col("outer_id"), col("sb"), col("po"), col("p.shh").as("shh"))
    val joined = inner.join(outer, Seq("shh"))
      .filter(col("inner_id") =!= col("outer_id") &&
        col("sb").cast("double") >= col("sa") * lit(t))
    val noPos = joined.select(col("inner_id"), col("outer_id")).distinct().count()
    val ubC = least(col("sa") - col("pi"), col("sb") - col("po"))
    val withPos = joined.filter(ubC.cast("double") / col("sa") >= t)
      .select(col("inner_id"), col("outer_id")).distinct().count()
    println(s"CAND containment noPos=$noPos withPos=$withPos")
    spark.stop()
  }
}
