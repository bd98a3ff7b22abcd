package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 containment scaling proof (VERDICT r20 item 9): candidate
  * counts with/without the round-20 positional bound, and containment
  * wall seconds, at increasing corpus sizes — sf0.01, sf0.1, and sf0.1
  * upscaled ×4 and ×16 (each doc replicated under fresh ids with a
  * per-copy marker token appended, so copies are near- but not exact
  * duplicates and the shingle distribution keeps its natural shape).
  * Run: sbt "Test/runMain graft.R21ConScale"
  */
object R21ConScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val t = 0.75

    def upscale(docs: DataFrame, times: Int): DataFrame =
      docs.select(col("doc_id"), col("text"),
          explode(typedLit((0 until times).toSeq)).as("cp"))
        .select((col("doc_id") * times + col("cp")).as("doc_id"),
          concat(col("text"), lit(" copymark"), col("cp").cast("string")).as("text"))

    def candCounts(docs: DataFrame): (Long, Long, Long) = {
      val base = docs.select(col("doc_id"),
          call_function("shingle_hashes", col("text"), lit(MinHash.GramLen)).as("shs"))
        .select(col("doc_id"), col("shs"), size(col("shs")).cast("long").as("sz"))
        .filter(col("sz") > 0).localCheckpoint(eager = true)
      val sh = base.select(col("doc_id"), col("sz"), explode(col("shs")).as("shh"))
      val df = sh.groupBy(col("shh")).agg(count(lit(1)).as("__df"))
      val prefLen = (col("sz") - ceil(col("sz") * lit(t)) + 1).cast("int")
      val ordAll = sh.join(df, Seq("shh"))
        .groupBy(col("doc_id"), col("sz"))
        .agg(expr("transform(sort_array(collect_list(struct(__df, shh))), p -> p.shh)").as("ord"))
        .localCheckpoint(eager = true)
      val inner = ordAll.select(col("doc_id").as("inner_id"), col("sz").as("sa"),
        posexplode(slice(col("ord"), lit(1), prefLen)).as(Seq("pi", "shh")))
      val outer = ordAll.select(col("doc_id").as("outer_id"), col("sz").as("sb"),
        posexplode(col("ord")).as(Seq("po", "shh")))
      val joined = inner.join(outer, Seq("shh"))
        .filter(col("inner_id") =!= col("outer_id") &&
          col("sb").cast("double") >= col("sa") * lit(t))
      val noPos = joined.select(col("inner_id"), col("outer_id")).distinct().count()
      val ubC = least(col("sa") - col("pi"), col("sb") - col("po"))
      val withPos = joined.filter(ubC.cast("double") / col("sa") >= t)
        .select(col("inner_id"), col("outer_id")).distinct().count()
      (base.count(), noPos, withPos)
    }

    def wall(docs: DataFrame): (Double, Long) = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = Dedup.containmentPairs(spark, docs, t).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (reps.map(_._1).sorted.apply(1), reps.head._2)
    }

    val shapes: Seq[(String, DataFrame)] = Seq(
      "sf0.01" -> Tables.documents(spark, "/root/testdata/sf0.01"),
      "sf0.1" -> Tables.documents(spark, "/root/testdata/sf0.1"),
      "sf0.1x4" -> upscale(Tables.documents(spark, "/root/testdata/sf0.1"), 4),
      "sf0.1x16" -> upscale(Tables.documents(spark, "/root/testdata/sf0.1"), 16))
    shapes.foreach { case (tag, docs0) =>
      val docs = docs0.localCheckpoint(eager = true)
      val (n, noPos, withPos) = candCounts(docs)
      val (sec, pairs) = wall(docs)
      println(f"CONSCALE $tag%-9s docs=$n%7d candNoPos=$noPos%10d candWithPos=$withPos%10d " +
        f"cut=${100.0 * (noPos - withPos) / math.max(1, noPos)}%5.1f%% wallMed=$sec%7.3f s pairs=$pairs")
      docs.unpersist()
    }
    spark.stop()
  }
}
