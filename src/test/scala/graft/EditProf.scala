package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for editDistancePairsQGram at title scale —
  * mirrors the pipeline stage by stage with checkpointed cuts so each
  * stage's wall and row count is observable in isolation. Usage:
  *   ADHOC_EDITDIST_N=1000000 sbt "Test/runMain graft.EditProf"
  */
object EditProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    val n = sys.env.getOrElse("ADHOC_EDITDIST_N", "1000000").toLong
    val baseT = spark.range(0, n).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), (pmod(hash(col("id")), lit(5)) + lit(5)).cast("int")),
        { i =>
          val h = hash(col("id") * 31 + i)
          when(pmod(h, lit(2)) === 0,
            concat(lit("s"), pmod(h, lit(64)).cast("string")))
            .otherwise(concat(lit("w"),
              lower(conv(pmod(h, lit(1500000)).cast("string"), 10, 36))))
        })).as("text"))
    val twins = baseT.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + n).as("doc_id"),
        concat(substring(col("text"), 1, 2), lit("Z"),
          expr("substring(text, 4)")).as("text"))
    val docs = baseT.unionByName(twins).localCheckpoint(eager = true)
    println(s"corpus: ${docs.count()}")

    val maxDist = 1
    val q = 4
    val qd = q * maxDist

    def cut(df: org.apache.spark.sql.DataFrame, label: String) = {
      val t0 = System.nanoTime()
      val out = df.localCheckpoint(eager = true)
      val c = out.count()
      println(f"PROF $label rows=$c secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      out
    }

    val base0 = docs
      .select(col("doc_id"), col("text"), octet_length(col("text")).cast("long").as("len"),
        call_function("char_qgram_hashes", col("text"), lit(q)).as("g"))
      .withColumn("ng", size(col("g")).cast("long"))
    val big = cut(base0.filter(col("ng") > qd), "big")
    val gx = big.select(col("doc_id"), explode(col("g")).as("gh"))
    val dfreq = cut(gx.groupBy(col("gh")).agg(count(lit(1)).as("freq")), "dfreq")
    val topVals = cut(gx.join(dfreq, Seq("gh"))
      .select(col("doc_id"),
        struct((-col("freq")).as("nf"), expr("~gh").as("ngh")).as("p"))
      .groupBy(col("doc_id"))
      .agg(call_function("collect_top_k", col("p"), lit(qd + 1), lit(false)).as("top"))
      .select(col("doc_id"),
        array_distinct(expr("transform(top, p -> ~p.ngh)")).as("pvals")), "topVals")
    val pre = cut(big.join(topVals, Seq("doc_id"))
      .select(col("doc_id"), col("len"), col("text"), explode(col("pvals")).as("gh"))
      .select(col("doc_id"), col("len"), col("gh"),
        explode(call_function("qgram_value_positions", col("text"), col("gh"), lit(q)))
          .as("pos"))
      .withColumn("pband", floor(col("pos") / (maxDist + 1))), "pre")
    val l = pre.select(col("doc_id").as("a_id"), col("len").as("la"),
      col("gh").as("a_gh"), col("pos").as("pa"), col("pband").as("a_pband"),
      explode(array(col("pband"), col("pband") + 1)).as("jband"))
    val r = pre.select(col("doc_id").as("b_id"), col("len").as("lb"),
      col("gh").as("b_gh"), col("pos").as("pb"), col("pband").as("b_pband"))
    val cand = cut(l.join(r,
        col("a_gh") === col("b_gh") && col("jband") === col("b_pband") &&
          col("a_id") =!= col("b_id") &&
          (col("a_pband") < col("b_pband") ||
            (col("a_pband") === col("b_pband") && col("a_id") < col("b_id"))) &&
          abs(col("pa") - col("pb")) <= maxDist &&
          abs(col("la") - col("lb")) <= maxDist)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
      .distinct(), "cand")
    val bigPairs = cut(cand
      .join(big.select(col("doc_id").as("a_id"), col("text").as("a_text"),
        col("g").as("a_g"), col("ng").as("na")), Seq("a_id"))
      .join(big.select(col("doc_id").as("b_id"), col("text").as("b_text"),
        col("g").as("b_g"), col("ng").as("nb")), Seq("b_id"))
      .filter(call_function("sorted_intersect_count", col("a_g"), col("b_g")) >=
        greatest(col("na"), col("nb")) - lit(qd))
      .withColumn("dist",
        call_function("byte_levenshtein", col("a_text"), col("b_text"), lit(maxDist)))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist")), "bigPairs")
    println(s"done: ${bigPairs.count()}")
    spark.stop()
  }
}
