package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 stage profiler for the GRADED editDistancePairsQGram shape
  * (sf0.1 documents, maxDist=8, q=4) — mirrors the pipeline with eager
  * cuts so each stage's wall and cardinality is observable.
  * Usage: sbt "Test/runMain graft.R20EditProf"
  */
object R20EditProf {
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
    val maxDist = 8
    val q = 4
    val qd = q * maxDist

    def cut(df: org.apache.spark.sql.DataFrame, label: String) = {
      val t0 = System.nanoTime()
      val out = df.localCheckpoint(eager = true)
      val c = out.count()
      println(f"PROF $label rows=$c secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      out
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val base = cut(docs
        .select(col("doc_id"), col("text"), octet_length(col("text")).cast("long").as("len"),
          call_function("char_qgram_hashes", col("text"), lit(q)).as("g"))
        .withColumn("ng", size(col("g")).cast("long")), "base")
      val big = base.filter(col("ng") > qd)
      val gx = cut(big.select(col("doc_id"), explode(col("g")).as("gh")), "gx")
      val dfreq = cut(gx.groupBy(col("gh")).agg(count(lit(1)).as("freq")), "dfreq")
      val topVals = cut(gx.join(broadcast(dfreq), Seq("gh"))
        .select(col("doc_id"),
          struct((-col("freq")).as("nf"), expr("~gh").as("ngh")).as("p"))
        .groupBy(col("doc_id"))
        .agg(call_function("collect_top_k", col("p"), lit(qd + 1), lit(false)).as("top"))
        .select(col("doc_id"),
          expr("transform(sort_array(top, false), p -> ~p.ngh)").as("kvals")), "topVals")
      val pre = cut(big.join(topVals, Seq("doc_id"))
        .select(col("doc_id"), col("len"), col("text"),
          explode(call_function("adaptive_prefix_values",
            col("text"), col("kvals"), lit(q), lit(maxDist))).as("gh"))
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
      val counted = cut(cand
        .join(base.select(col("doc_id").as("a_id"), col("text").as("a_text"),
          col("ng").as("na")), Seq("a_id"))
        .join(base.select(col("doc_id").as("b_id"), col("text").as("b_text"),
          col("ng").as("nb")), Seq("b_id"))
        .filter(call_function("sorted_intersect_count",
            call_function("char_qgram_hashes", col("a_text"), lit(q)),
            call_function("char_qgram_hashes", col("b_text"), lit(q))) >=
          greatest(col("na"), col("nb")) - lit(qd)), "countfilter")
      val pairs = cut(counted
        .withColumn("dist",
          call_function("byte_levenshtein", col("a_text"), col("b_text"), lit(maxDist)))
        .filter(col("dist") >= 0 && col("dist") <= maxDist)
        .select(col("a_id"), col("b_id"), col("dist")), "lev")
      val shortZone = docs.filter(octet_length(col("text")) <= (q - 1) + qd + maxDist)
      cut(shortZone, "shortZone")
      pairs.unpersist()
    }
    spark.stop()
  }
}
