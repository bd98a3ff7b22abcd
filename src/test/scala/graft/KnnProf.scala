package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only experiment (VERDICT r11 #5): q_f4_knn's half-join union
  * recomputes the n² pair join twice by design; measure whether
  * materializing the half-join once (persist) beats the recompute at
  * sf0.1 (2k vectors) and at a 10k-vector stress.
  * Usage: sbt "Test/runMain graft.KnnProf"
  */
object KnnProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val d = "/root/testdata/sf0.1"

    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("fvec_dot", a, b)

    def run(emb: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val n = emb.select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      def side(p: String) = n.select(col("vec_id").as(s"${p}_id"),
        col("embedding").as(s"${p}_emb"), col("nrm").as(s"${p}_nrm"))
      def halfJoin = side("a").join(side("b"), col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          Tables.trunc4(dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm"))).as("cos_sim"))
      def finish(pairs: org.apache.spark.sql.DataFrame) = pairs
        .select(col("q_id"), struct(col("cos_sim"), (-col("n_id")).as("negid"), col("n_id")).as("p"))
        .groupBy(col("q_id"))
        .agg(call_function("collect_top_k", col("p"), lit(3), lit(false)).as("top"))
        .select(col("q_id"), posexplode(sort_array(col("top"), asc = false)).as(Seq("pos", "p")))
        .select(col("q_id"), col("p.n_id").as("n_id"), col("p.cos_sim").as("cos_sim"),
          (col("pos") + 1).cast("long").as("rn"))

      for (rep <- 1 to 3) {
        // variant A: union of two half-join executions (current graded plan)
        var t0 = System.nanoTime()
        val h = halfJoin
        val a = finish(h.select(col("a_id").as("q_id"), col("b_id").as("n_id"), col("cos_sim"))
          .unionByName(h.select(col("b_id").as("q_id"), col("a_id").as("n_id"), col("cos_sim")))).count()
        val ta = (System.nanoTime() - t0) / 1e9
        // variant B: half-join persisted once, union reads the cache
        t0 = System.nanoTime()
        val hp = halfJoin.persist()
        val b = finish(hp.select(col("a_id").as("q_id"), col("b_id").as("n_id"), col("cos_sim"))
          .unionByName(hp.select(col("b_id").as("q_id"), col("a_id").as("n_id"), col("cos_sim")))).count()
        val tb = (System.nanoTime() - t0) / 1e9
        hp.unpersist(blocking = true)
        // variant C: localCheckpoint
        t0 = System.nanoTime()
        val hc = halfJoin.localCheckpoint(eager = false)
        val c = finish(hc.select(col("a_id").as("q_id"), col("b_id").as("n_id"), col("cos_sim"))
          .unionByName(hc.select(col("b_id").as("q_id"), col("a_id").as("n_id"), col("cos_sim")))).count()
        val tc = (System.nanoTime() - t0) / 1e9
        // variant D: explode mirror (single pass, Generate breaks codegen)
        t0 = System.nanoTime()
        val dcount = finish(halfJoin.select(explode(array(
            struct(col("a_id").as("q_id"), col("b_id").as("n_id"), col("cos_sim")),
            struct(col("b_id").as("q_id"), col("a_id").as("n_id"), col("cos_sim")))).as("m"))
          .select(col("m.q_id"), col("m.n_id"), col("m.cos_sim"))).count()
        val td = (System.nanoTime() - t0) / 1e9
        println(f"KNNPROF $label rep=$rep union=$ta%.2f persist=$tb%.2f ckpt=$tc%.2f explode=$td%.2f rows=$a/$b/$c/$dcount")
      }
    }

    // repartition to core count: the parquet scan / crossJoin output
    // otherwise carries 1–4 partitions and the pair join runs on as many
    // threads (the deflate-stress lesson)
    val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      .repartition(32)
      .localCheckpoint(eager = true)
    println(s"sf0.1 vectors: ${emb.count()}")
    run(emb, "sf01_2k")
    val emb10k = emb.crossJoin(spark.range(0, 5).select(col("id").as("copy")))
      .select((col("vec_id") * 5 + col("copy")).as("vec_id"), col("embedding"))
      .repartition(32)
      .localCheckpoint(eager = true)
    println(s"stress vectors: ${emb10k.count()}")
    run(emb10k, "stress_10k")
    spark.stop()
  }
}
