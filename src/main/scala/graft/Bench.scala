package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds
  * on SPARK_GRAFT_SF_DIR.
  *
  * Protocol (documented in BASELINE.md): before timing, every query runs
  * once UNTIMED at sf0.001 — that pass absorbs Catalyst planning + janino
  * whole-stage-codegen compilation, which are per-plan one-time costs that
  * amortize to zero on a real cluster run (and would otherwise dominate:
  * ~0.3–4 s per query vs sub-second steady-state execution). The timed
  * pass then measures data-bound throughput at the target scale factor.
  * Queries run in SparkEntry.specs order — stable across JVMs, unlike Map
  * iteration order, so per-query numbers are comparable round-over-round.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val specs = SparkEntry.specs
    specs.foreach { q =>
      try q.fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    val results = specs.map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
