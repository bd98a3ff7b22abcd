package graft

import org.apache.spark.sql.SparkSession

/** Round-21 scratch probe (test scope, never shipped): split a query's
  * per-rep cost into ANALYSIS+OPTIMIZATION (executedPlan force) vs
  * EXECUTION (count on the already-planned frame) to tell planning-bound
  * queries from data-bound ones at sf0.1.
  */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("OPTPROF_SF", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("OPTPROF_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq
    val specs = SparkEntry.specs.filter(q => names.contains(q.name))
    specs.foreach { q =>
      try q.fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    }
    specs.foreach { q =>
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val df = q.fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + optimization + planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"PROBE ${q.name}%-28s build=${(t1 - t0) / 1e9}%6.3f plan=${(t2 - t1) / 1e9}%6.3f exec=${(t3 - t2) / 1e9}%6.3f")
      }
    }
    spark.stop()
  }
}
