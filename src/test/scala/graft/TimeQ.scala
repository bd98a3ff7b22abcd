package graft

import org.apache.spark.sql.SparkSession

/** Dev timing harness (test scope — not shipped): time named SparkEntry
  * queries in one session, N reps each, after one untimed warmup of the
  * first query. Usage:
  *   sbt -batch "Test/runMain graft.TimeQ <sfDir> <reps> <name> [name...]"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    // absorb the session/codegen floor on a cheap query
    qs("q12_distinct")(spark, sfDir).count()
    for (name <- names) {
      val fn = qs(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val ts = times.map(_._1).map(t => f"$t%.2f").mkString(" ")
      println(f"TIME $name rows=${times.head._2} secs=[$ts]")
    }
    spark.stop()
  }
}
