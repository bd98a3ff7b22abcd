package graft

import org.apache.spark.sql.SparkSession

/** Dev plan-audit main (test scope): print formatted plans for selected
  * queries. Usage: sbt "Test/runMain graft.ExplainAudit <sfDir> <name>..."
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
