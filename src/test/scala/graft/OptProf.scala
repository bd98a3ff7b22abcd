package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-20 optimization profiler (test scope — not shipped): times the
  * named queries with the Bench methodology (warm once at sf0.001, median
  * of N timed count() reps at the target SF), counts Spark jobs/stages and
  * shuffled bytes per query via a listener, and optionally writes
  * `.explain("formatted")` to plans/r20/<query>_<tag>.txt.
  *
  * Usage:
  *   sbt "Test/runMain graft.OptProf <tag> q_a q_b ..."   # time + plans
  *   sbt "Test/runMain graft.OptProf none q_a q_b ..."    # time only
  * Env: OPTPROF_SF (default /root/testdata/sf0.1), OPTPROF_REPS (3),
  *      OPTPROF_CPUS (32).
  */
object OptProf {

  final class Meter extends SparkListener {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    override def onJobStart(js: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); shuffleRead.set(0); shuffleWrite.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("none")
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("OPTPROF_SF", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val reps = sys.env.getOrElse("OPTPROF_REPS", "3").toInt
    val cpus = sys.env.getOrElse("OPTPROF_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    val specs = SparkEntry.specs.filter(q => names.contains(q.name))
    val missing = names.filterNot(specs.map(_.name).contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")
    // spec order, like Bench
    val ordered = SparkEntry.specs.filter(q => names.contains(q.name))
    ordered.foreach { q =>
      try q.fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    ordered.foreach { q =>
      if (tag != "none") {
        val plan = q.fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val planDir = sys.env.getOrElse("OPTPROF_PLANDIR", "plans/r21")
        val dir = new java.io.File(planDir); dir.mkdirs()
        val w = new java.io.PrintWriter(s"$planDir/${q.name}_$tag.txt", "UTF-8")
        try w.println(plan) finally w.close()
      }
      val secs = (1 to reps).map { _ =>
        meter.reset()
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // meter holds the LAST rep's counts (steady-state, post-warm)
      val med = secs.sorted.apply(reps / 2)
      println(f"OPTPROF ${q.name}%-34s med=$med%7.3f reps=[${secs.map(s => f"$s%.3f").mkString(",")}] " +
        f"jobs=${meter.jobs.get()}%3d stages=${meter.stages.get()}%3d " +
        f"shufR=${meter.shuffleRead.get() / 1024}%8dKB shufW=${meter.shuffleWrite.get() / 1024}%8dKB")
    }
    spark.stop()
  }
}
