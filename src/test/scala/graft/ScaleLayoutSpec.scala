package graft

import org.apache.spark.sql.functions._

/** Storage-layout levers for the 100 TB deployment, exercised for real on
  * local data: bucketed co-located joins (no shuffle) and partition
  * pruning (sub-tree scans). These are the plan shapes the engine relies
  * on at scale; the assertions read the actual executed plans.
  */
class ScaleLayoutSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed tables join without an exchange (co-located join)") {
    Tables.orders(spark, sf001)
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables.customer(spark, sf001)
      .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
    joined.collect() // force execution so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // only the tiny groupBy may shuffle; the join itself must not
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"join should be co-located, plan had $exchanges exchanges:\n$plan")
    // sanity: result matches the unbucketed join
    val expected = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val got = joined.as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("partitioned parquet scans prune to the filtered partition") {
    val dir = tmpDir("part_events")
    Tables.events(spark, sf001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir).filter($"event_type" === "click")
    val n = df.count()
    assert(n > 0)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), "scan should carry partition filters")
    // the pruned scan must read strictly fewer files than the full table
    val all = spark.read.parquet(dir)
    val prunedFiles = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles }.getOrElse(-1L)
    val allFiles = all.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles }.getOrElse(-2L)
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned=$prunedFiles all=$allFiles")
  }
}
