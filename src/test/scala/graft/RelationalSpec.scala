package graft

import org.apache.spark.sql.functions._

/** Sanity + property coverage for the graded queries that have no DuckDB
  * oracle (C13 approx distinct, C20 sampling) and smoke for the rest.
  * Hash-exact parity is enforced by the driver and tools/parity.py.
  */
class RelationalSpec extends SparkSpec {

  import spark.implicits._

  test("every registered query runs at sf0.001 and the contract maps agree") {
    assert(SparkEntry.queries.keySet == SparkEntry.specs.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // entry smoke (driver t1)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("C13: approx_count_distinct lands within HLL error bounds") {
    val rows = Relational.qApproxDistinct.fn(spark, sf001)
      .select("l_returnflag", "approx_orders").as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, sf001)
      .groupBy($"l_returnflag").agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (flag, n) =>
      val approx = rows(flag)
      assert(math.abs(approx - n).toDouble / n < 0.1,
        s"$flag: approx $approx vs exact $n")
    }
  }

  test("C20: seeded sample is deterministic and lands in the envelope") {
    val a = Relational.qSample.fn(spark, sf001).collect()
    val b = Relational.qSample.fn(spark, sf001).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq, "same seed, same rows")
    val total = Tables.events(spark, sf001).count()
    assert(a.length > total * 0.1 && a.length < total * 0.3, s"got ${a.length} of $total")
  }

  test("C9: as-of join never pairs a purchase with a later click") {
    val rows = Relational.qAsofJoin.fn(spark, sf001)
      .select("ts_us", "prior_click_us").as[(Long, Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ts, prior) => prior.foreach(p => assert(p <= ts)) }
  }

  test("multimodal decode plumbing produces one feature row per record") {
    val feats = Multimodal.features(spark, sf001).collect()
    val n = Tables.documents(spark, sf001).count()
    assert(feats.length == n)
    assert(feats.forall(_.getAs[Boolean]("ok")))
    assert(feats.forall(r => r.getAs[Long]("n_bytes") > 0))
  }
}
