package graft

import org.apache.spark.sql.functions._

class Round2OpsSpec extends SparkSpec {

  import spark.implicits._

  test("quantization law: max element saturates; error bounded by half-step per dim") {
    val rows = Similarity.qQuantize.fn(spark, sf001)
      .as[(Long, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, amax, nSat, err) =>
      assert(nSat >= 1, "the max-|x| element must quantize to exactly ±127")
      // per-dim error ≤ half a quant step = amax/254; L2 over 64 dims
      val bound = amax / 254.0 * math.sqrt(64.0) + 1e-6
      assert(err <= bound, s"recon_err $err exceeds $bound")
    }
  }

  test("sessionization law: splits exactly at >30min gaps, events conserved") {
    val us = 1000000L
    val min = 60L * us
    // user 1: two sessions (gap 31min); user 2: one session (gaps ≤30min)
    val events = Seq(
      (1L, 101L, 0L), (1L, 102L, 10 * min), (1L, 103L, 41 * min + 1),
      (2L, 201L, 0L), (2L, 202L, 30 * min)
    ).toDF("user_id", "event_id", "ts_us")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = events
      .withColumn("brk",
        when(lag(col("ts_us"), 1).over(w).isNull
          .or(col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L), 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"))
      .as[(Long, Long, Long)].collect()
    val byUser = sessions.groupBy(_._1)
    assert(byUser(1L).map(_._2).toSet == Set(1L, 2L), "user 1 has two sessions")
    assert(byUser(2L).map(_._2).toSet == Set(1L), "user 2 has one session")
    assert(sessions.map(_._3).sum == 5L, "every event lands in exactly one session")
  }

  test("approx_percentile tracks exact percentile within rank-error bound") {
    import org.apache.spark.sql.functions._
    val exact = TextOps.qPercentiles.fn(spark, sf001)
      .select(col("lang"), col("p50")).as[(String, Double)].collect().toMap
    val approx = Tables.documents(spark, sf001).groupBy(col("lang"))
      .agg(expr("approx_percentile(n_chars, 0.5, 1000)").as("ap50"),
        count(lit(1)).as("n"),
        expr("percentile(n_chars, 0.45)").as("lo"),
        expr("percentile(n_chars, 0.55)").as("hi"))
      .as[(String, Long, Long, Double, Double)].collect()
    approx.foreach { case (lang, ap50, _, lo, hi) =>
      assert(ap50 >= lo - 1 && ap50 <= hi + 1,
        s"$lang: approx p50 $ap50 outside rank-error envelope [$lo,$hi] (exact ${exact(lang)})")
    }
  }

  test("sessionization on real data: sessions are disjoint, ordered, and conserve events") {
    val rows = Relational.qSessionize.fn(spark, sf001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val total = rows.map(_._3).sum
    val nEvents = Tables.events(spark, sf001).count()
    assert(total == nEvents, "sum of session sizes == event count")
    rows.groupBy(_._1).values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to ss.length.toLong), "dense session idx")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 - a._5 > 1800000000L, "consecutive sessions separated by >30min")
        case _ =>
      }
    }
  }
}
