package graft

import java.io.{File, PrintWriter}
import java.nio.charset.StandardCharsets.UTF_8

import graft.pipeline.Pipeline

/** E10: the exactly-once file→Kinesis pipeline, including resume from the
  * streaming checkpoint (SURVEY.md §2.E E10, §2.B B7).
  */
class PipelineSpec extends SparkSpec {

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit = {
    val w = new PrintWriter(new File(dir, name), "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  private def eventJson(id: Long, user: Long, tpe: String = "view"): String =
    s"""{"event_id":$id,"ts":"2024-01-01T00:0$id:00Z","user_id":$user,"event_type":"$tpe","value":1.5,"props":"{}"}"""

  private def deliveredIds(streamDir: String): Seq[Long] =
    ShardFiles.read(streamDir).values.flatten
      .map { case (_, data) =>
        val s = new String(data, UTF_8)
        """"event_id":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
      }.toSeq

  test("pipeline decodes, quarantines, delivers, and resumes without dupes") {
    val bucket = tmpDir("bucket"); val stream = tmpDir("stream")
    val quarantine = tmpDir("quar"); val checkpoint = tmpDir("ckpt")

    writeLines(bucket, "obj-001.jsonl",
      (1L to 5L).map(i => eventJson(i, user = i % 3)) :+ "not json at all")

    val q1 = Pipeline.run(spark, bucket, stream, quarantine, checkpoint, numShards = 4)
    q1.awaitTermination()

    val ids1 = deliveredIds(stream)
    assert(ids1.sorted == (1L to 5L), s"delivered: $ids1")
    val quarFiles = new File(quarantine).listFiles().filter(_.getName.startsWith("batch="))
    val quarLines = quarFiles.flatMap(d => d.listFiles().filter(_.getName.endsWith(".txt")))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    assert(quarLines.toSeq == Seq("not json at all"))

    // restart with no new input: nothing re-delivered
    val q2 = Pipeline.run(spark, bucket, stream, quarantine, checkpoint, numShards = 4)
    q2.awaitTermination()
    assert(deliveredIds(stream).sorted == (1L to 5L))

    // new object arrives; restart processes ONLY the new file
    writeLines(bucket, "obj-002.jsonl", (6L to 8L).map(i => eventJson(i, user = i)))
    val q3 = Pipeline.run(spark, bucket, stream, quarantine, checkpoint, numShards = 4)
    q3.awaitTermination()
    val ids3 = deliveredIds(stream)
    assert(ids3.sorted == (1L to 8L), s"after resume: $ids3")
    assert(ids3.size == 8, "no duplicate deliveries across restarts")
  }

  test("runV2 delivers the pipeline through the DataSourceV2 connector sink") {
    val bucket = tmpDir("bucket_v2"); val stream = tmpDir("stream_v2")
    val checkpoint = tmpDir("ckpt_v2")
    writeLines(bucket, "obj-001.jsonl",
      (1L to 6L).map(i => eventJson(i, user = i % 4)) :+ "garbage line")
    val q = Pipeline.runV2(spark, bucket, stream, checkpoint, numShards = 3)
    q.awaitTermination()
    val ids = deliveredIds(stream)
    assert(ids.sorted == (1L to 6L), s"delivered: $ids")
    // routing law holds end-to-end: every record sits in its md5 shard
    ShardFiles.read(stream).foreach { case (shard, rs) =>
      rs.foreach { case (pk, _) =>
        assert(graft.pipeline.KinesisSink.shardFor(pk, 3) == shard)
      }
    }
    // restart with no new input: the checkpoint prevents re-delivery
    val q2 = Pipeline.runV2(spark, bucket, stream, checkpoint, numShards = 3)
    q2.awaitTermination()
    assert(deliveredIds(stream).sorted == (1L to 6L), "restart must not duplicate")
  }

  test("backfill replays an archive dir through the same sink path") {
    val bucket = tmpDir("bucket2"); val stream = tmpDir("stream2")
    writeLines(bucket, "archive.jsonl", (1L to 9L).map(i => eventJson(i, user = i % 2)))
    val n = Pipeline.backfill(spark, bucket, stream, numShards = 2, tag = "bf")
    assert(n == 9)
    assert(deliveredIds(stream).sorted == (1L to 9L))
  }
}
