package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The reference ETL surface (SURVEY.md §2.A/§2.B, §3.4) as one Structured
  * Streaming query: a watched directory stands in for the S3 bucket, the
  * Kinesis-semantics sink for the stream, and the reference's scheduler /
  * checkpoint / retry logic maps onto triggers, the offset WAL, and the
  * sink's in-executor retry loop.
  *
  *   dir list (A4, maxFilesPerTrigger = batch-size knob)
  *     → decode JSON lines (B1) → validate/quarantine (B2)
  *     → partition-key assignment (B3)
  *     → shard routing + batching + retry (B4–B6, in KinesisSink)
  *   checkpointed (B7), scheduled by Trigger (B8), metered (B9).
  */
object Pipeline {

  /** Raw event schema as it appears in the source JSON-lines files
    * ("S3 objects"): ts is ISO-8601 text at this layer.
    */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** A4 + B1: watch a directory of JSON-lines files. Reading as `text`
    * first keeps malformed lines (from_json yields null) so B2 can
    * quarantine instead of silently dropping.
    */
  def fileSource(spark: SparkSession, bucketDir: String, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(bucketDir)
      .select(col("value").as("raw"),
        from_json(col("value"), rawEventSchema).as("ev"))

  /** B2: split decoded vs quarantined. A record is valid when the JSON
    * parsed and carries the required identity fields.
    */
  def validFilter = col("ev").isNotNull &&
    col("ev.event_id").isNotNull && col("ev.user_id").isNotNull

  def decoded(src: DataFrame): DataFrame =
    src.filter(validFilter).select(
      col("ev.event_id").as("event_id"),
      to_timestamp(col("ev.ts")).as("ts"),
      col("ev.user_id").as("user_id"),
      col("ev.event_type").as("event_type"),
      col("ev.value").as("value"),
      col("ev.props").as("props"))

  def quarantined(src: DataFrame): DataFrame =
    src.filter(!validFilter).select(col("raw"))

  /** B3: partition-key assignment — user_id keys the stream so one user's
    * events land in one shard (ordering per key, the Kinesis contract).
    */
  def withPartitionKey(events: DataFrame): DataFrame =
    events
      .withColumn("partitionKey", col("user_id").cast("string"))
      .withColumn("data", to_json(struct(
        col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))).cast("binary"))

  /** E10: the whole pipeline, exactly-once across restarts: the streaming
    * checkpoint (offset WAL + commit log) replays an unfinished batch, and
    * the sink's batchId-tagged files make re-delivery overwrite, not
    * append-duplicate.
    */
  def run(
      spark: SparkSession,
      bucketDir: String,
      streamDir: String,
      quarantineDir: String,
      checkpointDir: String,
      numShards: Int = 4,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 10): StreamingQuery = {
    val src = fileSource(spark, bucketDir, maxFilesPerTrigger)
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          quarantined(b).write.mode("overwrite")
            .text(s"$quarantineDir/batch=$batchId")
          val keyed = withPartitionKey(decoded(b))
          KinesisSink.deliver(keyed, numShards,
            (shard, tag) => new KinesisSink.DirectoryClient(streamDir, tag),
            fileTag = s"b$batchId")
        } finally { b.unpersist(); () }
      }
      .start()
  }

  /** The same pipeline on the DataSourceV2 connector sink — `writeStream
    * .format(...)` end to end, no foreachBatch: offsets checkpoint through
    * the standard WAL and the V2 writers' epoch-tagged files keep
    * re-delivery idempotent. One streaming query carries decode → validate
    * → key → route; quarantine (a second sink) runs as its own query over
    * the same source when needed — V2 queries are single-sink by design.
    */
  def runV2(
      spark: SparkSession,
      bucketDir: String,
      streamDir: String,
      checkpointDir: String,
      numShards: Int = 4,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 10): StreamingQuery =
    withPartitionKey(decoded(fileSource(spark, bucketDir, maxFilesPerTrigger)))
      .select(col("partitionKey"), col("data"))
      .writeStream
      .format(classOf[KinesisTableProvider].getName)
      .option("checkpointLocation", checkpointDir)
      .option("baseDir", streamDir)
      .option("numShards", numShards.toString)
      .trigger(trigger)
      .start()

  /** B10: replay/backfill — batch-read the archive ("bucket") dir and push
    * through the same decode → key → sink path, no streaming machinery.
    */
  def backfill(spark: SparkSession, bucketDir: String, streamDir: String,
      numShards: Int = 4, tag: String = "backfill"): Long = {
    val src = spark.read.text(bucketDir)
      .select(col("value").as("raw"), from_json(col("value"), rawEventSchema).as("ev"))
    val keyed = withPartitionKey(decoded(src))
    val n = keyed.count()
    KinesisSink.deliver(keyed, numShards,
      (shard, t) => new KinesisSink.DirectoryClient(streamDir, t), fileTag = tag)
    n
  }
}
