package graft.pipeline

import java.io.File
import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.KinesisShard
import KinesisSink.{KinesisRecord, MaxBytesPerRecord, MaxBytesPerRequest, MaxRecordsPerRequest}

/** DataSourceV2 connector surface for the Kinesis-semantics sink
  * (SURVEY.md §2.A A7, §7.3): `df.writeStream.format(<this class>)
  * .option("baseDir", …).option("numShards", …)` — the connector-API form
  * the reference's sink surface maps to, alongside the foreachBatch path
  * (`KinesisSink.deliver`) and the facade pipeline.
  *
  * Executor-side, each [[KinesisV2Writer]] routes rows with the same
  * codegen'd 128-bit MD5 math as the expression (`KinesisShard.route`),
  * accumulates at most ONE in-flight PutRecords batch per shard
  * (≤500 records / ≤5 MiB — flushed through `putWithRetry`, so the
  * per-record failure/backoff contract is identical to the batch sink),
  * and never holds more than numShards × 5 MiB regardless of partition
  * size. Re-delivery is idempotent per (epoch, partition): the writer
  * truncates its own `.krf` files on first touch, so a retried task
  * overwrites instead of duplicating — the same file-naming contract the
  * foreachBatch path uses.
  */
class KinesisTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisTableProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new KinesisTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = true
}

object KinesisTableProvider {
  val Schema: StructType = new StructType()
    .add("partitionKey", StringType, nullable = false)
    .add("data", BinaryType, nullable = false)
}

private[pipeline] class KinesisTable(properties: Map[String, String])
    extends Table with SupportsWrite {
  override def name(): String =
    s"kinesis-emulated(${properties.getOrElse("basedir", "?")})"
  override def schema(): StructType = KinesisTableProvider.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val opts = info.options()
    val baseDir = Option(opts.get("baseDir")).getOrElse(
      throw new IllegalArgumentException("kinesis sink requires option 'baseDir'"))
    val numShards = Option(opts.get("numShards")).map(_.toInt).getOrElse(
      throw new IllegalArgumentException("kinesis sink requires option 'numShards'"))
    val schema = info.schema()
    val pkIdx = schema.fieldIndex("partitionKey")
    val dataIdx = schema.fieldIndex("data")
    require(schema(pkIdx).dataType == StringType && schema(dataIdx).dataType == BinaryType,
      s"kinesis sink needs (partitionKey: string, data: binary), got ${schema.catalogString}")
    // ingress pacing (off unless asked for): either option enables the
    // per-shard token bucket; an omitted limit falls back to the public
    // Kinesis shard default
    val recPerSec = Option(opts.get("throttleRecordsPerSec")).map(_.toInt)
    val bytesPerSec = Option(opts.get("throttleBytesPerSec")).map(_.toLong)
    val throttle: Option[(Int, Long)] =
      if (recPerSec.isEmpty && bytesPerSec.isEmpty) None
      else Some((recPerSec.getOrElse(KinesisSink.ShardRecordsPerSec),
        bytesPerSec.getOrElse(KinesisSink.ShardBytesPerSec)))
    // round-6 ADVICE #3: resident throttle buckets lived for the executor
    // JVM with nothing evicting them, so ephemeral streams leaked one
    // bucket per (baseDir, shard). Watch this query and drop the scope
    // when it terminates.
    if (throttle.isDefined)
      ThrottleJanitor.watch(org.apache.spark.sql.SparkSession.active,
        info.queryId(), baseDir)
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new KinesisStreamingWrite(baseDir, numShards, pkIdx, dataIdx, throttle)
      }
    }
  }
}

/** Evicts a stream's resident throttle scope when the stream terminates.
  *
  * The DataSourceV2 streaming write API has no end-of-stream hook (commit/
  * abort are per-EPOCH, and evicting there would hand every micro-batch a
  * fresh full bucket — the exact free-burst bug the resident registry
  * exists to prevent), so teardown rides the SparkContext's shared
  * listener bus: one SparkListener per context, a watch table from query
  * id/runId to throttle scope, eviction on QueryTerminatedEvent (clean
  * stop AND failure). NOT a per-session StreamingQueryListener — the
  * write builder runs on the stream's CLONED session, whose
  * StreamingQueryManager filters events down to queries it started
  * (none), so a listener registered there never hears the termination.
  *
  * Scope of the guarantee: the listener runs on the DRIVER, so it empties
  * this JVM's registry — exact in local deployments (the test/bench
  * environment) and for any `deliver`/foreachBatch caller. On a multi-node
  * cluster, executor-side registries are untouched by the driver; their
  * entries are bounded-stale rather than harmful — a bucket idle longer
  * than its debt horizon (≤ 5 s at default rates: one 5 MiB overdraw at
  * 1 MiB/s, plus 1 s of refill) is indistinguishable from a fresh one, so
  * a leaked bucket costs only its map entry (~100 bytes per (baseDir,
  * shard)). Callers cycling MANY throttled scopes through long-lived
  * executors should reuse scope names or call
  * `ShardThrottle.evictScope` from a cleanup task of their own.
  */
private[pipeline] object ThrottleJanitor {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent

  // query id/runId (either may match the write's queryId) → throttle scope
  private val watched = new java.util.concurrent.ConcurrentHashMap[String, String]()
  // one listener per context; weak keys so a stopped context unpins it
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, Boolean]())

  def watch(spark: SparkSession, queryId: String, baseDir: String): Unit = {
    watched.put(queryId, baseDir)
    val sc = spark.sparkContext
    installed.synchronized {
      if (!installed.containsKey(sc)) {
        sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onOtherEvent(
              event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
            event match {
              case e: QueryTerminatedEvent =>
                Seq(e.id.toString, e.runId.toString).foreach { k =>
                  val scope = watched.remove(k)
                  // evict only when NO other live watched query shares the
                  // scope: two concurrent streams writing the same baseDir
                  // share its buckets, and the first termination evicting
                  // them would hand the survivor a fresh full bucket — the
                  // free-burst bug the resident registry exists to prevent.
                  // The listener bus delivers events serially, so the
                  // check-then-evict pair cannot interleave with another
                  // termination; containsValue is O(watched), which is
                  // tiny (one entry per live throttled query).
                  if (scope != null && !watched.containsValue(scope))
                    KinesisSink.ShardThrottle.evictScope(scope)
                }
              case _ => ()
            }
        })
        installed.put(sc, true)
      }
    }
  }
}

private[pipeline] class KinesisStreamingWrite(baseDir: String, numShards: Int,
    pkIdx: Int, dataIdx: Int, throttle: Option[(Int, Long)]) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    KinesisWriterFactory(baseDir, numShards, pkIdx, dataIdx, throttle)
  // per-record delivery already happened (and retried) in the writers;
  // the epoch commit is the offset-log barrier Structured Streaming owns
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

/** Ships to executors — plain fields only. */
private[pipeline] final case class KinesisWriterFactory(baseDir: String,
    numShards: Int, pkIdx: Int, dataIdx: Int,
    throttle: Option[(Int, Long)]) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new KinesisV2Writer(baseDir, numShards, pkIdx, dataIdx,
      s"e$epochId-p$partitionId", throttle)
}

private[pipeline] final case class KinesisCommit(records: Long) extends WriterCommitMessage

private[pipeline] class KinesisV2Writer(baseDir: String, numShards: Int,
    pkIdx: Int, dataIdx: Int, fileTag: String,
    throttle: Option[(Int, Long)] = None) extends DataWriter[InternalRow] {

  private val pending = Array.fill(numShards)(mutable.ArrayBuffer.empty[KinesisRecord])
  private val pendingBytes = new Array[Long](numShards)
  private val clients = mutable.Map.empty[Int, KinesisSink.DirectoryClient]
  private var total = 0L

  private def clientFor(shard: Int): KinesisSink.DirectoryClient =
    clients.getOrElseUpdate(shard, {
      // idempotent task retry: truncate this writer's file before the
      // first append so a re-run overwrites instead of duplicating
      val f = new File(new File(baseDir, s"shard=$shard"), s"$fileTag.krf")
      if (f.exists()) f.delete()
      new KinesisSink.DirectoryClient(baseDir, fileTag)
    })

  // EXECUTOR-RESIDENT bucket, keyed by (stream baseDir, shard): this
  // writer object is re-created every task and epoch, so holding the
  // bucket here would reset the balance each micro-batch and grant one
  // free burst per epoch — the foreachBatch path's round-4 advisor bug,
  // avoided in the connector from the start. Specs pre-seed the registry
  // with fake-clock instances via ShardThrottle.register.
  private def throttleFor(shard: Int): Option[KinesisSink.ShardThrottle] =
    throttle.map { case (rps, bps) =>
      KinesisSink.ShardThrottle.resident(baseDir, shard, rps, bps)
    }

  private def flush(shard: Int): Unit = if (pending(shard).nonEmpty) {
    val t = throttleFor(shard)
    // pace BEFORE submitting; retried subsets are re-charged inside
    t.foreach(_.acquire(pending(shard).size, pendingBytes(shard)))
    KinesisSink.putWithRetry(clientFor(shard), shard, pending(shard).toSeq,
      throttle = t)
    pending(shard).clear()
    pendingBytes(shard) = 0L
  }

  override def write(row: InternalRow): Unit = {
    val pk = row.getUTF8String(pkIdx)
    val data = row.getBinary(dataIdx)
    val shard = KinesisShard.route(pk, numShards)
    val sz = data.length.toLong + pk.numBytes()
    require(sz <= MaxBytesPerRecord,
      s"record for key $pk exceeds 1 MiB ($sz bytes)")
    if (pending(shard).size + 1 > MaxRecordsPerRequest ||
        pendingBytes(shard) + sz > MaxBytesPerRequest) flush(shard)
    pending(shard) += KinesisRecord(pk.toString, data)
    pendingBytes(shard) += sz
    total += 1
  }

  override def commit(): WriterCommitMessage = {
    (0 until numShards).foreach(flush)
    KinesisCommit(total)
  }
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
