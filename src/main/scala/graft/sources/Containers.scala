package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC-shaped container ingestion (round 20, VERDICT r19 item 3): real
  * crawls arrive as CONTAINER FILES holding many page records (WARC for
  * Common Crawl; the same shape as this engine's own .krf shard files),
  * not one file per page — so the A-layer needs a record splitter that
  * explodes a container into (doc_id, body) rows feeding the F58 HTML
  * front door. This is that splitter, batch AND streaming, over the
  * `binaryFile` file source (any Hadoop-visible store; the streaming
  * side rides the standard file-stream offset WAL, so kill/restart
  * resumes exactly-once like every other A4 source).
  *
  * PINNED RECORD CODEC (the KinesisSink .krf length-prefix pattern, one
  * level up): a container file is
  *
  *   magic "GCN1" (4 bytes) ·
  *   repeat { doc_id: i64 BE · body_len: i32 BE · body: bytes }
  *
  * Length-prefixing over boundary-delimiting is deliberate: bodies are
  * arbitrary bytes (HTML with any newline convention, media blobs), so
  * no in-band delimiter is safe, and the reader never scans — it seeks
  * record to record. The splitter FAILS LOUDLY on a wrong magic, a
  * negative/oversized length, or a truncated record (a half-written
  * container is a data-loss signal, not a skippable row — the B2
  * quarantine decision belongs to the caller, made per-FILE, not
  * silently per-record).
  *
  * Scale shape: one container file = one `binaryFile` row = one task's
  * in-memory split (containers are written at 100 MB–1 GB by the
  * producers this mirrors; `spark.sql.sources.binaryFile.maxLength`
  * guards the pathological case). The explode is a per-partition
  * flatMap — zero shuffle; downstream repartitioning is the consumer's
  * choice. Parallelism comes from the number of containers, which at
  * crawl scale is millions.
  */
object Containers {

  /** 4-byte container magic ("GCN1"). */
  val Magic: Array[Byte] = Array[Byte]('G', 'C', 'N', '1')

  /** Refuse single records above this (256 MiB): a longer length prefix
    * is far more likely a corrupt/foreign file than a real document. */
  val MaxRecordBytes: Int = 256 << 20

  /** The binaryFile source schema (explicit — the streaming side must
    * pass a schema; pinning it here keeps batch and stream identical). */
  val BinaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Split one container's bytes → (doc_id, body) records. Loud-failure
    * contract: wrong magic / bad length / truncation throw with the
    * container path and byte offset named. */
  private[graft] def split(path: String,
      bytes: Array[Byte]): Iterator[(Long, Array[Byte])] = {
    require(bytes.length >= 4 && bytes(0) == Magic(0) && bytes(1) == Magic(1)
        && bytes(2) == Magic(2) && bytes(3) == Magic(3),
      s"$path is not a graft container (missing GCN1 magic)")
    new Iterator[(Long, Array[Byte])] {
      private var off = 4
      override def hasNext: Boolean = off < bytes.length
      override def next(): (Long, Array[Byte]) = {
        require(off + 12 <= bytes.length,
          s"$path: truncated record header at byte $off")
        var id = 0L
        var i = 0
        while (i < 8) { id = (id << 8) | (bytes(off + i) & 0xffL); i += 1 }
        val len = ((bytes(off + 8) & 0xff) << 24) |
          ((bytes(off + 9) & 0xff) << 16) |
          ((bytes(off + 10) & 0xff) << 8) | (bytes(off + 11) & 0xff)
        require(len >= 0 && len <= MaxRecordBytes,
          s"$path: implausible record length $len at byte $off")
        require(off + 12 + len <= bytes.length,
          s"$path: truncated record body at byte $off (need $len bytes)")
        val body = java.util.Arrays.copyOfRange(bytes, off + 12, off + 12 + len)
        off += 12 + len
        (id, body)
      }
    }
  }

  /** The shared explode over any binaryFile-schema frame (batch or
    * stream): (container, mtime, doc_id, body). */
  private def explodeRecords(files: DataFrame): DataFrame = {
    val s = files.sparkSession
    import s.implicits._
    files.select(col("path"), col("modificationTime"), col("content"))
      .as[(String, java.sql.Timestamp, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, mtime, content) =>
        split(path, content).map { case (id, body) => (path, mtime, id, body) }
      })
      .toDF("container", "mtime", "doc_id", "body")
  }

  /** Batch read: every record of every container under `glob`. */
  def readContainers(spark: SparkSession, glob: String): DataFrame =
    explodeRecords(spark.read.format("binaryFile").load(glob))

  /** Streaming read (A4): watch `dir` for new containers; each arriving
    * file explodes into its records. Offsets checkpoint per FILE
    * through the standard file-stream WAL — a kill/restart re-delivers
    * whole files exactly-once, never partial splits. */
  def readContainerStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    explodeRecords(spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir))

  /** The (doc_id, ts, text) view [[graft.Graft.curateStream]] consumes —
    * bodies decoded as UTF-8 (the HTML/text-record case; media bodies
    * stay on the binary frame). */
  def pages(records: DataFrame): DataFrame =
    records.select(col("doc_id"), col("mtime").as("ts"),
      col("body").cast("string").as("text"))

  /** [[writeContainer]] resolving the filesystem through the SESSION's
    * Hadoop configuration (like [[graft.ModelIO]]) — the overload
    * driver-side callers should use: a session configured via
    * `spark.hadoop.*` (fs.defaultFS, S3A credentials) must write where
    * [[readContainers]] will later read. */
  def writeContainer(spark: SparkSession, path: String,
      records: Seq[(Long, Array[Byte])]): Unit =
    writeContainer(path, records, spark.sparkContext.hadoopConfiguration)

  /** Write one container file (the spec's round-trip witness; at scale
    * the PRODUCERS write containers — this engine's job is reading
    * them). Goes through the Hadoop filesystem API; NOTE the default
    * `conf` is a bare classpath `Configuration`, which does NOT see
    * `spark.hadoop.*` session settings — prefer the
    * [[writeContainer(spark:org\.apache\.spark\.sql\.SparkSession*]]
    * overload (or pass the session conf) anywhere a session exists.
    * Overwrites. */
  def writeContainer(path: String, records: Seq[(Long, Array[Byte])],
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(p, true)))
    try {
      out.write(Magic)
      records.foreach { case (id, body) =>
        out.writeLong(id); out.writeInt(body.length); out.write(body)
      }
    } finally out.close()
  }

  /** Distributed writer: pack a (doc_id, body) frame into container
    * files of ≤ `recordsPerFile` records under `dir` (one file per
    * output partition slice, named deterministically — a task retry
    * overwrites its own files idempotently) — the tooling a release
    * uses to hand a corpus BACK as containers. Writes through the
    * Hadoop FS with the session's configuration shipped to executors,
    * so `dir` may be any Hadoop-visible store. Returns the file
    * count. */
  def writeContainers(df: DataFrame, dir: String,
      recordsPerFile: Int = 10000): Long = {
    require(recordsPerFile > 0, s"recordsPerFile must be > 0, got $recordsPerFile")
    val s = df.sparkSession
    import s.implicits._
    // executors writing containers must see the SAME filesystem config
    // the driver resolved `dir` against, or a cluster run would scatter
    // files across worker-local disks; Spark's own serializable wrapper
    // ships it (a bare Configuration is not java-serializable)
    val shipped = new org.apache.spark.util.SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(shipped.value).mkdirs(dirPath)
    df.select(col("doc_id").cast("long"), col("body").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var fileIdx = 0
        it.grouped(recordsPerFile).map { group =>
          val f = new org.apache.hadoop.fs.Path(dir,
            f"part-$pid%05d-$fileIdx%05d.gcn")
          writeContainer(f.toString, group, shipped.value)
          fileIdx += 1
          group.size.toLong
        }
      }.toDF("n").agg(count(lit(1))).head().getLong(0)
  }
}
