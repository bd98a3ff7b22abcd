package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming operators (SURVEY.md §2.E) over the event schema. Each
  * function takes a (possibly streaming) DataFrame with columns
  * (event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
  * value: Double) and returns a transform that works identically on batch
  * DataFrames — which is how the specs assert exact results — and on
  * MemoryStream/file sources.
  */
object StreamOps {

  // E1: tumbling window aggregation.
  def tumblingCounts(events: DataFrame, width: String = "10 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total"))

  // E2: sliding window.
  def slidingCounts(events: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"), col("n"))

  // E3: session window (gap-based).
  def sessionCounts(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n"))

  // E4: watermarked tumbling agg — late rows beyond the watermark are
  // dropped from state (observable only on a real stream; specs drive it
  // with MemoryStream micro-batches).
  def watermarkedCounts(events: DataFrame, watermark: String = "10 minutes",
      width: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  // E5: streaming dedup by event_id within the watermark.
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  // E6: stream–static join (stream events enriched by a static dimension).
  def enrich(events: DataFrame, users: DataFrame): DataFrame =
    events.join(broadcast(users), col("user_id") === col("u_id"), "left")

  // E7: stream–stream join — purchases joined to the same user's clicks
  // within [-10 min, 0] (time-bounded condition keeps state finite).
  def purchaseAfterClick(events: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"))
  }

  // ---- E8: arbitrary stateful processing ------------------------------

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserSession(user_id: Long, n_events: Long, total_value: Double,
      last_ts: Long, closed: Boolean)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** E8 on the Spark 4 `transformWithState` API: per-user running totals
    * with typed ValueState, emitted in Update mode on every batch. Requires
    * the RocksDB state store provider (the 100 TB-scale store anyway —
    * incremental checkpoints, state larger than executor heap).
    */
  class RunningTotalsProcessor extends StatefulProcessor[Long, Ev, UserTotals] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserTotals](
        "totals", Encoders.product[UserTotals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[UserTotals] = {
      val prev = if (state.exists()) state.get() else UserTotals(key, 0L, 0.0)
      val next = rows.foldLeft(prev)((acc, e) =>
        acc.copy(n_events = acc.n_events + 1, total_value = acc.total_value + e.value))
      state.update(next)
      Iterator.single(next)
    }
  }

  /** Per-user running totals via transformWithState (Update mode). */
  def runningTotals(events: Dataset[Ev]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update(), Encoders.product[UserTotals])
  }

  // ---- streaming near-duplicate suppression (F2 × E8) -----------------

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)
  final case class KeyedDoc(bucket: Long, doc_id: Long, ts: Timestamp,
      text: String, sig: Seq[Long])
  final case class BucketState(sigs: List[(Long, Seq[Long])])

  /** Streaming near-duplicate suppression at ingest: each arriving doc's
    * MinHash signature is computed INLINE by the codegen `minhash_sig`
    * kernel (a per-row map — no shuffle added to the stream), the doc is
    * keyed by its first LSH band bucket, and flatMapGroupsWithState keeps
    * the signatures already admitted in that bucket; an arrival whose
    * estimated Jaccard vs any retained signature ≥ minEst is dropped.
    *
    * First-band-only keying = one state lookup per doc; recall is the
    * single-band collision probability (a full-recall variant fans out to
    * all bands and dedups survivors — the batch candidatePairs shape).
    * State is per-bucket and append-only here; production bounds it with
    * an event-time TTL (same pattern as sessionize's timeout) — noted
    * rather than wired so the spec stays deterministic.
    */
  def nearDupSuppress(docs: DataFrame, minEst: Double = 0.8): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val nPerms = graft.MinHash.NumPerms
    val bandRows = graft.MinHash.BandRows
    val keyed = docs
      .withColumn("sig",
        call_function("minhash_sig", col("text"), lit(nPerms), lit(graft.MinHash.GramLen)))
      .withColumn("bucket",
        xxhash64((lit(0) +: (0 until bandRows).map(r => col("sig").getItem(r))): _*))
      .select(col("bucket"), col("doc_id"), col("ts"), col("text"), col("sig"))
      .as[KeyedDoc]
    def est(a: Seq[Long], b: Seq[Long]): Double = {
      var m = 0; var i = 0
      while (i < a.length) { if (a(i) == b(i)) m += 1; i += 1 }
      m.toDouble / a.length
    }
    keyed.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, Doc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[KeyedDoc], state: GroupState[BucketState]) =>
          var seen = state.getOption.getOrElse(BucketState(Nil)).sigs
          val out = List.newBuilder[Doc]
          rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
            if (!seen.exists { case (_, s) => est(s, d.sig) >= minEst }) {
              seen = (d.doc_id, d.sig) :: seen
              out += Doc(d.doc_id, d.ts, d.text)
            }
          }
          state.update(BucketState(seen))
          out.result().iterator
      }
  }

  /** Per-user session accumulation with an event-time timeout: state
    * accumulates per key and is emitted (closed) once the watermark passes
    * the session gap — the reference's "scheduler + in-flight state"
    * reimplemented on flatMapGroupsWithState (SURVEY.md §2.E E8).
    * Event-time (not processing-time) timeouts keep the operator
    * deterministic and replayable — the 100 TB-scale property: a backfill
    * produces the same sessions as the live run.
    */
  def sessionize(events: Dataset[Ev], gapMillis: Long = 600000L,
      watermarkDelay: String = "0 seconds"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(s.copy(closed = true))
          } else {
            val prev = state.getOption.getOrElse(UserSession(uid, 0L, 0.0, 0L, closed = false))
            val next = rows.foldLeft(prev) { (acc, e) =>
              acc.copy(n_events = acc.n_events + 1,
                total_value = acc.total_value + e.value,
                last_ts = math.max(acc.last_ts, e.ts.getTime))
            }
            state.update(next)
            state.setTimeoutTimestamp(next.last_ts + gapMillis)
            Iterator.empty
          }
      }
  }
}
