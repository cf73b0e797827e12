package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the CDC event stream: the `readStream` →
  * transform → `writeStream` surface (watermarked windowed aggregation,
  * custom session state) that complements the foreachBatch MERGE pipeline.
  *
  * Scale notes: the windowed aggregation is the canonical streaming
  * shuffle — partial aggregation per micro-batch, state keyed by
  * (window, event_type) in the state store, watermark bounding state
  * growth. Sessionization keeps one small state row per active user and
  * emits sessions closed by the gap; event-time timeout expires idle
  * state, so memory is O(active users), not O(history). */
object StreamAggs {

  /** Tumbling 1-hour rollup per event type with a watermark bounding late
    * data and state. Same result shape as the batch `q_events_hourly`. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact-dedup guard for at-least-once sources: a redelivered
    * change event (same `event_id`) must land once, not twice — the
    * reference leans on BigQuery MERGE idempotence for this
    * (StreamBigqueryChangeConsumer upsert); a Spark-first pipeline drops
    * the duplicate in flight. `dropDuplicatesWithinWatermark` keeps one
    * row per id and expires its dedup state once the watermark passes —
    * state is O(events inside the watermark window), not O(history).
    * Batch frames take the plain `dropDuplicates` path.
    *
    * @param tsCol the event-time column the watermark rides on —
    *              parameterized like `idCols` (ADVICE r3: a hardcoded
    *              "ts" threw at analysis time for any frame keyed by a
    *              different event-time column). */
  def dedupEvents(events: DataFrame, idCols: Seq[String] = Seq("event_id"),
                  watermark: String = "30 minutes",
                  tsCol: String = "ts"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  /** Windowed corpus-quality monitor: per (window, source) document
    * counts, Gopher-gate pass counts and the pass RATE over a streaming
    * document feed — the live health dashboard of an ingest pipeline
    * (a sudden pass-rate drop on one source is the first symptom of a
    * scraper regression or an upstream format change).
    *
    * The gate is [[graft.llm.TextOps.gopherPassCol]] evaluated map-side
    * on each micro-batch; the only stateful operator is the canonical
    * watermarked windowed aggregation (state keyed by (window, source),
    * bounded by the watermark). Works identically on batch frames —
    * same plan minus the watermark — which is what the equality spec
    * pins. */
  def qualityMonitor(docs: DataFrame, tsCol: String = "ingest_ts",
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours",
                     minWords: Long = 50, maxWords: Long = 100000,
                     minStop: Int = 2): DataFrame =
    gateMonitor(docs,
      graft.llm.TextOps.gopherPassCol(minWords, maxWords, minStop),
      tsCol, windowLen, watermark)

  /** [[qualityMonitor]] generalized to ANY per-row gate predicate —
    * e.g. `!TextOps.textBlocklist` semantics via its blocked column, a
    * langid-confidence gate, or a composed one. The gate evaluates
    * map-side per micro-batch; the only stateful operator stays the
    * watermarked windowed aggregation. */
  def gateMonitor(docs: DataFrame, gate: org.apache.spark.sql.Column,
                  tsCol: String = "ingest_ts",
                  windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame = {
    val passed = when(gate, 1L).otherwise(0L)
    val src = if (docs.isStreaming) docs.withWatermark(tsCol, watermark)
              else docs
    src
      .groupBy(window(col(tsCol), windowLen).as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(passed).as("n_pass"))
      .select(col("w.start").as("window_start"), col("source"),
        col("n_docs"), col("n_pass"),
        (col("n_pass").cast("double") / col("n_docs")).as("pass_rate"))
  }

  /** Live change-mix monitor: per (window, op) change and delete counts
    * over a streaming CDC feed — the streaming twin of the batch
    * `cdc_op_mix` dashboard, watching for the same symptoms as it
    * happens: a delete-rate spike is an upstream purge heading for the
    * MERGE, a flood of `r` rows is a snapshot re-run. The envelope
    * flatten runs map-side per micro-batch; the only stateful operator
    * is the canonical watermarked windowed aggregation, state keyed by
    * (window, op) — ≤ 4 rows per window — and bounded by the watermark.
    *
    * The batch form's `op_share` deliberately stays OUT of the stream:
    * it would be a second stateful aggregation over the first's output
    * (a shape append-mode streaming handles poorly and dashboards
    * derive for free from the emitted counts); batch frames get the
    * same counts and can window the share downstream. */
  def opMixMonitor(events: DataFrame, windowLen: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    val flat = graft.cdc.Cdc.flatten(events)
    val src = if (flat.isStreaming) flat.withWatermark("ts", watermark)
              else flat
    src.groupBy(window(col("ts"), windowLen).as("w"), col("__op"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__deleted"), 1L).otherwise(0L)).as("n_deleted"))
      .select(col("w.start").as("hour"), col("__op"),
        col("n_events"), col("n_deleted"))
  }

  /** Driver query: the BATCH form of [[qualityMonitor]] over a
    * deterministic synthetic ingest timestamp (a 6-hour spread derived
    * from doc_id — documents carry no event time of their own). The
    * oracle replays the same gopher gate + hourly rollup in DuckDB;
    * streaming == batch is StreamAggsSpec's equality. */
  def corpusQualityMonitorQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .withColumn("ingest_ts",
        (lit(1704067200L) + col("doc_id") % 21600).cast("timestamp"))
    qualityMonitor(docs, minWords = 8, minStop = 1)
  }

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start_ms: Long, last_ms: Long, n_events: Long)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  val DefaultGapMs: Long = 30 * 60 * 1000L

  /** Session builder usable in BOTH batch and streaming:
    *  - batch (single invocation with the key's full history, no
    *    watermark): emits every session, including the final one — the
    *    input is complete, so the last session is closed by definition;
    *  - streaming (`flatMapGroupsWithState`, append mode, event-time
    *    timeout): emits sessions closed by the gap within or across
    *    micro-batches, holds the open session in state and flushes it when
    *    the watermark passes its timeout.
    */
  def sessionFunc(gapMs: Long)(
      userId: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.start_ms, s.last_ms, s.n_events))
    }
    // Streaming: flatMapGroupsWithState does NOT drop rows older than the
    // watermark — an un-dropped late event would (a) regress last_ms of the
    // open session and (b) produce a timeout timestamp <= the current
    // watermark, which Spark rejects (IllegalArgumentException → query
    // death). Drop them here; batch mode has no watermark (None → keep all).
    val wmOpt: Option[Long] =
      if (streamingWithWatermark(state)) Some(state.getCurrentWatermarkMs())
      else None
    val sorted = events.toSeq
      .filter(e => wmOpt.forall(e.ts.getTime >= _))
      .sortBy(_.ts.getTime)
    var cur = state.getOption
    val out = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val ms = e.ts.getTime
      cur match {
        case Some(s) if ms - s.last_ms <= gapMs =>
          // max(): state restored from a prior batch may already extend
          // past an in-batch event's timestamp
          cur = Some(SessionState(s.start_ms, math.max(s.last_ms, ms), s.n_events + 1))
        case Some(s) =>
          out += Session(userId, s.start_ms, s.last_ms, s.n_events)
          cur = Some(SessionState(ms, ms, 1))
        case None =>
          cur = Some(SessionState(ms, ms, 1))
      }
    }
    cur.foreach { s =>
      if (wmOpt.isDefined) {
        state.update(s)
        // the timeout must be strictly beyond the current watermark or
        // Spark throws; clamp covers state carried over from before a
        // watermark advance
        state.setTimeoutTimestamp(math.max(s.last_ms + gapMs, wmOpt.get + 1))
      } else {
        // batch execution: input is complete — close the final session
        out += Session(userId, s.start_ms, s.last_ms, s.n_events)
      }
    }
    out.result().iterator
  }

  /** Driver entry: the BATCH execution of [[sessionize]] — the full
    * session table (user, start/end epoch-ms, event count) from the
    * same `flatMapGroupsWithState` function the stream runs, executed
    * once per key over complete history. Oracle-checked: DuckDB
    * replays the gap rule as a cumulative-sum session id (ties at one
    * timestamp share a RANGE-framed window value, which is exactly the
    * sessionizer's behavior — same-instant events always co-session).
    * `q_user_sessions` stays the window-function per-user COUNT view;
    * this is the session-grain table itself, and StreamAggsSpec pins
    * the streaming path equal to this batch one. */
  def eventsSessionsQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts")).as[SessionEvent]
    sessionize(ev).toDF()
  }

  /** Event-time timeouts exist only in streaming execution with a
    * watermark; in batch, `getCurrentWatermarkMs` throws. */
  private def streamingWithWatermark(state: GroupState[_]): Boolean =
    try { state.getCurrentWatermarkMs(); true }
    catch { case _: UnsupportedOperationException => false }

  /** Sessionization with custom state: one state row per active user,
    * sessions appended as the gap (or the watermark) closes them. Works on
    * batch Datasets too (full-history invocation, see [[sessionFunc]]). */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long = DefaultGapMs,
                 watermark: String = "1 minute")
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val src = if (events.isStreaming) events.withWatermark("ts", watermark).as[SessionEvent]
              else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sessionFunc(gapMs))
  }
}
