package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the continuous form of
  * [[graft.operators.AsofJoin]]: each left event (purchase) is enriched
  * with the latest strictly-earlier right event (click) of the same key,
  * as the stream flows, with the "latest right so far" carried in
  * per-key state across micro-batches.
  *
  * This is the state shape of a Flink temporal join re-expressed as
  * `flatMapGroupsWithState`: state per key is ONE row (the best right
  * event seen), so memory is O(active keys) — not O(history), not
  * O(window). No timeout expires it: unlike a session, the last click
  * stays relevant indefinitely (callers with bounded key lifetimes can
  * down-stream filter).
  *
  * Ordering contract: events are processed in event-time order WITHIN
  * each micro-batch (left before right at equal timestamps — the strict
  * semantics of [[graft.operators.AsofJoin.asof]]); a right event
  * arriving in a LATER batch than a left event it precedes in event time
  * cannot retro-enrich it (the enriched row was already emitted —
  * append-mode streaming has no retractions). Per-key in-order delivery
  * across batches, the CDC-source contract, makes streaming output equal
  * batch output; rows behind the watermark are dropped like
  * [[StreamAggs.sessionFunc]] does. */
object StreamAsof {

  case class EnrichEvent(user_id: Long, ts: java.sql.Timestamp,
                         event_id: Long, event_type: String, value: Double)
  case class LastRight(ts_ms: Long, id: Long)
  case class Enriched(event_id: Long, user_id: Long, ts_ms: Long,
                      value: Double, click_event_id: Long)

  /** Per-key enrichment: lefts emit with the stateful latest right;
    * rights advance the state. Shared by batch and streaming execution
    * (same dual-mode pattern as [[StreamAggs.sessionFunc]]). */
  def enrichFunc(leftType: String, rightType: String)(
      userId: Long, events: Iterator[EnrichEvent],
      state: GroupState[LastRight]): Iterator[Enriched] = {
    val wmOpt: Option[Long] =
      try Some(state.getCurrentWatermarkMs())
      catch { case _: UnsupportedOperationException => None }
    // event-time order; lefts BEFORE rights at equal ts = strict as-of
    val sorted = events.toSeq
      .filter(e => wmOpt.forall(e.ts.getTime >= _))
      .sortBy(e => (e.ts.getTime, if (e.event_type == leftType) 0 else 1,
        e.event_id))
    var last = state.getOption
    val out = Seq.newBuilder[Enriched]
    sorted.foreach { e =>
      val ms = e.ts.getTime
      e.event_type match {
        case t if t == leftType =>
          val click = last.filter(_.ts_ms < ms).map(_.id).getOrElse(-1L)
          out += Enriched(e.event_id, userId, ms, e.value, click)
        case t if t == rightType =>
          // keep the max (ts, id) — state from a prior batch may already
          // be ahead of an in-batch right (out-of-order delivery)
          if (last.forall(s =>
              s.ts_ms < ms || (s.ts_ms == ms && s.id < e.event_id)))
            last = Some(LastRight(ms, e.event_id))
        case _ => ()
      }
    }
    last.foreach(state.update)
    out.result().iterator
  }

  /** Enrich a (batch or streaming) event Dataset: `leftType` rows emit
    * with the latest strictly-earlier `rightType` row's id per user. */
  def enrich(events: Dataset[EnrichEvent],
             leftType: String = "purchase", rightType: String = "click",
             watermark: String = "1 minute")
            (implicit spark: SparkSession): Dataset[Enriched] = {
    import spark.implicits._
    val src =
      if (events.isStreaming)
        events.withWatermark("ts", watermark).as[EnrichEvent]
      else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastRight, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        enrichFunc(leftType, rightType))
  }
}
