package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
    * with the latest strictly-earlier `rightType` row's id per user.
    * The single-stream, concretely-typed demo shape; the general
    * operator is [[enrichFrame]]. */
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

  /** The GENERAL streaming as-of — [[graft.operators.AsofJoin.asof]]'s
    * signature (arbitrary key columns, timestamp columns, right payload,
    * strictness, tolerance, right tie column) over batch OR streaming
    * frames, with per-key state = ONE row (the best right payload seen).
    * Output matches the batch operator: every left row exactly once with
    * its original columns plus `<rightPrefix>_<col>` payload columns
    * (null where nothing qualifies).
    *
    * Shape: union-tag both frames — the same (ts, side, tie) encoding as
    * the batch window, so equal-timestamp visibility is decided by sort
    * position within a batch — then `flatMapGroupsWithState` keyed by
    * the key columns, with Row encoders supplied from the schemas (no
    * case classes: this is what makes the operator generic). Strictness
    * against state carried from PRIOR batches is re-checked explicitly
    * (an equal-ts right from an earlier batch is in state but must stay
    * invisible to a strict left).
    *
    * Same ordering contract as [[enrich]]: per-key event-time-ordered
    * delivery across batches makes streaming output equal batch output;
    * late rows behind the watermark are dropped. */
  def enrichFrame(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTs: String, rightTs: String, rightCols: Seq[String],
                  rightPrefix: String = "r", strict: Boolean = true,
                  toleranceSec: Option[Long] = None,
                  rightTieCol: Option[String] = None,
                  watermark: String = "1 minute"): DataFrame = {
    val keys = keyCols.map(col)
    // side ordering at equal ts encodes strictness, exactly as the batch
    // window does: strict → rights sort AFTER lefts (invisible to them),
    // inclusive → before
    val (rightSide, leftSide) = if (strict) (2, 1) else (0, 1)
    val rpay = struct(col(rightTs).cast("long").as("__rts") +:
      rightCols.map(c => col(c).as(c)): _*)
    val lpay = struct(left.columns.map(col): _*)
    val rpayType = right.select(rpay).schema.head.dataType
    val lpayType = left.select(lpay).schema.head.dataType
    val tie = rightTieCol.map(c => col(c).cast("long"))
      .getOrElse(xxhash64(rpay))
    val r = right.select(keys :+ col(rightTs).as("__ts") :+
      lit(rightSide).as("__side") :+ rpay.as("__rpay") :+
      lit(null).cast(lpayType).as("__lpay") :+ tie.as("__tie"): _*)
    val l = left.select(keys :+ col(leftTs).as("__ts") :+
      lit(leftSide).as("__side") :+ lit(null).cast(rpayType).as("__rpay") :+
      lpay.as("__lpay") :+ lit(null).cast("long").as("__tie"): _*)
    val union = l.unionByName(r)
    val tagged =
      if (union.isStreaming) union.withWatermark("__ts", watermark) else union
    val nKeys = keyCols.size
    val keySchema = StructType(tagged.schema.fields.take(nKeys))
    val stateSchema = StructType(Seq(
      StructField("ts_ms", LongType, nullable = false),
      StructField("tie", LongType, nullable = false),
      StructField("rpay", rpayType, nullable = true)))
    val outSchema = StructType(
      left.schema.fields ++ rightCols.map { c =>
        val f = right.schema(c)
        StructField(s"${rightPrefix}_${f.name}", f.dataType, nullable = true)
      })
    val nRight = rightCols.size
    val tolMs = toleranceSec.map(_ * 1000L)
    val func = (key: Row, rows: Iterator[Row], state: GroupState[Row]) => {
      val wmOpt: Option[Long] =
        try Some(state.getCurrentWatermarkMs())
        catch { case _: UnsupportedOperationException => None }
      val iTs = nKeys; val iSide = nKeys + 1; val iRpay = nKeys + 2
      val iLpay = nKeys + 3; val iTie = nKeys + 4
      def ms(row: Row): Long = row.getTimestamp(iTs).getTime
      val sorted = rows.toSeq
        .filter(e => wmOpt.forall(ms(e) >= _))
        .sortBy(e => (ms(e), e.getInt(iSide),
          if (e.isNullAt(iTie)) Long.MinValue else e.getLong(iTie)))
      var last: Option[Row] = state.getOption
      val out = Seq.newBuilder[Row]
      sorted.foreach { e =>
        val t = ms(e)
        if (e.getInt(iSide) == leftSide) {
          // strictness + tolerance re-checked against cross-batch state
          val m = last.filter { s =>
            val st = s.getLong(0)
            (if (strict) st < t else st <= t) &&
              tolMs.forall(t - st <= _)
          }.map(_.getStruct(2))
          val lrow = e.getStruct(iLpay)
          out += Row.fromSeq(lrow.toSeq ++
            (0 until nRight).map(i => m.map(_.get(i + 1)).orNull))
        } else {
          val t2 = if (e.isNullAt(iTie)) Long.MinValue else e.getLong(iTie)
          if (last.forall(s => s.getLong(0) < t ||
              (s.getLong(0) == t && s.getLong(1) < t2)))
            last = Some(Row(t, t2, e.getStruct(iRpay)))
        }
      }
      last.foreach(state.update)
      out.result().iterator
    }
    tagged.groupByKey((row: Row) =>
        Row.fromSeq((0 until nKeys).map(row.get)))(Encoders.row(keySchema))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(func)(
        Encoders.row(stateSchema), Encoders.row(outSchema))
  }
}
