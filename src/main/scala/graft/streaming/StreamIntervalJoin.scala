package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous interval-containment join — the streaming form of
  * [[graft.operators.IntervalJoin]], planned as Spark's NATIVE
  * watermarked stream-stream join (StreamingSymmetricHashJoin), the one
  * Structured Streaming join operator the rest of the streaming surface
  * (windowed aggs, `flatMapGroupsWithState` as-of/sessionization,
  * foreachBatch MERGE) does not exercise.
  *
  * A symmetric hash join wants an EQUALITY key; a bare range predicate
  * would be rejected. The batch operator's bin trick supplies it in
  * streaming unchanged: the point's time bin is its key, the interval
  * side explodes (a stateless projection — legal pre-join in streaming)
  * to every bin it covers, and each qualifying pair meets in exactly one
  * bin, so no post-join dedup. State is bounded two ways:
  *  - both sides carry a WATERMARK on their event-time column;
  *  - the join condition carries the range directly on those timestamp
  *    columns (`p_ts` ∈ [`i_start`, `i_start` + maxLen]) in the shape
  *    Spark's StreamingJoinHelper recognizes, so each side's state
  *    evicts as the other side's watermark passes — without it an inner
  *    stream-stream join runs but buffers BOTH streams forever.
  *
  * Intervals longer than `maxLen` are dropped (they would break the
  * eviction bound and explode without limit); `maxLen` is therefore both
  * the state horizon and the longest supported interval. Batch frames
  * pass through to the same plan minus watermarks, which is what the
  * streaming==batch spec pins against [[graft.operators.IntervalJoin]].
  *
  * Contract: column names of the two sides must be disjoint (alias
  * upstream), ends are exclusive (`[start, end)`) like the batch
  * operator's default.
  */
object StreamIntervalJoin {

  private val LBin = "__graft_slbin"
  private val RBin = "__graft_srbin"

  /** @param binMicros bin width in microseconds (default 15 min) — pick
    *                  ≈ the typical interval length, the batch rule
    * @param maxLen    SQL interval literal body (e.g. "1 HOUR"): state
    *                  horizon and maximum supported interval length
    * @param watermark how late either stream's rows may arrive */
  def join(points: DataFrame, pTs: String,
           intervals: DataFrame, iStart: String, iEnd: String,
           binMicros: Long = 15L * 60 * 1000 * 1000,
           maxLen: String = "1 HOUR",
           watermark: String = "1 minute"): DataFrame = {
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty, s"alias overlapping columns first: $overlap")
    require(binMicros > 0, "binMicros must be positive")

    val lt = unix_micros(col(pTs))
    val rs = unix_micros(col(iStart))
    val re = unix_micros(col(iEnd))
    val maxEnd = col(iStart) + expr(s"INTERVAL $maxLen")

    val p = (if (points.isStreaming) points.withWatermark(pTs, watermark)
             else points)
      .withColumn(LBin, floor(lt / binMicros))
    val i = {
      val bounded = intervals
        .filter(re > rs && col(iEnd) <= maxEnd)
      (if (bounded.isStreaming) bounded.withWatermark(iStart, watermark)
       else bounded)
        .withColumn(RBin,
          explode(sequence(floor(rs / binMicros), floor((re - 1) / binMicros))))
    }
    // the range rides the raw timestamp columns: `p_ts >= i_start` and
    // `p_ts <= i_start + maxLen` are the bounds StreamingJoinHelper
    // derives state watermarks from; `p_ts < i_end` is the exact
    // (sub-maxLen) predicate it cannot see but does not need to
    p.join(i,
        col(LBin) === col(RBin) &&
          col(pTs) >= col(iStart) && col(pTs) <= maxEnd &&
          col(pTs) < col(iEnd))
      .drop(LBin, RBin)
  }
}
