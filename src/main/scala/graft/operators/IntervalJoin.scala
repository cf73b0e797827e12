package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval (range-containment) join: each left row with instant `t`
  * pairs with every right row whose interval `[start, end)` contains it.
  *
  * Spark plans a bare `t >= start AND t < end` join with NO equi-key as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) work and a broadcast of a whole
  * side, which is exactly the plan that dies at 100 TB. The scale path is
  * the classic bin-overlap technique (used by interval-join
  * implementations in streaming engines and genomics joins alike):
  *
  *  1. quantize time into fixed-width bins;
  *  2. a left instant belongs to exactly ONE bin; a right interval is
  *     exploded to EVERY bin it overlaps (⌈len/width⌉ + 1 rows at most);
  *  3. equi-join on the bin id — a plain shuffled hash/sort-merge join —
  *     then re-check the exact range predicate.
  *
  * Each qualifying (left, right) pair meets in exactly one bin (the
  * left row's), so no post-join dedup is needed. Choosing `binMicros` ≈
  * the typical interval length keeps the explosion factor ~2 while
  * keeping bins selective; AQE handles residual bin skew (busy hours)
  * like any other shuffle-key skew, and a salted variant would compose
  * the same way `AsofJoin.asofSalted` does.
  *
  * Contract: column names of `left` and `right` must be disjoint (alias
  * upstream, as the `eventsIntervalJoinQ` wrapper does); intervals with
  * `end <= start` (empty under the exclusive-end semantics) are dropped
  * before the explode — `sequence()` would otherwise walk BACKWARD and
  * fabricate bins.
  */
object IntervalJoin {

  private val LBin = "__graft_lbin"
  private val RBin = "__graft_rbin"
  private val LSalt = "__graft_lsalt"
  private val RSalt = "__graft_rsalt"

  /** @param lTimeCol    event-time column of `left` (timestamp)
    * @param rStartCol   interval start column of `right` (timestamp)
    * @param rEndCol     interval end column of `right` (timestamp)
    * @param binMicros   bin width in microseconds (default 15 min)
    * @param endInclusive `[start, end]` instead of `[start, end)` */
  def join(left: DataFrame, lTimeCol: String,
           right: DataFrame, rStartCol: String, rEndCol: String,
           binMicros: Long = 15L * 60 * 1000 * 1000,
           endInclusive: Boolean = false): DataFrame = {
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty, s"alias overlapping columns first: $overlap")
    require(binMicros > 0, "binMicros must be positive")

    val lt = unix_micros(col(lTimeCol))
    val rs = unix_micros(col(rStartCol))
    val re = unix_micros(col(rEndCol))

    val l = left.withColumn(LBin, floor(lt / binMicros))
    // Last covered bin: the one holding the interval's greatest member —
    // `end` itself when inclusive, the microsecond before when exclusive.
    val lastBin = floor((if (endInclusive) re else re - 1) / binMicros)
    val r = right
      .filter(if (endInclusive) re >= rs else re > rs)
      .withColumn(RBin, explode(sequence(floor(rs / binMicros), lastBin)))

    val rangeOk =
      if (endInclusive) lt >= rs && lt <= re
      else lt >= rs && lt < re
    l.join(r, col(LBin) === col(RBin) && rangeOk)
      .drop(LBin, RBin)
  }

  /** Skew-hardened variant: a "hot bin" (an incident storm, a busy hour)
    * concentrates one shuffle partition the same way a hot join key does.
    * The standard salting trade applies cleanly here because the interval
    * side is ALREADY replicated per bin: left rows scatter across
    * `salts` sub-keys of their bin (by a high-cardinality hash — pass
    * `saltOn` when left timestamps themselves repeat heavily), and the
    * interval side's bin rows replicate `salts`× more. Join work and
    * results are identical; the hot bin's probe rows now spread over
    * `salts` partitions. Proven equal to [[join]] at several salt counts
    * (IntervalJoinSpec); measured 2.6× faster than [[join]] on a 4M-row
    * hot bin over 32 cores — with AQE skew-join ON or OFF alike, because
    * AQE only splits partitions past its 256 MB byte threshold while a
    * hot bin serializes long before that (SkewSmoke). */
  def joinSalted(left: DataFrame, lTimeCol: String,
                 right: DataFrame, rStartCol: String, rEndCol: String,
                 binMicros: Long = 15L * 60 * 1000 * 1000,
                 endInclusive: Boolean = false,
                 salts: Int = 8,
                 saltOn: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty, s"alias overlapping columns first: $overlap")
    require(salts > 0, "salts must be positive")

    val lt = unix_micros(col(lTimeCol))
    val rs = unix_micros(col(rStartCol))
    val re = unix_micros(col(rEndCol))
    val lSalt = pmod(saltOn.getOrElse(xxhash64(col(lTimeCol))), lit(salts.toLong))

    val l = left.withColumn(LBin, floor(lt / binMicros))
      .withColumn(LSalt, lSalt)
    val lastBin = floor((if (endInclusive) re else re - 1) / binMicros)
    val r = right
      .filter(if (endInclusive) re >= rs else re > rs)
      .withColumn(RBin, explode(sequence(floor(rs / binMicros), lastBin)))
      .withColumn(RSalt, explode(sequence(lit(0L), lit(salts - 1L))))

    val rangeOk =
      if (endInclusive) lt >= rs && lt <= re
      else lt >= rs && lt < re
    l.join(r, col(LBin) === col(RBin) && col(LSalt) === col(RSalt) && rangeOk)
      .drop(LBin, RBin, LSalt, RSalt)
  }

  /** Driver entry: purchases inside 15-minute incident windows opened by
    * error events — (purchase, incident) pairs. Bin width = window length,
    * so each incident explodes to exactly 2 bins. Reference-shape note:
    * the reference's BQ surface expresses this as a raw inequality join
    * (`p.ts BETWEEN e.ts AND e.ts + 15m`) and lets the warehouse cope;
    * here the bin equi-key keeps the plan shuffle-based at any scale. */
  def eventsIntervalJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("ts").as("i_start"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("i_end"))
    join(purchases, "p_ts", incidents, "i_start", "i_end")
      .select("purchase_id", "incident_id")
  }
}
