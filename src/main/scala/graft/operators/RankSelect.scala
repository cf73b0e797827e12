package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT order-statistic selection — the rank-r row of a
  * group without ever sorting the group in one task.
  *
  * The repo's selected-row convention (rank = (n+1) div 2 over a total
  * order, never interpolated — engine-identical by construction) was
  * implemented until r13 as `row_number().over(partitionBy(group)
  * .orderBy(...))`: correct, but a window partition is ONE task, so a
  * 5-group corpus sorts n/5 rows per task — the one plan the r13
  * verdict marked as the remaining 100 TB scale-killer
  * (events_value_outliers ran TWO such sorts). This operator replaces
  * the sort with the classic two-pass histogram selection (the
  * distributed median-finding folklore that underlies e.g. MapReduce
  * order-statistics jobs): locate the rank's bucket with a bounded
  * histogram, then resolve the exact value inside the one touched
  * bucket. Every shuffle is a map-side-combinable aggregate and every
  * window partition is DIMENSION-bounded: the histogram prefix by the
  * ≤ `buckets`² occupied bins, the final selection by the occupancy of
  * a single fine bin (~n/buckets² for spread values — r15; for heavily
  * tied values the in-bin frame first collapses to DISTINCT values, so
  * ties never inflate a partition).
  *
  * Pass structure (per call):
  *   0. per-group extent `(min, max)` of the value's double image —
  *      one map-side-combined aggregate, |groups| rows, broadcast;
  *   1. ONE per-(group, bin) count histogram over monotone linear
  *      binning of the double image at `buckets`² granularity —
  *      map-side-combined, ≤ `buckets`² occupied bins per group
  *      (dimension-bounded at any corpus size, ~16 MB worst case); a
  *      running sum over the occupied bins locates each target rank's
  *      bin and its residual rank by prefix sum (r15: the r14
  *      `buckets`-level histogram left ~n/buckets DISTINCT values in
  *      the final window on continuous domains);
  *   2. rows of the ONE located bin per (group, rank) collapse to
  *      per-distinct-value counts (map-side-combined); a running sum
  *      over the collapsed frame (window partitions ≈ n/buckets²
  *      distinct values) selects the exact value covering the residual.
  *
  * The double cast used for binning only needs to be monotone
  * NON-STRICTLY (collisions share a bucket, they never invert order),
  * which holds for every numeric, DECIMAL and timestamp type; the
  * selection itself compares the ORIGINAL values, so the result is
  * exact even where the double image collapses (longs above 2^53).
  * Values must be non-NULL and finite — callers filter NULLs up front
  * (the r13 NULL-ordering lesson: Spark ranks NULLS FIRST, DuckDB
  * LAST, so selected-row constructions exclude NULLs on both engines).
  *
  * `ranksOf` maps the group's row count n to an ARRAY of 1-based
  * target ranks (a handful per group — medians, ntile boundaries,
  * p95s); each output row is labeled with its position `__ridx` in
  * that array. Out-of-range ranks (< 1 or > n) yield no row.
  */
object RankSelect {

  /** rank = (n+1) div 2 — the repo's lower-median convention. The same
    * function serves the WEIGHTED selection ([[selectValuesWeighted]]),
    * where n is the group's total weight and the rank is in weight
    * units — the lower median of the weight-expanded multiset. */
  val lowMedian: Column => Column =
    n => array(((n + lit(1L)) / lit(2L)).cast("long"))

  private def joinG(big: DataFrame, small: DataFrame,
                    groups: Seq[String]): DataFrame =
    if (groups.isEmpty) big.crossJoin(broadcast(small))
    else big.join(broadcast(small), groups)

  /** Per-group (double-image bound, count) frame: groups ++ (__vmin,
    * __vmax, __n) — ONE map-side-combined pass, materialized (it is
    * |groups| rows referenced by several downstream subplans; without
    * the cut each reference would re-run the scan). Callers that can
    * DERIVE bounds analytically (events_value_outliers bounds the
    * deviation pass from the value pass's extent and the median — no
    * second extent scan) pass their own frame to [[selectValues]];
    * bounds only need to CONTAIN the values, not be tight. */
  def statsFor(df: DataFrame, groups: Seq[String],
               valueCol: String): DataFrame = {
    val vd = col(valueCol).cast("double")
    graft.Exec.materialize(
      df.filter(col(valueCol).isNotNull).groupBy(groups.map(col): _*)
        .agg(min(vd).as("__vmin"), max(vd).as("__vmax"),
          count(lit(1)).as("__n")))
  }

  /** Core: locate, for each target rank `(groups..., __ridx, __r)`,
    * the exact value at that rank plus the residual rank `__resid`
    * (1-based) WITHIN the value's tie class and the tie-class size
    * `__nties`. Output: groups ++ (__ridx, valueCol, __resid,
    * __nties). `base` must carry a LONG `__w` row-weight column
    * (lit(1L) for the unweighted paths): ranks, residuals and tie
    * sizes are in weight units — the selection over the
    * weight-expanded multiset without materializing the expansion.
    * Zero-weight rows shift no rank and are never selected. */
  private def locateValue(base: DataFrame, groups: Seq[String],
                          valueCol: String, stats: DataFrame,
                          targets: DataFrame, buckets: Int): DataFrame = {
    val gcols = groups.map(col)
    val proj = base.select((groups ++ Seq(valueCol, "__w")).map(col): _*)
    val vd = col(valueCol).cast("double")
    // FINE binning (r14 verdict task 4; r15 fixed buckets²; r16 made
    // the bin count PER-GROUP ADAPTIVE — verdict task 3, after the r15
    // board showed sf-sized groups paying ~0.2–0.5 s per selection to
    // sort ~1M-bin histograms their n never fills): bin the base ONCE
    // at `fineN = clamp(n div buckets, buckets, buckets²)` granularity,
    // derived from the already-joined stats frame, so the plan SHAPE is
    // unchanged (same two base scans, same single histogram shuffle).
    // The invariants both bounds need still hold at every n:
    //  - prefix window ≤ min(n, fineN) ≤ buckets² occupied bins per
    //    group — a one-task integer sort of ≤1M histogram rows
    //    (~16 MB), DIMENSION-bounded at any corpus size;
    //  - final ordered window over the ONE located bin ≈ n/fineN ≤
    //    max(buckets, n/buckets ≤ buckets at small n) ≈ buckets
    //    distinct values for spread domains — the n/buckets² bound
    //    mattered only as "≈ buckets at the n where buckets² engages",
    //    which the adaptive form preserves exactly (n ≥ buckets³ pins
    //    fineN = buckets² and the bin holds n/buckets² ≥ buckets).
    // So small groups pay small histograms (sf0.1 ≈ the r14 cost) and
    // the 100× bound is the same as r15's. A degenerate double-image
    // collapse (all values share one double, e.g. longs past 2⁵³)
    // still lands everything in bin 0 and degrades to a single window
    // over the tie-collapsed values.
    // __fineN and the bin width are PER-GROUP quantities — computed
    // once in the |groups|-row broadcast frame, not re-derived per row
    // inside the codegen'd bin expression (measured ~0.2 s per
    // selection at sf0.1 when the least/greatest/floor chain rode the
    // row side of the join).
    val fineN = least(lit(buckets.toLong * buckets),
      greatest(lit(buckets.toLong),
        floor(col("__n") / lit(buckets.toDouble)).cast("long")))
    val ext = stats.select((gcols ++
      Seq(col("__vmin"), col("__vmax"), fineN.as("__fineN"))): _*)
      .withColumn("__width",
        (col("__vmax") - col("__vmin")) / col("__fineN").cast("double"))
    val fbkt = when(col("__vmax") <= col("__vmin")
        || col("__width") === lit(0.0), lit(0L))
      .otherwise(least(col("__fineN") - lit(1L),
        floor((vd - col("__vmin")) / col("__width")).cast("long")))
    val binned = joinG(proj, ext, groups).withColumn("__fbkt", fbkt)
      .drop("__vmin", "__vmax", "__fineN", "__width")
    // pass 1: the ONE base histogram pass + prefix over occupied bins
    val hist = binned.groupBy((gcols :+ col("__fbkt")): _*)
      .agg(sum(col("__w")).as("__c"))
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(
        Window.partitionBy(gcols: _*).orderBy(col("__fbkt"))))
    val loc = joinG(cum, targets, groups)
      .filter(col("__cum") >= col("__r") &&
        col("__cum") - col("__c") < col("__r"))
      .select(gcols ++ Seq(col("__ridx"), col("__fbkt").as("__tfbkt"),
        (col("__r") - col("__cum") + col("__c")).as("__bresid")): _*)
    // pass 2: rows of the ONE fine bucket per (group, rank), collapsed
    // to distinct values — ties never inflate the window partition
    val marked = joinG(binned, loc, groups)
      .filter(col("__fbkt") === col("__tfbkt"))
    val vc = marked
      .groupBy((gcols ++ Seq(col("__ridx"), col("__bresid"),
        col(valueCol))): _*)
      .agg(sum(col("__w")).as("__vc"))
    val vcum = vc.withColumn("__vcum",
      sum(col("__vc")).over(Window
        .partitionBy((gcols :+ col("__ridx")): _*).orderBy(col(valueCol))))
    vcum.filter(col("__vcum") >= col("__bresid") &&
        col("__vcum") - col("__vc") < col("__bresid"))
      .select(gcols ++ Seq(col("__ridx"), col(valueCol),
        (col("__bresid") - col("__vcum") + col("__vc")).as("__resid"),
        col("__vc").as("__nties")): _*)
  }

  private def explodeRanks(stats: DataFrame, groups: Seq[String],
                           ranksOf: Column => Column): DataFrame =
    stats.select(groups.map(col) :+
      posexplode(ranksOf(col("__n"))).as(Seq("__ridx", "__r")): _*)

  /** For each group, the exact VALUE at each target rank of the order
    * on `valueCol` (duplicates counted — the value at rank r is
    * well-defined regardless of how ties are broken). Output: groups
    * ++ (__ridx, valueCol). `stats` lets a caller reuse / derive the
    * per-group ([[statsFor]]) frame instead of re-scanning. */
  def selectValues(df: DataFrame, groups: Seq[String], valueCol: String,
                   ranksOf: Column => Column, buckets: Int = 1024,
                   stats: Option[DataFrame] = None): DataFrame = {
    val base = df.select((groups :+ valueCol).map(col): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("__w", lit(1L))
    val st = stats.getOrElse(statsFor(base, groups, valueCol))
    val targets = explodeRanks(st, groups, ranksOf)
    locateValue(base, groups, valueCol, st, targets, buckets)
      .select((groups ++ Seq("__ridx", valueCol)).map(col): _*)
  }

  /** Per-group (double-image bound, total weight) frame for the
    * WEIGHTED selection: groups ++ (__vmin, __vmax, __n) with __n =
    * Σ weight — the [[statsFor]] analogue in weight units. */
  def statsForWeighted(df: DataFrame, groups: Seq[String],
                       valueCol: String, weightCol: String): DataFrame = {
    val vd = col(valueCol).cast("double")
    graft.Exec.materialize(
      df.filter(col(valueCol).isNotNull).groupBy(groups.map(col): _*)
        .agg(min(vd).as("__vmin"), max(vd).as("__vmax"),
          sum(col(weightCol).cast("long")).as("__n")))
  }

  /** WEIGHTED exact selection: for each group, the value at each
    * target rank of the weight-expanded multiset — the rank-r value
    * is the smallest v whose cumulative weight (over the order on
    * `valueCol`) reaches r, identical to [[selectValues]] run on the
    * multiset with each row repeated `weightCol` times, WITHOUT the
    * expansion (quantity-weighted medians over billions of expanded
    * units stay one histogram pass). `ranksOf` receives the group's
    * TOTAL WEIGHT; weights are non-negative LONGs (zero-weight rows
    * shift no rank and are never selected — the locate filter needs
    * a strictly positive tie mass). Same pass structure and bounds
    * as [[selectValues]]: every shuffle map-side-combined, every
    * window partition ≤ `buckets` rows or one bucket's distinct
    * values. Output: groups ++ (__ridx, valueCol). */
  def selectValuesWeighted(df: DataFrame, groups: Seq[String],
                           valueCol: String, weightCol: String,
                           ranksOf: Column => Column, buckets: Int = 1024,
                           stats: Option[DataFrame] = None): DataFrame = {
    val base = df.select((groups ++ Seq(valueCol, weightCol)).map(col): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("__w", col(weightCol).cast("long"))
      .drop(weightCol)
    val st = stats.getOrElse(statsForWeighted(base, groups, valueCol, "__w"))
    val targets = explodeRanks(st, groups, ranksOf)
    locateValue(base, groups, valueCol, st, targets, buckets)
      .select((groups ++ Seq("__ridx", valueCol)).map(col): _*)
  }

  /** For each group, the exact ROW KEY PAIR `(valueCol, tieCol)` at
    * each target rank of the TOTAL order (valueCol, tieCol) — tieCol
    * must make the pair unique (the ntile-boundary use case: a tile
    * boundary can fall between rows tied on the metric, split by the
    * tiebreak). Resolves the rank within the located value's tie
    * class by recursing the same histogram selection on the tiebreak,
    * so no step sorts more than one bucket's distinct ties. Output:
    * groups ++ (__ridx, valueCol, tieCol). */
  def selectRowsTied(df: DataFrame, groups: Seq[String], valueCol: String,
                     tieCol: String, ranksOf: Column => Column,
                     buckets: Int = 1024): DataFrame = {
    val gcols = groups.map(col)
    val base = df.select((groups ++ Seq(valueCol, tieCol)).map(col): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("__w", lit(1L))
    val st = statsFor(base, groups, valueCol)
    val targets = explodeRanks(st, groups, ranksOf)
    val lv = locateValue(base, groups, valueCol, st, targets, buckets)
    // ranks-per-group rows; materialized so the tie-class filter and
    // the level-2 stats/histogram don't re-run the level-1 selection
    val key = graft.Exec.materialize(
      lv.select(gcols ++ Seq(col("__ridx").as("__oridx"),
        col(valueCol).as("__v"), col("__resid").as("__r2")): _*))
    // tie classes of the located values, re-keyed by the rank label
    val tied = joinG(base, key, groups)
      .filter(col(valueCol) === col("__v"))
      .select(gcols ++ Seq(col("__oridx"), col(tieCol), col("__w")): _*)
    val targets2 = key.select(gcols ++ Seq(col("__oridx"),
      lit(0).as("__ridx"), col("__r2").as("__r")): _*)
    val st2 = statsFor(tied, groups :+ "__oridx", tieCol)
    val lv2 = locateValue(tied, groups :+ "__oridx", tieCol, st2,
      targets2, buckets)
    lv2.select(gcols ++ Seq(col("__oridx"), col(tieCol)): _*)
      .join(key.select(gcols ++ Seq(col("__oridx"), col("__v")): _*),
        groups :+ "__oridx")
      .select(gcols ++ Seq(col("__oridx").as("__ridx"),
        col("__v").as(valueCol), col(tieCol)): _*)
  }
}
