package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 second-wave analytics: activity concentration, structural
  * change detection, behavioral co-occurrence/diversity, and repeat
  * purchase — shapes the earlier families don't cover (a global Gini
  * without a global sort, an argmax over every possible series split in
  * one pass, PMI over a bounded self-join).
  *
  * Determinism contract shared with [[Analytics3]]: every aggregate is
  * an exact integer (counts, count products) until ONE final IEEE
  * double expression tree both engines evaluate identically, rounded
  * 4dp at the edge.
  */
object Analytics4 {

  /** Activity concentration report — Gini coefficient and top-1%/10%
    * share of events over users, the "how skewed is our traffic" audit
    * every capacity planner and bot-hunter runs first (a Gini near 1
    * says a handful of accounts generate the corpus and per-user
    * partitioning will skew; near 0 says uniform).
    *
    * The naive Gini ranks every user globally — a full sort of a
    * corpus-dimension frame. The scale-right shape exploits that the
    * rank statistic Σ i·cᵢ is tie-invariant: group users into the
    * HISTOGRAM of activity values (distinct event-counts c, bounded by
    * max per-user activity, thousands not billions), where a tie-block
    * of m users at value c starting after o users contributes
    * c·(m·o + m(m+1)/2) exactly. Two map-side-combined aggs (user
    * counts → value histogram) and windows over the histogram frame
    * only. Top-k shares read off the same histogram: the block
    * containing rank k contributes a deterministic partial
    * (k − users_before)·c — no per-user tiebreak ever matters.
    *
    * All sums ride DECIMAL(38,0) (i·c products overflow BIGINT at
    * 10⁹ users × 10⁶ events); the final ratios are one shared IEEE
    * tree, 4dp. */
  def eventsPowerUsers(spark: SparkSession, dir: String): DataFrame =
    eventsPowerUsersOn(Tables.events(spark, dir))

  /** The (activity value → user count) histogram — the ONLY pass over
    * the corpus; exposed un-materialized so the plan spec can pin its
    * single user_id exchange (a pin on the operator's own plan would
    * see a LogicalRDD past the materialize cut). */
  private[graft] def activityHistogram(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("m"))

  def eventsPowerUsersOn(events: DataFrame): DataFrame = {
    // materialized: both the windowed block frame and the totals row
    // derive from the histogram — without the cut, the crossJoin's
    // build side replays the corpus aggregation a second time
    val hist = graft.Exec.materialize(activityHistogram(events))
    val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
    val asc = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = hist
      .withColumn("cum_u", sum(col("m")).over(asc))
      .withColumn("cum_e", sum(dec(col("c")) * dec(col("m"))).over(asc))
      .withColumn("o", col("cum_u") - col("m"))
      // Σ i·c over the tie-block = c·(m·o + m(m+1)/2), exact integers
      // (m(m+1) is always even, so the integer div loses nothing)
      .withColumn("rank_term",
        dec(col("c")) * (dec(col("m")) * dec(col("o")) +
          dec(expr("m * (m + 1) div 2"))))
    val tot = scored.agg(
      sum(col("m")).as("n"),
      sum(dec(col("c")) * dec(col("m"))).as("s"),
      sum(col("rank_term")).as("t"))
    // top-k share: the DESC-cumulative block containing rank k yields
    // events_above + (k − users_above)·c; max over qualifying blocks
    // IS that block's value (cumulative sums increase monotonically)
    def topShare(k: org.apache.spark.sql.Column) = {
      val above = col("n") - col("cum_u") // users strictly more active
      val eAbove = col("s") - col("cum_e")
      max(when(above < k,
        eAbove + dec(least(dec(col("m")), k - above)) * dec(col("c"))))
    }
    val withTot = scored.crossJoin(broadcast(tot))
    withTot.agg(
      first(col("n")).as("n_users"),
      first(col("s").cast("long")).as("n_events"),
      round(
        (lit(2).cast("decimal(38,0)") * first(col("t")) -
          dec(first(col("n")) + lit(1)) * first(col("s"))).cast("double") /
        (first(col("n")).cast("double") * first(col("s")).cast("double")),
        4).as("gini"),
      round(topShare(dec(greatest(lit(1L), expr("n div 100"))))
        .cast("double") / first(col("s")).cast("double"), 4)
        .as("top1pct_share"),
      round(topShare(dec(greatest(lit(1L), expr("n div 10"))))
        .cast("double") / first(col("s")).cast("double"), 4)
        .as("top10pct_share"))
  }

  /** Structural-break detection: the binary-segmentation first split of
    * the DENSE corpus-wide hourly series — which hour boundary best
    * separates "before" from "after" (deploys, incidents, bot waves,
    * onboarding launches all present as a level shift;
    * `events_anomaly` finds hour-sized spikes, this finds the REGIME
    * change those z-scores silently absorb into the mean). Score is
    * the between-segment sum of squares t·(n−t)/n·(μl−μr)², evaluated
    * at every candidate split from ONE prefix-sum pass.
    *
    * Dense grid off a broadcast min/max spine (the forecast_baseline
    * spine rule — skipping empty hours biases both means). Prefix sums
    * window over the |hours| frame only (the q_rolling_revenue
    * argument); each candidate's score is pure arithmetic on its own
    * row. Double products throughout — s·n and S·t stay exact under
    * 2^53 at any plausible hour count, and above it the IEEE tree is
    * still the SAME tree on both engines, so ranks agree. Ties break
    * on the earlier hour. */
  def eventsChangepoint(spark: SparkSession, dir: String,
                        topK: Int = 5): DataFrame =
    eventsChangepointOn(Tables.events(spark, dir), topK)

  def eventsChangepointOn(events: DataFrame, topK: Int = 5): DataFrame = {
    // PERSISTED (r17, guide §1.2): the hourly rollup feeds the bounds
    // agg and the dense spine join — two otherwise-recomputed corpus
    // aggregations. |hours|-sized.
    val hourly = events
      .select((col("ts").cast("long") / 3600L).cast("long").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
      .persist()
    val bounds = broadcast(hourly.agg(min(col("h")).as("h0"),
      max(col("h")).as("h1")))
    val dense = bounds
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("c"), lit(0L)).as("c"))
    val pre = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dense
      .withColumn("t", count(lit(1)).over(pre))
      .withColumn("s", sum(col("c")).over(pre))
    val tot = broadcast(cum.agg(max(col("t")).as("n"),
      max(col("s")).as("tot")))
    val d = (c: String) => col(c).cast("double")
    val scored = cum.crossJoin(tot)
      .filter(col("t") < col("n")) // split AFTER hour h: left = 1..t
      .withColumn("num", d("s") * d("n") - d("tot") * d("t"))
      .withColumn("score",
        col("num") * col("num") / (d("t") * (d("n") - d("t")) * d("n")))
    val w = Window.orderBy(col("score").desc, col("h"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("rank"),
        ((col("h") + 1) * 3600L).as("split_epoch_s"),
        col("t").as("hours_left"),
        (col("n") - col("t")).as("hours_right"),
        round(d("s") / d("t"), 4).as("mean_left"),
        round((d("tot") - d("s")) / (d("n") - d("t")), 4).as("mean_right"),
        round((d("tot") - d("s")) / (d("n") - d("t")) - d("s") / d("t"), 4)
          .as("shift"),
        round(col("score"), 4).as("score"))
  }

  /** Event-type affinity matrix: for every type pair, how many users
    * do BOTH, with Jaccard, lift and PMI — the behavioral
    * co-occurrence readout ("do users who error also purchase?") that
    * decides which event families share a funnel and which are
    * independent traffic. PMI > 0 means doing A makes B more likely
    * than the marginals predict.
    *
    * Scale shape: ONE distinct (user, type) reduction (map-side
    * combined), then a self-join co-partitioned on user_id whose
    * fan-out is bounded by |types|² per user — never a corpus×corpus
    * pair stream; marginals and the user total ride a broadcast join.
    * Counts exact; jaccard/lift/pmi one IEEE tree, 4dp. */
  def eventsTypeAffinity(spark: SparkSession, dir: String): DataFrame =
    eventsTypeAffinityOn(Tables.events(spark, dir))

  def eventsTypeAffinityOn(events: DataFrame): DataFrame = {
    // PERSISTED (r17, guide §1.2): the distinct (user, type) frame
    // feeds both self-join sides, the marginals, and the user total —
    // five otherwise-recomputed references (plans/r17/events_type_
    // affinity_before.txt). ContextCleaner-freed.
    val ud = events.select(col("user_id"), col("event_type")).distinct()
      .persist()
    val marg = ud.groupBy(col("event_type"))
      .agg(count(lit(1)).as("users"))
    val nTot = broadcast(ud.agg(countDistinct(col("user_id")).as("n")))
    val a = ud.select(col("user_id"), col("event_type").as("type_a"))
    val b = ud.select(col("user_id"), col("event_type").as("type_b"))
    val both = a.join(b, Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("users_both"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    both
      .join(broadcast(marg.select(col("event_type").as("type_a"),
        col("users").as("users_a"))), Seq("type_a"))
      .join(broadcast(marg.select(col("event_type").as("type_b"),
        col("users").as("users_b"))), Seq("type_b"))
      .crossJoin(nTot)
      .select(col("type_a"), col("type_b"),
        col("users_a"), col("users_b"), col("users_both"),
        round(d(col("users_both")) /
          d(col("users_a") + col("users_b") - col("users_both")), 4)
          .as("jaccard"),
        round(d(col("users_both")) * d(col("n")) /
          (d(col("users_a")) * d(col("users_b"))), 4).as("lift"),
        round(log(d(col("users_both")) * d(col("n")) /
          (d(col("users_a")) * d(col("users_b")))), 4).as("pmi"))
  }

  /** Per-user behavioral diversity: Shannon entropy of each user's
    * event-type distribution, plus its normalized form H/ln(k) — the
    * single-number "is this account a one-trick bot or a real user"
    * feature every abuse model starts from (bots concentrate on one
    * type → H≈0; organic users spread → H near ln k). The per-term
    * form Σ (c/n)·ln(n/c) makes single-type users EXACTLY 0.0 (ln 1 is
    * exact), where ln n − Σ c·ln c/n would leave an ulp of noise.
    *
    * One (user, type) reduction then one user-keyed agg, both
    * map-side combined; no windows, no corpus-wide sort. Integer
    * counts feed a shared IEEE tree, 4dp. */
  def eventsUserEntropy(spark: SparkSession, dir: String): DataFrame =
    eventsUserEntropyOn(Tables.events(spark, dir))

  def eventsUserEntropyOn(events: DataFrame): DataFrame = {
    val ut = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    // ln(n) − Σ c·ln(c)/n — the two-aggregate algebraic form
    // ([[graft.llm.TextOps.textEntropy]]'s shape); greatest(0, ·)
    // clamps the ±ulp residue a single-type user leaves (both engines'
    // ln may differ in the last bit, and −1e-17 would round to "-0.0"
    // on one side only)
    val perUser = ut.groupBy(col("user_id")).agg(
      sum(col("c")).as("n_events"),
      count(lit(1)).as("n_types"),
      sum(d(col("c")) * log(d(col("c")))).as("clogc"))
    val h = greatest(lit(0.0),
      log(d(col("n_events"))) - col("clogc") / d(col("n_events")))
    perUser.select(col("user_id"), col("n_events"), col("n_types"),
      round(h, 4).as("entropy"),
      round(when(col("n_types") > 1,
        greatest(lit(0.0), h / log(d(col("n_types"))))).otherwise(0.0), 4)
        .as("norm_entropy"))
  }

  /** Session-gap threshold sweep (r12 sB): what each sessionization
    * gap actually produces — per candidate timeout τ, the session
    * count, mean events per session and the share of inter-event gaps
    * it breaks. The [[graft.streaming.StreamAggs.sessionize]] gap (and
    * every analytics built on `events_sessions`) is a CHOICE, and this
    * is the evidence for it: the τ where the session count stops
    * falling fast is where real session boundaries end and typing
    * pauses begin (the dedup_threshold_sweep argument applied to
    * time). Session count needs no per-τ sessionization: sessions =
    * users + broken gaps, an identity over the SAME gap frame for
    * every τ.
    *
    * Scale shape: ONE user_id exchange (the lag window), then the
    * broadcast τ-grid crossJoin fans the slim gap rows |τ| ways
    * map-side and reduces immediately (the threshold_sweep shape);
    * totals ride a 1-row broadcast. Exact integer seconds and counts;
    * two 4dp ratios. */
  def eventsSessionSweep(spark: SparkSession, dir: String,
                         taus: Seq[Long] =
                           Seq(300L, 900L, 1800L, 3600L, 7200L)): DataFrame =
    eventsSessionSweepOn(Tables.events(spark, dir), taus)

  def eventsSessionSweepOn(events: DataFrame,
                           taus: Seq[Long] =
                             Seq(300L, 900L, 1800L, 3600L, 7200L)): DataFrame = {
    require(taus.nonEmpty, "eventsSessionSweep: empty tau grid")
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsec"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("tsec"))
      .withColumn("g", col("tsec") - lag(col("tsec"), 1).over(w))
    val stats = broadcast(gaps.agg(
      countDistinct(col("user_id")).as("n_users"),
      count(lit(1)).as("n_events"),
      sum(when(col("g").isNotNull, 1L).otherwise(0L)).as("n_gaps")))
    val grid = broadcast(taus.toDF("gap_s"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    gaps.crossJoin(grid)
      .groupBy(col("gap_s"))
      .agg(sum(when(col("g") > col("gap_s"), 1L).otherwise(0L))
        .as("n_breaks"))
      .crossJoin(stats)
      .select(col("gap_s"),
        (col("n_users") + col("n_breaks")).as("n_sessions"),
        round(d(col("n_events")) / d(col("n_users") + col("n_breaks")), 4)
          .as("avg_events_per_session"),
        round(when(col("n_gaps") > 0,
          d(col("n_breaks")) / d(col("n_gaps"))).otherwise(0.0), 4)
          .as("break_rate"))
  }

  /** Repeat-purchase report per part: of the customers who ever bought
    * the part, how many came back for it in a second order — the
    * reorder-rate view merchandising uses to split staples from
    * one-off buys (and the pipeline twin of a per-key "returning
    * user" rate on any entity).
    *
    * Scale shape: lineitem joins orders on the orderkey hash (both
    * sides co-partitioned by the join key; no broadcast — orders is
    * corpus-sized), reduces to distinct (part, cust, order) DURING the
    * first agg, then two map-side-combined rollups. Output is
    * |parts|-dimensional. Exact integers + one 4dp ratio. */
  def qReorderRate(spark: SparkSession, dir: String): DataFrame =
    qReorderRateOn(Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  def qReorderRateOn(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_partkey"))
    val ord = orders.select(col("o_orderkey"), col("o_custkey"))
    val pco = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("l_partkey").as("partkey"), col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"))
      .distinct()
    val perBuyer = pco.groupBy(col("partkey"), col("custkey"))
      .agg(count(lit(1)).as("n_orders"))
    perBuyer.groupBy(col("partkey")).agg(
      count(lit(1)).as("buyers"),
      sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("repeat_buyers"),
      sum(col("n_orders")).as("orders"),
      max(col("n_orders")).as("max_orders_per_buyer"),
      round(sum(when(col("n_orders") >= 2, 1L).otherwise(0L))
        .cast("double") / count(lit(1)).cast("double"), 4)
        .as("repeat_rate"))
  }

  /** Customer activity-band migration (r12 sD): the transition matrix
    * of per-customer order-count BANDS between two halves of the
    * window — who upgraded, who churned to absent, where the new
    * volume came from. Bands are power-of-two order counts (bit
    * length: 1, 2–3, 4–7, 8+…) with band 0 = absent in that half, so
    * banding is INTEGER-exact and scale-free (no quartile rank sort);
    * the migration view is what [[Analytics.qRetentionMatrix]]'s
    * presence triangle can't say — not just "came back" but "came
    * back smaller".
    *
    * Scale shape: one (customer, half) count (map-side), a full-outer
    * self-merge per customer (same exchange), the ≤ bands² matrix
    * rollup with window shares. Exact integers + one 4dp ratio. */
  def qCustomerMigration(spark: SparkSession, dir: String,
                         split: String = "1998-07-01"): DataFrame =
    qCustomerMigrationOn(Tables.orders(spark, dir), split)

  def qCustomerMigrationOn(orders: DataFrame,
                           split: String = "1998-07-01"): DataFrame = {
    val half = when(col("o_orderdate") < lit(split).cast("timestamp"),
      lit(1)).otherwise(lit(2))
    val per = orders.groupBy(col("o_custkey"), half.as("h"))
      .agg(count(lit(1)).as("n"))
    val band = (c: org.apache.spark.sql.Column) =>
      length(bin(c)).cast("int")
    val merged = per.groupBy(col("o_custkey")).agg(
      coalesce(max(when(col("h") === 1, band(col("n")))), lit(0))
        .as("band_h1"),
      coalesce(max(when(col("h") === 2, band(col("n")))), lit(0))
        .as("band_h2"))
    val m = merged.groupBy(col("band_h1"), col("band_h2"))
      .agg(count(lit(1)).as("n_customers"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    m.select(col("band_h1"), col("band_h2"), col("n_customers"),
      round(col("n_customers").cast("double") /
        sum(col("n_customers")).over(wAll).cast("double"), 4)
        .as("share"),
      (col("band_h2") > col("band_h1")).as("upgraded"),
      (col("band_h2") === 0).as("churned"))
  }

  /** Arrival dispersion per event type (r12 sC): the Fano factor
    * (variance/mean of hourly counts over the DENSE corpus hour grid)
    * — the one-number Poisson test behind every capacity model: a
    * Poisson arrival process has Fano ≈ 1, bursty traffic reads ≫ 1,
    * and a rate-limited/paced source reads < 1. [[eventsBurst]] flags
    * WHICH hours spike; this says whether the process is bursty AT
    * ALL, which decides if peak-provisioning or mean-provisioning is
    * the right capacity model.
    *
    * Dense-grid exactness WITHOUT a spine explode: absent hours are
    * zeros, and zeros contribute nothing to Σx or Σx² — so
    * var = (n·Σx² − S²)/n² over n = the corpus hour span needs only
    * the PRESENT (type, hour) rows plus the broadcast span. Exact
    * integer moments into one IEEE tree, 4dp.
    *
    * Scale shape: ONE (type, hour) map-side count, a 1-row broadcast
    * span, a |types| rollup. */
  def eventsDispersion(spark: SparkSession, dir: String): DataFrame =
    eventsDispersionOn(Tables.events(spark, dir))

  def eventsDispersionOn(events: DataFrame): DataFrame = {
    val th = events.groupBy(col("event_type"),
        expr("unix_millis(ts) div 3600000").as("h"))
      .agg(count(lit(1)).as("n"))
    val span = broadcast(th.agg(
      (max(col("h")) - min(col("h")) + 1L).as("n_hours")))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    th.groupBy(col("event_type"))
      .agg(count(lit(1)).as("active_hours"),
        sum(col("n")).as("n_events"),
        sum(col("n") * col("n")).as("q"))
      .crossJoin(span)
      .select(col("event_type"), col("n_hours"), col("active_hours"),
        col("n_events"),
        round(d(col("n_events")) / d(col("n_hours")), 4)
          .as("mean_per_hour"),
        round((d(col("n_hours")) * d(col("q")) -
          d(col("n_events")) * d(col("n_events"))) /
          (d(col("n_hours")) * d(col("n_hours"))), 4).as("variance"),
        round((d(col("n_hours")) * d(col("q")) -
          d(col("n_events")) * d(col("n_events"))) /
          (d(col("n_hours")) * d(col("n_events"))), 4).as("fano"))
  }

  /** Month-of-year seasonal index (r12 sC): per calendar month, the
    * mean monthly order count and revenue ACROSS YEARS divided by the
    * all-months mean — the deseasonalization table [[q_growth_yoy]]'s
    * year-over-year ratios assume away (an index of 1.3 for December
    * says a 30% December jump is seasonality, not growth). Partial
    * years are handled by cell counting: each month divides by the
    * number of (year, month) cells it actually has, and the grand mean
    * by the total cell count — no phantom zero months.
    *
    * Scale shape: one (year, month) agg (map-side), a 1-row broadcast
    * of grand totals, a 12-row month rollup. Counts exact, revenue in
    * DECIMAL until the final index tree (4dp). */
  def qSeasonalIndex(spark: SparkSession, dir: String): DataFrame =
    qSeasonalIndexOn(Tables.orders(spark, dir))

  def qSeasonalIndexOn(orders: DataFrame): DataFrame = {
    import graft.queries.Money.{asDouble, dec}
    val ym = orders.groupBy(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("rev"))
    val tot = broadcast(ym.agg(sum(col("n")).as("tn"),
      sum(col("rev")).as("trev"), count(lit(1)).as("cells")))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    ym.groupBy(col("m").as("month"))
      .agg(count(lit(1)).as("n_years"), sum(col("n")).as("n_orders"),
        sum(col("rev")).as("rv"))
      .crossJoin(tot)
      .select(col("month"), col("n_years"), col("n_orders"),
        asDouble(col("rv")).as("revenue"),
        round((d(col("n_orders")) / d(col("n_years"))) /
          (d(col("tn")) / d(col("cells"))), 4).as("count_index"),
        round((asDouble(col("rv")) / d(col("n_years"))) /
          (asDouble(col("trev")) / d(col("cells"))), 4)
          .as("revenue_index"))
  }

  /** Daily event-mix drift (r12 sC): per day, the KL divergence and
    * total-variation distance of that day's event-TYPE mix against the
    * corpus mix — composition drift, the failure mode
    * [[eventsChangepoint]]'s count series is blind to (a day can hold
    * volume flat while its mix flips from views to errors). The
    * monitoring twin of [[graft.llm.TextOps.corpusMixKl]] pointed at
    * time instead of sources.
    *
    * Sparse-exact identities — NO dense day×type spine: a type absent
    * from a day contributes 0 to KL (measure convention) and exactly
    * q_t to L1, so TV = (Σ_present |p−q| + 1 − Σ_present q) / 2.
    *
    * Scale shape: ONE (day, type) map-side-combined count; day totals
    * by a window over that dimension-sized frame (days × |types|,
    * never events); corpus mix rides a broadcast join. Integer counts
    * into one shared IEEE tree, 4dp. */
  def eventsMixDrift(spark: SparkSession, dir: String): DataFrame =
    eventsMixDriftOn(Tables.events(spark, dir))

  def eventsMixDriftOn(events: DataFrame): DataFrame = {
    val dt = events.groupBy(
        date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val wDay = Window.partitionBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val tTot = dt.groupBy(col("event_type")).agg(sum(col("n")).as("nt"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val q = tTot.select(col("event_type"),
      (col("nt").cast("double") /
        sum(col("nt")).over(wAll).cast("double")).as("q"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val p = d(col("n")) / d(col("nd"))
    dt.withColumn("nd", sum(col("n")).over(wDay))
      .join(broadcast(q), Seq("event_type"))
      .groupBy(col("day"))
      .agg(max(col("nd")).as("n_events"),
        round(sum(p * log(p / col("q"))), 4).as("kl_nats"),
        round((sum(abs(p - col("q"))) + lit(1.0) - sum(col("q"))) / 2.0,
          4).as("tv_dist"),
        count(lit(1)).as("n_types"))
  }

  /** Hourly session-concurrency profile (r12 sC): how many sessions
    * are ACTIVE in each hour (interval-stabbing count), how many start
    * and how many end there — the capacity-planning curve behind every
    * "how many state slots does the sessionizer hold at peak" question
    * a [[graft.streaming.StreamAggs.sessionize]] deployment asks, and
    * the load view `events_hourly` (raw event counts) can't give: a
    * few long sessions and many short ones count the same there but
    * hold very different state here.
    *
    * Scale shape: sessions from ONE user_id exchange (the
    * events_sessions window pair — lag + running boundary sum, same
    * sort), then each session explodes to its covered hours (bounded
    * by duration, not events) and ONE hour-keyed map-side-combined
    * agg. Exact integers only. */
  def eventsConcurrency(spark: SparkSession, dir: String): DataFrame =
    eventsConcurrencyOn(Tables.events(spark, dir))

  def eventsConcurrencyOn(events: DataFrame,
                          gapMs: Long = 1800000L): DataFrame = {
    val wLag = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wCum = Window.partitionBy(col("user_id")).orderBy(col("ms"))
    val sessions = events
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("ts"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(wLag))
      .withColumn("sid", sum(when(col("prev_ms").isNull ||
        col("ms") - col("prev_ms") > gapMs, 1).otherwise(0)).over(wCum))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"))
    sessions
      .select(expr("start_ms div 3600000").as("sh"),
        expr("end_ms div 3600000").as("eh"))
      .select(col("sh"), col("eh"),
        explode(sequence(col("sh"), col("eh"))).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("h") === col("sh"), 1L).otherwise(0L))
          .as("n_started"),
        sum(when(col("h") === col("eh"), 1L).otherwise(0L))
          .as("n_ended"))
      .select((col("h") * 3600L).as("hour_epoch_s"), col("n_active"),
        col("n_started"), col("n_ended"))
  }

  /** Time-to-convert distribution (r12 sB): for every `purchase`, the
    * lag back to the user's FIRST touch inside the attribution lookback
    * window, bucketed on a power-of-two minute grid — the journey-length
    * histogram behind every attribution-window choice
    * ([[Analytics3.eventsAttribution]] picks 168h; this is the evidence
    * that the mass actually lives inside it). Conversions with no prior
    * touch land in bucket −1 as `(direct)` journeys.
    *
    * Shares the attribution operator's scale shape: ONE per-user range
    * window takes the min conditional (tsec, event_id) struct — no
    * touches×conversions self-join — then the histogram is a bucket
    * groupBy over the conversion frame only. The bucket is
    * INTEGER-exact in both engines: `length(bin(lag_min)) − 1` (the
    * bit-length of the floored minute lag) sidesteps cross-engine
    * `floor(log2(x))` boundary rounding entirely; shares/cum ride one
    * IEEE tree over the ≤15-row bucket frame, 4dp. */
  def eventsConversionLag(spark: SparkSession, dir: String): DataFrame =
    eventsConversionLagOn(Tables.events(spark, dir))

  def eventsConversionLagOn(events: DataFrame,
                            lookbackHours: Int = 168): DataFrame = {
    import graft.queries.Money.{asDouble, dec}
    val e = events.select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), col("ts").cast("long").as("tsec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
      .rangeBetween(-lookbackHours.toLong * 3600L, -1L)
    val touch = when(col("event_type") =!= "purchase",
      struct(col("tsec"), col("event_id")))
    val conv = e
      .withColumn("ft", min(touch).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("value"),
        (col("tsec") - col("ft.tsec")).as("lag_sec"))
    // lag_sec ≥ 1 by the window's `1 PRECEDING` bound; bucket −1 = direct
    val lagMin = greatest(lit(1L), col("lag_sec").divide(60).cast("long"))
    val bucketed = conv.select(col("value"),
      when(col("lag_sec").isNull, lit(-1))
        .otherwise((length(bin(lagMin)) - 1).cast("int")).as("bucket"))
    val hist = bucketed.groupBy(col("bucket")).agg(
      count(lit(1)).as("n_conv"),
      sum(dec(col("value"))).as("v"))
    val wAll = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.select(col("bucket"),
        when(col("bucket") === -1, lit(0L))
          .otherwise(pow(lit(2.0), col("bucket").cast("double"))
            .cast("long")).as("lo_min"),
        col("n_conv"), asDouble(col("v")).as("conv_value"),
        round(col("n_conv").cast("double") /
          sum(col("n_conv")).over(wAll).cast("double"), 4).as("share"),
        round(sum(col("n_conv")).over(wCum).cast("double") /
          sum(col("n_conv")).over(wAll).cast("double"), 4).as("cum_share"))
  }
}
