package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 session-4 analytics: adoption, purchase-cadence and
  * correlation shapes the earlier query families don't exercise —
  * cumulative distinct done right (no cumulative-distinct window
  * exists), per-key cadence via one wide shuffle, and Pearson
  * correlation rebuilt from exact integer sums so both engines share
  * one IEEE expression tree instead of their own (divergent) streaming
  * covariance kernels.
  */
object Analytics3 {

  private val epoch = lit("1990-01-01").cast("date")

  /** Daily new users + cumulative adoption curve — the growth view
    * every product dashboard opens with ("users to date"). The naive
    * form is a cumulative DISTINCT window, which no engine's window
    * frame computes and a day×user range self-join would nested-loop;
    * the right shape is two bounded reductions: a user's FIRST-SEEN
    * day is ONE map-side-combined `min` agg (|users| rows), daily new
    * counts collapse that to the |days| frame, and the running total
    * is a window over THAT dimension-sized frame (the
    * q_rolling_revenue argument — the implied single-partition sort
    * never sees the corpus). `adoption` = cum/total, exact-int ratio
    * rounded 4dp; total rides a window over the same tiny frame. */
  def eventsNewUsers(spark: SparkSession, dir: String): DataFrame =
    eventsNewUsersOn(Tables.events(spark, dir))

  def eventsNewUsersOn(events: DataFrame): DataFrame = {
    val dayN = datediff(col("ts").cast("date"), epoch).cast("long")
    val firstSeen = events
      .select(col("user_id"), dayN.as("day_n"))
      .groupBy(col("user_id"))
      .agg(min(col("day_n")).as("first_day"))
    val daily = firstSeen.groupBy(col("first_day").as("day_n"))
      .agg(count(lit(1)).as("new_users"))
    val cumW = Window.orderBy(col("day_n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy()
    daily
      .withColumn("cum_users", sum(col("new_users")).over(cumW))
      .withColumn("__total", sum(col("new_users")).over(totW))
      .select(col("day_n"), col("new_users"), col("cum_users"),
        round(col("cum_users").cast("double") / col("__total"), 4)
          .as("adoption"))
  }

  /** Per-customer purchase-cadence profile: order count, active span,
    * mean and max inter-order gap in days (repeat customers only) —
    * the churn-risk signal ("their max gap is 3× their mean: they
    * lapsed once already") and the replenishment-cycle estimate
    * feeding any demand forecast. One wide shuffle total: the lag
    * window and the per-customer rollup share the same `o_custkey`
    * hash partitioning, so the groupBy reuses the window's exchange.
    * `mean_gap_days` is derived as span/(n−1) — algebraically the mean
    * of the lag gaps, but computed from the agg's own min/max without
    * touching the lag column (exact-int ratio, 4dp); `max_gap_days`
    * is the one statistic that genuinely needs the ordered diff.
    * Ordering ties on the same date break by `o_orderkey` (and yield
    * gap 0 either way). */
  def qOrderGaps(spark: SparkSession, dir: String): DataFrame =
    qOrderGapsOn(Tables.orders(spark, dir))

  def qOrderGapsOn(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"))
      .withColumn("gap", datediff(col("od"), lag(col("od"), 1).over(w)))
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        datediff(max(col("od")), min(col("od"))).cast("long").as("span_days"),
        max(col("gap")).cast("long").as("max_gap_days"))
      .filter(col("n_orders") >= 2)
      .select(col("o_custkey"), col("n_orders"), col("span_days"),
        round(col("span_days").cast("double") / (col("n_orders") - 1), 4)
          .as("mean_gap_days"),
        col("max_gap_days"))
  }

  /** Cohort LTV curve: per (first-active-week cohort, weeks since),
    * purchase revenue, the running cumulative, and LTV per cohort
    * member — the monetized companion of `q_retention_matrix` (same
    * cohort definition, so the two matrices join on their keys): "how
    * much has the January cohort spent per user by week 6" is THE
    * payback-period question under every acquisition budget. Cohort
    * size counts ALL members (not just purchasers) so LTV is per
    * acquired user, the metric's standard form.
    *
    * Scale shape: first-active week = one distinct + min agg (the
    * retention-matrix frames, reusing the same user_id partitioning);
    * revenue cells = ONE map-side-combined agg over purchases to the
    * cohorts × weeks matrix; the cumulative windows over THAT
    * dimension-sized frame. Revenue accumulates in DECIMAL (exact,
    * order-independent — the Money contract) and lands as DOUBLE;
    * weeks with no purchases are absent (their cum is carried by the
    * next observed week). */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val activity = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohorts = activity.groupBy("user_id")
      .agg(min(col("wk")).as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_cohort_users"))
    val cells = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"),
        col("value").cast("decimal(12,2)").as("rev"))
      .join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("wk").cast("date"), col("cohort_week").cast("date")) / 7)
          .cast("int").as("week_n"))
      .agg(sum(col("rev")).as("rev_dec"))
    val cumW = Window.partitionBy(col("cohort_week")).orderBy(col("week_n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_dec", sum(col("rev_dec")).over(cumW))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_n"),
        col("rev_dec").cast("double").as("revenue"),
        col("cum_dec").cast("double").as("cum_revenue"),
        col("n_cohort_users"),
        round(col("cum_dec").cast("double") / col("n_cohort_users"), 4)
          .as("ltv_per_user"))
  }

  /** Per-user automation (bot) profile: event count, active span,
    * events/hour rate, and the coefficient of variation of inter-event
    * gaps — the behavioral-data curation gate before training on event
    * streams (a scripted client fires on a timer: gap CV near 0; a
    * human's gaps are heavy-tailed, CV ≳ 1). `is_bot` flags high-volume
    * users (≥ 20 events) whose cadence is too regular (CV ≤ 0.2).
    *
    * ONE wide shuffle: the lag window and the per-user rollup share the
    * user_id hash partitioning (the q_order_gaps shape). Determinism:
    * gaps are exact integer SECONDS (micros would overflow Σg² in
    * BIGINT on wide spans); mean/variance derive from the integer sums
    * (n, Σg, Σg²) through one IEEE expression tree shared with the
    * oracle (the events_burst convention), CV rounds 4dp, and the
    * degenerate all-same-timestamp user (mean 0) pins CV to 0.0 —
    * maximally regular, which is the honest bot reading. */
  def eventsBotProfile(spark: SparkSession, dir: String,
                       minEvents: Int = 20, maxCv: Double = 0.2): DataFrame =
    eventsBotProfileOn(Tables.events(spark, dir), minEvents, maxCv)

  def eventsBotProfileOn(events: DataFrame,
                         minEvents: Int = 20,
                         maxCv: Double = 0.2): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap",
        call_function("div",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)),
          lit(1000000L)))
    val agg = gaps.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      call_function("div",
        max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))),
        lit(1000000L)).as("span_sec"),
      count(col("gap")).as("ng"),
      sum(col("gap")).as("sg"),
      sum(col("gap") * col("gap")).as("sg2"))
    val ng = col("ng").cast("double")
    val mean = col("sg").cast("double") / ng
    val variance = (ng * col("sg2").cast("double") -
      col("sg").cast("double") * col("sg").cast("double")) / (ng * ng)
    val cv = when(col("ng") > 0 && col("sg") > 0,
      round(sqrt(variance) / mean, 4)).otherwise(0.0)
    agg.filter(col("n_events") >= 2)
      .select(col("user_id"), col("n_events"), col("span_sec"),
        when(col("span_sec") > 0,
          round(col("n_events") * lit(3600.0) / col("span_sec"), 4))
          .otherwise(0.0).as("rate_per_hour"),
        cv.as("gap_cv"),
        (col("n_events") >= minEvents && cv <= maxCv).as("is_bot"))
  }

  /** Per-priority fulfillment-lag distribution: line count, mean /
    * exact lower median / min / max of (ship date − order date) days —
    * the order-to-ship SLA view a logistics dashboard leads with, and
    * the shape every "exact percentile per group" question reduces to.
    * A per-group percentile window would funnel the whole fact join
    * through |priorities| tasks (five corpus-sized sorts at scale);
    * the right shape is the COUNT-GRID: lags are small integers, so
    * ONE map-side-combined agg reduces the join to a ≤ |priorities| ×
    * |distinct lags| frame and every statistic — including the exact
    * lower median via cumulative counts (first lag with cum ≥
    * ⌈n/2⌉, the q_median_order rank construction) — derives from
    * windows over THAT grid (the quality_calibration argument). Mean
    * is an exact-integer ratio, 4dp. */
  def qFulfillmentLag(spark: SparkSession, dir: String): DataFrame = {
    val lag = datediff(col("l_shipdate").cast("date"),
      col("o_orderdate").cast("date")).cast("long")
    val grid = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), lag.as("lag"))
      .agg(count(lit(1)).as("cnt"))
    val cumW = Window.partitionBy(col("o_orderpriority")).orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col("o_orderpriority"))
    val g = grid
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n_lines", sum(col("cnt")).over(totW))
      .withColumn("lag_sum", sum(col("lag") * col("cnt")).over(totW))
      .withColumn("min_lag", min(col("lag")).over(totW))
      .withColumn("max_lag", max(col("lag")).over(totW))
    g.filter(col("cum") >= expr("(n_lines + 1) div 2"))
      .groupBy(col("o_orderpriority"))
      .agg(
        min(col("n_lines")).as("n_lines"),
        round(min(col("lag_sum")).cast("double") / min(col("n_lines")), 4)
          .as("mean_lag_days"),
        min(col("lag")).as("median_lag_days"),
        min(col("min_lag")).as("min_lag_days"),
        min(col("max_lag")).as("max_lag_days"))
  }

  /** Per-brand discount→quantity Pearson correlation — "does
    * discounting this brand actually move volume", the price-response
    * screen a pricing team runs before a margin giveaway. The scale
    * shape is ONE map-side-combined aggregation: five integer moment
    * sums (Σx, Σy, Σxy, Σx², Σy²) + n per brand, with the part
    * dimension joined in beforehand (AQE broadcasts while small, the
    * SF-growing-dim convention — no hint). Correlation then assembles
    * DRIVER-FREE from those sums in one closed-form expression.
    *
    * Determinism: a native `corr()` aggregate runs each engine's own
    * streaming covariance kernel in partition order — divergent last
    * ulps by construction. Here x = discount in exact basis points
    * (round(d·100) — the synthetic discounts are centi-steps, never at
    * a half boundary) and y = integral quantity, so all five sums are
    * exact BIGINTs and both engines evaluate the IDENTICAL double
    * expression over identical integers; 4dp rounding at the boundary
    * absorbs nothing but is kept by convention. Zero-variance brands
    * pin to 0.0. At sums beyond 2^53 (≫ this schema's reach) the
    * moment columns would accumulate in DECIMAL(38,0) instead —
    * same plan shape. */
  def qDiscountEffect(spark: SparkSession, dir: String): DataFrame =
    qDiscountEffectOn(Tables.lineitem(spark, dir), Tables.part(spark, dir))

  def qDiscountEffectOn(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem.select(
      col("l_partkey"),
      round(col("l_discount") * 100, 0).cast("long").as("x"),
      col("l_quantity").cast("long").as("y"))
    val joined = li.join(
      part.select(col("p_partkey"), col("p_brand")),
      col("l_partkey") === col("p_partkey"))
    val agg = joined.groupBy(col("p_brand")).agg(
      count(lit(1)).as("n_lines"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sx2"),
      sum(col("y") * col("y")).as("sy2"))
    val n = col("n_lines").cast("double")
    val num = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val varx = n * col("sx2").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vary = n * col("sy2").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    agg.select(
      col("p_brand"), col("n_lines"),
      round(col("sx").cast("double") / n, 4).as("avg_disc_bp"),
      round(col("sy").cast("double") / n, 4).as("avg_qty"),
      when(varx > 0 && vary > 0,
        round(num / (sqrt(varx) * sqrt(vary)), 4)).otherwise(0.0)
        .as("corr_disc_qty"))
  }

  /** Weekly growth accounting (r11): every active (user, week) is
    * exactly one of new / retained (active the week before) /
    * resurrected (active before, but not last week); churned(w) =
    * active(w−1) − retained(w); quick ratio = (new + resurrected) /
    * churned — the canonical growth-accounting identity (active(w) =
    * new + retained + resurrected, spec-pinned) behind every
    * startup-metrics dashboard, and the decomposition [[qRetention]]'s
    * single ratio can't show (a flat DAU can be healthy retention or a
    * leaky bucket refilled by reactivation — these columns tell them
    * apart).
    *
    * Scale shape: events collapse to the distinct (user, week) frame in
    * one shuffle (map-side combined); the status window (lag week +
    * running min) rides the SAME user partitioning; the rollup and the
    * churn lag live on the week-dimension frame. Integers end to end;
    * the one ratio guards /0 with a 0.0 sentinel, 4dp. */
  def eventsLifecycle(spark: SparkSession, dir: String): DataFrame =
    eventsLifecycleOn(Tables.events(spark, dir))

  def eventsLifecycleOn(events: DataFrame): DataFrame = {
    val act = events
      .select(col("user_id"),
        (col("ts").cast("long") / 604800L).cast("long").as("week"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("week"))
    val status = act
      .withColumn("prev", lag(col("week"), 1).over(w))
      .select(col("week"),
        when(col("prev").isNull, "new")
          .when(col("prev") === col("week") - 1L, "retained")
          .otherwise("resurrected").as("status"))
    val weekly = status.groupBy(col("week")).agg(
      count(lit(1)).as("n_active"),
      sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
      sum(when(col("status") === "retained", 1L).otherwise(0L))
        .as("n_retained"),
      sum(when(col("status") === "resurrected", 1L).otherwise(0L))
        .as("n_resurrected"))
    val ww = Window.orderBy(col("week"))
    weekly
      .withColumn("prev_active", lag(col("n_active"), 1).over(ww))
      .withColumn("prev_week", lag(col("week"), 1).over(ww))
      .select(col("week"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        when(col("prev_week") === col("week") - 1L,
          col("prev_active") - col("n_retained"))
          .otherwise(coalesce(col("prev_active"), lit(0L)))
          .as("n_churned"))
      .withColumn("quick_ratio",
        when(col("n_churned") > 0L,
          round((col("n_new") + col("n_resurrected")).cast("double") /
            col("n_churned"), 4)).otherwise(0.0))
  }

  /** Seasonal-naive forecast backtest (r11): per event_type, the MAE of
    * the "same hour last week" forecast vs the "previous hour"
    * persistence baseline over a DENSE hourly grid, plus their skill
    * ratio — the sanity baseline every capacity-planning / anomaly
    * model must beat before it ships (if a learned model can't beat
    * count[h−168], it's memorizing seasonality badly). Missing hours
    * are REAL zeros: evaluating only on observed hours silently
    * inflates skill exactly where traffic dies, so the grid
    * materializes from the corpus' own [min, max] hour span.
    *
    * Scale shape: events collapse to the (hour × type) count frame in
    * ONE map-side-combined agg — the only corpus-sized pass; the dense
    * spine builds from a broadcast 1-row min/max and the
    * type-dimension frame (time-bounded, not data-bounded), lags are
    * one window over that dimension-sized grid, and the rollup is
    * type-sized. Counts are exact integers; MAE = Σ|diff|/n in one
    * shared division, 4dp; skill guards the zero-MAE baseline. */
  def eventsForecastBaseline(spark: SparkSession, dir: String): DataFrame =
    eventsForecastBaselineOn(Tables.events(spark, dir))

  def eventsForecastBaselineOn(events: DataFrame,
                               seasonHours: Int = 168): DataFrame = {
    val hourly = events
      .select((col("ts").cast("long") / 3600L).cast("long").as("h"),
        col("event_type"))
      .groupBy(col("h"), col("event_type")).agg(count(lit(1)).as("n"))
    val bounds = broadcast(hourly.agg(min(col("h")).as("h0"),
      max(col("h")).as("h1")))
    val types = hourly.select(col("event_type")).distinct()
    val spine = types.crossJoin(bounds)
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
    val dense = spine.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val scored = dense
      .withColumn("season", lag(col("n"), seasonHours).over(w))
      .withColumn("persist", lag(col("n"), 1).over(w))
      .filter(col("season").isNotNull)
    val agg = scored.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_hours"),
      sum(abs(col("n") - col("season"))).as("se"),
      sum(abs(col("n") - col("persist"))).as("pe"))
    agg.select(col("event_type"), col("n_hours"),
      round(col("se").cast("double") / col("n_hours"), 4)
        .as("mae_seasonal"),
      round(col("pe").cast("double") / col("n_hours"), 4)
        .as("mae_persist"),
      when(col("pe") > 0L,
        round(col("se").cast("double") / col("pe"), 4))
        .otherwise(0.0).as("skill"))
  }

  /** First-touch / last-touch conversion attribution (r11): for every
    * `purchase`, the earliest and latest non-purchase event by the same
    * user inside the lookback window gets the credit; conversions with
    * no prior touch report as `(direct)`. The marketing-analytics
    * staple ("which channel opens journeys, which one closes them").
    *
    * The naive shape is a touches×conversions self-join per user —
    * quadratic in events for a hot user. The right shape is ONE
    * per-user range window over epoch seconds: first/last touch are
    * `min`/`max` of a conditional (tsec, event_id, event_type) struct
    * over `[-lookback, -1]` — event_id breaks same-second ties, so the
    * order is total and both engines agree. One shuffle on user_id,
    * window state bounded by the lookback horizon; the two rollups then
    * aggregate the CONVERSION frame only (a fraction of events), meet
    * in a type-dimension-sized full outer join, and every count/value
    * is exact (DECIMAL sums, the [[Money.dec]] rule). */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame =
    eventsAttributionOn(Tables.events(spark, dir))

  /** The un-materialized (first × last) touch-type cell grid — exposed
    * separately so the plan-pin spec can assert "exactly one user_id
    * exchange" on the frame that still CONTAINS that exchange;
    * [[eventsAttributionOn]] checkpoints it before the two rollups, so
    * its own executed plan starts from a LogicalRDD (VERDICT r11 §wrong 1). */
  def eventsAttributionCells(events: DataFrame,
                             lookbackHours: Int = 168): DataFrame = {
    import graft.queries.Money.dec
    val e = events.select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), col("ts").cast("long").as("tsec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
      .rangeBetween(-lookbackHours.toLong * 3600L, -1L)
    val touch = when(col("event_type") =!= "purchase",
      struct(col("tsec"), col("event_id"), col("event_type").as("et")))
    val conv = e
      .withColumn("ft", min(touch).over(w))
      .withColumn("lt", max(touch).over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("ft.et"), lit("(direct)")).as("first_type"),
        coalesce(col("lt.et"), lit("(direct)")).as("last_type"),
        col("value"))
    conv.groupBy(col("first_type"), col("last_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("v"))
  }

  def eventsAttributionOn(events: DataFrame,
                          lookbackHours: Int = 168): DataFrame = {
    import graft.queries.Money.asDouble
    // ONE pass to the (first × last) cell grid — ≤ |types|² rows,
    // materialized so the two rollups don't each replay the scan +
    // window subtree (the exchange pin lives on eventsAttributionCells)
    val cells = graft.Exec.materialize(
      eventsAttributionCells(events, lookbackHours))
    val first = cells.groupBy(col("first_type").as("touch_type"))
      .agg(sum(col("n")).as("first_touch"), sum(col("v")).as("fv"))
    val last = cells.groupBy(col("last_type").as("touch_type"))
      .agg(sum(col("n")).as("last_touch"), sum(col("v")).as("lv"))
    first.join(last, Seq("touch_type"), "full_outer")
      .select(col("touch_type"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        asDouble(coalesce(col("fv"), lit(0).cast("decimal(12,2)")))
          .as("first_touch_value"),
        asDouble(coalesce(col("lv"), lit(0).cast("decimal(12,2)")))
          .as("last_touch_value"))
  }

  /** Stationary distribution of the event-type Markov chain (r12):
    * where a user's session settles in the long run — the equilibrium
    * the per-step [[Analytics2.eventsTransitions]] matrix implies but
    * doesn't state. A type whose stationary mass far exceeds its raw
    * frequency share is an attractor (sessions funnel into it and
    * stay); the gap between the two is the signal a one-step
    * transition report can't show.
    *
    * Shape: the corpus pays exactly the transitions aggregation — one
    * user_id window + one map-side-combined (prev, next) count to a
    * ≤ |types|² frame; that DIMENSION-sized matrix collects to the
    * driver (the Heaps-β/`vocabGrowth` rule: driver arithmetic on
    * dimension-sized data is honest) where `steps` power-iteration
    * steps run in deterministic left-to-right summation order — the
    * DuckDB oracle replays the identical recursive loop with
    * `list_sum`'s identical order, so both engines walk one IEEE
    * trajectory. A dangling type (no outgoing transitions)
    * redistributes uniformly, the PageRank convention. Probabilities
    * round 4dp at the END only. */
  def eventsMarkovStationary(spark: SparkSession, dir: String,
                             steps: Int = 20): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val types = counts.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    val m = types.size
    val rowTot = types.map(t =>
      types.map(u => counts.getOrElse((t, u), 0L)).sum)
    val p = Array.tabulate(m, m) { (j, k) =>
      if (rowTot(j) == 0L) 1.0 / m
      else counts.getOrElse((types(j), types(k)), 0L).toDouble / rowTot(j)
    }
    var pi = Array.fill(m)(1.0 / m)
    for (_ <- 1 to steps)
      pi = Array.tabulate(m)(k => (0 until m).map(j => pi(j) * p(j)(k)).sum)
    val total = rowTot.sum.toDouble
    types.indices.map { i =>
      (types(i), rowTot(i),
        BigDecimal(pi(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble + 0.0,
        BigDecimal(
          if (total == 0.0) 0.0 else rowTot(i) / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    }.toDF("event_type", "n_transitions_out", "stationary_prob",
      "outflow_share")
  }

  /** DAU/MAU stickiness (r12): per calendar day, the active-user count,
    * the trailing-30-day active-user count, and their ratio — the
    * engagement metric every growth dashboard tracks next to
    * [[eventsDauWau]]'s spot counts and [[eventsLifecycle]]'s weekly
    * accounting. Missing days are REAL rows (DAU 0, MAU still counts
    * the trailing window) — the dense-spine rule
    * [[eventsForecastBaselineOn]] established, because stickiness
    * evaluated only on active days silently hides the dead ones.
    *
    * Scale shape: the corpus collapses ONCE to the distinct
    * (user, day) frame (map-side-combined); DAU is a count over it;
    * the trailing window is NOT a cumulative-distinct window (none
    * exists) nor a day×user range join — each (user, day) row explodes
    * to the ≤ 30 window-end days it covers, a bounded 30× of the
    * user-day frame, and MAU is one countDistinct per day over that.
    * The spine is dimension-sized (days × nothing). Exact ints, ratio
    * 4dp. */
  def eventsStickiness(spark: SparkSession, dir: String,
                       windowDays: Int = 30): DataFrame = {
    // PERSISTED (r17, guide §1.2): the distinct (user, day) frame feeds
    // the DAU rollup, the bounds agg, and the MAU window cover — three
    // otherwise-recomputed references. ContextCleaner-freed.
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), datediff(to_date(col("ts")), epoch).as("di"))
      .distinct()
      .persist()
    val dau = ud.groupBy(col("di")).agg(count(lit(1)).as("dau"))
    val bounds = broadcast(ud.agg(min(col("di")).as("d0"),
      max(col("di")).as("d1")))
    val cover = ud.select(col("user_id"),
      explode(sequence(col("di"),
        col("di") + lit(windowDays - 1))).as("di"))
    val mau = cover.join(broadcast(bounds), cover("di") <= bounds("d1"))
      .groupBy(col("di")).agg(countDistinct(col("user_id")).as("mau"))
    val spine = bounds.select(explode(sequence(col("d0"), col("d1")))
      .as("di"))
    spine.join(dau, Seq("di"), "left").join(mau, Seq("di"), "left")
      .select(date_add(epoch, col("di")).as("d"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("mau"), lit(0L)).as("mau"),
        when(coalesce(col("mau"), lit(0L)) > 0L,
          round(coalesce(col("dau"), lit(0L)).cast("double") / col("mau"),
            4)).otherwise(0.0).as("stickiness"))
  }

  /** Hourly autocorrelation function (r12): ACF at lags 1..`maxLag`
    * of the DENSE corpus-wide hourly event-count series — the
    * statistical twin of `events_seasonality` (that one profiles
    * hour-of-day/day-of-week means; this one measures how much the
    * series REMEMBERS at each offset, which is what picks the seasonal
    * window `events_forecast_baseline` takes as input: a daily cycle
    * shows as an ACF spike at lag 24, sessionful traffic as high lag-1
    * mass, white noise as nothing). The grid must be dense — skipping
    * empty hours silently shortens every lag and biases r upward —
    * so missing hours are real zeros off a broadcast min/max spine
    * (the forecast_baseline spine rule).
    *
    * Scale shape: ONE map-side-combined rollup collapses the corpus
    * to the |hours| frame (materialized, reused 3×); the lag pairing
    * is a (maxLag × |hours|) self-join over THAT dimension-sized
    * frame, never the corpus; totals ride a 1-row broadcast.
    * Determinism: every sum is an exact integer (counts and count
    * products); r_k = (Σab − μΣa − μΣb + mμ²)/(Σc² − nμ²) is one
    * shared IEEE tree over them, rounded 4dp, with a zero-variance
    * guard. */
  def eventsAutocorrelation(spark: SparkSession, dir: String,
                            maxLag: Int = 24): DataFrame =
    eventsAutocorrelationOn(Tables.events(spark, dir), maxLag)

  def eventsAutocorrelationOn(events: DataFrame,
                              maxLag: Int = 24): DataFrame = {
    val spark = events.sparkSession
    val hourly = events
      .select((col("ts").cast("long") / 3600L).cast("long").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
    val bounds = broadcast(hourly.agg(min(col("h")).as("h0"),
      max(col("h")).as("h1")))
    val dense = graft.Exec.materialize(
      bounds.select(explode(sequence(col("h0"), col("h1"))).as("h"))
        .join(hourly, Seq("h"), "left")
        .select(col("h"), coalesce(col("c"), lit(0L)).as("c")))
    val tot = broadcast(dense.agg(count(lit(1)).as("n"),
      sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2")))
    val lags = spark.range(1, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    val pairs = lags.crossJoin(dense.select(col("h"), col("c").as("ca")))
      .join(dense.select(col("h").as("hb"), col("c").as("cb")),
        col("hb") === col("h") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("m"),
        sum(col("ca") * col("cb")).as("sab"),
        sum(col("ca")).as("sa"), sum(col("cb")).as("sb"))
    val mu = col("s1").cast("double") / col("n")
    val den = col("s2").cast("double") - col("n") * mu * mu
    pairs.crossJoin(tot)
      .select(col("lag"), col("m").as("n_pairs"),
        when(den =!= 0.0,
          round((col("sab").cast("double") - mu * col("sa")
            - mu * col("sb") + col("m") * mu * mu) / den, 4))
          .otherwise(0.0).as("acf"))
      .orderBy(col("lag"))
  }

  /** Kaplan–Meier churn-survival curve over customer order lifetimes
    * (r12): per observed exit week, the at-risk population, churn and
    * censor exits, the discrete hazard d/n, and the product-limit
    * survival S(t) = Π_{u≤t}(1 − d_u/n_u) — the censoring-aware
    * estimator (Kaplan & Meier 1958) that retention curves get wrong:
    * a customer still ordering at the corpus edge hasn't churned,
    * merely stopped being observed, and counting them as churned
    * biases every naive lifetime average low. A customer's observed
    * time is last−first order date in whole weeks; customers whose
    * last order falls within `censorDays` of the corpus end are
    * CENSORED (leave the risk set without a churn event), everyone
    * else churned at their observed week. Runs on orders (multi-year
    * span, real churn/censor mix) rather than events (the 30-day
    * window censors everyone — measured before choosing the
    * substrate).
    *
    * Scale shape: ONE custkey shuffle (min/max date agg) collapses
    * the fact table to |customers| rows; exits roll up
    * map-side-combined to the ≤|weeks| frame; at-risk counts and the
    * product-limit fold are windows over THAT dimension-sized frame
    * (the q_rolling_revenue argument — the single-partition sort
    * never sees the corpus). Determinism: counts are exact integers;
    * survival is exp(Σ ln(1−h)) over the week-ordered window —
    * identical summation order on both engines — with an exact-zero
    * guard for the final h=1 week (ln(0) never evaluates);
    * hazard/survival rounded 4dp. */
  def qCustomerSurvival(spark: SparkSession, dir: String,
                        censorDays: Int = 90): DataFrame = {
    val users = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"))
      .groupBy("o_custkey")
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
    val maxD = broadcast(users.agg(max(col("last_d")).as("max_d")))
    val exits = users.crossJoin(maxD)
      .select(
        (datediff(col("last_d"), col("first_d")) / 7).cast("int")
          .as("week"),
        (datediff(col("max_d"), col("last_d")) > censorDays)
          .as("churned"))
      .groupBy("week")
      .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("n_churned"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("n_censored"))
    val wAll = Window.orderBy("week")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrev = Window.orderBy("week")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("week")
    val h = col("n_churned").cast("double") / col("n_risk")
    exits
      .withColumn("n_risk",
        sum(col("n_churned") + col("n_censored")).over(wAll) -
          coalesce(sum(col("n_churned") + col("n_censored")).over(wPrev),
            lit(0L)))
      .select(col("week"), col("n_risk"), col("n_churned"),
        col("n_censored"),
        round(h, 4).as("hazard"),
        round(when(min(lit(1.0) - h).over(wCum) === 0.0, lit(0.0))
          .otherwise(exp(sum(log(lit(1.0) - h)).over(wCum))), 4)
          .as("survival"))
  }
}
