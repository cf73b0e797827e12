package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 second analytics wave: gaps-and-islands streaks,
  * load-correlation screening, cross-table balance/activity profiling,
  * time-bounded funnels, and join-fan-out profiling — classic
  * operations-analytics shapes the earlier families don't cover.
  *
  * Determinism contract as [[Analytics5]]: exact integer/DECIMAL
  * aggregates into one final IEEE tree, 4dp at the edge. */
object Analytics6 {

  private val d = (c: Column) => c.cast("double")

  /** Consecutive-day activity streaks (gaps-and-islands): a user active
    * on days {3,4,5, 9} has streaks of 3 and 1. The table gives the
    * streak-length histogram plus, per length, how many users top out
    * there — the engagement-habit readout ([[Analytics2.eventsDauWau]]
    * gives level, this gives PERSISTENCE; a product with many 1-day
    * streaks and few 3+ has visitors, not habits).
    *
    * The island key is the textbook day − row_number(): constant within
    * a consecutive run, strictly decreasing across gaps — all integer
    * arithmetic, engine-identical.
    *
    * Scale shape: one distinct (user, day) reduction (map-side), one
    * user-partitioned window (the sessionization shuffle), then
    * histogram-sized rollups. */
  def eventsStreaks(spark: SparkSession, dir: String): DataFrame =
    eventsStreaksOn(Tables.events(spark, dir))

  def eventsStreaksOn(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val streaks = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    val best = streaks.groupBy(col("user_id"))
      .agg(max(col("len")).as("len"))
      .groupBy(col("len").as("streak_days"))
      .agg(count(lit(1)).as("n_users_best"))
    val tot = broadcast(streaks.agg(count(lit(1)).as("n_total")))
    streaks.groupBy(col("len").as("streak_days"))
      .agg(count(lit(1)).as("n_streaks"))
      .join(best, Seq("streak_days"), "left")
      .crossJoin(tot)
      .select(col("streak_days"), col("n_streaks"),
        coalesce(col("n_users_best"), lit(0L)).as("n_users_best"),
        round(d(col("n_streaks")) / d(col("n_total")), 4).as("share"))
  }

  /** Which event types scale with load: per type, the Pearson
    * correlation (and regression slope) of its hourly count against
    * TOTAL hourly traffic across the active-hour span. Types that track
    * load (corr ≈ 1) are organic; a type that doesn't (errors firing at
    * a constant rate at 3am) has an external driver — the first
    * question an on-call asks of an error-rate graph. Absent
    * (type, hour) cells count as zero observations against that hour's
    * load; hours with NO traffic at all are outside the span (an
    * all-zero observation adds no information and the active-hour
    * convention keeps the frame spine-free). The total includes the
    * type itself — the operator answers "does it track overall
    * traffic", not "does it track everyone else".
    *
    * Exact integer moments ([[Analytics5.qPriceElasticity]] rule), one
    * IEEE tree, 4dp. Moment exactness (r13 advice, promoted r15): the
    * second moments and their combine products accumulate in
    * DECIMAL(38,0) — the [[graft.llm.Dedup]] pair-budget pattern — so
    * they are exact to 10³⁸ (≈10¹⁹ events/hour over a 10⁵-hour span)
    * instead of wrapping at the ~10⁹-per-hour BIGINT square bound
    * (Spark would WRAP where DuckDB errors — silent divergence).
    *
    * Scale shape: ONE (type, hour) map-side count; the dense
    * type×active-hour frame is dimension-sized (|types| · span_hours)
    * regardless of corpus size. */
  def eventsErrorLoadCorr(spark: SparkSession, dir: String): DataFrame =
    eventsErrorLoadCorrOn(Tables.events(spark, dir))

  def eventsErrorLoadCorrOn(events: DataFrame): DataFrame = {
    val th = events.groupBy(col("event_type"),
        expr("unix_millis(ts) div 3600000").as("h"))
      .agg(count(lit(1)).as("n"))
    val tot = th.groupBy(col("h")).agg(sum(col("n")).as("nt"))
    val types = th.select(col("event_type")).distinct()
    val cells = tot.crossJoin(broadcast(types))
      .join(th, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("nt").as("y"),
        coalesce(col("n"), lit(0L)).as("x"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cov = d(d38(col("nh")) * col("sxy") - d38(col("sx")) * col("sy"))
    val varx = d(d38(col("nh")) * col("sxx") - d38(col("sx")) * col("sx"))
    val vary = d(d38(col("nh")) * col("syy") - d38(col("sy")) * col("sy"))
    cells.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nh"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(d38(col("x")) * col("x")).as("sxx"),
        sum(d38(col("x")) * col("y")).as("sxy"),
        sum(d38(col("y")) * col("y")).as("syy"))
      .select(col("event_type"), col("nh").as("n_hours"),
        col("sx").as("n_events"),
        round(d(col("sx")) / d(col("sy")), 4).as("load_share"),
        // degenerate-fit guards (r14 audit): one active hour, or a
        // type firing an identical count every hour, zeroes a variance
        // — NULL ("no co-movement measurable") instead of a NaN whose
        // rendering diverges between the gate's readers
        when(varx * vary === 0.0, lit(null))
          .otherwise(round(cov / sqrt(varx * vary), 4))
          .as("corr_with_load"),
        when(vary === 0.0, lit(null))
          .otherwise(round(cov / vary, 4)).as("events_per_load_unit"))
  }

  /** Customer balance bands × order activity — the cross-table
    * credit-vs-behavior profile: per fixed acctbal band, how many
    * customers, how they order, and where the revenue sits. Fixed band
    * edges (not quantiles) keep the table comparable across runs and
    * engines; customers with no orders still count in their band (LEFT
    * join), which is the point — a top-balance band full of dormant
    * accounts is the churn-risk readout.
    *
    * Scale shape: one broadcast-free shuffle join orders→customer on
    * custkey (both sides key-partitioned), DECIMAL revenue, band
    * rollups on a 5-row frame. */
  def qBalanceActivity(spark: SparkSession, dir: String): DataFrame =
    qBalanceActivityOn(Tables.customer(spark, dir),
      Tables.orders(spark, dir))

  def qBalanceActivityOn(customer: DataFrame, orders: DataFrame)
      : DataFrame = {
    val band = when(col("c_acctbal") < 0, "1_negative")
      .when(col("c_acctbal") < 2500, "2_low")
      .when(col("c_acctbal") < 5000, "3_mid")
      .when(col("c_acctbal") < 7500, "4_high")
      .otherwise("5_top")
    val cust = customer.select(col("c_custkey"), band.as("band"))
    val perCust = orders
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val joined = cust.join(perCust,
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_customers"),
        sum(coalesce(col("n_orders"), lit(0L))).as("n_orders"),
        sum(coalesce(col("rev"), lit(0).cast("decimal(18,2)")))
          .as("rev"))
    val tot = broadcast(joined.agg(sum(col("rev")).as("tr")))
    joined.crossJoin(tot)
      .select(col("band"), col("n_customers"), col("n_orders"),
        round(d(col("n_orders")) / d(col("n_customers")), 4)
          .as("orders_per_customer"),
        d(col("rev")).as("revenue"),
        round(d(col("rev")) / d(col("tr")), 4).as("revenue_share"),
        round(d(col("rev")) / d(greatest(col("n_orders"), lit(1L))), 4)
          .as("avg_order_value"))
  }

  /** Time-bounded funnel (ClickHouse windowFunnel semantics, min-based):
    * step i must happen AFTER the user's step-(i−1) time and within
    * `window` of it, taking the EARLIEST qualifying event at each step.
    * [[Analytics2.funnel]] is the unbounded-time variant; bounding each
    * hop is what separates "eventually purchased" from "purchased in
    * the session the click started" — the number an ads attribution
    * window actually pays on.
    *
    * Scale shape: one grouped min per step over a user-keyed frame (the
    * same shuffle key each step, so the exchange is reused), 1-row
    * count frames crossed into the 3-row output. */
  def eventsWindowFunnel(spark: SparkSession, dir: String): DataFrame =
    eventsWindowFunnelOn(Tables.events(spark, dir))

  def eventsWindowFunnelOn(events: DataFrame,
                           steps: Seq[String] = Seq("view", "click",
                             "purchase"),
                           window: String = "INTERVAL 1 HOUR")
      : DataFrame = {
    require(steps.size == 3, "the 3-step shape is the driver contract")
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    // PERSISTED (r17, guide §1.2): each step frame feeds BOTH the next
    // step's join and its own count, and the 3-branch output union
    // referenced the whole chain once per branch — the pre-persist
    // plan scanned events 18 times (plans/r17/events_window_funnel_
    // before.txt). The boundaries pin each step to one execution;
    // per-user min frames, corpus-slim, ContextCleaner-freed.
    val s1 = ev.filter(col("event_type") === steps(0))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      .persist()
    val s2 = ev.filter(col("event_type") === steps(1))
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr(window))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      .persist()
    val s3 = ev.filter(col("event_type") === steps(2))
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr(window))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val c = s1.agg(count(lit(1)).as("n1"))
      .crossJoin(s2.agg(count(lit(1)).as("n2")))
      .crossJoin(s3.agg(count(lit(1)).as("n3")))
      .persist()
    def conv(a: Column, b: Column): Column =
      round(d(a) / d(greatest(b, lit(1L))), 4)
    c.select(lit(1).as("step"), lit(steps(0)).as("step_type"),
        col("n1").as("n_users"), lit(1.0).as("conv_from_prev"),
        lit(1.0).as("conv_from_first"))
      .unionByName(c.select(lit(2).as("step"),
        lit(steps(1)).as("step_type"), col("n2").as("n_users"),
        conv(col("n2"), col("n1")).as("conv_from_prev"),
        conv(col("n2"), col("n1")).as("conv_from_first")))
      .unionByName(c.select(lit(3).as("step"),
        lit(steps(2)).as("step_type"), col("n3").as("n_users"),
        conv(col("n3"), col("n2")).as("conv_from_prev"),
        conv(col("n3"), col("n1")).as("conv_from_first")))
  }

  /** Lines-per-order width profile — the join fan-out histogram every
    * planner wants before joining orders×lineitem: per order width
    * (number of lines), how many orders, their share, and the revenue
    * they carry. A heavy tail here is exactly the skew
    * [[graft.operators.SkewProfile]] prices on keys, read on the
    * structural axis instead.
    *
    * Scale shape: one l_orderkey agg (map-side combined), then a
    * ≤ max-width histogram rollup with a 1-row broadcast total. */
  def qOrderWidthProfile(spark: SparkSession, dir: String): DataFrame =
    qOrderWidthProfileOn(Tables.lineitem(spark, dir))

  def qOrderWidthProfileOn(lineitem: DataFrame): DataFrame = {
    import Money.discPrice
    val perOrder = lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("w"), sum(discPrice).as("rev"))
    val hist = perOrder.groupBy(col("w").as("lines_per_order"))
      .agg(count(lit(1)).as("n_orders"), sum(col("rev")).as("rev"))
    val tot = broadcast(hist.agg(sum(col("n_orders")).as("tn"),
      sum(col("rev")).as("tr")))
    hist.crossJoin(tot)
      .select(col("lines_per_order"), col("n_orders"),
        round(d(col("n_orders")) / d(col("tn")), 4).as("share"),
        d(col("rev")).as("revenue"),
        round(d(col("rev")) / d(col("tr")), 4).as("revenue_share"),
        round(d(col("rev")) / d(col("n_orders")), 4)
          .as("avg_order_revenue"))
  }
}
