package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 analytics wave 1: weighted order statistics and the
  * winsorized-mean robust KPI — the [[graft.operators.RankSelect]]
  * family extended to weight-expanded multisets. Determinism contract
  * as [[Analytics5]]/[[Analytics6]]: integer/DECIMAL accumulation,
  * doubles only at the output edge (4dp), selected rows never
  * interpolated, NULLs excluded up front on both engines. */
object Analytics8 {

  private val d = (c: Column) => c.cast("double")

  /** Quantity-weighted median unit price per return flag — "the price
    * of the median shipped UNIT", the inventory-weighted KPI a plain
    * row median gets wrong whenever cheap lines carry bulk quantity.
    * The weighted median is the exact lower median of the multiset
    * with each line repeated l_quantity times, selected WITHOUT the
    * expansion ([[graft.operators.RankSelect.selectValuesWeighted]]:
    * the histogram counts weight mass instead of rows — at 100 TB the
    * expansion would be ~50× the fact table, the weighted histogram
    * is the same two bounded passes as the unweighted one). The plain
    * row median rides the same call tree for contrast.
    *
    * Scale shape: two histogram selections (each: one map-side
    * extent, one ≤1024-bucket histogram + bounded prefix window, one
    * single-bucket resolve) + one map-side-combined count — no
    * group-sized sort, no expansion. */
  def qPriceWeightedMedian(spark: SparkSession, dir: String): DataFrame =
    qPriceWeightedMedianOn(Tables.lineitem(spark, dir))

  def qPriceWeightedMedianOn(lineitem: DataFrame): DataFrame = {
    import graft.operators.RankSelect
    val li = lineitem.select(col("l_returnflag"),
      col("l_extendedprice"),
      col("l_quantity").cast("long").as("qty"))
    // ONE stats scan serves both selections and the totals row: the
    // extent is weight-independent, only __n differs (rows vs mass)
    val both = graft.Exec.materialize(
      li.groupBy(col("l_returnflag"))
        .agg(min(col("l_extendedprice").cast("double")).as("__vmin"),
          max(col("l_extendedprice").cast("double")).as("__vmax"),
          count(lit(1)).as("n_lines"), sum(col("qty")).as("total_qty")))
    val wstats = both.select(col("l_returnflag"), col("__vmin"),
      col("__vmax"), col("total_qty").as("__n"))
    val ustats = both.select(col("l_returnflag"), col("__vmin"),
      col("__vmax"), col("n_lines").as("__n"))
    val wsel = RankSelect.selectValuesWeighted(li, Seq("l_returnflag"),
        "l_extendedprice", "qty", RankSelect.lowMedian,
        stats = Some(wstats))
      .select(col("l_returnflag"),
        col("l_extendedprice").as("wmedian_price"))
    val usel = RankSelect.selectValues(li, Seq("l_returnflag"),
        "l_extendedprice", RankSelect.lowMedian, stats = Some(ustats))
      .select(col("l_returnflag"),
        col("l_extendedprice").as("median_price"))
    both.select(col("l_returnflag"), col("n_lines"), col("total_qty"))
      .join(usel, Seq("l_returnflag"))
      .join(wsel, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_lines"), col("total_qty"),
        col("median_price"), col("wmedian_price"))
  }

  /** Winsorized mean of event values per type — the OTHER robust
    * mean: where [[Analytics7.eventsValueTrimmed]] DROPS the tail
    * ranks, winsorizing CLAMPS every value into [p10, p90] (selected
    * boundary values, ceil-rank convention of
    * [[Analytics7.eventsValuePercentiles]]) so n is preserved — the
    * estimator of choice when the tail rows must keep their weight
    * (billing reconciliation: every event counts once, outliers just
    * can't dominate). Clamped sum in closed form from one grouped
    * pass: S − S(v<lo) + lo·c(v<lo) − S(v>hi) + hi·c(v>hi), DECIMAL
    * accumulation, so no second scan materializes clamped values.
    *
    * Scale shape: one histogram selection (both boundary ranks ride
    * one pass), one map-side-combined grouped aggregate over the
    * corpus, 5-row broadcast joins. */
  /** Pareto / ABC analysis per brand: the MINIMAL number of parts
    * whose (gross, cents-exact) revenue covers 80% of the brand's
    * total, under the canonical order (revenue desc, partkey asc) —
    * "how concentrated is this brand's catalog" as a COUNT, where
    * [[qAcctbalGini]] gives the index. Rides
    * [[graft.operators.OrderedPrefix]] on the NEGATED revenue
    * (exclusive prefixes over strictly-larger revenues); within the
    * one tie class that crosses the bar, the extra members needed are
    * j = ceil((4T − 5S)/(5v)) evaluated as the INTEGER
    * (x + 5v − 1) div (5v) on longs — the whole crossing is integer
    * arithmetic (5·cum ≥ 4·T in DECIMAL, never 0.8·double; the long
    * residual x = 4T − 5S is bounded by the crossing class's own
    * revenue mass 5·v·c), and k is tie-order invariant because tie
    * members are interchangeable.
    *
    * Scale shape: one (brand, part) revenue aggregate (part-domain
    * bounded), the bounded prefix windows, a 1-row-per-brand filter. */
  def qRevenuePareto(spark: SparkSession, dir: String): DataFrame =
    qRevenueParetoOn(Tables.lineitem(spark, dir), Tables.part(spark, dir))

  def qRevenueParetoOn(lineitem: DataFrame, partT: DataFrame): DataFrame = {
    import graft.operators.OrderedPrefix
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val li = lineitem
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
    val part = partT.select(col("p_partkey"), col("p_brand"))
    val rev = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(col("cents")).as("rev"))
      .select(col("p_brand"), (-col("rev")).as("nrev"))
    val pref = OrderedPrefix.distinctPrefix(rev, Seq("p_brand"), "nrev")
    // per tie class (v = −nrev): F parts and S cents strictly above
    val cls = pref.select(col("p_brand"), (-col("nrev")).as("v"),
      col("__c"), col("__cumc").as("f"), (-col("__cums")).as("s"))
    val tot = cls.groupBy(col("p_brand"))
      .agg(sum(col("__c")).as("n_parts"),
        sum(d38(col("v")) * col("__c")).as("t"))
    val j = expr("(__x + 5L * v - 1L) div (5L * v)")
    cls.join(broadcast(tot), Seq("p_brand"))
      // exactly one class crosses: 5S < 4T ≤ 5(S + c·v)
      .filter(lit(5) * col("s") < lit(4) * col("t") &&
        lit(5) * (col("s") + d38(col("v")) * col("__c")) >=
          lit(4) * col("t"))
      // the long residual only exists on the crossing row, where the
      // filter bounds it by the class's own mass 5·v·c (ANSI casts
      // throw on overflow — computing x pre-filter would risk that on
      // the deep tail rows)
      .withColumn("__x", (lit(4) * col("t") - lit(5) * col("s"))
        .cast("long"))
      .select(col("p_brand"), col("n_parts"),
        round(col("t").cast("double") / lit(100.0), 2)
          .as("total_revenue"),
        (col("f") + j).as("parts_for_80pct"),
        round((col("f") + j).cast("double") / d(col("n_parts")), 4)
          .as("share_of_parts"))
  }

  /** EWMA surge baseline per event type: the α = ½, 20-day-horizon
    * exponentially weighted mean of daily counts up to D−1, and the
    * last day's actual against it — the ops-page "is today hot"
    * number ([[Analytics4]]'s forecast baseline reads seasonality;
    * this reads level with exponential forgetting). α = ½ is chosen
    * for DETERMINISM, not convenience: every weight 2^⁻ⁱ is a dyadic
    * rational, counts are ≤ ~2³⁷, and with the horizon capped at 20
    * the full significand spread stays under 53 bits — every partial
    * sum is EXACT in IEEE double, so the result is summation-order
    * independent and the two engines cannot diverge even though
    * windowed FP sums combine in different orders (Spark running
    * frames vs DuckDB segment trees). The ≤ 2⁻²⁰ tail mass the cap
    * drops is the documented truncation.
    *
    * Scale shape: one map-side (type, day) count, a per-type max
    * broadcast, a ≤ 20-row-per-type weighted reduce. */
  def eventsEwmaBaseline(spark: SparkSession, dir: String): DataFrame =
    eventsEwmaBaselineOn(Tables.events(spark, dir))

  def eventsEwmaBaselineOn(events: DataFrame): DataFrame = {
    val day = expr("unix_millis(ts) div 86400000")
    // PERSISTED (r17, guide §1.2): the daily cell frame feeds the maxd
    // agg and, through `joined`, both the EWMA history and the last-day
    // probe — three otherwise-recomputed corpus aggregations.
    val daily = events.select(col("event_type"), day.as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val maxd = daily.groupBy(col("event_type"))
      .agg(max(col("day")).as("maxd"))
    val joined = daily.join(broadcast(maxd), Seq("event_type"))
    val hist = joined
      .filter(col("day") >= col("maxd") - lit(20L) &&
        col("day") < col("maxd"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("days_used"),
        sum(d(col("c")) *
          pow(lit(2.0), d(col("day") - col("maxd")))).as("ewma"))
    val last = joined.filter(col("day") === col("maxd"))
      .select(col("event_type"), col("c").as("actual_last"))
    hist.join(last, Seq("event_type"))
      .select(col("event_type"), col("days_used"), col("ewma"),
        col("actual_last"),
        round(d(col("actual_last")) / col("ewma"), 4).as("surge_ratio"))
  }

  /** Value-decile band table for order totals: the nine exact decile
    * boundary VALUES (ceil-rank selection, one histogram pass) and,
    * per band, the order count and exact revenue share —
    * [[Analytics5.qOrderValueBands]] with data-driven boundaries
    * instead of fixed widths, and the order-side sibling of
    * [[qAcctbalLorenz]]. Band assignment is BY VALUE (band = 1 + #
    * boundaries strictly below), so tied orders always land together
    * — deterministic where ntile splits ties by arbitrary rank; bands
    * can be empty (heavy ties collapse them) and emitted counts are
    * the proof.
    *
    * Scale shape: one RankSelect pass (9 ranks share one histogram),
    * a 9-row broadcast, one map-side banded aggregate. */
  def qOrderValueDeciles(spark: SparkSession, dir: String): DataFrame =
    qOrderValueDecilesOn(Tables.orders(spark, dir))

  def qOrderValueDecilesOn(orders: DataFrame): DataFrame = {
    import graft.operators.RankSelect
    val o = orders.select(
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val ranksOf: Column => Column = n => array((1 to 9).map(dcl =>
      ceil(lit(dcl) * n.cast("double") / lit(10.0)).cast("long")): _*)
    val bounds = RankSelect.selectValues(o, Seq.empty, "cents", ranksOf)
      .groupBy()
      .agg(collect_list(struct(col("__ridx"), col("cents"))).as("bs"))
      .select(sort_array(col("bs")).getField("cents").as("bs"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val banded = o.crossJoin(broadcast(bounds))
      .select(col("cents"),
        (lit(1) + size(filter(col("bs"), b => b < col("cents"))))
          .as("band"))
    // Aggregate per band FIRST, then derive the totals as an
    // unpartitioned window over the ≤10 band rows — one orders scan,
    // no second aggregate lineage (ADVICE r14), and nothing cached or
    // checkpointed survives the call (the TableProfile r15 lesson:
    // per-invocation localCheckpoints accumulate block-manager
    // entries). The single-task window is bounded by the band count
    // (10), not the corpus.
    val perBand = banded.groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        sum(d38(col("cents"))).as("rev"))
    val wAll = Window.partitionBy()
    perBand
      .withColumn("n_orders_tot", sum(col("n_orders")).over(wAll))
      .withColumn("rev_tot", sum(col("rev")).over(wAll))
      .select(col("band"), col("n_orders"),
        round(col("rev").cast("double") / lit(100.0), 2).as("revenue"),
        round(col("n_orders").cast("double") /
          col("n_orders_tot").cast("double"), 4).as("order_share"),
        round(col("rev").cast("double") / col("rev_tot").cast("double"),
          4).as("revenue_share"))
  }

  /** Session-shape percentiles: exact p50/p90/p99 of session DURATION
    * and session EVENT COUNT over the 30-minute-gap sessionization —
    * the capacity-planning shape ("how long is a p99 session, how
    * chatty") that events_sessions lists raw and events_user_sessions
    * averages away. Sessions build with the standard lag + running
    * new-session flag (the per-user window every sessionization here
    * pays); both percentile families then ride GLOBAL RankSelect
    * histogram selections — single-group selection is exactly where
    * the old `row_number` construction was a one-task sort of EVERY
    * session, and where the bounded histogram matters most.
    *
    * Durations are integer milliseconds, counts integers — selected
    * rows, never interpolated. */
  def eventsSessionProfile(spark: SparkSession, dir: String): DataFrame =
    eventsSessionProfileOn(Tables.events(spark, dir))

  def eventsSessionProfileOn(events: DataFrame): DataFrame = {
    import graft.operators.RankSelect
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ms = expr("unix_millis(ts)")
    val flagged = events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("ms", ms)
      .withColumn("new_s",
        when(lag(col("ms"), 1).over(w).isNull ||
          col("ms") - lag(col("ms"), 1).over(w) > lit(1800000L), 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
    // r17: MATERIALIZED (guide §1.2 "don't recompute") — the two
    // RankSelect selections plus the count re-read this frame SEVEN
    // times (statsFor + histogram + located-bin per selection, + the
    // n_sessions agg), and each re-read re-paid the full per-user
    // sessionization window shuffle. One localCheckpoint of the
    // |sessions|-row 2-column frame (the events_rfm `per` convention)
    // makes every re-read a flat cached scan. Same rows, same
    // selections — result-identical by construction.
    val sessions = graft.Exec.materialize(
      flagged.groupBy(col("user_id"), col("sid"))
        .agg(min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"),
          count(lit(1)).as("n_events"))
        .select((col("end_ms") - col("start_ms")).as("dur_ms"),
          col("n_events")))
    val qs = Seq(0.5, 0.9, 0.99)
    val ranksOf: Column => Column = n =>
      array(qs.map(q => ceil(lit(q) * n.cast("double")).cast("long")): _*)
    def sel(valueCol: String, pfx: String): DataFrame =
      RankSelect.selectValues(sessions, Seq.empty, valueCol, ranksOf)
        .agg(max(when(col("__ridx") === 0, col(valueCol))).as(s"p50_$pfx"),
          max(when(col("__ridx") === 1, col(valueCol))).as(s"p90_$pfx"),
          max(when(col("__ridx") === 2, col(valueCol))).as(s"p99_$pfx"))
    val n = sessions.agg(count(lit(1)).as("n_sessions"))
    // Empty-input contract: the DuckDB oracle body yields 0 rows on an
    // empty events table (its rank join is empty), while agg-on-empty
    // plus crossJoin would emit one (0, NULL, …) row here — drop the
    // degenerate row so both engines agree (ADVICE r14).
    n.crossJoin(sel("dur_ms", "dur_ms"))
      .crossJoin(sel("n_events", "events"))
      .filter(col("n_sessions") > 0)
  }

  /** Ship-delay percentiles per order priority: exact p50/p90/p99 of
    * datediff(shipdate, orderdate) in days — the SLA dashboard
    * ("does URGENT actually ship faster, and by how much at the
    * tail"). The delay column only exists after the orders⋈lineitem
    * join (the natural orderkey co-partitioned fact join — at scale
    * both sides bucket on the key, no extra shuffle), then the three
    * ranks ride ONE [[graft.operators.RankSelect]] histogram pass on
    * small-integer days (the near-collapsed bucket regime: ~120
    * distinct values).
    *
    * Ceil-rank convention of [[Analytics7.eventsValuePercentiles]];
    * delays are int days — never interpolated, never doubled. */
  def qShipDelayProfile(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankSelect
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    // r17: MATERIALIZED — RankSelect's three passes plus the per-priority
    // count re-read this frame four times, and each re-read re-paid the
    // orders⋈lineitem join. One localCheckpoint of the narrow
    // (priority, delay_days) frame trades one write of ~16 B/row for
    // three repeated join executions (guide §1.2; the events_rfm
    // convention). Result-identical: same rows feed the same selection.
    val delays = graft.Exec.materialize(
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("delay_days")))
    val qs = Seq(0.5, 0.9, 0.99)
    val ranksOf: Column => Column = n =>
      array(qs.map(q => ceil(lit(q) * n.cast("double")).cast("long")): _*)
    val sel = RankSelect.selectValues(delays, Seq("o_orderpriority"),
      "delay_days", ranksOf)
    val counts = delays.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"))
    sel.groupBy(col("o_orderpriority"))
      .agg(max(when(col("__ridx") === 0, col("delay_days"))).as("p50_days"),
        max(when(col("__ridx") === 1, col("delay_days"))).as("p90_days"),
        max(when(col("__ridx") === 2, col("delay_days"))).as("p99_days"))
      .join(broadcast(counts), Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("n_lines"), col("p50_days"),
        col("p90_days"), col("p99_days"))
  }

  /** Week-over-week top movers per event type: the three weeks with
    * the largest |Δ count| vs the PREVIOUS ACTIVE week — the ops
    * review's "what changed" list ([[Analytics4.eventsMixDrift]]
    * reads composition drift; this reads raw level moves). Weeks are
    * epoch-day÷7 integers (engine-exact; no calendar-week dialect to
    * disagree on). Both windows partition by type over |weeks| rows —
    * bounded by the calendar, not the corpus; the heavy lifting is
    * the (type, week) count aggregate, map-side combined.
    *
    * Ranking tiebreak: |Δ| desc, then week asc — total order, so the
    * top-3 cut is deterministic. */
  def eventsTopMovers(spark: SparkSession, dir: String): DataFrame =
    eventsTopMoversOn(Tables.events(spark, dir))

  def eventsTopMoversOn(events: DataFrame): DataFrame = {
    val wk = expr("unix_millis(ts) div 86400000 div 7")
    val weekly = events
      .select(col("event_type"), wk.as("wk"))
      .groupBy(col("event_type"), col("wk"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    val withPrev = weekly
      .withColumn("prev_n", lag(col("n"), 1).over(byType))
      .filter(col("prev_n").isNotNull)
      .withColumn("delta", col("n") - col("prev_n"))
    val ranked = withPrev.withColumn("rk",
      row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(abs(col("delta")).desc, col("wk"))))
    ranked.filter(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("wk"), col("n"),
        col("prev_n"), col("delta"))
  }

  def eventsValueWinsorized(spark: SparkSession, dir: String): DataFrame =
    eventsValueWinsorizedOn(Tables.events(spark, dir))

  /** Exact Gini coefficient of positive account balances per market
    * segment — the concentration KPI (0 = perfectly even, →1 = one
    * customer holds everything). Closed form over the distinct-value
    * prefix frame ([[graft.operators.OrderedPrefix]]): a tie class of
    * c copies of value v with F rows strictly below occupies ranks
    * F+1..F+c, so Σ rank·value = Σ_v v·(c·F + c(c+1)/2) — exact
    * DECIMAL(38,0) (ranks reach corpus size, values 10^6 cents; the
    * product needs ~38 digits at warehouse scale, the pair-mass
    * rule), and G = 2R/(nT) − (n+1)/n only becomes DOUBLE at the
    * output edge. Rank-sum is tie-order invariant (tied rows share
    * v), so ANY total order gives the same R — no tiebreak needed.
    *
    * Scale shape: one distinct-cents shuffle (domain-bounded — acctbal
    * has ≤ ~1.1M distinct cent values at ANY corpus size), bounded
    * prefix windows, one |distinct|-sized grouped reduce. */
  def qAcctbalGini(spark: SparkSession, dir: String): DataFrame =
    qAcctbalGiniOn(Tables.customer(spark, dir))

  def qAcctbalGiniOn(customer: DataFrame): DataFrame = {
    import graft.operators.OrderedPrefix
    val cust = customer.filter(col("c_acctbal") > 0)
      .select(col("c_mktsegment"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal"))
    OrderedPrefix.gini(cust, Seq("c_mktsegment"), "bal")
      .select(col("c_mktsegment"), col("n").as("n_customers"),
        round(col("mean_raw") / lit(100.0), 4).as("mean_bal"),
        col("gini"))
  }

  /** Gini of per-user activity per event type — "is this event driven
    * by the crowd or by a handful of accounts" (→1 flags bot/power
    * concentration [[Analytics3.eventsBotProfile]] screens row-wise).
    * Same rank-sum algebra as [[qAcctbalGini]], but over the OTHER
    * distinct-value regime: values are per-user event counts, so the
    * distinct domain is tiny (counts 1..k) and the prefix frame
    * nearly collapses — the two queries together pin both ends of the
    * operator's bound. */
  def eventsUserGini(spark: SparkSession, dir: String): DataFrame =
    eventsUserGiniOn(Tables.events(spark, dir))

  def eventsUserGiniOn(events: DataFrame): DataFrame = {
    import graft.operators.OrderedPrefix
    val perUser = events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    OrderedPrefix.gini(perUser, Seq("event_type"), "n_events")
      .select(col("event_type"), col("n").as("n_users"),
        round(col("mean_raw"), 4).as("mean_events"), col("gini"))
  }

  /** Lorenz curve of positive balances per segment at the ten decile
    * ranks: with r_d = ceil(d·n/10), the cumulative balance share at
    * rank r_d is (S(v<b) + b·(r_d − F(v<b))) / T where b is the
    * SELECTED decile boundary value — the tie partial b·(r_d − F)
    * counts exactly the copies of b at ranks ≤ r_d, so the share is
    * exact even when a decile lands mid-tie (never interpolated, the
    * [[Analytics2.qMedianOrder]] rule). Rides ONE
    * [[graft.operators.OrderedPrefix]] frame: the boundary row for
    * rank r is the distinct value with F < r ≤ F + c — a broadcast
    * range-join of 10·|segments| targets against the distinct-value
    * frame, no second corpus pass.
    *
    * The straight reading: "the bottom 50% of SEGMENT's customers
    * hold cum_share of its receivable balance" — the audit view of
    * [[qAcctbalGini]]'s single number. */
  def qAcctbalLorenz(spark: SparkSession, dir: String): DataFrame =
    qAcctbalLorenzOn(Tables.customer(spark, dir))

  def qAcctbalLorenzOn(customer: DataFrame): DataFrame = {
    import graft.operators.OrderedPrefix
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cust = customer.filter(col("c_acctbal") > 0)
      .select(col("c_mktsegment"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal"))
    val pref = OrderedPrefix.distinctPrefix(cust, Seq("c_mktsegment"), "bal")
    val tot = pref.groupBy(col("c_mktsegment"))
      .agg(sum(col("__c")).as("n"),
        sum(d38(col("bal")) * col("__c")).as("t"))
    val targets = tot.select(col("c_mktsegment"), col("n"), col("t"),
        explode(sequence(lit(1), lit(10))).as("decile"))
      .withColumn("r", ceil(col("decile") * d(col("n")) / lit(10.0))
        .cast("long"))
    pref.join(broadcast(targets), Seq("c_mktsegment"))
      .filter(col("__cumc") < col("r") &&
        col("r") <= col("__cumc") + col("__c"))
      .select(col("c_mktsegment"), col("decile"),
        round(d(col("bal")) / lit(100.0), 2).as("bal_at"),
        round((col("__cums") + d38(col("bal")) *
            (col("r") - col("__cumc"))).cast("double")
          / col("t").cast("double"), 4).as("cum_share"))
  }

  /** 2-D skyline (Pareto frontier) of the part catalog on (retail
    * price ↓, size ↑): the distinct (price, size) points no other
    * point beats on both axes — "the efficient frontier of what a
    * dollar buys". A point is dominated iff a STRICTLY cheaper point
    * carries ≥ its size, or an equal-priced point carries MORE — so
    * the skyline is exactly: per price, the max-size point, kept when
    * its size strictly exceeds the exclusive prefix max over cheaper
    * prices ([[graft.operators.OrderedPrefix]] `maxCol`; NULL prefix
    * = group minimum = always on the frontier). The textbook
    * construction sorts the catalog in one task; the prefix-max
    * split keeps every window bounded, and dominance transitivity is
    * what makes the bucket offset sufficient.
    *
    * Scale shape: one distinct-price shuffle (domain-bounded), the
    * bounded prefix windows, one distinct-pair aggregate for the
    * membership counts. */
  def qPartSkyline(spark: SparkSession, dir: String): DataFrame =
    qPartSkylineOn(Tables.part(spark, dir))

  def qPartSkylineOn(part: DataFrame): DataFrame = {
    import graft.operators.OrderedPrefix
    val pts = part.select(
      round(col("p_retailprice") * 100, 0).cast("long").as("price"),
      col("p_size"))
    val pref = OrderedPrefix.distinctPrefix(pts, Seq.empty, "price",
      maxCol = Some("p_size"))
    val frontier = pref
      .filter(col("__cummax").isNull || col("__m") > col("__cummax"))
      .select(col("price"), col("__m").as("p_size"))
    val pairs = pts.groupBy(col("price"), col("p_size"))
      .agg(count(lit(1)).as("n_parts"))
    pairs.join(broadcast(frontier), Seq("price", "p_size"))
      .select(round(d(col("price")) / lit(100.0), 2).as("p_retailprice"),
        col("p_size"), col("n_parts"))
  }

  def eventsValueWinsorizedOn(events: DataFrame): DataFrame = {
    import graft.operators.RankSelect
    val dec = (c: Column) => c.cast("decimal(12,2)")
    val e = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    val stats = RankSelect.statsFor(e, Seq("event_type"), "value")
    val ranksOf: Column => Column = n => array(
      ceil(lit(0.1) * n.cast("double")).cast("long"),
      ceil(lit(0.9) * n.cast("double")).cast("long"))
    val sel = RankSelect.selectValues(e, Seq("event_type"), "value",
      ranksOf, stats = Some(stats))
    val b = stats.select(col("event_type"), col("__n").as("n"))
      .join(sel.groupBy(col("event_type"))
          .agg(max(when(col("__ridx") === 0, col("value"))).as("vlo"),
            max(when(col("__ridx") === 1, col("value"))).as("vhi")),
        Seq("event_type"))
    val z = lit(0).cast("decimal(12,2)")
    e.join(broadcast(b), Seq("event_type"))
      .groupBy(col("event_type"), col("n"), col("vlo"), col("vhi"))
      .agg(sum(dec(col("value"))).as("s_all"),
        sum(when(col("value") < col("vlo"), dec(col("value")))
          .otherwise(z)).as("s_lo"),
        count(when(col("value") < col("vlo"), lit(1))).as("c_lo"),
        sum(when(col("value") > col("vhi"), dec(col("value")))
          .otherwise(z)).as("s_hi"),
        count(when(col("value") > col("vhi"), lit(1))).as("c_hi"))
      .select(col("event_type"), col("n"), col("vlo"), col("vhi"),
        round(col("s_all").cast("double") / d(col("n")), 4)
          .as("mean_value"),
        round((col("s_all") - col("s_lo") + dec(col("vlo")) * col("c_lo")
            - col("s_hi") + dec(col("vhi")) * col("c_hi"))
          .cast("double") / d(col("n")), 4)
          .as("winsorized_mean"))
  }
}
