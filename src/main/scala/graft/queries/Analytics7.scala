package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 final analytics wave: inter-arrival cadence, capacity
  * provisioning, engagement decay fitting, and join-cost estimation.
  * Determinism contract as [[Analytics5]]/[[Analytics6]]. */
object Analytics7 {

  private val d = (c: Column) => c.cast("double")

  /** Per-type inter-arrival cadence histogram: consecutive same-user
    * gaps in log₂ millisecond buckets — "how often does a user do X",
    * the distribution [[Analytics2]]'s session ops threshold at a
    * single 30-minute point and [[Analytics4]]'s burstiness reduces to
    * one CV number. The log₂ bucketing is floor(log2(gap_ms + 1)):
    * boundary cases are exactly the powers of two, where IEEE log2 is
    * exact on both engines, so the floor never straddles an ulp.
    *
    * Scale shape: the sessionization lag shuffle, then a
    * (type, ≤ ~40 buckets) rollup. */
  def eventsInterarrival(spark: SparkSession, dir: String): DataFrame =
    eventsInterarrivalOn(Tables.events(spark, dir))

  def eventsInterarrivalOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_ms",
        lag(expr("unix_millis(ts)"), 1).over(w))
      .filter(col("prev_ms").isNotNull)
      .select(col("event_type"),
        (expr("unix_millis(ts)") - col("prev_ms")).as("gap_ms"))
    val byType = Window.partitionBy(col("event_type"))
    gaps
      .select(col("event_type"),
        floor(log2(d(col("gap_ms") + lit(1L)))).as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_gaps"))
      .withColumn("tot", sum(col("n_gaps")).over(byType))
      .select(col("event_type"), col("bucket"),
        (pow(lit(2.0), d(col("bucket"))) / lit(1000.0)).as("gap_s_lo"),
        col("n_gaps"),
        round(d(col("n_gaps")) / d(col("tot")), 4).as("share"))
  }

  /** Per-type hourly load profile for capacity provisioning: mean over
    * the DENSE hour span, exact p95 and peak, and the peak-to-mean
    * ratio that decides peak- vs mean-provisioning.
    * [[Analytics4.eventsDispersion]] says WHETHER the process is
    * bursty; this says what to BUY. The p95 is a SELECTED row over the
    * dense grid WITHOUT a spine: with z = span − active zero cells,
    * the rank-r order statistic is 0 when r ≤ z, else the (r − z)-th
    * smallest ACTIVE count — rank arithmetic on integers, never an
    * interpolation ([[Analytics2.qMedianOrder]] rule).
    *
    * Scale shape: ONE (type, hour) map-side count; ranks/rollups on
    * the dimension-sized cell frame. */
  def eventsLoadProfile(spark: SparkSession, dir: String): DataFrame =
    eventsLoadProfileOn(Tables.events(spark, dir))

  def eventsLoadProfileOn(events: DataFrame): DataFrame = {
    // PERSISTED (r17, guide §1.2): the (type, hour) cell frame feeds
    // the span agg, the p95 ranking, and the per-type rollup — three
    // otherwise-recomputed references. Dimension-sized.
    val th = events.groupBy(col("event_type"),
        expr("unix_millis(ts) div 3600000").as("h"))
      .agg(count(lit(1)).as("n"))
      .persist()
    val span = broadcast(th.agg(
      (max(col("h")) - min(col("h")) + 1L).as("span_hours")))
    val byType = Window.partitionBy(col("event_type"))
    val ranked = th.crossJoin(span)
      .withColumn("rn",
        row_number().over(byType.orderBy(col("n"), col("h"))))
      .withColumn("active", count(lit(1)).over(byType))
    // p95 rank over the DENSE span; zeros occupy ranks 1..(span-active)
    val p95 = ranked
      .withColumn("target",
        expr("CAST(ceil(0.95 * span_hours) AS BIGINT)"))
      .withColumn("zeros", col("span_hours") - col("active"))
      .filter((col("target") <= col("zeros") && col("rn") === 1) ||
        col("rn") === col("target") - col("zeros"))
      .select(col("event_type"),
        when(col("target") <= col("zeros"), lit(0L)).otherwise(col("n"))
          .as("p95_per_hour"))
    th.groupBy(col("event_type"))
      .agg(count(lit(1)).as("active_hours"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("peak_per_hour"))
      .crossJoin(span)
      .join(p95, Seq("event_type"))
      .select(col("event_type"), col("span_hours"), col("active_hours"),
        col("n_events"),
        round(d(col("n_events")) / d(col("span_hours")), 4)
          .as("mean_per_hour"),
        col("p95_per_hour"), col("peak_per_hour"),
        round(d(col("peak_per_hour") * col("span_hours")) /
          d(col("n_events")), 4).as("peak_to_mean"))
  }

  /** Engagement half-life: fit exponential decay to the
    * days-since-first-activity retention curve r(t) = share of users
    * active exactly t days after their first day, via OLS on
    * ln r(t) over t ∈ 1..14 (zero-retention days drop out of the log
    * on both engines identically). half_life = ln 2 / λ — the single
    * number "how fast do new users fade" that the cohort matrix
    * ([[Analytics.qRetentionMatrix]]) spreads over a triangle.
    *
    * Retention shares are exact integer ratios; the log-OLS runs over
    * ≤ 14 rows in one IEEE tree, 4dp. Sign convention: a flat or
    * RISING curve fits λ ≤ 0 and the "half-life" comes out negative —
    * read it as "no decay measured" (the driver corpus is synthetic
    * steady-state traffic and lands exactly there, λ = −0.0007).
    *
    * Scale shape: one distinct (user, day) reduction, a broadcast
    * first-day join back, a ≤ 14-row fit frame. */
  def qRetentionHalflife(spark: SparkSession, dir: String): DataFrame =
    qRetentionHalflifeOn(Tables.events(spark, dir))

  def qRetentionHalflifeOn(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .as("day"))
      .distinct()
    val first = days.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
    val nUsers = broadcast(first.agg(count(lit(1)).as("n_users")))
    val rt = days.join(first, Seq("user_id"))
      .select((col("day") - col("d0")).as("t"))
      .filter(col("t").between(1, 14))
      .groupBy(col("t")).agg(count(lit(1)).as("n_active"))
      .crossJoin(nUsers)
      .select(col("t"), col("n_active"), col("n_users"),
        log(d(col("n_active")) / d(col("n_users"))).as("y"))
    val fit = rt.agg(count(lit(1)).as("k"),
      sum(d(col("t"))).as("st"), sum(col("y")).as("sy"),
      sum(d(col("t")) * d(col("t"))).as("stt"),
      sum(d(col("t")) * col("y")).as("sty"),
      max(col("n_users")).as("n_users"),
      max(when(col("t") === 1,
        round(d(col("n_active")) / d(col("n_users")), 4))).as("r1"))
    // degenerate-fit guards (r13 advice): k < 2 leaves the OLS
    // denominator at 0 (slope NaN — and NaN/Inf RENDERINGS diverge
    // between the gate's two readers); a perfectly flat curve fits
    // slope = 0 and ln2/−0 = ±Infinity. Both land NULL — "no decay
    // measurable" — via the same guarded tree on both engines.
    val denom = d(col("k")) * col("stt") - col("st") * col("st")
    val slope = (d(col("k")) * col("sty") - col("st") * col("sy")) / denom
    fit.select(col("n_users"), col("k").as("n_days_fit"), col("r1"),
      when(denom === 0.0, lit(null))
        .otherwise(round(-slope, 4)).as("lambda_per_day"),
      when(denom === 0.0 || abs(slope) < lit(1e-12), lit(null))
        .otherwise(round(log(lit(2.0)) / -slope, 4)).as("half_life_days"))
  }

  /** Exact join-cardinality estimator — the planning question asked
    * BEFORE paying a join: from the two sides' (key, count) histograms,
    * the output size is EXACTLY Σ_k a_k·b_k; the table reports it for
    * the three joins this warehouse actually runs (orders⋈lineitem,
    * the lineitem self-join on partkey behind the basket ops, the
    * events self-join on user_id behind sessionization), with the
    * amplification factor and the single worst key —
    * [[graft.operators.SkewProfile]]'s question answered cross-table.
    * Products accumulate in DECIMAL(38,0) (self-join products square
    * per-key counts; the [[graft.llm.Dedup.dedupPairBudget]] rule).
    *
    * Scale shape: per join, two map-side (key, count) aggs
    * co-partitioned into one slim join — the histograms shuffle, the
    * data never does. */
  def qJoinCardinality(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val events = Tables.events(spark, dir)
    joinCardinality("orders_x_lineitem_orderkey",
      orders, "o_orderkey", lineitem, "l_orderkey")
      .unionByName(joinCardinality("lineitem_x_lineitem_partkey",
        lineitem, "l_partkey", lineitem, "l_partkey"))
      .unionByName(joinCardinality("events_x_events_user",
        events, "user_id", events, "user_id"))
  }

  def joinCardinality(name: String, a: DataFrame, keyA: String,
                      b: DataFrame, keyB: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val ca = a.groupBy(col(keyA).as("k")).agg(count(lit(1)).as("ca"))
    val cb = b.groupBy(col(keyB).as("k")).agg(count(lit(1)).as("cb"))
    // PERSISTED (r17, guide §1.2): the totals agg and the top-key probe
    // both consume the product frame, and unpersisted each re-ran both
    // histogram aggregations (q_join_cardinality's pre-persist plan:
    // 24 scans across its three joins). Key-domain bounded.
    val prod = ca.join(cb, Seq("k"))
      .select(col("k"), (dec(col("ca")) * dec(col("cb"))).as("pm"))
      .persist()
    val tots = broadcast(prod.agg(
      count(lit(1)).as("n_keys_common"),
      sum(col("pm")).as("est"), max(col("pm")).as("mx")))
    val sides = broadcast(a.agg(count(lit(1)).as("n_left"))
      .crossJoin(b.agg(count(lit(1)).as("n_right"))))
    val top = prod.crossJoin(tots)
      .filter(col("pm") === col("mx"))
      .agg(min(col("k")).as("top_key"))
    broadcast(top).crossJoin(tots).crossJoin(sides)
      .select(lit(name).as("join_name"), col("n_left"), col("n_right"),
        col("n_keys_common"),
        d(col("est")).as("est_rows"),
        round(d(col("est")) /
          d(greatest(col("n_left"), col("n_right"))), 4)
          .as("amplification"),
        col("top_key"),
        round(d(col("mx")) / d(col("est")), 4).as("top_key_share"))
  }

  /** Exact per-type value percentile table (p25/p50/p75/p90/p99) —
    * the distribution summary behind alert thresholds and SLO
    * dashboards, as SELECTED rows: percentile q is the value at rank
    * ceil(q·n) of the per-type value order (at q = 0.5 this is
    * exactly the (n+1) div 2 low-median convention), never
    * interpolated, so the outputs are actual input values both
    * engines reproduce bit-for-bit. NULL values are excluded up front
    * on both engines (the r13 NULL-ordering rule).
    *
    * All five ranks ride ONE multi-rank
    * [[graft.operators.RankSelect.selectValues]] pass (r14): the
    * histogram is built once per type and each target rank resolves
    * in its own touched bucket — no per-type sort, shuffles map-side
    * combined, window partitions bounded by the histogram width.
    * The exact twin of [[graft.llm.Sketches.ddQuantileRollup]]'s
    * log-bucket estimates (EpsilonPinSpec's measured-bound pair). */
  def eventsValuePercentiles(spark: SparkSession, dir: String): DataFrame =
    eventsValuePercentilesOn(Tables.events(spark, dir))

  def eventsValuePercentilesOn(events: DataFrame): DataFrame = {
    import graft.operators.RankSelect
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val e = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    val ranksOf: Column => Column = n =>
      array(qs.map(q => ceil(lit(q) * n.cast("double")).cast("long")): _*)
    val sel = RankSelect.selectValues(e, Seq("event_type"), "value", ranksOf)
    val counts = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    sel.groupBy(col("event_type"))
      .agg(
        max(when(col("__ridx") === 0, col("value"))).as("p25"),
        max(when(col("__ridx") === 1, col("value"))).as("p50"),
        max(when(col("__ridx") === 2, col("value"))).as("p75"),
        max(when(col("__ridx") === 3, col("value"))).as("p90"),
        max(when(col("__ridx") === 4, col("value"))).as("p99"))
      .join(broadcast(counts), Seq("event_type"))
      .select(col("event_type"), col("n"), col("p25"), col("p50"),
        col("p75"), col("p90"), col("p99"))
  }

  /** Exact 5%-per-side rank-trimmed mean of event values per type —
    * the robust KPI (one fat-tailed day can move a plain mean by
    * percent; trimming by RANK is the BI-standard fix) computed
    * WITHOUT sorting any group: with l = floor(0.05·n) trimmed from
    * each side, the trimmed sum is
    *   S − S(v < vlo) − vlo·(l − c(v < vlo))
    *     − S(v > vhi) − vhi·(l − c(v > vhi))
    * where vlo/vhi are the SELECTED boundary values at ranks l and
    * n−l+1 ([[graft.operators.RankSelect.selectValues]], one
    * histogram pass both ranks ride) and the vlo/vhi product terms
    * are the tie corrections: ties spanning a trim boundary are
    * trimmed exactly l copies, by rank, not by value. l = 0 (n < 20)
    * degrades to the plain mean — the boundary ranks fall out of
    * range, select no row, and the guarded terms vanish.
    *
    * Money discipline: values accumulate in DECIMAL(12,2) (exact,
    * order-independent — the [[Money]] rule), divided as DOUBLE at
    * the output edge, 4dp. */
  def eventsValueTrimmed(spark: SparkSession, dir: String): DataFrame =
    eventsValueTrimmedOn(Tables.events(spark, dir))

  def eventsValueTrimmedOn(events: DataFrame): DataFrame = {
    import graft.operators.RankSelect
    val dec = (c: Column) => c.cast("decimal(12,2)")
    val e = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    val stats = RankSelect.statsFor(e, Seq("event_type"), "value")
    val ranksOf: Column => Column = n => {
      val l = floor(lit(0.05) * n.cast("double")).cast("long")
      array(l, n.cast("long") - l + lit(1L))
    }
    val sel = RankSelect.selectValues(e, Seq("event_type"), "value",
      ranksOf, stats = Some(stats))
    val b = stats
      .select(col("event_type"), col("__n").as("n"),
        floor(lit(0.05) * col("__n").cast("double")).cast("long").as("l"))
      .join(sel.groupBy(col("event_type"))
          .agg(max(when(col("__ridx") === 0, col("value"))).as("vlo"),
            max(when(col("__ridx") === 1, col("value"))).as("vhi")),
        Seq("event_type"), "left")
    val z = lit(0).cast("decimal(12,2)")
    e.join(broadcast(b), Seq("event_type"))
      .groupBy(col("event_type"), col("n"), col("l"), col("vlo"),
        col("vhi"))
      .agg(sum(dec(col("value"))).as("s_all"),
        sum(when(col("value") < col("vlo"), dec(col("value")))
          .otherwise(z)).as("s_lo"),
        count(when(col("value") < col("vlo"), lit(1))).as("c_lo"),
        sum(when(col("value") > col("vhi"), dec(col("value")))
          .otherwise(z)).as("s_hi"),
        count(when(col("value") > col("vhi"), lit(1))).as("c_hi"))
      .select(col("event_type"), col("n"),
        (col("n") - lit(2L) * col("l")).as("n_trimmed"),
        round(col("s_all").cast("double") / col("n").cast("double"), 4)
          .as("mean_value"),
        round((col("s_all") - col("s_lo")
            - when(col("l") === 0L, z)
              .otherwise(dec(col("vlo")) * (col("l") - col("c_lo")))
            - col("s_hi")
            - when(col("l") === 0L, z)
              .otherwise(dec(col("vhi")) * (col("l") - col("c_hi"))))
          .cast("double")
          / (col("n") - lit(2L) * col("l")).cast("double"), 4)
          .as("trimmed_mean"))
  }

  /** Referential-integrity audit over the warehouse's foreign-key
    * edges — the first data-quality gate a CDC-fed warehouse runs
    * after every load (the cross-TABLE complement of
    * [[graft.cdc.Cdc]]'s lifecycle audit, which watches orphan
    * UPDATES/DELETES inside one changelog): per edge, child rows
    * whose key has no parent (orphans — broken ingest ordering or
    * lost parents) and parent rows with no children (childless —
    * expected for dims, an alarm for orders). One row per edge.
    *
    * Scale shape: per edge one LEFT ANTI join each way — key-hash
    * shuffles (broadcast when the parent is a dim), map-side-combined
    * counts, 1-row crossJoins. No row data moves, only keys. */
  def qIntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val edges = Seq(
      ("lineitem_orderkey",
        lineitem.select(col("l_orderkey").as("k")),
        orders.select(col("o_orderkey").as("k"))),
      ("orders_custkey",
        orders.select(col("o_custkey").as("k")),
        Tables.customer(spark, dir).select(col("c_custkey").as("k"))),
      ("lineitem_partkey",
        lineitem.select(col("l_partkey").as("k")),
        Tables.part(spark, dir).select(col("p_partkey").as("k"))))
    edges.map { case (nm, cRaw, pRaw) =>
      // PERSISTED (r17, guide §1.2): each edge consumes its child and
      // parent key frames three times (count, orphan anti-join,
      // childless anti-join) — 18 scans across the three edges before
      // the boundaries (plans/r17/q_integrity_audit_before.txt).
      // Single-key-column frames, ContextCleaner-freed.
      val c = cRaw.persist()
      val p = pRaw.persist()
      c.agg(count(lit(1)).as("n_child"))
        .crossJoin(c.join(p, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_orphans")))
        .crossJoin(p.agg(count(lit(1)).as("n_parent")))
        .crossJoin(p.join(c, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_childless")))
        .select(lit(nm).as("edge"), col("n_child"), col("n_orphans"),
          round(d(col("n_orphans")) / d(col("n_child")), 4)
            .as("orphan_share"),
          col("n_parent"), col("n_childless"),
          round(d(col("n_childless")) / d(col("n_parent")), 4)
            .as("childless_share"))
    }.reduce(_ unionByName _)
  }
}
