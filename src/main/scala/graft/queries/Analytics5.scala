package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 analytics wave: periodicity detection, transition
  * predictability, forensic digit audits, price-response regression,
  * value-distribution banding, market concentration, and robust outlier
  * screening — the remaining "operations analyst" shapes the r10–r12
  * families don't cover.
  *
  * Determinism contract shared with [[Analytics4]]: aggregates stay
  * exact (counts, integer moments, DECIMAL money) until ONE final IEEE
  * double expression tree both engines evaluate identically, rounded
  * 4dp at the edge. Medians are SELECTED rows (low-median rank
  * `(n+1) div 2` over a total order), never interpolated — the
  * [[Analytics2.qMedianOrder]] construction, engine-identical by
  * design.
  */
object Analytics5 {

  private val d = (c: Column) => c.cast("double")

  /** Epoch-folding periodicity scan (astronomy's χ² period search,
    * Leahy 1983): for each candidate period T ∈ {6, 24, 168} hours,
    * fold the hourly event counts onto phase φ = hour mod T and test
    * the folded profile against uniformity. With N events over T
    * phase cells the statistic collapses to exact integer moments:
    *   χ² = Σ_φ (n_φ − N/T)² / (N/T)  =  T·Σn_φ²/N − N
    * (absent cells contribute nothing to Σn_φ², so the identity holds
    * on the sparse frame — no phase spine needed). A large χ² at T=24
    * says daily rhythm; at T=168, weekly; at T=6, shift-of-day
    * structure. `peak_phase` (ties → smallest phase) and `peak_lift`
    * (peak cell vs the uniform N/T) locate the hot phase.
    *
    * Scale shape: ONE map-side (type, hour) count — the grid is
    * ≤ |types|·span_hours rows no matter the corpus — then the 3-way
    * period fan-out, phase re-agg, and window run on that
    * dimension-sized frame. Zero shuffles touch raw events twice.
    *
    * Moment exactness (r13 advice, promoted r15): Σn_φ² accumulates
    * in DECIMAL(38,0) — the [[graft.llm.Dedup]] pair-budget pattern —
    * so the moment is exact to 10³⁸ (≈10¹⁹ events per type), not the
    * ~3×10⁹ a BIGINT square would cap at before Spark silently WRAPS
    * where DuckDB errors. Doubles only at the rounded output edge. */
  def eventsPeriodicity(spark: SparkSession, dir: String): DataFrame =
    eventsPeriodicityOn(Tables.events(spark, dir))

  def eventsPeriodicityOn(events: DataFrame): DataFrame = {
    val th = events.groupBy(col("event_type"),
        expr("unix_millis(ts) div 3600000").as("h"))
      .agg(count(lit(1)).as("n"))
    val cells = th.select(col("event_type"), col("h"), col("n"),
        explode(array(lit(6L), lit(24L), lit(168L))).as("period_h"))
      .groupBy(col("event_type"), col("period_h"),
        (col("h") % col("period_h")).as("phi"))
      .agg(sum(col("n")).as("n"))
    val w = Window.partitionBy(col("event_type"), col("period_h"))
    cells.withColumn("mx", max(col("n")).over(w))
      .groupBy(col("event_type"), col("period_h"))
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("active_cells"),
        sum(col("n").cast("decimal(38,0)") * col("n")).as("q"),
        min(when(col("n") === col("mx"), col("phi"))).as("peak_phase"),
        max(col("n")).as("peak_n"))
      .select(col("event_type"), col("period_h"), col("n_events"),
        col("active_cells"),
        round(d(col("period_h") * col("q")) / d(col("n_events")) -
          d(col("n_events")), 4).as("chi2"),
        col("peak_phase"),
        round(d(col("period_h") * col("peak_n")) / d(col("n_events")), 4)
          .as("peak_lift"))
  }

  /** Per-state transition entropy — how predictable is the NEXT event
    * given the current one. [[Analytics2.eventsTransitions]] publishes
    * the transition shares and [[Analytics3]]'s stationary/stickiness
    * ops consume the matrix; this op scores each FROM-state with the
    * Shannon entropy of its outgoing distribution (bits): 0 bits means
    * the next event is determined, log2(k) means anyone's guess — the
    * quantity a next-event-prediction model's achievable accuracy is
    * bounded by. `top_next` (ties → lexicographically first) and its
    * share give the majority-class baseline.
    *
    * Entropy rides the [[graft.llm.TextOps.textEntropy]] identity
    * H = log2(N) − Σc·log2(c)/N: integer counts all the way, one
    * final IEEE tree, 4dp.
    *
    * Scale shape: one user-partitioned window (the sessionization
    * shuffle every consecutive-pair op shares), then a |types|² frame;
    * the per-state rollup windows/aggregates touch ≤ 25 rows. */
  def eventsTransitionEntropy(spark: SparkSession, dir: String): DataFrame =
    eventsTransitionEntropyOn(Tables.events(spark, dir))

  def eventsTransitionEntropyOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val cij = pairs
      .groupBy(col("event_type").as("from_type"), col("next_type"))
      .agg(count(lit(1)).as("c"))
    val wf = Window.partitionBy(col("from_type"))
    cij.withColumn("mx", max(col("c")).over(wf))
      .groupBy(col("from_type"))
      .agg(sum(col("c")).as("n_out"),
        count(lit(1)).as("k_next"),
        sum(d(col("c")) * log2(d(col("c")))).as("clog"),
        min(when(col("c") === col("mx"), col("next_type"))).as("top_next"),
        max(col("c")).as("top_c"))
      .select(col("from_type"), col("n_out"), col("k_next"),
        round(log2(d(col("n_out"))) - col("clog") / d(col("n_out")), 4)
          .as("entropy_bits"),
        col("top_next"),
        round(d(col("top_c")) / d(col("n_out")), 4).as("top_share"))
  }

  /** Benford first-digit audit over the money columns — the classic
    * fraud/synthetic-data forensic (Benford 1938, Nigrini's auditing
    * use): natural multi-scale amounts put digit d first with
    * probability log10(1+1/d); uniform generators and capped fields
    * don't. Emits, per measure × digit, the observed share, the
    * Benford expectation, the excess, and the χ² contribution
    * N·(share−p)²/p — large terms localize WHERE the distribution
    * breaks (a cap at $500k shows up as a digit-4/5 bulge).
    *
    * The first significant digit is extracted lexically from the
    * DECIMAL(18,2) rendering (first [1-9] in the string) — immune to
    * the floor(log10(x)) edge cases at exact powers of ten, and
    * engine-identical because both engines render DECIMAL identically.
    *
    * Scale shape: pure map-side digit projection + an 18-row rollup;
    * the only shuffle carries 9 rows per measure. */
  def qBenfordAudit(spark: SparkSession, dir: String): DataFrame =
    qBenfordAuditOn(Tables.orders(spark, dir), Tables.lineitem(spark, dir))

  def qBenfordAuditOn(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    def digits(df: DataFrame, c: String): DataFrame =
      df.select(regexp_extract(
          col(c).cast("decimal(18,2)").cast("string"), "[1-9]", 0).as("ds"))
        .filter(col("ds") =!= "")
        .groupBy(col("ds").cast("int").as("digit"))
        .agg(count(lit(1)).as("n"))
        .withColumn("measure", lit(c))
    val both = digits(orders, "o_totalprice")
      .unionByName(digits(lineitem, "l_extendedprice"))
    val w = Window.partitionBy(col("measure"))
    val benford = log10(lit(1.0) + lit(1.0) / d(col("digit")))
    val share = d(col("n")) / d(col("nn"))
    both.withColumn("nn", sum(col("n")).over(w))
      .select(col("measure"), col("digit"), col("n"),
        round(share, 4).as("share"),
        round(benford, 4).as("benford_share"),
        round(share - benford, 4).as("excess"),
        round(pow(share - benford, 2) * d(col("nn")) / benford, 4)
          .as("chi2_term"))
  }

  /** Discount→quantity response per brand — the "does discounting
    * move volume" regression behind [[Analytics3]]'s
    * q_discount_effect revenue table: per p_brand, the OLS slope of
    * quantity on discount and the Pearson correlation. Both engines'
    * streaming `corr`/`regr_slope` differ in update algebra, so the
    * moments are accumulated EXACTLY instead: discount is one of 11
    * discrete levels → an integer percent x ∈ 0..10, quantity is
    * integer-valued → bigint y; all five moments (Σx, Σy, Σx², Σxy,
    * Σy²) are exact BIGINT sums folded into one final IEEE tree.
    * `slope_qty_per_disc` is quantity per unit discount (per-percent
    * slope × 100). BIGINT moment bound: safe to ~10¹⁴ lines per brand
    * (Σxy ≤ 500·n); past that promote the moments to DECIMAL(38,0)
    * — the [[graft.llm.Dedup]] pair-budget pattern.
    *
    * Scale shape: broadcast part join (dimension table), one
    * per-brand agg — a 25-row reduce, fully map-side combined. */
  def qPriceElasticity(spark: SparkSession, dir: String): DataFrame =
    qPriceElasticityOn(Tables.lineitem(spark, dir), Tables.part(spark, dir))

  def qPriceElasticityOn(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_partkey"),
      round(col("l_discount") * 100, 0).cast("bigint").as("x"),
      col("l_quantity").cast("bigint").as("y"))
    val joined = li.join(broadcast(part
        .select(col("p_partkey"), col("p_brand"))),
      col("l_partkey") === col("p_partkey"))
    val cov = d(col("n_lines") * col("sxy") - col("sx") * col("sy"))
    val varx = d(col("n_lines") * col("sxx") - col("sx") * col("sx"))
    val vary = d(col("n_lines") * col("syy") - col("sy") * col("sy"))
    joined.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("p_brand"), col("n_lines"),
        round(d(col("sx")) / d(col("n_lines")) / lit(100.0), 4)
          .as("avg_discount"),
        round(d(col("sy")) / d(col("n_lines")), 4).as("avg_qty"),
        // degenerate-fit guards (r13 advice): a brand with one discount
        // level has varx = 0 (slope 0/0 → NaN, whose rendering diverges
        // between the gate's readers); a constant quantity zeroes vary
        // (corr NaN). The moments are exact integers in doubles, so the
        // = 0 compares are engine-identical.
        when(varx === 0.0, lit(null))
          .otherwise(round(cov * lit(100.0) / varx, 4))
          .as("slope_qty_per_disc"),
        when(varx * vary === 0.0, lit(null))
          .otherwise(round(cov / sqrt(varx * vary), 4)).as("corr"))
  }

  /** Order-value magnitude bands — the revenue-distribution profile
    * [[graft.llm.TextOps]]'s corpus_length_profile gives documents,
    * for money: per decimal-magnitude band (floor(log10(value))),
    * order count, revenue, shares, the cumulative revenue share up
    * the bands, and the mean order value. The table answers "where
    * does the money live" (a 10³ band with 60% of orders but 8% of
    * revenue prices the long tail) and catches synthetic caps (a
    * missing 10⁶ band).
    *
    * Money sums in DECIMAL (exact, order-independent), doubles only
    * in the final share tree. Prices are > 0 and carry cents, so the
    * log10 band edge cases (exact powers of ten) don't arise; ties
    * with the oracle are by identical IEEE floor(log10).
    *
    * Scale shape: one map-side band agg (≤ 6 cells), a 1-row
    * broadcast total, a 6-row cumulative window. */
  def qOrderValueBands(spark: SparkSession, dir: String): DataFrame =
    qOrderValueBandsOn(Tables.orders(spark, dir))

  def qOrderValueBandsOn(orders: DataFrame): DataFrame = {
    val bands = orders
      .select(floor(log10(col("o_totalprice"))).cast("bigint").as("band"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"), sum(col("p")).as("rev"))
    val tot = broadcast(bands.agg(sum(col("n_orders")).as("tn"),
      sum(col("rev")).as("tr")))
    val w = Window.orderBy(col("band"))
    bands.crossJoin(tot)
      .withColumn("cum_rev", sum(col("rev")).over(w))
      .select(col("band"), col("n_orders"),
        round(d(col("n_orders")) / d(col("tn")), 4).as("share_orders"),
        d(col("rev")).as("revenue"),
        round(d(col("rev")) / d(col("tr")), 4).as("share_revenue"),
        round(d(col("cum_rev")) / d(col("tr")), 4).as("cum_revenue_share"),
        round(d(col("rev")) / d(col("n_orders")), 4).as("avg_value"))
  }

  /** Supplier market concentration per nation — the
    * Herfindahl–Hirschman index over each nation's supplier revenue
    * shares, plus the top-supplier share and the effective number of
    * suppliers (1/HHI, the "numbers equivalent"): the antitrust-style
    * screen for single-supplier dependency that
    * [[Analytics.q16SupplierDiversity]]'s distinct counts can't see
    * (ten suppliers where one takes 95% counts as ten, but its
    * effective number is ~1.1).
    *
    * Revenue is the TPC-H discounted price in DECIMAL; shares are
    * squared/summed as doubles only on the supplier-sized frame.
    *
    * Scale shape: broadcast supplier+nation dims into lineitem, one
    * (nation, supplier) agg — the only corpus-sized shuffle — then
    * windows/rollups on the |suppliers| frame. */
  def qSupplierHhi(spark: SparkSession, dir: String): DataFrame =
    qSupplierHhiOn(Tables.lineitem(spark, dir), Tables.supplier(spark, dir),
      Tables.nation(spark, dir))

  def qSupplierHhiOn(lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame): DataFrame = {
    import Money.discPrice
    val sup = broadcast(supplier.select(col("s_suppkey"), col("s_nationkey")))
    val nat = broadcast(nation.select(col("n_nationkey"), col("n_name")))
    val bySup = lineitem
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(sum(discPrice).as("rev"))
    val w = Window.partitionBy(col("n_name"))
    bySup.withColumn("tot", sum(col("rev")).over(w))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev")).as("revenue"),
        sum(pow(d(col("rev")) / d(col("tot")), 2)).as("hhi_raw"),
        max(col("rev")).as("mx"))
      .select(col("n_name"), col("n_suppliers"),
        d(col("revenue")).as("revenue"),
        round(col("hhi_raw"), 4).as("hhi"),
        round(lit(1.0) / col("hhi_raw"), 4).as("effective_suppliers"),
        round(d(col("mx")) / d(col("revenue")), 4).as("top_share"))
  }

  /** Robust per-type outlier screen on event values — median/MAD
    * instead of mean/σ (one fat-tailed day wrecks a z-score;
    * [[Analytics2.eventsAnomaly]] is exactly that day-level z), with
    * the standard 3×1.4826·MAD cut (the σ-consistent MAD scaling).
    * Medians are SELECTED rows — low-median rank (n+1) div 2 over the
    * (value, event_id) total order, engine-identical, never
    * interpolated — and the deviation frame reuses the same
    * construction for the MAD.
    *
    * NULL values are excluded up front ON BOTH ENGINES: the rank
    * construction would otherwise diverge (Spark windows sort NULLS
    * FIRST ascending, DuckDB NULLS LAST), and a NULL deviation can't
    * be an outlier anyway.
    *
    * Scale shape (rewritten r14, the r13 verdict's top task): until
    * r13 each median was a per-type sorted window — ONE task sorting
    * ~n/5 corpus rows, twice. Exactness does not require that sort:
    * both medians now ride [[graft.operators.RankSelect.selectValues]]
    * — a bounded per-(type, bucket) histogram locates the rank's
    * bucket by prefix sum, then the one touched bucket per type
    * resolves the exact value — same selected row, same oracle, every
    * shuffle map-side-combined and every window partition bounded by
    * the histogram width. The med/MAD table then broadcasts back onto
    * one grouped pass as before. (The quantile sketches in
    * [[graft.llm.Sketches]] remain the single-pass approximate
    * warehouse twin; this op is the exact contract they approximate.) */
  def eventsValueOutliers(spark: SparkSession, dir: String): DataFrame =
    eventsValueOutliersOn(Tables.events(spark, dir))

  def eventsValueOutliersOn(events: DataFrame): DataFrame = {
    import graft.operators.RankSelect
    // event_id (the old window tiebreak) is gone from the projection:
    // the selected VALUE at a rank is tie-order-independent, so the
    // scan now reads only (event_type, value)
    val e = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    val eStats = RankSelect.statsFor(e, Seq("event_type"), "value")
    val med = graft.Exec.materialize(
      RankSelect.selectValues(e, Seq("event_type"), "value",
          RankSelect.lowMedian, stats = Some(eStats))
        .select(col("event_type"), col("value").as("median_value")))
    val dev = e.join(broadcast(med), "event_type")
      .select(col("event_type"),
        abs(col("value") - col("median_value")).as("dev"))
    // the deviation pass needs no extent scan: 0 ≤ |v − med| ≤
    // max(med − vmin, vmax − med), derived from the value pass's stats
    val devStats = graft.Exec.materialize(eStats.join(med, "event_type")
      .select(col("event_type"),
        greatest(col("median_value") - col("__vmin"),
          col("__vmax") - col("median_value")).as("__vmax"),
        col("__n"))
      .withColumn("__vmin", lit(0.0)))
    val mad = RankSelect.selectValues(dev, Seq("event_type"), "dev",
        RankSelect.lowMedian, stats = Some(devStats))
      .select(col("event_type"), col("dev").as("mad"))
    val stats = broadcast(med.join(mad, "event_type"))
    dev.join(stats, "event_type")
      .groupBy(col("event_type"), col("median_value"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"),
        round(col("median_value"), 4).as("median_value"),
        round(col("mad"), 4).as("mad"),
        col("n_outliers"),
        round(d(col("n_outliers")) / d(col("n")), 4).as("outlier_share"))
  }
}
