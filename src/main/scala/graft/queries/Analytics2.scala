package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-6 widening of the BQ-style analytics surface: the remaining
  * TPC-H shapes, adapted to the synthetic star schema (no partsupp /
  * comment / shipmode columns — see TESTDATA.md). What matters is the
  * SHAPE coverage, each one a plan family a 100 TB warehouse runs daily:
  *
  *  - q2:  per-group argmin with ties (window over a filtered join)
  *  - q6:  pure scan-side conjunctive filter → scalar agg (no shuffle)
  *  - q8:  conditional share-of-total over a 7-table star join
  *  - q9:  profit arithmetic over 5-way join, grouped two ways
  *  - q11: aggregate filtered by a scalar aggregate of itself
  *  - q13: LEFT OUTER join with ON-clause filter → distribution agg
  *  - q15: argmax-by-scalar-subquery (max total over a derived agg)
  *  - q17: correlated per-group average as a self-agg join
  *  - q19: disjunction of conjunctive predicate groups (OR pushdown)
  *  - q20: nested semi-join chain through a HAVING aggregate
  *  - q22: scalar-subquery threshold + NOT EXISTS anti join
  *
  * Scale notes follow Analytics.scala: dims broadcast explicitly, facts
  * shuffle once on their join key, money math accumulates in DECIMAL
  * (exact, order-independent) and lands as DOUBLE (driver hash parity).
  */
object Analytics2 {

  import Money.{asDouble, dec, discPrice}

  /** TPC-H Q6-style forecast revenue: every predicate reaches the parquet
    * scan (PushedFilters), one partial+final agg, zero shuffle of data
    * rows — the cheapest possible plan at any scale. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(asDouble(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"))

  /** TPC-H Q2-style min-cost supplier (adapted: supply relation comes from
    * observed lineitem pairs, "cost" is s_acctbal): per qualifying part,
    * the supplier(s) with minimal account balance in EUROPE, ties kept.
    *
    * The supply pairs distinct is the only fact shuffle; parts and the
    * 100-row supplier⋈nation⋈region dim both broadcast, so the window
    * (per-part min) runs over an already-small candidate set. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val pt = broadcast(Tables.part(spark, dir)
      .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
      .select("p_partkey"))
    // broadcast-filter BEFORE the distinct: only qualifying parts' supply
    // pairs enter the shuffle (the filter-before-exchange discipline —
    // distinct-then-filter shuffled the whole fact's pair space)
    val ps = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey")
      .join(pt, col("l_partkey") === col("p_partkey"), "left_semi")
      .distinct()
    val eurSupp = broadcast(
      Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    import org.apache.spark.sql.expressions.Window
    val cand = ps
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(eurSupp, col("l_suppkey") === col("s_suppkey"))
    cand
      .withColumn("mn", min(col("s_acctbal")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("s_acctbal") === col("mn"))
      .select("s_acctbal", "s_name", "n_name", "p_partkey", "s_suppkey")
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"), col("s_suppkey"))
      .limit(100)
  }

  /** TPC-H Q8-style market share: NATION_2's share of PROMO-part revenue
    * sold into ASIA, per order year. Numerator and denominator accumulate
    * in DECIMAL (exact), the share divides as DOUBLE on both engine and
    * oracle — bit-identical. Customer-side and supplier-side dims are
    * broadcast; lineitem⋈orders is the one fact-fact shuffle. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val asiaCust = broadcast(
      Tables.customer(spark, dir)
        .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey"))
    val suppNat = broadcast(
      Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nat")))
    val promoPart = broadcast(Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey"))
    val ord = Tables.orders(spark, dir)
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    Tables.lineitem(spark, dir)
      .join(promoPart, col("l_partkey") === col("p_partkey"))
      .join(suppNat, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(year(col("o_orderdate")).as("yr"), discPrice.as("vol"), col("nat"))
      .groupBy(col("yr"))
      .agg((asDouble(sum(when(col("nat") === "NATION_2", col("vol"))
          .otherwise(lit(0).cast("decimal(12,2)")))) /
        asDouble(sum(col("vol")))).as("mkt_share"))
  }

  /** TPC-H Q9-style product profit (adapted: supply cost ≈ 5% of
    * p_retailprice) by supplier nation × order year, over parts whose
    * name contains "red". All three dims broadcast; the single shuffle
    * is lineitem⋈orders on orderkey, then one hash agg. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val redPart = broadcast(Tables.part(spark, dir)
      .filter(col("p_name").contains("red"))
      .select("p_partkey", "p_retailprice"))
    val suppNat = broadcast(
      Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nat")))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    Tables.lineitem(spark, dir)
      .join(redPart, col("l_partkey") === col("p_partkey"))
      .join(suppNat, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("nat"), year(col("o_orderdate")).as("yr"),
        (discPrice - dec(col("p_retailprice")) * lit(0.05).cast("decimal(3,2)") *
          dec(col("l_quantity"))).as("amount"))
      .groupBy(col("nat"), col("yr"))
      .agg(asDouble(sum(col("amount"))).as("sum_profit"))
  }

  /** TPC-H Q11-style important parts (adapted: part value = discounted
    * revenue from ASIA-region suppliers): parts whose value exceeds
    * 0.1% of the total. The per-part aggregate is computed ONCE and
    * reused for both the rows and the scalar total — the total is a
    * 1-row frame cross-joined in (Catalyst broadcasts it), not a
    * recompute and not a collect. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val asiaSupp = broadcast(
      Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir).filter(col("n_regionkey") === 2),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey"))
    val v = Tables.lineitem(spark, dir)
      .join(asiaSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(discPrice).as("val"))
    val total = v.agg((asDouble(sum(col("val"))) * lit(0.001)).as("threshold"))
    v.crossJoin(broadcast(total))
      .filter(asDouble(col("val")) > col("threshold"))
      .select(col("l_partkey").as("p_partkey"), asDouble(col("val")).as("part_value"))
  }

  /** TPC-H Q13-style order-count distribution: LEFT OUTER join with the
    * priority filter INSIDE the join condition (kept customers with zero
    * matching orders count 0), then the distribution re-aggregate. Both
    * sides are facts at scale, so they shuffle on custkey once; the
    * first agg rides that same partitioning (no second exchange) and the
    * distribution agg runs on ≤ #customers rows. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select("c_custkey")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q15-style top supplier: quarterly revenue per supplier, keep
    * the max (ties kept via exact DECIMAL equality, no rank). The revenue
    * frame is computed once; its 1-row max cross-joins back in as a
    * broadcast — same reuse pattern as q11. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice).as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), asDouble(col("total_rev")).as("total_revenue"))
  }

  /** TPC-H Q17-style small-quantity revenue: lineitems below 20% of their
    * part's average quantity, for one brand's small parts. The correlated
    * AVG becomes a per-part aggregate joined back (broadcast — bounded by
    * #qualifying parts). l_quantity is integral, so the double AVG is
    * sum-exact/count — deterministic on both engines. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val pt = broadcast(Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)
      .select("p_partkey"))
    val base = Tables.lineitem(spark, dir)
      .join(pt, col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgQ = base.groupBy(col("l_partkey").as("a_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    base
      .join(broadcast(avgQ), col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((asDouble(sum(dec(col("l_extendedprice")))) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q19-style disjunctive revenue: three brand/size/quantity
    * predicate groups OR'd over the part⋈lineitem join. Part broadcasts;
    * the disjunction stays a single codegen'd filter after the join (no
    * union-of-three-scans blowup). */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val pt = broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size"))
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(asDouble(sum(discPrice)).as("revenue"))
  }

  /** TPC-H Q20-style excess suppliers (adapted): suppliers in region 1
    * that moved > 50 units of some "red" part in 1996 — a HAVING
    * aggregate feeding a semi-join chain. The aggregate runs on the
    * part-filtered fact slice; the supplier probe is a broadcast
    * LEFT SEMI (suppliers are tiny). */
  def q20ExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val redPart = broadcast(Tables.part(spark, dir)
      .filter(col("p_name").startsWith("red")).select("p_partkey"))
    val movers = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(redPart, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 50)
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_regionkey") === 1)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(movers), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
  }

  /** TPC-H Q12-style priority line counts (adapted: group by returnflag
    * instead of the absent shipmode): fact-fact join on orderkey with
    * conditional counts — the classic "join then CASE-aggregate" shape.
    * The shipdate filter lands in the lineitem scan, so only the 1996
    * slice shuffles. */
  def q12PriorityLines(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))

  /** Ordered conversion funnel over the event stream: users who signed
    * up, then clicked strictly after their first signup, then purchased
    * strictly after that first qualifying click. Each stage is a keyed
    * aggregate joined to the previous stage's timestamps; all three
    * shuffles hash on user_id, so the exchange partitioning is computed
    * once and reused down the chain. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(spark, dir))

  def funnel(events: DataFrame): DataFrame = {
    val ev = events.select("user_id", "event_type", "ts")
    // PERSISTED (r17, guide §1.2): s1/s2 each feed the next stage AND
    // the final outer-join spine — unpersisted the chain re-ran per
    // reference (6 events scans, plans/r17/q_funnel_before.txt).
    // Per-user min frames, corpus-slim, ContextCleaner-freed.
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
      .persist()
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
      .persist()
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    s1.join(s2, Seq("user_id"), "left_outer")
      .join(s3, Seq("user_id"), "left_outer")
      .agg(count(col("t1")).as("n_signup"),
        count(col("t2")).as("n_click_after_signup"),
        count(col("t3")).as("n_purchase_after_click"))
  }

  /** ROLLUP aggregation hierarchy (the BQ `GROUP BY ROLLUP` surface):
    * revenue at (returnflag, linestatus), per-flag subtotals, and the
    * grand total. NOT `rollup()` on the corpus: Spark plans that as an
    * Expand that multiplies every input row by the number of grouping
    * sets (3×) BEFORE the aggregate — at 100 TB that is 3× the scan
    * volume through the partial agg for a 6-row result. Instead the
    * corpus aggregates ONCE at the finest grain (|flags|×|statuses|
    * rows) and the rollup re-aggregates the tiny frame: SUM and COUNT
    * are decomposable (count re-aggregates as sum-of-counts), and the
    * per-grain DECIMAL sums are exact, so subtotal values are
    * bit-identical to the single-pass form (RollupProfile proves
    * equality) — measured 1.52 → 0.89 s min at sf0.1. NULL grouping slots are coalesced to 'ALL' on both engines
    * so the comparator never sees engine-specific null rendering. */
  def qRollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val grain = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(discPrice).as("rev"), count(lit(1)).as("n"))
    grain
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(asDouble(sum(col("rev"))).as("revenue"),
        sum(col("n")).as("n_lines"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("revenue"), col("n_lines"))
  }

  /** Ordered running total per customer (cumulative spend by order
    * date): the canonical ROWS UNBOUNDED PRECEDING window. DECIMAL
    * accumulation keeps every prefix sum exact, so each output row is
    * engine-identical, not just the final one. One shuffle on custkey;
    * the per-customer sort is bounded by that customer's order count. */
  def qRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        asDouble(sum(dec(col("o_totalprice"))).over(w)).as("running_spend"))
  }

  /** Forward as-of enrichment: for each click, the FIRST purchase of the
    * same user STRICTLY after it, within a 10-minute horizon (else -1) —
    * the time-reversed twin of `events_asof`, same union-tag + one-window
    * plan (ONE shuffle, no join operator): scanning in DESCENDING time
    * order, "the last purchase seen before this row" IS the nearest
    * following purchase. Equal timestamps sort purchases after clicks in
    * the scan, which excludes them — "strictly after" exactly. The gap
    * compares in integer microseconds (engine-exact). */
  def qNextPurchase(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "purchase", 2).otherwise(1).as("side"),
        when(col("event_type") === "purchase",
          struct(unix_micros(col("ts")).as("p_us"), col("event_id").as("p_id")))
          .as("p"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("side").asc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("nxt", last(col("p"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        coalesce(
          when(col("nxt.p_us") - unix_micros(col("ts")) <= 600000000L,
            col("nxt.p_id")),
          lit(-1L)).as("next_purchase_id"),
        coalesce(
          when(col("nxt.p_us") - unix_micros(col("ts")) <= 600000000L,
            col("nxt.p_us") - unix_micros(col("ts"))),
          lit(-1L)).as("gap_us"))
  }

  /** Exact per-group median (lower/`percentile_disc` form): the value
    * at rank (n+1) div 2 of the per-priority price order. The selected
    * VALUE — not an interpolated float — is engine-identical;
    * `percentile_cont`-style interpolation differs in evaluation
    * across engines and is exactly what this construction avoids.
    *
    * Rewritten r14 onto [[graft.operators.RankSelect.selectValues]]:
    * the old row_number window sorted each priority (~orders/5 rows)
    * in ONE task; the histogram selection keeps the same selected
    * value (ties on price share the value, so the old o_orderkey
    * tiebreak never influenced the output) with bounded shuffles and
    * bounded window partitions. Oracle unchanged. */
  def qMedianOrder(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RankSelect.selectValues(
        Tables.orders(spark, dir)
          .select(col("o_orderpriority"), col("o_totalprice")),
        Seq("o_orderpriority"), "o_totalprice",
        graft.operators.RankSelect.lowMedian)
      .select(col("o_orderpriority"), col("o_totalprice").as("median_price"))

  /** TPC-H Q22-style dormant high-balance customers (adapted: "no orders"
    * → "no orders since 2000"): customers above the positive-balance
    * average with no recent orders, rolled up by nation. The scalar
    * threshold is a 1-row broadcast cross join (exact DECIMAL sum ÷
    * count, divided as DOUBLE — deterministic on both engines); the NOT
    * EXISTS is a LEFT ANTI against the recent-orders key set. */
  def q22DormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_nationkey") < 10)
    val threshold = cust.filter(col("c_acctbal") > 0.0)
      .agg((asDouble(sum(dec(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    cust.crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"),
        asDouble(sum(dec(col("c_acctbal")))).as("totacctbal"))
  }

  /** Per-user z-score anomaly screen over event values: events whose
    * value sits ≥ 3 sample standard deviations from the user's own
    * mean — the per-entity outlier gate a metrics pipeline runs before
    * training on behavioral data (the [[graft.llm.Ann.embedOutliers]]
    * shape on the events table). Single-event users have no sample
    * deviation and are unflaggable by construction (sd is null);
    * constant-valued users are excluded by the sd > 0 guard.
    *
    * ONE shuffle: both window aggregates share the user_id partition,
    * and the window needs no ORDER BY (whole-partition frames), so no
    * per-user sort beyond the exchange's. Window partitions are
    * per-user event counts — bounded by entity activity, the salted
    * pattern (AsofJoin.joinSalted) applies if a bot user ever needs
    * it. Floats follow the embed_outliers rule: z is rounded to 4
    * decimals on BOTH engines before the threshold compare and is the
    * only float output. */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame =
    eventsAnomalyOn(Tables.events(spark, dir))

  def eventsAnomalyOn(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    events
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("sd", stddev_samp(col("value")).over(w))
      .withColumn("z", round(
        (col("value") - avg(col("value")).over(w)) / col("sd"), 4))
      .filter(col("sd") > 0 && abs(col("z")) >= 3.0)
      .select(col("event_id"), col("user_id"), col("z"))
  }

  /** Event-type transition matrix: counts and conditional probabilities
    * of consecutive (prev → next) event types per user — the first-order
    * Markov view of behavioral flow (where does a `view` lead; what
    * fraction of `cart`s convert). [[qFunnel]] asks about one fixed
    * path; this is every one-step path at once.
    *
    * ONE wide shuffle: the lag window partitions by user_id (the same
    * exchange q_user_sessions rides), then transitions collapse to a
    * |types|²-row frame via a map-side-combined agg; the probability
    * normalizes over THAT frame with a tiny window — the event stream
    * is never shuffled twice. Probability = exact count ratio, 4dp. */
  def eventsTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy(col("prev_type"))
    trans.withColumn("p", round(col("n") / sum(col("n")).over(byPrev), 4))
  }

  /** Rolling 7-day revenue: per order date, that day's revenue and the
    * trailing-week sum — the RANGE-framed window (`rangeBetween` over a
    * day index) none of the ROWS-framed queries exercise; a gap in the
    * calendar must contribute nothing, which a ROWS frame gets wrong
    * and a RANGE frame gets right (the spec plants exactly that gap).
    *
    * The window is global-ordered BUT runs over the DAILY frame —
    * |dates| rows after one map-side-combined agg, dimension-sized —
    * so the single-partition sort every unpartitioned window implies
    * costs nothing at any corpus scale. Money per [[Money]]: daily
    * sums accumulate exact DECIMAL, the rolling sum adds ≤ 7 exact
    * decimals, and both land DOUBLE at the boundary. */
  def qRollingRevenue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import Money._
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderdate"))
      .agg(sum(dec(col("o_totalprice"))).as("rev_dec"))
      .withColumn("day_n", datediff(col("o_orderdate").cast("date"),
        lit("1990-01-01").cast("date")))
    val w7 = Window.orderBy(col("day_n")).rangeBetween(-6, 0)
    daily.select(
      col("o_orderdate"),
      asDouble(col("rev_dec")).as("day_rev"),
      asDouble(sum(col("rev_dec")).over(w7)).as("rev_7d"))
  }

  /** Year-over-year revenue growth: yearly order rollup with the
    * lag-window growth rate every finance dashboard leads with. The
    * global-ordered lag window runs over the |years| frame after ONE
    * map-side-combined agg — dimension-sized at any corpus scale (the
    * [[qRollingRevenue]] argument). Yearly sums accumulate exact
    * DECIMAL; the growth ratio divides their DOUBLE casts and rounds
    * 4dp (identical IEEE ops both engines); the first year has no
    * predecessor and lands at the 0.0 sentinel (NULLs render
    * asymmetrically across the driver's readers). */
  def qGrowthYoy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import Money._
    val yearly = Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(sum(dec(col("o_totalprice"))).as("rev_dec"),
        count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("yr"))
    yearly.select(
      col("yr"), col("n_orders"),
      asDouble(col("rev_dec")).as("revenue"),
      coalesce(
        round(asDouble(col("rev_dec")) /
          asDouble(lag(col("rev_dec"), 1).over(w)) - 1.0, 4),
        lit(0.0)).as("yoy_growth"))
  }

  /** Revenue-concentration (Pareto) report: per customer-revenue
    * DECILE, customer count, exact-DECIMAL revenue, revenue share, and
    * the cumulative share from the top — "the top 10% of customers
    * carry X% of revenue", the concentration curve behind every
    * key-account and risk dashboard (and the business twin of
    * [[graft.operators.SkewProfile]]'s engineering view: the same
    * heavy keys, priced). Deciles are exactly `ntile(10)` over
    * (revenue DESC, custkey) — a total order, so bucket boundaries
    * replay exactly.
    *
    * Rewritten r14 with [[eventsRfm]]: the `ntile` window was a single
    * task sorting the whole |customers| frame. The nine decile
    * BOUNDARY ROWS are now selected by
    * [[graft.operators.RankSelect.selectRowsTied]]'s bounded histogram
    * (descending revenue rides the negated value — binning is
    * monotone either way) and each customer scores by comparing its
    * sort-key struct against the broadcast boundary array —
    * bit-identical to ntile, no entity-sized sort anywhere. Oracle
    * unchanged. Shares divide exact DECIMAL sums as DOUBLE, rounded
    * 4dp; the cumulative share windows over the 10-row decile
    * frame. */
  def qRevenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import Money._
    import graft.operators.RankSelect
    val perCust = graft.Exec.materialize(
      Tables.orders(spark, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"))
        .withColumn("nrev", -col("rev")))
    val decileBounds: Column => Column = n => array((1 to 9).map { t =>
      lit(t.toLong) * (n / lit(10L)).cast("long") +
        least(lit(t.toLong), n % lit(10L))
    }: _*)
    val bounds = RankSelect.selectRowsTied(perCust, Nil, "nrev",
      "o_custkey", decileBounds)
    val bArr = broadcast(bounds.agg(collect_list(
      struct(col("nrev").as("v"), col("o_custkey").as("u"))).as("__b")))
    val ranked = perCust.crossJoin(bArr)
      .withColumn("decile", lit(1) + size(filter(col("__b"),
        b => struct(col("nrev").as("v"), col("o_custkey").as("u")) > b)))
    val deciles = ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("rev")).as("rev_dec"))
    val total = broadcast(deciles.agg(sum(col("rev_dec")).as("tot")))
    deciles.crossJoin(total)
      .select(col("decile"), col("n_customers"),
        asDouble(col("rev_dec")).as("revenue"),
        round(asDouble(col("rev_dec")) / asDouble(col("tot")), 4)
          .as("rev_share"),
        round(asDouble(sum(col("rev_dec")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, 0))) /
          asDouble(col("tot")), 4).as("cum_share"))
  }

  /** Market-basket part pairs: the top-K (part_a, part_b) combinations
    * by LIFT — P(a,b) / (P(a)·P(b)) over orders — the bought-together
    * signal behind recommendations and assortment planning, restricted
    * to pairs seen ≥ `minOrders` times (lift's low-support pathology,
    * the text_collocations minCount rule). Pair generation is a
    * within-order self-join — orders average ~4 lines, so pair volume
    * is ~6× orders, never quadratic in lineitem — followed by ONE
    * map-side-combined pair count; part marginals and the order total
    * are dimension-sized frames joined back (AQE broadcast). Lift =
    * exact integer counts through identical IEEE division, rounded
    * 4dp BEFORE the (lift, part_a, part_b) total-order ranking. */
  def qBasketPairs(spark: SparkSession, dir: String, topK: Int = 50,
                   minOrders: Long = 3): DataFrame =
    qBasketPairsOn(Tables.lineitem(spark, dir), topK, minOrders)

  def qBasketPairsOn(lineitem: DataFrame, topK: Int = 50,
                     minOrders: Long = 3): DataFrame = {
    // PERSISTED (r17): the distinct line frame feeds FIVE subplans
    // (both self-join sides, the two marginal joins' source, the order
    // total) and Spark's ReuseExchange does not unify them — the
    // pre-persist plan carried 10 lineitem scans and 5 distinct
    // aggregations (plans/r17/q_basket_pairs_before.txt). The cache
    // boundary computes it once; freed by the ContextCleaner when the
    // plan dies (the ANN-family pair-join-pin convention).
    val lines = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().persist()
    val pairs = lines.as("a")
      .join(lines.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minOrders)
    val marg = lines.groupBy(col("pk")).agg(count(lit(1)).as("n"))
    val total = broadcast(lines.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders")))
    pairs
      .join(marg.select(col("pk").as("part_a"), col("n").as("na")), "part_a")
      .join(marg.select(col("pk").as("part_b"), col("n").as("nb")), "part_b")
      .crossJoin(total)
      .select(col("part_a"), col("part_b"), col("n_both"),
        round(col("n_both").cast("double") * col("n_orders") /
          (col("na").cast("double") * col("nb")), 4).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  /** Directional association rules (r12): the classic
    * support/confidence/lift triple per ORDERED part pair a→b — the
    * Agrawal-style rule mining [[qBasketPairs]]'s symmetric lift
    * ranking can't express: lift(a,b) = lift(b,a), but
    * confidence(a→b) = P(b|a) ≠ P(a|b), and "customers who bought a
    * also bought b" is a directional claim (the cheap accessory
    * implies the expensive base, rarely the reverse). Each undirected
    * pair above `minOrders` emits BOTH directions; ranking is
    * (confidence DESC, lift DESC, antecedent, consequent), top-K.
    *
    * Scale shape: identical to qBasketPairs up to the pair frame
    * (within-order self-join over distinct lines — ~6× orders, never
    * quadratic in lineitem; ONE map-side-combined pair count), then
    * the direction explode and marginal joins run over the
    * min-support-bounded pair frame (AQE broadcasts the dimension
    * marginals); top-K is a TakeOrdered. Support/confidence/lift are
    * exact integer counts through identical IEEE division, rounded
    * 4dp BEFORE the total-order ranking. */
  def qBasketRules(spark: SparkSession, dir: String, topK: Int = 50,
                   minOrders: Long = 3): DataFrame =
    qBasketRulesOn(Tables.lineitem(spark, dir), topK, minOrders)

  def qBasketRulesOn(lineitem: DataFrame, topK: Int = 50,
                     minOrders: Long = 3): DataFrame = {
    // PERSISTED (r17): same rationale as qBasketPairsOn — five
    // otherwise-recomputed references to the distinct line frame
    val lines = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().persist()
    // PERSISTED (r17): the direction union references the min-support
    // pair frame twice; uncached, each arm re-ran the within-order
    // self-join + pair count
    val pairs = lines.as("a")
      .join(lines.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minOrders)
      .persist()
    val rules = pairs.select(col("pa").as("antecedent"),
        col("pb").as("consequent"), col("n_both"))
      .unionByName(pairs.select(col("pb").as("antecedent"),
        col("pa").as("consequent"), col("n_both")))
    val marg = lines.groupBy(col("pk")).agg(count(lit(1)).as("n"))
    val total = broadcast(lines.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders")))
    rules
      .join(marg.select(col("pk").as("antecedent"), col("n").as("na")),
        "antecedent")
      .join(marg.select(col("pk").as("consequent"), col("n").as("nb")),
        "consequent")
      .crossJoin(total)
      .select(col("antecedent"), col("consequent"), col("n_both"),
        round(col("n_both").cast("double") / col("n_orders"), 4)
          .as("support"),
        round(col("n_both").cast("double") / col("na"), 4)
          .as("confidence"),
        round(col("n_both").cast("double") * col("n_orders") /
          (col("na").cast("double") * col("nb")), 4).as("lift"))
      .orderBy(col("confidence").desc, col("lift").desc,
        col("antecedent"), col("consequent"))
      .limit(topK)
  }

  /** Hourly burst detection per event type: each (hour, type) cell
    * z-scored against its own trailing 24 OBSERVED hours — the ops
    * alarm ("error rate just spiked") complementing [[eventsAnomaly]]
    * (per-user outliers) and `events_seasonality` (the static
    * baseline). Burst = z ≥ 3 with ≥ 12 baseline hours (cold starts
    * never alarm); the sd floors at 1.0 — the Poisson-ish floor for
    * count data, without which a perfectly flat baseline makes ANY
    * deviation infinitely surprising (zero variance) and a noisy ±1
    * hour would alarm.
    *
    * Scale shape: ONE map-side-combined agg to the (hours × types)
    * frame; the trailing window runs over THAT frame, partitioned by
    * type. Determinism: mean and variance derive from the window's
    * INTEGER sums (Σx, Σx², exact in doubles) via identical IEEE
    * arithmetic on both engines — no Welford-vs-naive stddev
    * divergence — and z rounds 4dp at the boundary anyway. */
  def eventsBurst(spark: SparkSession, dir: String): DataFrame =
    eventsBurstOn(Tables.events(spark, dir))

  def eventsBurstOn(events: DataFrame): DataFrame =
    burstFromHourly(events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events")))

  /** The z-score stage over an already-aggregated (hour, event_type,
    * n_events) frame — split out so the STREAMING-maintained count
    * table ([[graft.streaming.StreamBurst]]) serves the identical
    * report: hourly counts are exact integers and additive over
    * micro-batch shards, so a served frame equals the batch rebuild
    * bit-for-bit, and everything downstream is derived from those
    * integers through one shared IEEE expression tree. */
  def burstFromHourly(hourly: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-24, -1)
    val withSums = hourly
      .withColumn("b_cnt", count(col("n_events")).over(w))
      .withColumn("b_sum", sum(col("n_events")).over(w))
      .withColumn("b_sum2", sum(col("n_events") * col("n_events")).over(w))
    val mean = col("b_sum").cast("double") / col("b_cnt")
    val variance = (col("b_sum2").cast("double") * col("b_cnt") -
      col("b_sum").cast("double") * col("b_sum")) /
      (col("b_cnt").cast("double") * col("b_cnt"))
    val z = when(col("b_cnt") >= 12,
      round((col("n_events") - mean) /
        greatest(sqrt(variance), lit(1.0)), 4)).otherwise(0.0)
    withSums.select(col("hour"), col("event_type"), col("n_events"),
      when(col("b_cnt") >= 12, round(mean, 4)).otherwise(-1.0)
        .as("baseline_mean"),
      z.as("z"),
      (z >= 3.0).as("is_burst"))
  }

  /** DAU / WAU / stickiness per day — the engagement triple every
    * product dashboard leads with (stickiness = DAU/WAU, the "how many
    * weekly users show up daily" ratio). WAU needs a trailing-7-day
    * DISTINCT, which no window frame computes and a raw range join
    * would plan as a nested loop ([[graft.operators.IntervalJoin]]'s
    * lesson): instead each (day, user) pair EXPLODES to the ≤ 7 target
    * days it is visible to — a map-side `sequence`, then ONE distinct
    * agg keyed by (target day, user) and ONE count agg. Day index is
    * exact integer arithmetic; ratios exact-int 4dp; days with events
    * only (the corpus has no true calendar dimension). */
  def eventsDauWau(spark: SparkSession, dir: String): DataFrame = {
    val dayN = datediff(col("ts").cast("date"), lit("1990-01-01").cast("date"))
      .cast("long")
    val dayUser = Tables.events(spark, dir)
      .select(dayN.as("day_n"), col("user_id")).distinct()
    val dau = dayUser.groupBy(col("day_n"))
      .agg(count(lit(1)).as("dau"))
    val wau = dayUser
      .select(explode(sequence(col("day_n"), col("day_n") + 6))
        .as("target_day"), col("user_id"))
      .distinct()
      .groupBy(col("target_day").as("day_n"))
      .agg(count(lit(1)).as("wau"))
    // inner join: only days that themselves have activity report (the
    // explode also seeds phantom post-corpus days, which dau lacks)
    dau.join(wau, "day_n")
      .select(col("day_n"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
  }

  /** Top-K three-step user journeys: the most common consecutive
    * (step1 → step2 → step3) event-type paths across all users — the
    * multi-step extension of [[eventsTransitions]] (which sees one hop)
    * and the exploratory complement of [[qFunnel]] (which checks one
    * FIXED path): product analytics' "what do users actually do"
    * query. ONE wide shuffle (the same user_id window every sequence
    * query here reuses), two `lead`s ride it for free, then the
    * triples collapse map-side-combined to a ≤ |types|³ frame and the
    * top-K is a bounded TakeOrdered with a total (count DESC, steps
    * ASC) order. */
  def eventsPaths(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("b", lead(col("event_type"), 1).over(w))
      .withColumn("c", lead(col("event_type"), 2).over(w))
      .filter(col("b").isNotNull && col("c").isNotNull)
      .groupBy(col("event_type").as("step1"), col("b").as("step2"),
        col("c").as("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
      .limit(topK)
  }

  /** Activity seasonality matrix: events and distinct actives per
    * (ISO weekday × hour-of-day) cell with each cell's share of all
    * traffic — the capacity-planning / anomaly-baseline heatmap every
    * event pipeline dashboard draws (is Tuesday 14:00 quiet because
    * it's always quiet, or because ingestion broke?). ONE map-side-
    * combined agg to a ≤ 168-row frame; the share windows over THAT
    * frame, never the stream; weekday is ISO (1 = Monday) on both
    * engines (Spark `weekday`+1 == DuckDB `isodow`). */
  def eventsSeasonality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import Money._
    val cells = Tables.events(spark, dir)
      .groupBy((weekday(col("ts")) + 1).as("iso_dow"),
        hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        asDouble(sum(dec(col("value")))).as("sum_value"))
    cells.withColumn("share",
      round(col("n_events").cast("double") /
        sum(col("n_events")).over(Window.partitionBy()), 4))
  }

  /** RFM segmentation: per purchasing user, recency (days from last
    * purchase to the corpus's newest event — a deterministic anchor),
    * frequency (purchase count), monetary (exact DECIMAL sum), and the
    * classic 1–5 quintile scores, exactly `ntile(5)`'s assignment over
    * each (metric, user_id) total order. Score 5 = most recent / most
    * frequent / highest spend.
    *
    * Rewritten r14 (the r13 verdict's task-1 rider): the three `ntile`
    * windows were GLOBAL-ordered — each one a single task sorting the
    * whole |users| frame. ntile's tile of a row is pure rank
    * arithmetic: tile = 1 + #(t ∈ 1..4 : rank > cum(t)) where
    * cum(t) = t·(n div 5) + min(t, n mod 5) is the last rank of tile
    * t. So the rewrite selects the four BOUNDARY ROWS (the rank-cum(t)
    * (metric, user_id) pairs — a tile boundary can split a run of tied
    * metric values, hence rows, not values) per metric via
    * [[graft.operators.RankSelect.selectRowsTied]]'s bounded histogram
    * selection, broadcasts the three 4-element boundary arrays, and
    * scores each user by comparing its sort-key struct against them —
    * bit-identical to ntile (duplicate boundaries at n < 5 count
    * multiply, matching ntile's empty tiles), no global sort anywhere.
    * Oracle unchanged (still ntile SQL). The per-user frame is
    * materialized once — the boundary selections re-read it, not the
    * event stream. */
  def eventsRfm(spark: SparkSession, dir: String): DataFrame = {
    import Money._
    import graft.operators.RankSelect
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val anchor = broadcast(p.agg(max(col("ts")).as("anchor_ts")))
    val per = graft.Exec.materialize(
      p.groupBy("user_id")
        .agg(max(col("ts")).as("last_ts"),
          count(lit(1)).as("frequency"),
          sum(dec(col("value"))).as("mon_dec"))
        .crossJoin(anchor))
    val quintileBounds: Column => Column = n => array((1 to 4).map { t =>
      lit(t.toLong) * (n / lit(5L)).cast("long") +
        least(lit(t.toLong), n % lit(5L))
    }: _*)
    // melt: all three metrics map order-isomorphically AND injectively
    // into doubles (timestamps: epoch seconds carry the µs fraction
    // with ulp 2⁻²¹ s < 1 µs; counts and DECIMAL(12,2) sit under 2⁵³),
    // so ONE selection pipeline serves all three orderings
    def melt(m: String, c: Column): Column =
      struct(lit(m).as("m"), c.cast("double").as("mv"),
        col("user_id").as("u"))
    val melted = per.select(explode(array(
        melt("r", col("last_ts")), melt("f", col("frequency")),
        melt("m", col("mon_dec")))).as("x"))
      .select(col("x.m").as("metric"), col("x.mv").as("mv"),
        col("x.u").as("user_id"))
    val bounds = RankSelect.selectRowsTied(melted, Seq("metric"), "mv",
      "user_id", quintileBounds)
    def side(m: String): Column =
      collect_list(when(col("metric") === m,
        struct(col("mv").as("v"), col("user_id").as("u"))))
    val bArr = broadcast(bounds.groupBy().agg(
      side("r").as("__b_r"), side("f").as("__b_f"), side("m").as("__b_m")))
    def score(metric: Column, arr: String): Column =
      lit(1) + size(filter(col(arr),
        b => struct(metric.cast("double").as("v"),
          col("user_id").as("u")) > b))
    per.crossJoin(bArr)
      .select(
        col("user_id"),
        datediff(col("anchor_ts").cast("date"), col("last_ts").cast("date"))
          .as("recency_days"),
        col("frequency"),
        asDouble(col("mon_dec")).as("monetary"),
        score(col("last_ts"), "__b_r").as("r_score"),
        score(col("frequency"), "__b_f").as("f_score"),
        score(col("mon_dec"), "__b_m").as("m_score"))
  }

  /** Revenue pivot: ship-year rows × return-flag columns — the
    * wide-format report every BI layer asks of a long-format fact
    * table, exercising `RelationalGroupedDataset.pivot` (the one
    * reshaping API the rest of the analytics surface doesn't touch;
    * `q_retention_matrix` keeps its matrix long, `q_rollup_revenue`
    * adds grains, this TRANSPOSES a dimension into the schema).
    *
    * The pivot values are EXPLICIT — with an inferred value list Spark
    * first runs a separate distinct-collect job over the fact table to
    * discover the columns, an extra full scan that also makes the
    * output schema data-dependent (a new flag value would silently
    * widen the table). Pinned values make the pivot a pure single-pass
    * hash aggregate: internally one partial agg on (year, flag) with
    * map-side combine, then the transpose over the years×flags frame —
    * dimension-sized, never the fact table.
    *
    * Money follows [[Money]]: DECIMAL accumulation (exact,
    * order-independent), DOUBLE at the output boundary; empty cells
    * land 0.0 via coalesce so the frame is total. */
  def qPivotRevenue(spark: SparkSession, dir: String): DataFrame = {
    import Money._
    val flags = Seq("A", "N", "R")
    val pivoted = Tables.lineitem(spark, dir)
      .groupBy(year(col("l_shipdate")).as("ship_year"))
      .pivot("l_returnflag", flags)
      .agg(sum(discPrice))
    flags.foldLeft(pivoted) { (df, f) =>
      df.withColumn(s"rev_${f.toLowerCase}",
        asDouble(coalesce(col(f), lit(0).cast("decimal(12,2)"))))
    }.select(col("ship_year"), col("rev_a"), col("rev_n"), col("rev_r"))
  }
}
