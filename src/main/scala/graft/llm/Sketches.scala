package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable distinct-count sketches for corpus dashboards.
  *
  * At 100 TB an exact `countDistinct` per reporting dimension re-shuffles
  * the corpus for every rollup level. The warehouse answer is a SKETCH
  * TABLE: aggregate once at the finest grain (lang × source) into HLL
  * sketches, persist those few-KB binaries, and serve every coarser
  * rollup (per-lang, global, ad-hoc source groupings) by UNIONING
  * sketches — never touching the corpus again. Spark 4's DataSketches
  * HLL functions (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`) are deterministic: the same input multiset
  * yields the same sketch bytes, so union-then-estimate is EXACTLY equal
  * to estimating a direct coarse-grain sketch — pinned by
  * SketchesSpec, alongside a ±5% accuracy bound vs exact distinct.
  */
object Sketches {

  /** Finest-grain sketch table: one row per (lang, source) holding the
    * HLL sketch of distinct normalized-content fingerprints plus exact
    * row counts. This is the frame a pipeline would persist. */
  def sketchTable(docs: DataFrame, lgK: Int = 12): DataFrame =
    docs
      .select(col("lang"), col("source"),
        xxhash64(col("text")).as("fp"))
      .groupBy(col("lang"), col("source"))
      .agg(hll_sketch_agg(col("fp"), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_docs"))

  /** Roll the sketch table up to per-lang distinct-content estimates by
    * sketch union — the corpus is not re-read. */
  def rollupByLang(sketchTbl: DataFrame): DataFrame =
    sketchTbl
      .groupBy(col("lang"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_distinct"),
        sum(col("n_docs")).as("n_docs"))

  /** One-pass per-lang sketch straight off the corpus (no intermediate
    * table) — the equality partner for the rollup in SketchesSpec. */
  def directByLang(docs: DataFrame, lgK: Int = 12): DataFrame =
    docs
      .select(col("lang"), xxhash64(col("text")).as("fp"))
      .groupBy(col("lang"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("fp"), lit(lgK))).as("est_distinct"),
        count(lit(1)).as("n_docs"))

  /** Driver entry (rows-only: estimates have no DuckDB twin): per-lang
    * distinct-content estimate computed THROUGH the mergeable sketch
    * table, the way a 100 TB dashboard would. */
  def sketchDistinctQ(spark: SparkSession, dir: String): DataFrame =
    rollupByLang(sketchTable(Tables.documents(spark, dir)))

  /** EVENTS-side HLL: per (hour, event_type) distinct-active-user
    * sketches — the ops-dashboard twin of [[sketchTable]] on the CDC
    * event stream (distinct actives is THE metric every such dashboard
    * serves, and the one a COUNT(DISTINCT) recompute per grain can't
    * afford at 100 TB). Same warehouse pattern: persist the few-KB
    * sketch rows at the finest grain, serve every coarser grain
    * (daily, per-type, global) by sketch UNION without re-reading the
    * stream; hourly sketches also make the table INCREMENTAL — a new
    * hour appends without touching history. */
  def eventsUserSketchTable(events: DataFrame, lgK: Int = 12): DataFrame =
    events
      .select(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"), col("user_id"))
      .groupBy(col("hour"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Roll the hourly user sketches up to per-type totals by union —
    * the stream is not re-read. */
  def eventsUserRollup(sketchTbl: DataFrame): DataFrame =
    sketchTbl
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
          .as("est_users"),
        sum(col("n_events")).as("n_events"))

  /** One-pass per-type sketch straight off the stream — the equality
    * partner for the rollup in SketchesSpec. */
  def eventsUserDirect(events: DataFrame, lgK: Int = 12): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(lgK)))
          .as("est_users"),
        count(lit(1)).as("n_events"))

  /** Driver entry (rows-only: estimates have no DuckDB twin). */
  def sketchEventsUsersQ(spark: SparkSession, dir: String): DataFrame =
    eventsUserRollup(eventsUserSketchTable(Tables.events(spark, dir)))

  // --- KLL quantile sketches ---

  /** Mergeable QUANTILE sketch table — the KLL twin of the HLL distinct
    * table, for distribution dashboards (doc-length percentiles per
    * stratum are the standard curation report): per (lang, source), a
    * KLL sketch of per-doc whitespace token counts plus exact row
    * counts. Same warehouse pattern: persist the few-KB sketch rows,
    * serve every coarser rollup by MERGING sketches, never re-reading
    * the corpus. Spark 4's DataSketches KLL functions
    * (`kll_sketch_agg_bigint` / `kll_merge_agg_bigint` /
    * `kll_sketch_get_quantile_bigint`) ride the hash agg like any
    * native aggregate. Unlike HLL, a KLL sketch's bytes depend on merge
    * order (compaction is structural), so rollup-vs-direct equality is
    * WITHIN rank error, not bit-exact — SketchesSpec pins both paths to
    * the ±2% normalized-rank bound the default k=200 guarantees. */
  def quantileSketchTable(docs: DataFrame, k: Int = 200): DataFrame =
    docs
      .select(col("lang"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("lang"), col("source"))
      .agg(call_function("kll_sketch_agg_bigint", col("n_tok"), lit(k))
        .as("sketch"),
        count(lit(1)).as("n_docs"))

  /** Per-lang token-count percentiles by sketch MERGE — the corpus is
    * not re-read. Output (lang, n_docs, p50, p90, p99). */
  def quantileRollupByLang(sketchTbl: DataFrame,
                           qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val merged = sketchTbl
      .groupBy(col("lang"))
      .agg(call_function("kll_merge_agg_bigint", col("sketch")).as("sk"),
        sum(col("n_docs")).as("n_docs"))
    merged.select(col("lang") +: col("n_docs") +: qs.map { q =>
      call_function("kll_sketch_get_quantile_bigint", col("sk"), lit(q))
        .as(s"p${math.round(q * 100)}")
    }: _*)
  }

  /** One-pass per-lang quantile sketch straight off the corpus — the
    * tolerance partner for the rollup in SketchesSpec. */
  def quantileDirectByLang(docs: DataFrame, k: Int = 200,
                           qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val agg = docs
      .select(col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(call_function("kll_sketch_agg_bigint", col("n_tok"), lit(k))
        .as("sk"),
        count(lit(1)).as("n_docs"))
    agg.select(col("lang") +: col("n_docs") +: qs.map { q =>
      call_function("kll_sketch_get_quantile_bigint", col("sk"), lit(q))
        .as(s"p${math.round(q * 100)}")
    }: _*)
  }

  // --- deterministic log-bucket quantile sketch (r14) ---

  /** DDSketch-style log-bucket quantile sketch table (Masson, Lee &
    * Rim, VLDB 2019 — relative-error quantiles from exponential
    * buckets): per (lang, source, bucket), the count of docs whose
    * token count lands in bucket b = ceil(8·log2 v), i.e. γ = 2^(1/8)
    * buckets with guaranteed relative error ≤ 2^(1/16) − 1 ≈ 4.4% at
    * the geometric-mid estimate. Bounded state (counts ≤ 2²⁴ span
    * ≤ 192 buckets per stratum), and — unlike the KLL BINARY sketch
    * ([[quantileSketchTable]], whose compaction is engine-bound and
    * merge-order dependent) — bucket counts merge by ADDITION:
    * order-independent, deterministic, replayable in DuckDB SQL. That
    * determinism is what moves the quantile dashboard behind the
    * value-level gate (r13 verdict task 3); the KLL table stays as the
    * tighter-error library alternative with SketchesSpec tolerance
    * pins. */
  def ddQuantileTable(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("bkt",
        when(col("n_tok") <= 0, lit(-1L))
          .otherwise(ceil(log2(col("n_tok").cast("double")) * lit(8.0))
            .cast("long")))
      .groupBy(col("lang"), col("source"), col("bkt"))
      .agg(count(lit(1)).as("n_docs"))

  /** Per-lang p50/p90/p99 token counts by sketch MERGE (= bucket-count
    * addition; the corpus is not re-read). Quantile q selects the
    * bucket holding rank ceil(q·n) by prefix sum (the RankSelect
    * histogram shape — window partitions ≤ 192 bucket rows) and
    * reports the bucket's geometric mid 2^((b−0.5)/8), rounded 4dp —
    * one IEEE tree both engines evaluate identically. */
  def ddQuantileRollup(tbl: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = tbl.groupBy(col("lang"), col("bkt"))
      .agg(sum(col("n_docs")).as("n"))
    val cum = merged.withColumn("cum",
      sum(col("n")).over(Window.partitionBy(col("lang")).orderBy(col("bkt"))))
    val ranks = merged.groupBy(col("lang")).agg(sum(col("n")).as("n_docs"))
      .select(col("lang"), col("n_docs"),
        explode(typedLit(Seq(0.5, 0.9, 0.99))).as("q"))
      .withColumn("r",
        ceil(col("q") * col("n_docs").cast("double")).cast("long"))
    val sel = cum.join(broadcast(ranks), Seq("lang"))
      .filter(col("cum") >= col("r") && col("cum") - col("n") < col("r"))
      .withColumn("est", when(col("bkt") === -1L, lit(0.0))
        .otherwise(round(pow(lit(2.0),
          (col("bkt").cast("double") - lit(0.5)) / lit(8.0)), 4)))
    sel.groupBy(col("lang"), col("n_docs"))
      .agg(max(when(col("q") === 0.5, col("est"))).as("p50"),
        max(when(col("q") === 0.9, col("est"))).as("p90"),
        max(when(col("q") === 0.99, col("est"))).as("p99"))
  }

  /** Driver entry (r14: FLIPPED from rows-only to value-oracled): the
    * per-lang token-count percentile dashboard served through the
    * deterministic mergeable log-bucket table. */
  def sketchQuantilesQ(spark: SparkSession, dir: String): DataFrame =
    ddQuantileRollup(ddQuantileTable(Tables.documents(spark, dir)))

  // --- Frequent-items (heavy hitters) sketches ---

  /** Mergeable HEAVY-HITTERS sketch table — the frequent-items member of
    * the trio (HLL distinct, KLL quantiles, and this): per (lang,
    * source), a DataSketches frequent-items sketch of whitespace tokens
    * plus exact token counts. The dashboard it serves is the
    * vocabulary/boilerplate report ("which tokens dominate this
    * stratum") that drives stopword and template detection. Same
    * warehouse shape: the corpus aggregates ONCE at the finest grain;
    * every coarser rollup merges few-KB sketch rows. `maxItems` bounds
    * sketch memory; items with true count ≥ N/maxItems are guaranteed
    * tracked (the Misra-Gries bound), and when a stratum's distinct
    * count stays under maxItems the counts are EXACT — SketchesSpec pins
    * that regime against a plain groupBy count. */
  def topkSketchTable(docs: DataFrame, maxItems: Int = 1024): DataFrame =
    docs
      .select(col("lang"), col("source"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"), col("source"))
      .agg(call_function("approx_top_k_accumulate", col("tok"), lit(maxItems))
        .as("sketch"),
        count(lit(1)).as("n_tokens"))

  /** Per-lang top-k tokens by sketch MERGE (corpus not re-read), exploded
    * to (lang, token, est_count, n_tokens) rows. */
  def topkRollupByLang(sketchTbl: DataFrame, k: Int = 20): DataFrame =
    sketchTbl
      .groupBy(col("lang"))
      .agg(call_function("approx_top_k_combine", col("sketch")).as("sk"),
        sum(col("n_tokens")).as("n_tokens"))
      .select(col("lang"), col("n_tokens"),
        explode(call_function("approx_top_k_estimate", col("sk"), lit(k)))
          .as("e"))
      .select(col("lang"), col("e.item").as("token"),
        col("e.count").as("est_count"), col("n_tokens"))

  /** One-pass per-lang top-k straight off the corpus — the equality
    * partner for the rollup in SketchesSpec. */
  def topkDirectByLang(docs: DataFrame, k: Int = 20,
                       maxItems: Int = 1024): DataFrame =
    docs
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"))
      .agg(call_function("approx_top_k", col("tok"), lit(k), lit(maxItems))
        .as("top"),
        count(lit(1)).as("n_tokens"))
      .select(col("lang"), col("n_tokens"), explode(col("top")).as("e"))
      .select(col("lang"), col("e.item").as("token"),
        col("e.count").as("est_count"), col("n_tokens"))

  // --- deterministic truncated-counter heavy hitters (r14) ---

  /** Truncated-counter heavy-hitters sketch table — the MERGEABLE
    * SUMMARIES form of the frequent-items sketch (Agarwal et al.,
    * "Mergeable Summaries", PODS 2012: truncated exact counters merge
    * with additive error bounded by the truncation thresholds): per
    * (lang, source), the EXACT counts of the top `maxItems` tokens
    * (boundary ties broken by token — a total order, so the kept set
    * is deterministic where the DataSketches binary FI sketch's is
    * merge-order bound) plus the stratum's truncation `threshold` (the
    * (maxItems+1)-th count; 0 when nothing was dropped — the counts
    * are then exact) and the exact stratum token total. Any token
    * absent from a stratum's sketch has a count ≤ that stratum's
    * threshold there, which is what prices the rollup's upper bound.
    *
    * Determinism is what moves the heavy-hitter dashboard behind the
    * value-level gate (r13 verdict task 3); the DataSketches FI table
    * ([[topkSketchTable]]) stays as the library alternative with
    * SketchesSpec exact-regime pins.
    *
    * Scale shape: one map-side (lang, source, token) count (the
    * word-count shuffle, bounded by vocab×strata), truncation through
    * [[graft.operators.GroupTopK]] (WindowGroupLimit bounds the
    * exchange at maxItems+1 rows per stratum per partition), then
    * windows only over ≤ maxItems+1-row frames. */
  def hhSketchTable(docs: DataFrame, maxItems: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // PERSISTED (r17, guide §1.2): the word-count table feeds both the
    // truncation chain and the exact stratum totals, and the ranked
    // frame feeds both the threshold agg and the kept filter —
    // unpersisted, the corpus was tokenized twice (plans/r17/
    // sketch_topk_before.txt). counts is vocab×strata bounded, ranked
    // ≤ (maxItems+1)×strata; ContextCleaner-freed.
    val counts = docs.select(col("lang"), col("source"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"), col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val kept1 = graft.operators.GroupTopK.topK(counts,
      Seq("lang", "source"), Seq(col("cnt").desc, col("tok").asc),
      maxItems + 1)
    val ranked = kept1.withColumn("rnk",
      row_number().over(Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("cnt").desc, col("tok").asc)))
      .persist()
    val thr = ranked.groupBy(col("lang"), col("source"))
      .agg(coalesce(max(when(col("rnk") === maxItems + 1, col("cnt"))),
        lit(0L)).as("threshold"))
    val totals = counts.groupBy(col("lang"), col("source"))
      .agg(sum(col("cnt")).as("n_tokens"))
    ranked.filter(col("rnk") <= maxItems)
      .select(col("lang"), col("source"), col("tok"), col("cnt"))
      .join(broadcast(thr), Seq("lang", "source"))
      .join(broadcast(totals), Seq("lang", "source"))
  }

  /** Per-lang top-k heavy hitters by sketch MERGE (tracked counts add;
    * the corpus is not re-read), with the mergeable-summaries error
    * bound made visible: `est_count` = Σ tracked counts (a LOWER
    * bound on the true count), `est_upper` = est_count + Σ thresholds
    * of the strata whose sketch does NOT track the token (the most it
    * could have hidden there). Ranking and the k boundary use the
    * (est_count DESC, token) total order — deterministic. */
  def hhTopkRollup(tbl: DataFrame, k: Int = 20): DataFrame = {
    val strata = tbl
      .select(col("lang"), col("source"), col("threshold"), col("n_tokens"))
      .distinct()
    val sums = strata.groupBy(col("lang"))
      .agg(sum(col("threshold")).as("thr_all"),
        sum(col("n_tokens")).as("n_tokens"))
    val cand = tbl.groupBy(col("lang"), col("tok"))
      .agg(sum(col("cnt")).as("est_count"),
        sum(col("threshold")).as("thr_present"))
    val scored = cand.join(broadcast(sums), Seq("lang"))
      .select(col("lang"), col("tok").as("token"), col("est_count"),
        (col("est_count") + col("thr_all") - col("thr_present"))
          .as("est_upper"),
        col("n_tokens"))
    graft.operators.GroupTopK.topK(scored, Seq("lang"),
      Seq(col("est_count").desc, col("token").asc), k)
  }

  /** Driver entry (r14: FLIPPED from rows-only to value-oracled): the
    * per-lang heavy-hitter dashboard served through the deterministic
    * truncated-counter table. the default maxItems = 16 keeps the
    * truncation LIVE at the driver SF (stratum vocabularies run
    * 16–31), so the gate checks the merge's bound arithmetic, not
    * just an exact regime. */
  def sketchTopkQ(spark: SparkSession, dir: String): DataFrame =
    hhTopkRollup(hhSketchTable(Tables.documents(spark, dir)))

  /** KMV (k-minimum-values) sketch table: per key, the k smallest
    * xxhash64 values of the member set — the sketch family member HLL
    * cannot replace: HLL unions but cannot INTERSECT, and "how much do
    * two audiences overlap" is a set-intersection question. KMV set
    * algebra is plain array math over k-length arrays (Beyer et al.
    * 2007), so every pairwise overlap estimate runs on a
    * dimension-sized frame without re-reading the stream.
    *
    * Built COMPOSITIONALLY — distinct → [[graft.operators.GroupTopK]]
    * (map-side WindowGroupLimit bounds the exchange at k rows per key
    * per partition) → sorted collect_list — rather than as a custom
    * aggregate: the engine's own operators already give the bounded
    * shuffle a hand-rolled TypedImperativeAggregate would buy. */
  def kmvSketchTable(df: DataFrame, keyCol: String, valueCol: String,
                     k: Int = 256): DataFrame = {
    val uh = df.select(col(keyCol).as("key"),
      xxhash64(col(valueCol)).as("vh")).distinct()
    val kept = graft.operators.GroupTopK.topK(uh, Seq("key"),
      Seq(col("vh").asc), k)
    // n_distinct is exact and free: the distinct frame is already keyed
    uh.groupBy("key").agg(count(lit(1)).as("n_distinct"))
      .join(kept.groupBy("key")
        .agg(sort_array(collect_list(col("vh"))).as("kmv")), "key")
  }

  /** Pairwise overlap report from a KMV sketch table: for every
    * unordered key pair, estimated union size, intersection size and
    * Jaccard — the audience-overlap matrix served entirely from the
    * |keys|-row sketch frame. Estimators are the standard KMV forms:
    * union sketch = k smallest of the merged arrays; θ = its largest
    * value normalized to (0,1); |A∪B| ≈ (k−1)/θ when the union sketch
    * is full, EXACT when it isn't (the sketch then IS the set);
    * Jaccard = |union-sketch ∩ A ∩ B| / |union sketch|; intersection =
    * Jaccard · |A∪B|. All outputs are rounded where float (4dp). */
  def kmvOverlap(sketches: DataFrame, k: Int = 256): DataFrame = {
    val a = sketches.select(col("key").as("key_a"), col("kmv").as("kmv_a"),
      col("n_distinct").as("n_a"))
    val b = sketches.select(col("key").as("key_b"), col("kmv").as("kmv_b"),
      col("n_distinct").as("n_b"))
    val merged = array_sort(array_union(col("kmv_a"), col("kmv_b")))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("u", slice(merged, 1, k))
      .withColumn("matches",
        size(array_intersect(array_intersect(col("u"), col("kmv_a")),
          col("kmv_b"))))
      // θ: kth min hash as a fraction of the hash space — xxhash64 is a
      // signed long, so shift into (0, 1) via /2⁶⁴ + ½
      .withColumn("theta",
        element_at(col("u"), size(col("u"))).cast("double")
          / lit(2.0 * Long.MaxValue) + lit(0.5))
      .withColumn("est_union",
        when(size(col("u")) < k, size(col("u")).cast("double"))
          .otherwise((lit(k) - 1) / col("theta")))
      .withColumn("jaccard_est",
        round(col("matches") / size(col("u")), 4))
      .select(col("key_a"), col("key_b"), col("n_a"), col("n_b"),
        round(col("est_union")).cast("long").as("est_union"),
        round(col("jaccard_est") * col("est_union")).cast("long")
          .as("est_inter"),
        col("jaccard_est"))
  }

  /** Driver entry: user-audience overlap between event types. k = 512
    * exceeds the sf0.01 user population, so every sketch is COMPLETE
    * and the estimators sit in their exact regime — which is what makes
    * a DuckDB oracle possible at all (the same param-for-oracle move as
    * text_gopher's minWords); SketchesSpec covers the k ≪ n estimation
    * regime against exact truth with tolerance bounds instead. */
  def sketchOverlapQ(spark: SparkSession, dir: String): DataFrame = {
    val k = 512
    // PERSISTED (r17, guide §1.2): kmvOverlap joins the sketch table
    // with itself — unpersisted, each side re-ran the distinct +
    // GroupTopK sketch build. |keys|-sized (one k-array row per type).
    kmvOverlap(kmvSketchTable(Tables.events(spark, dir),
      "event_type", "user_id", k).persist(), k)
  }
}
