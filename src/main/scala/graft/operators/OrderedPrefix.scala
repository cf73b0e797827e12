package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix aggregation over a value order — for
  * each distinct value of a group, the count / value-mass / measure-max
  * of all STRICTLY SMALLER values, without sorting the group in one
  * task.
  *
  * This is the sibling of [[RankSelect]] (which answers "what value
  * sits at rank r"); OrderedPrefix answers "what accumulated below
  * value v" for EVERY distinct v at once — the primitive under exact
  * Gini coefficients (rank-weighted sums), Lorenz curves (cumulative
  * mass at selected ranks) and 2-D skylines (prefix max over a second
  * attribute). The classic construction is a global sorted window —
  * one task per group; here the prefix splits into a bucket offset
  * (window over ≤ `buckets` histogram rows per group) plus an
  * in-bucket prefix (window over one bucket's distinct values), the
  * same bound structure as RankSelect: no window partition ever holds
  * more than `buckets` rows or one bucket's distinct-value occupancy.
  *
  * Input contract: `valueCol` is integral (cast to LONG internally —
  * the cents discipline; exact DECIMAL(38,0) value-mass needs integer
  * values) and non-NULL rows only (callers filter, the NULL-ordering
  * rule). The double image used for binning need only be monotone,
  * as in RankSelect; prefixes attach to ORIGINAL long values.
  *
  * Output, one row per distinct (groups, value):
  *   - `__c`     count of rows at this value (LONG)
  *   - `__cumc`  count of rows at STRICTLY smaller values (LONG, 0 at
  *               the group minimum)
  *   - `__cums`  Σ value·count over strictly smaller values
  *               (DECIMAL(38,0), 0 at the minimum)
  *   - `__m`/`__cummax` (only when `maxCol` is given) max of maxCol at
  *               this value / over strictly smaller values (NULL at
  *               the minimum — "nothing below", the skyline
  *               not-dominated sentinel)
  */
object OrderedPrefix {

  def distinctPrefix(df: DataFrame, groups: Seq[String], valueCol: String,
                     maxCol: Option[String] = None,
                     buckets: Int = 1024): DataFrame = {
    val gcols = groups.map(col)
    val v = col(valueCol).cast("long")
    val base = df.filter(col(valueCol).isNotNull)
    // distinct-value frame: the only corpus-sized shuffle, bounded by
    // the value domain (map-side combined)
    // PERSISTED (r17, guide §1.2): three subtrees consume this frame —
    // the extent agg, the in-bucket prefix, and the bucket-total
    // branch — and without the cache boundary each re-ran the corpus
    // aggregation (q_revenue_pareto's pre-persist plan carried 8
    // lineitem scans, plans/r17/*_before.txt). Distinct-value-domain
    // bounded; freed by the ContextCleaner when the plan dies.
    val vc = base
      .groupBy((gcols :+ v.as("__v")): _*)
      .agg(count(lit(1)).as("__c"),
        maxCol.map(m => max(col(m)).as("__m")).toSeq: _*)
      .persist()
    val ext = vc.groupBy(gcols: _*)
      .agg(min(col("__v").cast("double")).as("__vmin"),
        max(col("__v").cast("double")).as("__vmax"))
    val joined =
      if (groups.isEmpty) vc.crossJoin(broadcast(ext))
      else vc.join(broadcast(ext), groups)
    val width = (col("__vmax") - col("__vmin")) / lit(buckets.toDouble)
    val bkt = when(col("__vmax") <= col("__vmin"), lit(0L))
      .otherwise(least(lit((buckets - 1).toLong),
        floor((col("__v").cast("double") - col("__vmin")) / width)
          .cast("long")))
    val vb = joined.withColumn("__bkt", bkt).drop("__vmin", "__vmax")
    val mass = col("__v").cast("decimal(38,0)") * col("__c")
    // in-bucket exclusive prefixes: partition = one bucket's values
    val wIn = Window.partitionBy((gcols :+ col("__bkt")): _*)
      .orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, -1)
    val in0 = vb
      .withColumn("__ic", coalesce(sum(col("__c")).over(wIn), lit(0L)))
      .withColumn("__is", coalesce(sum(mass).over(wIn),
        lit(0).cast("decimal(38,0)")))
    val inb = maxCol.fold(in0)(_ =>
      in0.withColumn("__im", max(col("__m")).over(wIn)))
    // bucket totals + exclusive bucket offsets: ≤ `buckets` rows/group
    val bt = vb.groupBy((gcols :+ col("__bkt")): _*)
      .agg(sum(col("__c")).as("__bc"),
        (sum(mass).as("__bs") +:
          maxCol.map(_ => max(col("__m")).as("__bm")).toSeq): _*)
    val wB = Window.partitionBy(gcols: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ob0 = bt
      .withColumn("__oc", coalesce(sum(col("__bc")).over(wB), lit(0L)))
      .withColumn("__os", coalesce(sum(col("__bs")).over(wB),
        lit(0).cast("decimal(38,0)")))
    val ob = maxCol.fold(ob0)(_ =>
      ob0.withColumn("__om", max(col("__bm")).over(wB)))
      .select((gcols ++ Seq(col("__bkt"), col("__oc"), col("__os")) ++
        maxCol.map(_ => col("__om"))): _*)
    val merged = inb.join(broadcast(ob), groups :+ "__bkt")
    val out0 = merged
      .withColumn("__cumc", col("__oc") + col("__ic"))
      .withColumn("__cums",
        (col("__os") + col("__is")).cast("decimal(38,0)"))
    val out = maxCol.fold(out0)(_ =>
      out0.withColumn("__cummax", greatest(col("__om"), col("__im"))
        // greatest(null, x) = x in Spark, but make the all-null case
        // explicit: no smaller value anywhere → NULL
      ))
    // (Deliberately NOT persisted: consumers that reference the prefix
    // frame twice re-run only the bounded window passes above the vc
    // cache — ≤ buckets rows per partition at any corpus size — and an
    // A/B of the extra boundary read +0.05 s of pure overhead at sf0.1,
    // PersistBatchScratch.)
    out.select((gcols ++ Seq(col("__v").as(valueCol), col("__c"),
      col("__cumc"), col("__cums")) ++
      maxCol.map(_ => col("__m")) ++
      maxCol.map(_ => col("__cummax"))): _*)
  }

  /** Exact Gini coefficient per group over `valueCol` (integral,
    * positive), via the distinct-value prefix frame: a tie class of c
    * copies of v with F rows strictly below occupies ranks F+1..F+c,
    * so Σ rank·value = Σ_v v·(cF + c(c+1)/2). Accumulates the DOUBLED
    * rank-sum 2R = Σ_v v·(2cF + c(c+1)) — always integral, so nothing
    * divides before the output edge (Spark's `/` on integers is
    * DOUBLE division; c(c+1)/2 through a double would silently lose
    * exactness past 2^52) — in DECIMAL(38,0), and
    * G = 2R/(nT) − (n+1)/n only becomes DOUBLE in the returned
    * columns. Rank-sums are tie-order invariant (tied rows share v),
    * so no tiebreak is ever needed. Output: groups ++
    * (n, mean_raw, gini) with mean_raw = T/n un-rounded (callers
    * rescale cents→currency before rounding) and gini rounded 4dp. */
  def gini(df: DataFrame, groups: Seq[String], valueCol: String,
           buckets: Int = 1024): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val pref = distinctPrefix(df, groups, valueCol, buckets = buckets)
    val c38 = d38(col("__c"))
    val r2 = d38(col(valueCol)) *
      (lit(2L) * c38 * d38(col("__cumc")) + c38 * (c38 + lit(1L)))
    val t = d38(col(valueCol)) * col("__c")
    pref.groupBy(groups.map(col): _*)
      .agg(sum(col("__c")).as("n"), sum(t).as("tot"), sum(r2).as("rs2"))
      .select((groups.map(col) ++ Seq(col("n"),
        (dd(col("tot")) / dd(col("n"))).as("mean_raw"),
        round(dd(col("rs2")) / (dd(col("n")) * dd(col("tot")))
          - (dd(col("n")) + lit(1.0)) / dd(col("n")), 4).as("gini"))): _*)
  }
}
