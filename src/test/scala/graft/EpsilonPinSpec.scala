package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ε-pins between the EXACT profiling contracts and their sketch
  * counterparts (r13 verdict task 7 — optional depth): the scaladocs
  * declare "the sketch is the warehouse path" for these ops; these
  * tests replace that docstring claim with a MEASURED error bound at
  * driver SF.
  *
  *  - events_value_outliers' exact per-type median vs the DD
  *    log-bucket sketch estimate (γ = 2^(1/8) → relative error
  *    ≤ 2^(1/16) − 1 ≈ 4.43%);
  *  - table_profile's exact per-column NDV vs the HLL (lgK = 12)
  *    estimate (standard error 1.04/√2¹² ≈ 1.6%; ±5% is the 3σ
  *    SketchesSpec convention).
  */
class EpsilonPinSpec extends AnyFunSuite with SparkFixture {

  test("events_value_outliers exact medians vs DD-sketch p50: ≤ 4.43%") {
    val events = Tables.events(spark, sfDir)
    val exact = graft.queries.Analytics5.eventsValueOutliersOn(events)
      .select("event_type", "median_value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the DD path: per-type log-bucket histogram, rank (n+1) div 2
    // (≡ ceil(n/2), the rollup's ceil(q·n) at q = 0.5), geometric mid
    val vals = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val bound = math.pow(2.0, 1.0 / 16.0) - 1.0
    for ((t, xs0) <- vals.groupBy(_._1)) {
      val buckets = xs0.map { case (_, v) =>
        math.ceil(math.log(v) / math.log(2.0) * 8.0).toLong
      }.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
      val n = xs0.length.toLong
      val r = (n + 1) / 2
      val cums = buckets.scanLeft(0L)(_ + _._2).tail
      val b = buckets(cums.indexWhere(_ >= r))._1
      val est = math.pow(2.0, (b - 0.5) / 8.0)
      val ex = exact(t)
      assert(math.abs(est - ex) / ex <= bound + 1e-4,
        s"$t: dd=$est exact=$ex")
    }
  }

  test("sketch_quantiles served rollup vs exact RankSelect percentiles: ≤ 4.43%") {
    // the PRODUCTION serving path (ddQuantileTable → ddQuantileRollup,
    // the sketch_quantiles driver entry) against the exact selected-row
    // percentiles of the same per-doc token counts — the theoretical
    // γ = 2^(1/8) bound measured at every (lang, q) cell
    import graft.llm.{Sketches, TextOps}
    import graft.operators.RankSelect
    val docs = Tables.documents(spark, sfDir)
    val dd = Sketches.ddQuantileRollup(Sketches.ddQuantileTable(docs))
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val toks = docs.select(col("lang"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    val qs = Seq(0.5, 0.9, 0.99)
    val ranksOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => array(qs.map(q =>
        ceil(lit(q) * n.cast("double")).cast("long")): _*)
    val exact = RankSelect.selectValues(toks, Seq("lang"), "n_tok", ranksOf)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val bound = math.pow(2.0, 1.0 / 16.0) - 1.0
    for ((lang, ests) <- dd; (est, i) <- ests.zipWithIndex) {
      val ex = exact((lang, i)).toDouble
      assert(math.abs(est - ex) / ex <= bound + 1e-4,
        s"$lang q=${qs(i)}: dd=$est exact=$ex")
    }
  }

  test("table_profile exact NDVs vs HLL estimates: within 5% per column") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = graft.operators.TableProfile.tableProfile(li)
      .select("column_name", "n_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (f <- li.schema.fields) {
      // HLL takes int/bigint/string/binary: hash the canonical string
      // rendering (injective per distinct value, so NDV is preserved)
      val est = li.agg(
        hll_sketch_estimate(
          hll_sketch_agg(col(f.name).cast("string"), lit(12))))
        .collect().head.getLong(0)
      val ex = exact(f.name)
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"${f.name}: hll=$est exact=$ex")
    }
  }
}
