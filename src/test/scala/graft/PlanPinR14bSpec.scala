package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextProfile2
import graft.queries.Analytics8

/** Physical-plan pins for the round-14 session-B operators — the
  * shapes the scaladocs promise: selections never sort (no
  * row_number over corpus frames), scans read only the columns used,
  * filters reach the parquet scan. */
class PlanPinR14bSpec extends AnyFunSuite with SparkFixture {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("selection-based ops carry no row_number / ntile") {
    // weighted median, winsorized boundaries, ship-delay percentiles:
    // all histogram selections; gini/lorenz/skyline: prefix algebra.
    // (events_top_movers is EXEMPT — its row_number ranks |weeks|
    // rows per type, calendar-bounded by construction.)
    val plans = Seq(
      Analytics8.qPriceWeightedMedian(spark, sfDir),
      Analytics8.eventsValueWinsorized(spark, sfDir),
      Analytics8.qShipDelayProfile(spark, sfDir),
      Analytics8.qAcctbalGini(spark, sfDir),
      Analytics8.qAcctbalLorenz(spark, sfDir),
      Analytics8.qPartSkyline(spark, sfDir),
      Analytics8.qRevenuePareto(spark, sfDir),
      Analytics8.qOrderValueDeciles(spark, sfDir),
      Analytics8.eventsSessionProfile(spark, sfDir))
      .map(plan)
    for (p <- plans) {
      assert(!p.contains("row_number"), p.take(600))
      assert(!p.contains("ntile"), p.take(600))
    }
  }

  test("gini/lorenz scans: pruned columns, positive-balance pushdown") {
    for (df <- Seq(Analytics8.qAcctbalGini(spark, sfDir),
        Analytics8.qAcctbalLorenz(spark, sfDir))) {
      val p = plan(df)
      // the broadcast side adds IsNotNull(c_mktsegment) — accept the
      // superset; what matters is the positive-balance pushdown
      assert(p.contains("GreaterThan(c_acctbal,0.0)"), p.take(800))
      assert(p.contains(
        "ReadSchema: struct<c_acctbal:double,c_mktsegment:string>"),
        p.take(800))
    }
  }

  test("skyline reads only (p_size, p_retailprice)") {
    val p = plan(Analytics8.qPartSkyline(spark, sfDir))
    assert(p.contains("ReadSchema: struct<p_size:int,p_retailprice:double>"),
      p.take(800))
  }

  test("corpus dashboards read only the columns they use") {
    val pBudget = plan(TextProfile2.corpusQualityBudgetCurveQ(spark, sfDir))
    assert(pBudget.contains("ReadSchema: struct<text:string>"),
      pBudget.take(800))
    val pDiv = plan(TextProfile2.corpusSourceDiversityQ(spark, sfDir))
    assert(pDiv.contains("ReadSchema: struct<lang:string,source:string>"),
      pDiv.take(800))
    val pVg = plan(TextProfile2.textVocabGiniQ(spark, sfDir))
    assert(pVg.contains("ReadSchema: struct<text:string,lang:string>")
      || pVg.contains("ReadSchema: struct<lang:string,text:string>"),
      pVg.take(800))
    val pMk = plan(TextProfile2.textMarkupAuditQ(spark, sfDir))
    assert(pMk.contains("ReadSchema: struct<text:string,source:string>")
      || pMk.contains("ReadSchema: struct<source:string,text:string>"),
      pMk.take(800))
  }

  test("events ops read only (event_type, value|user_id|ts)") {
    val pW = plan(Analytics8.eventsValueWinsorized(spark, sfDir))
    assert(pW.contains("event_type") && pW.contains("value")
      && !pW.contains("props"), pW.take(800))
    val pG = plan(Analytics8.eventsUserGini(spark, sfDir))
    assert(!pG.contains("props") && !pG.contains("value:"), pG.take(800))
    val pM = plan(Analytics8.eventsTopMovers(spark, sfDir))
    assert(!pM.contains("props") && !pM.contains("user_id"), pM.take(800))
  }
}
