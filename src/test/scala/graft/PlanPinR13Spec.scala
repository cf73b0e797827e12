package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Ann, TextProfile}
import graft.queries.{Analytics5, Analytics7}

/** Physical-plan pins for the round-13 operators — the shapes the
  * scaladocs PROMISE, asserted against the executed plan on the real
  * tables (the LlmOpsSpec/AsofJoinSpec convention): filters that must
  * reach the parquet scan, columns that must be pruned, operators that
  * must NOT appear. */
class PlanPinR13Spec extends AnyFunSuite with SparkFixture {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("panel ops push the vec_id < 50 filter into the parquet scan") {
    for (df <- Seq(Ann.embedJlDistortionQ(spark, sfDir),
        Ann.embedDistanceProfileQ(spark, sfDir))) {
      val p = plan(df)
      assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,50)]"),
        p.take(800))
    }
  }

  test("map-side text profiles read ONLY the columns they use") {
    // doc_id + text for the per-doc ops; no lang/n_chars/source
    for (df <- Seq(TextProfile.textNumericDensityQ(spark, sfDir),
        TextProfile.textCaseProfileQ(spark, sfDir))) {
      val p = plan(df)
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        p.take(800))
      // pure projection: no exchange at all
      assert(!p.contains("Exchange"), p.take(800))
    }
    val p = plan(TextProfile.vocabGoodTuringQ(spark, sfDir))
    assert(p.contains("ReadSchema: struct<text:string,source:string>")
      || p.contains("ReadSchema: struct<source:string,text:string>"),
      p.take(800))
  }

  test("table_profile plans WITHOUT an Expand (the 179x lesson)") {
    val p = plan(graft.operators.TableProfile.tableProfileQ(spark, sfDir))
    assert(!p.contains("Expand"), p.take(800))
  }

  test("q_price_elasticity broadcasts the part dimension") {
    val p = plan(Analytics5.qPriceElasticity(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q_join_cardinality joins histograms, never the fact rows") {
    // every join input is a HashAggregate (a (key, count) histogram) or
    // a broadcast of one: no join touches raw fact rows, so no
    // SortMergeJoin on an un-aggregated scan can appear below a join
    val df = Analytics7.qJoinCardinality(spark, sfDir)
    val p = plan(df)
    // the fact scans feed aggregates; the only equality joins are on
    // the aggregated key frames (shuffled hash or sort-merge on the
    // histogram, both fine) — pin the absence of a nested-loop join
    // over fact-sized inputs
    assert(!p.contains("CartesianProduct"), p.take(800))
    // and correctness of the shape: at least one aggregate per side
    // feeds each join — count HashAggregates comfortably exceeds joins
    val aggs = "HashAggregate".r.findAllIn(p).size
    val joins = "Join".r.findAllIn(p).size
    assert(aggs >= 6, s"expected histogram aggregates, got $aggs")
    assert(joins >= 3, s"expected per-join-name key joins, got $joins")
  }

  test("events_periodicity touches raw events in exactly one exchange") {
    // one (type, hour) map-side count; the period fan-out and phase
    // re-agg run on the dimension-sized grid
    val p = plan(Analytics5.eventsPeriodicity(spark, sfDir))
    // events.ts reads as timestamp or timestamp_ntz depending on the
    // parquet vintage (Tables.events dispatch) — pin the PRUNING, not
    // the timestamp flavor: only ts + event_type are read
    assert(p.contains("ReadSchema: struct<ts:timestamp_ntz,event_type:string>")
      || p.contains("ReadSchema: struct<ts:timestamp,event_type:string>"),
      p.take(800))
  }
}
