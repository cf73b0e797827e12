package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Cdc

/** Invariants of the CDC semantics over the real test warehouse. (Pure
  * functions get full ScalaCheck treatment in [[PureProperties]].) */
class CdcPropertiesSpec extends AnyFunSuite with SparkFixture {

  test("mergeIncremental equals upsertSnapshot for any cutoff") {
    val events = Tables.events(spark, sfDir)
    val want = Cdc.upsertSnapshot(events)
    // cutoffs sampled across and beyond the data's time range
    for (cut <- Seq("2023-12-01", "2024-01-08", "2024-01-21", "2025-01-01")) {
      val got = Cdc.mergeIncremental(events, lit(cut).cast("timestamp"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"cutoff $cut diverged")
    }
  }

  test("dedupLatest is idempotent and insensitive to input order") {
    val flat = Cdc.flatten(Tables.events(spark, sfDir))
    def dedup(df: org.apache.spark.sql.DataFrame) =
      Cdc.dedupLatest(df, Seq("user_id"),
        Seq(col("__source_ts_ms"), Cdc.opPriorityCol(col("__op")), col("event_id")))
    val once = dedup(flat)
    val twice = dedup(once)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    val shuffled = dedup(flat.orderBy(rand(42)))
    assert(once.exceptAll(shuffled).isEmpty && shuffled.exceptAll(once).isEmpty)
  }
}
