package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Cdc

class CdcSpec extends AnyFunSuite with SparkFixture {

  test("routeDestination: plain destination maps dots to underscores") {
    assert(Cdc.routeDestination("db.schema.tbl") === "db_schema_tbl")
  }

  test("routeDestination: regexp replace applies before dot mapping") {
    // reference semantics: destination-regexp strips the server prefix
    assert(Cdc.routeDestination("srv1.inventory.orders",
      regexp = Some("^srv1\\."), replace = Some("")) === "inventory_orders")
  }

  test("routeDestination: no regexp configured means no replacement at all") {
    // an empty-pattern replaceAll would inject the replacement between
    // every character ("xdxbx_xtx") — guarded against
    assert(Cdc.routeDestination("db.t", regexp = None, replace = Some("x"))
      === "db_t")
    assert(Cdc.routeDestination("db.t", regexp = Some(""), replace = Some("x"))
      === "db_t")
  }

  test("dedupLatest keeps the row with highest (ts, op-priority, id)") {
    import spark.implicits._
    val df = Seq(
      // key 1: same ts — op priority decides (d > u > r > c)
      (1L, "u", 100L, 10L), (1L, "d", 100L, 11L), (1L, "c", 100L, 12L),
      // key 2: later ts wins regardless of priority
      (2L, "d", 100L, 20L), (2L, "c", 200L, 21L),
      // key 3: full tie — highest id wins
      (3L, "u", 100L, 30L), (3L, "u", 100L, 31L)
    ).toDF("user_id", "__op", "__source_ts_ms", "event_id")
    val out = Cdc.dedupLatest(df, Seq("user_id"),
      Seq(col("__source_ts_ms"), Cdc.opPriorityCol(col("__op")), col("event_id")))
      .select("user_id", "__op", "event_id").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(out === Array((1L, "d", 11L), (2L, "c", 21L), (3L, "u", 31L)))
  }

  test("mergeIncremental equals upsertSnapshot over the full changelog") {
    val events = Tables.events(spark, sfDir)
    val full = Cdc.upsertSnapshot(events)
    val merged = Cdc.mergeIncremental(events, lit("2024-01-15").cast("timestamp"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("softDeleteSnapshot keeps deleted keys flagged, upsertSnapshot drops them") {
    val events = Tables.events(spark, sfDir)
    val soft = Cdc.softDeleteSnapshot(events)
    val hard = Cdc.upsertSnapshot(events)
    val deleted = soft.filter(col("__op") === "d").count()
    assert(soft.count() === hard.count() + deleted)
    assert(hard.filter(col("__op") === "d").count() === 0)
  }

  test("op mix: per-hour shares sum to 1, deletes counted only under op d") {
    import spark.implicits._
    val mix = Cdc.opMix(Tables.events(spark, sfDir))
    // shares within each hour form a distribution
    val badShare = mix.groupBy("hour")
      .agg(sum("op_share").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9)
    assert(badShare.isEmpty)
    // the __deleted flag tracks the d op exactly (error events)
    val badDel = mix.filter(
      (col("__op") === "d" && col("n_deleted") =!= col("n_events")) ||
        (col("__op") =!= "d" && col("n_deleted") =!= 0L))
    assert(badDel.isEmpty)
    // totals reconcile with the raw stream
    val total = mix.agg(sum("n_events")).as[Long].head()
    assert(total === Tables.events(spark, sfDir).count())
  }
}
