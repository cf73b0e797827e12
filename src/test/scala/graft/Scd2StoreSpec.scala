package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Cdc, Scd2Store}
import graft.sinks.WarehouseSink

/** Store lifecycle for the partitioned SCD2 warehouse layout
  * (VERDICT r11 #6): pruned open read, multi-batch fold equality to the
  * full rebuild, crash-replay idempotence of the closed-row merge, and
  * the strict in-order guard at the store boundary. */
class Scd2StoreSpec extends AnyFunSuite with SparkFixture {

  private def freshStore(): (Scd2Store, WarehouseSink) = {
    val sink = new WarehouseSink(tmpDir("scd2_store_"))
    (new Scd2Store(sink), sink)
  }

  private def events = Tables.events(spark, sfDir)

  test("multi-batch folds equal the full rebuild; open read is pruned") {
    val (store, _) = freshStore()
    val cut1 = lit("2024-01-10").cast("timestamp")
    val cut2 = lit("2024-01-20").cast("timestamp")
    store.build(events.filter(col("ts") <= cut1))
    store.foldBatch(spark, events.filter(col("ts") > cut1 && col("ts") <= cut2))
    store.foldBatch(spark, events.filter(col("ts") > cut2))
    val full = Cdc.scd2(events)
    val got = store.read(spark).select(full.columns.map(col): _*)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
    // open partition: exactly the current rows, via a pruned one-dir read
    val open = store.readOpen(spark)
    val wantOpen = full.filter(col("is_current"))
      .select(full.columns.map(col): _*)
    assert(open.select(full.columns.map(col): _*).exceptAll(wantOpen).isEmpty
      && wantOpen.exceptAll(open.select(full.columns.map(col): _*)).isEmpty)
    val plan = open.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("part#") && !plan.contains("PartitionFilters: []"),
      s"open read must prune on the part column:\n$plan")
  }

  test("closed-row merge is crash-replay idempotent; closed months " +
    "are never rewritten by later in-order folds") {
    val (store, sink) = freshStore()
    val cut = lit("2024-01-15").cast("timestamp")
    store.build(events.filter(col("ts") <= cut))
    val before = store.read(spark).count()
    // simulate the crash window: the closed merge ran, the current
    // overwrite did not, and the whole fold replays from the top
    val batch = events.filter(col("ts") > cut)
    val folded = graft.Exec.materialize(
      Cdc.scd2Incremental(store.readOpen(spark), batch)
        .withColumn("part", when(col("is_current"), lit(store.CurrentPart))
          .otherwise(date_format(timestamp_millis(col("valid_to_ms")),
            "yyyy-MM"))))
    store.mergeClosed(spark, folded.filter(col("part") =!= store.CurrentPart))
    store.foldBatch(spark, batch) // full replay after the "crash"
    val full = Cdc.scd2(events)
    val got = store.read(spark).select(full.columns.map(col): _*)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty,
      "replayed fold must converge, not duplicate closed versions")
    assert(before > 0 && got.count() === full.count())
    // empty batch: identity
    store.foldBatch(spark, batch.filter(lit(false)))
    val again = store.read(spark).select(full.columns.map(col): _*)
    assert(again.exceptAll(full).isEmpty && full.exceptAll(again).isEmpty)
  }

  test("out-of-order batch trips the guard at the store boundary") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val (store, _) = freshStore()
    val history = Seq(
      (1L, 1L, "signup", 1.0, ts("2024-01-01 00:00:00"), """{"k":1}"""),
      (2L, 1L, "click", 1.0, ts("2024-02-10 00:00:00"), """{"k":2}"""))
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    store.build(history)
    val late = Seq(
      (3L, 1L, "view", 1.0, ts("2024-02-05 00:00:00"), """{"k":3}"""))
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val err = intercept[IllegalArgumentException] {
      store.foldBatch(spark, late)
    }
    assert(err.getMessage.contains("in-order contract"))
    // the store is untouched by the rejected fold
    val full = Cdc.scd2(history)
    val got = store.read(spark).select(full.columns.map(col): _*)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
  }

  test("all-keys-deleted batch retires the open partition") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val (store, sink) = freshStore()
    val history = Seq(
      (1L, 1L, "signup", 1.0, ts("2024-01-01 00:00:00"), """{"k":1}"""),
      (2L, 2L, "signup", 1.0, ts("2024-01-02 00:00:00"), """{"k":2}"""))
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    store.build(history)
    assert(store.readOpen(spark).count() === 2L)
    val deletes = Seq(
      (3L, 1L, "error", 1.0, ts("2024-03-01 00:00:00"), """{"k":3}"""),
      (4L, 2L, "error", 1.0, ts("2024-03-02 00:00:00"), """{"k":4}"""))
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    store.foldBatch(spark, deletes)
    assert(store.readOpen(spark).isEmpty)
    val full = Cdc.scd2(history.unionByName(deletes))
    val got = store.read(spark).select(full.columns.map(col): _*)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
    assert(!new java.io.File(sink.tablePath("scd2"), "part=current").exists())
  }
}
