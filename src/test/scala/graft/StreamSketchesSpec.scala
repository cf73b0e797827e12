package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sketches
import graft.sinks.WarehouseSink
import graft.streaming.StreamSketches

/** Pins the streaming sketch-table maintenance loop: micro-batch HLL
  * shards union to EXACTLY the batch-rebuilt table's estimates, coarser
  * rollups match the one-pass direct sketch, and a replayed micro-batch
  * rewrites its own partition instead of double-counting. */
class StreamSketchesSpec extends AnyFunSuite with SparkFixture {

  test("streaming-built sketch table serves the batch rebuild's estimates exactly") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val inputDir = tmpDir("skst_in_")
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$inputDir/f0")
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$inputDir/f1")
    val sink = new WarehouseSink(tmpDir("skst_wh_"))
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
    val q = StreamSketches.eventsUsersStream(stream, sink,
      checkpoint = tmpDir("skst_ckpt_"),
      trigger = Some(Trigger.AvailableNow()))
    q.awaitTermination()
    // at least two micro-batches landed (one per file)
    val shards = sink.read(spark, "events_users_sketch")
    assert(shards.select("batch_id").distinct().count() >= 2)

    def ests(tbl: org.apache.spark.sql.DataFrame) = tbl
      .select(col("hour"), col("event_type"),
        hll_sketch_estimate(col("sketch")).cast("long").as("est"),
        col("n_events"))
    val served = ests(StreamSketches.servedSketchTable(spark, sink))
    val want = ests(Sketches.eventsUserSketchTable(events))
    assert(served.count() === want.count())
    assert(served.exceptAll(want).isEmpty && want.exceptAll(served).isEmpty)

    // coarser grain by union == batch rollup == one-pass direct
    def roll(tbl: org.apache.spark.sql.DataFrame) = Sketches
      .eventsUserRollup(tbl)
      .select(col("event_type"), col("est_users").cast("long"),
        col("n_events"))
    val rServed = roll(StreamSketches.servedSketchTable(spark, sink))
    val rBatch = roll(Sketches.eventsUserSketchTable(events))
    val direct = Sketches.eventsUserDirect(events)
      .select(col("event_type"), col("est_users").cast("long"),
        col("n_events"))
    assert(rServed.exceptAll(rBatch).isEmpty && rBatch.exceptAll(rServed).isEmpty)
    assert(rServed.exceptAll(direct).isEmpty && direct.exceptAll(rServed).isEmpty)

    // replay idempotence: re-running a batch overwrites its own rows.
    // Identify which file slice batch 0 carried by its exact row total
    val before = served.collect().map(_.toSeq).toSet
    val b0Events = shards.filter(col("batch_id") === 0)
      .agg(sum("n_events")).as[Long].head()
    val evenSlice = events.filter(col("event_id") % 2 === 0)
    val oddSlice = events.filter(col("event_id") % 2 === 1)
    val replay = if (evenSlice.count() == b0Events) evenSlice else oddSlice
    StreamSketches.writeBatch(replay, 0L, sink, "events_users_sketch")
    val after = ests(StreamSketches.servedSketchTable(spark, sink))
      .collect().map(_.toSeq).toSet
    assert(after === before)
  }

  test("streaming DD quantile table == batch rebuild, bit-exact, replay-proof") {
    val docs = Tables.documents(spark, sfDir)
    val inputDir = tmpDir("ddst_in_")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$inputDir/f0")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$inputDir/f1")
    val sink = new WarehouseSink(tmpDir("ddst_wh_"))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
    val q = StreamSketches.ddQuantileStream(stream, sink,
      checkpoint = tmpDir("ddst_ckpt_"),
      trigger = Some(Trigger.AvailableNow()))
    q.awaitTermination()
    assert(sink.read(spark, "dd_quantile_sketch")
      .select("batch_id").distinct().count() >= 2)
    // the DD merge is addition: streaming shards sum to the EXACT
    // batch-rebuilt table, and the percentile dashboard matches
    // bit-for-bit (no tolerance anywhere)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val served = StreamSketches.servedDdQuantileTable(spark, sink)
    assert(rows(served) === rows(Sketches.ddQuantileTable(docs)))
    assert(rows(Sketches.ddQuantileRollup(served))
      === rows(Sketches.ddQuantileRollup(Sketches.ddQuantileTable(docs))))
    // replay: rewriting batch 0 from either slice leaves the table as-is
    val before = rows(served)
    val b0 = sink.read(spark, "dd_quantile_sketch")
      .filter(col("batch_id") === 0).agg(sum("n_docs"))
      .collect().head.getLong(0)
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val replay = if (even.count() == b0) even else odd
    StreamSketches.ddQuantileBatch(replay, 0L, sink, "dd_quantile_sketch")
    assert(rows(StreamSketches.servedDdQuantileTable(spark, sink))
      === before)
  }

  test("streaming source-mix table serves the diversity dashboard bit-exactly") {
    val docs = Tables.documents(spark, sfDir)
    val inputDir = tmpDir("smix_in_")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$inputDir/f0")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$inputDir/f1")
    val sink = new WarehouseSink(tmpDir("smix_wh_"))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
    val q = StreamSketches.sourceMixStream(stream, sink,
      checkpoint = tmpDir("smix_ckpt_"),
      trigger = Some(Trigger.AvailableNow()))
    q.awaitTermination()
    assert(sink.read(spark, "source_mix")
      .select("batch_id").distinct().count() >= 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val served = StreamSketches.servedSourceMixTable(spark, sink)
    // counts merge additively → the dashboard off the streamed table
    // IS the batch dashboard, bit for bit
    import graft.llm.TextProfile2
    assert(rows(TextProfile2.corpusSourceDiversityFromCounts(served))
      === rows(TextProfile2.corpusSourceDiversity(docs)))
    // replay idempotence on the coarse grain
    val before = rows(served)
    val b0 = sink.read(spark, "source_mix")
      .filter(col("batch_id") === 0).agg(sum("c"))
      .collect().head.getLong(0)
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val replay = if (even.count() == b0) even else odd
    StreamSketches.sourceMixBatch(replay, 0L, sink, "source_mix")
    assert(rows(StreamSketches.servedSourceMixTable(spark, sink))
      === before)
  }
}
