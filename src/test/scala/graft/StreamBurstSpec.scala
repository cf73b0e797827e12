package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Analytics2
import graft.sinks.WarehouseSink
import graft.streaming.StreamBurst

/** Pins the streaming burst-monitor maintenance loop: micro-batch count
  * shards sum to EXACTLY the batch history, the served z-scored report
  * is bit-identical to `events_burst` over all events, and a replayed
  * micro-batch rewrites its own partition instead of double-counting. */
class StreamBurstSpec extends AnyFunSuite with SparkFixture {

  test("streaming-maintained counts serve the exact batch burst report") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val inputDir = tmpDir("burst_in_")
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$inputDir/f0")
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$inputDir/f1")
    val sink = new WarehouseSink(tmpDir("burst_wh_"))
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
    val q = StreamBurst.eventsBurstStream(stream, sink,
      checkpoint = tmpDir("burst_ckpt_"),
      trigger = Some(Trigger.AvailableNow()))
    q.awaitTermination()
    val shards = sink.read(spark, "events_hourly_counts")
    assert(shards.select("batch_id").distinct().count() >= 2)

    // counts are additive integers: served grain == one batch agg
    val served = StreamBurst.servedHourly(spark, sink)
      .collect().map(_.toSeq).toSet
    val want = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(_.toSeq).toSet
    assert(served === want)

    // ...so the z-scored report is bit-identical to events_burst
    val rep = StreamBurst.servedBurstReport(spark, sink)
      .collect().map(_.toSeq).toSet
    val batchRep = Analytics2.eventsBurstOn(events)
      .collect().map(_.toSeq).toSet
    assert(rep === batchRep)
    assert(rep.nonEmpty)

    // replay idempotence: re-running a batch overwrites its own rows.
    // Batch 0 is identified by its (hour, event_type, n) rows, not a
    // total count — the even/odd slices can tie on totals (ADVICE r10)
    val b0Rows = shards.filter(col("batch_id") === 0)
      .select("hour", "event_type", "n_events")
      .collect().map(_.toSeq).toSet
    def hourlyOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(_.toSeq).toSet
    val evenSlice = events.filter(col("event_id") % 2 === 0)
    val oddSlice = events.filter(col("event_id") % 2 === 1)
    val replay =
      if (hourlyOf(evenSlice) == b0Rows) evenSlice
      else {
        assert(hourlyOf(oddSlice) === b0Rows,
          "neither file slice reproduces batch 0's aggregate rows")
        oddSlice
      }
    StreamBurst.writeBatch(replay, 0L, sink, "events_hourly_counts")
    val after = StreamBurst.servedBurstReport(spark, sink)
      .collect().map(_.toSeq).toSet
    assert(after === batchRep)
  }
}
