package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Cdc, Scd2Store}
import graft.sinks.WarehouseSink
import graft.streaming.StreamScd2

/** Pins the streaming SCD2 maintenance loop: time-ordered micro-batches
  * fold to EXACTLY the batch rebuild, the first batch takes the build
  * path, redelivered batches at-or-below the marker are skipped whole,
  * and the open partition stays the only rewritten directory. */
class StreamScd2Spec extends AnyFunSuite with SparkFixture {

  test("streamed folds equal the full batch rebuild; redelivery skips") {
    val events = Tables.events(spark, sfDir)
    val inputDir = tmpDir("scd2s_in_")
    val cut = lit("2024-01-15").cast("timestamp")
    // time-ordered slices: the changelog contract the store enforces
    events.filter(col("ts") <= cut).coalesce(1)
      .write.parquet(s"$inputDir/f0")
    Thread.sleep(50) // strictly later mtime => later micro-batch
    events.filter(col("ts") > cut).coalesce(1)
      .write.parquet(s"$inputDir/f1")
    val sink = new WarehouseSink(tmpDir("scd2s_wh_"))
    val store = new Scd2Store(sink)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(s"$inputDir/f*")
    val q = StreamScd2.scd2Stream(stream, store, sink,
      checkpoint = tmpDir("scd2s_ckpt_"),
      trigger = Some(Trigger.AvailableNow()))
    q.awaitTermination()
    assert(StreamScd2.lastApplied(sink) >= 1L)
    val full = Cdc.scd2(events)
    val got = store.read(spark).select(full.columns.map(col): _*)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
    // redelivered batch at the marker: skipped whole, store unchanged —
    // even though folding this slice again would trip the order guard
    StreamScd2.writeBatch(events.filter(col("ts") > cut),
      StreamScd2.lastApplied(sink), store, sink)
    val again = store.read(spark).select(full.columns.map(col): _*)
    assert(again.exceptAll(full).isEmpty && full.exceptAll(again).isEmpty)
    // the layout holds: one open directory + monthly closed directories
    val parts = new java.io.File(sink.tablePath("scd2")).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("part="))
      .map(_.getName).toSet
    assert(parts.contains("part=current"))
    assert((parts - "part=current").forall(_.matches("part=\\d{4}-\\d{2}")))
  }
}
