package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Analytics2
import graft.sinks.WarehouseSink

/** Continuous maintenance of the hourly (hour, event_type) count table
  * behind the burst alarm (`events_burst`) from a LIVE event stream —
  * the [[StreamSketches]] pattern applied to the ops-alarm surface:
  * each micro-batch appends its exact per-hour counts (a ≤ hours×types
  * frame, bytes per batch), and the z-scored burst report serves off
  * the PERSISTED table, never re-reading the stream's history.
  *
  * Why the served report is exactly the batch one: hourly counts are
  * exact integers and ADDITIVE over any partition of the stream into
  * micro-batches — Σ per-batch counts IS the count of the whole history
  * — and [[Analytics2.burstFromHourly]] derives mean/var/z from those
  * integers alone, so streaming-built == batch rebuild bit-for-bit
  * (StreamBurstSpec pins it across real micro-batch boundaries, unlike
  * the watermarked monitors whose equality is up to late-data policy).
  *
  * Replay idempotence, the [[CdcStream]] dead-letter convention: batch
  * rows land partitioned by `batch_id` with dynamic overwrite of that
  * one partition, so a replayed micro-batch (crash between write and
  * checkpoint commit) rewrites its own rows instead of double-counting.
  *
  * An alarm consumer polls [[servedBurstReport]] between micro-batches;
  * the trailing-24h baseline means one late-arriving hour shifts only
  * that hour's own cell and the ≤ 24 windows it baselines. */
object StreamBurst {

  /** Per-micro-batch worker: the batch's hourly counts tagged with
    * `batch_id`, idempotently written. Public so tests and backfills
    * drive it without a streaming query. */
  def writeBatch(batch: DataFrame, batchId: Long, sink: WarehouseSink,
                 table: String): Unit = {
    val rows = batch
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("batch_id", lit(batchId))
    sink.write(rows, table, "batch_id", Seq("hour", "event_type"),
      dynamicOverwrite = true)
  }

  /** Start the maintenance loop over a streaming events frame. */
  def eventsBurstStream(stream: DataFrame, sink: WarehouseSink,
                        table: String = "events_hourly_counts",
                        checkpoint: String,
                        trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, sink, table)
      }
    trigger.fold(w)(w.trigger).start()
  }

  /** The maintained table rolled to its finest grain: batch shards of
    * each (hour, event_type) cell sum to the exact history count. */
  def servedHourly(spark: SparkSession, sink: WarehouseSink,
                   table: String = "events_hourly_counts"): DataFrame =
    sink.read(spark, table)
      .groupBy(col("hour"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"))

  /** The burst report off the persisted counts — identical to
    * `events_burst` over the full replayed history. */
  def servedBurstReport(spark: SparkSession, sink: WarehouseSink,
                        table: String = "events_hourly_counts"): DataFrame =
    Analytics2.burstFromHourly(servedHourly(spark, sink, table))
}
