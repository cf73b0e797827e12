package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.cdc.Scd2Store

/** Continuous SCD2 maintenance from a LIVE changelog stream: each
  * micro-batch folds into the partitioned [[Scd2Store]] layout via
  * `foreachBatch`, so the warehouse's Type-2 history stays current at
  * per-batch cost (open partition + touched months, never history —
  * the [[Scd2Store]] contract).
  *
  * Exactly-once discipline, the standard foreachBatch pattern: a
  * `batch_id` high-water marker is written AFTER a fold completes, and
  * a redelivered batch at-or-below the marker is skipped whole. Inside
  * a fold the write order is closed-months-merge (idempotent: dedup +
  * dynamic overwrite) THEN current-partition overwrite, so a crash
  * before the marker leaves the open partition pre-batch and the
  * replayed fold converges. The one unprotected window — crash between
  * the current-partition swap and the marker write — makes the replay
  * trip [[graft.cdc.Cdc.scd2Incremental]]'s strict in-order guard
  * (the batch reads as "before" its own already-applied open rows):
  * the query fails LOUDLY instead of silently double-folding, and the
  * operator advances the marker by hand after confirming the store
  * matches the batch — visible recovery, never silent corruption. */
object StreamScd2 {

  private def markerPath(store: Scd2Store, sink: graft.sinks.WarehouseSink)
      : java.nio.file.Path =
    Paths.get(sink.tablePath("scd2"), "_stream_batch_marker")

  def lastApplied(sink: graft.sinks.WarehouseSink): Long = {
    val p = Paths.get(sink.tablePath("scd2"), "_stream_batch_marker")
    if (Files.exists(p)) new String(Files.readAllBytes(p)).trim.toLong
    else -1L
  }

  /** Per-micro-batch worker; public so tests and backfills can drive it
    * without a streaming query. */
  def writeBatch(batch: DataFrame, batchId: Long, store: Scd2Store,
                 sink: graft.sinks.WarehouseSink): Unit = {
    if (batchId <= lastApplied(sink)) return // redelivery: already folded
    val spark = batch.sparkSession
    if (!sink.tableExists("scd2")) store.build(batch)
    else store.foldBatch(spark, batch)
    Files.write(markerPath(store, sink),
      batchId.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  /** Start the maintenance loop over a streaming changelog frame. */
  def scd2Stream(stream: DataFrame, store: Scd2Store,
                 sink: graft.sinks.WarehouseSink,
                 checkpoint: String,
                 trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, store, sink)
      }
    trigger.fold(w)(w.trigger).start()
  }
}
