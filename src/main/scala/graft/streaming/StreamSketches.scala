package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.Sketches
import graft.sinks.WarehouseSink

/** Continuous maintenance of the events-side distinct-user HLL sketch
  * table ([[Sketches.eventsUserSketchTable]]) from a LIVE event stream —
  * the production shape of the sketch-warehouse pattern: the stream is
  * read ONCE as it arrives, each micro-batch contributes its few-KB
  * finest-grain sketch rows, and every dashboard grain is served by
  * sketch UNION off the persisted table, never from the stream's
  * history.
  *
  * Why this composes exactly: DataSketches HLL union is deterministic
  * and exact over multiset partitions — the union of per-batch sketches
  * of disjoint slices IS the sketch of the whole slice (SketchesSpec
  * pins this for incremental halves; StreamSketchesSpec pins it across
  * real micro-batch boundaries). So the streaming-built table serves
  * THE SAME estimates as a batch rebuild over all history, at
  * per-micro-batch cost.
  *
  * Replay idempotence, the [[CdcStream]] dead-letter convention: batch
  * rows land partitioned by `batch_id` with dynamic overwrite of that
  * one partition — a replayed micro-batch (crash between the write and
  * the checkpoint commit) rewrites its own rows instead of
  * double-counting. n_events stays an exact per-batch count, so summing
  * it at serve time is exact too. */
object StreamSketches {

  /** Per-micro-batch worker: the batch's (hour, event_type) sketch rows
    * tagged with `batch_id`, idempotently written. Public so tests (and
    * backfills) can drive it without a streaming query. */
  def writeBatch(batch: DataFrame, batchId: Long, sink: WarehouseSink,
                 table: String, lgK: Int = 12): Unit = {
    val rows = Sketches.eventsUserSketchTable(batch, lgK)
      .withColumn("batch_id", lit(batchId))
    sink.write(rows, table, "batch_id", Seq("hour", "event_type"),
      dynamicOverwrite = true)
  }

  /** Start the maintenance loop over a streaming events frame.
    * `trigger` defaults to the continuous micro-batch trigger; tests and
    * backfills pass `Trigger.AvailableNow()`. */
  def eventsUsersStream(stream: DataFrame, sink: WarehouseSink,
                        table: String = "events_users_sketch",
                        checkpoint: String,
                        trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
                        lgK: Int = 12): StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, sink, table, lgK)
      }
    trigger.fold(w)(w.trigger).start()
  }

  /** Serve the finest grain off the persisted table: batch shards of
    * each (hour, event_type) cell union into one sketch — the exact
    * equivalent of [[Sketches.eventsUserSketchTable]] over all history,
    * without re-reading the stream. Feed to
    * [[Sketches.eventsUserRollup]] for coarser grains. */
  def servedSketchTable(spark: SparkSession, sink: WarehouseSink,
                        table: String = "events_users_sketch"): DataFrame =
    sink.read(spark, table)
      .groupBy(col("hour"), col("event_type"))
      .agg(hll_union_agg(col("sketch")).as("sketch"),
        sum(col("n_events")).as("n_events"))

  // --- DD log-bucket quantile maintenance (r14) ---

  /** Per-micro-batch worker for the deterministic quantile table
    * ([[Sketches.ddQuantileTable]]): the batch's (lang, source, bkt)
    * count rows land tagged with `batch_id`, idempotently (dynamic
    * overwrite of the batch's own partition — the replay convention
    * above). Because the DD merge is plain ADDITION, the streaming-
    * built table serves the batch rebuild EXACTLY — bit-equal counts,
    * not within-tolerance estimates — which StreamSketchesSpec pins
    * across real micro-batch boundaries and a replay. */
  def ddQuantileBatch(batch: DataFrame, batchId: Long, sink: WarehouseSink,
                      table: String): Unit = {
    val rows = Sketches.ddQuantileTable(batch)
      .withColumn("batch_id", lit(batchId))
    sink.write(rows, table, "batch_id", Seq("lang", "source", "bkt"),
      dynamicOverwrite = true)
  }

  /** Start the DD quantile maintenance loop over a streaming documents
    * frame. */
  def ddQuantileStream(stream: DataFrame, sink: WarehouseSink,
                       table: String = "dd_quantile_sketch",
                       checkpoint: String,
                       trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ddQuantileBatch(batch, batchId, sink, table)
      }
    trigger.fold(w)(w.trigger).start()
  }

  /** Serve the finest grain off the persisted DD table: batch shards
    * sum per (lang, source, bkt) — the EXACT equivalent of
    * [[Sketches.ddQuantileTable]] over all history. Feed to
    * [[Sketches.ddQuantileRollup]] for the percentile dashboard. */
  def servedDdQuantileTable(spark: SparkSession, sink: WarehouseSink,
                            table: String = "dd_quantile_sketch")
      : DataFrame =
    sink.read(spark, table)
      .groupBy(col("lang"), col("source"), col("bkt"))
      .agg(sum(col("n_docs")).as("n_docs"))

  // --- source-mix maintenance (r14) ---

  /** Per-micro-batch worker for the (lang, source) mix table feeding
    * the diversity dashboard
    * ([[graft.llm.TextProfile2.corpusSourceDiversityFromCounts]]):
    * plain additive counts, batch_id-tagged, idempotent under replay —
    * the [[ddQuantileBatch]] convention on the coarser grain. */
  def sourceMixBatch(batch: DataFrame, batchId: Long, sink: WarehouseSink,
                     table: String): Unit = {
    val rows = batch.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("c"))
      .withColumn("batch_id", lit(batchId))
    sink.write(rows, table, "batch_id", Seq("lang", "source"),
      dynamicOverwrite = true)
  }

  /** Start the source-mix maintenance loop over a streaming documents
    * frame. */
  def sourceMixStream(stream: DataFrame, sink: WarehouseSink,
                      table: String = "source_mix",
                      checkpoint: String,
                      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sourceMixBatch(batch, batchId, sink, table)
      }
    trigger.fold(w)(w.trigger).start()
  }

  /** Serve the (lang, source) counts off the persisted table — the
    * EXACT equivalent of the batch groupBy over all history; feed to
    * corpusSourceDiversityFromCounts for the dashboard. */
  def servedSourceMixTable(spark: SparkSession, sink: WarehouseSink,
                           table: String = "source_mix"): DataFrame =
    sink.read(spark, table)
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("c")).as("c"))
}
