package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.MergePipeline
import graft.sinks.WarehouseSink
import graft.state.OffsetStore

/** The continuous consume → convert → upsert loop of the reference
  * (BaseChangeConsumer.java:139 `handleBatch` → :204 `uploadDestination`),
  * re-expressed as Structured Streaming: a file source feeds micro-batches
  * into a `foreachBatch` MERGE through the partitioned warehouse sink,
  * with the offset store checkpointing progress per batch (the analog of
  * `BigqueryOffsetBackingStore` alongside Spark's own checkpoint).
  *
  * Throttling: the reference's batch-size-wait strategies
  * (MaxBatchSizeWait / DynamicBatchSizeWait in the batchsizewait package) map to
  * the source/trigger knobs — `maxFilesPerTrigger` bounds batch size and
  * the processing-time trigger sets the cadence; `BatchSizeWait` below
  * reproduces the dynamic sleep computation for custom schedulers.
  *
  * Scale: each micro-batch runs the bucket-pruned MERGE (O(batch +
  * touched buckets)); state between batches lives in the warehouse layout,
  * not executor memory, so the stream restarts from checkpoints with no
  * state rebuild. */
object CdcStream {

  /** Start the pipeline over a directory of flattened-changelog parquet
    * files (each new file = one CDC batch).
    *
    * @param availableNow drain all pending input then stop (test/batch
    *                     catch-up mode); otherwise run continuously with a
    *                     processing-time trigger.
    */
  def start(spark: SparkSession,
            inputDir: String,
            schema: StructType,
            sink: WarehouseSink,
            table: String,
            keyCols: Seq[String],
            checkpointDir: String,
            offsets: OffsetStore,
            availableNow: Boolean = true,
            maxFilesPerTrigger: Int = 1,
            triggerMs: Long = 1000L,
            keepDeletes: Boolean = false): StreamingQuery = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    val writer = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        MergePipeline.mergeBatch(spark, sink, table, batch, keyCols, keepDeletes)
        offsets.put(Map(s"stream/$table" -> batchId.toString))
      }
    val triggered =
      if (availableNow) writer.trigger(Trigger.AvailableNow())
      else writer.trigger(Trigger.ProcessingTime(triggerMs))
    triggered.start()
  }

  /** Multi-table variant — the reference's complete loop: each micro-batch
    * carries a destination column, is grouped per destination and MERGEd
    * into its routed table (`handleBatch` → `getTableId` →
    * `uploadDestination`). Offsets record the last batch id per stream. */
  def startRouted(spark: SparkSession,
                  inputDir: String,
                  schema: StructType,
                  sink: WarehouseSink,
                  destCol: String,
                  keyCols: Seq[String],
                  checkpointDir: String,
                  offsets: OffsetStore,
                  regexp: Option[String] = None,
                  replace: Option[String] = None,
                  availableNow: Boolean = true,
                  maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val tables = graft.cdc.Router.routeAndWrite(
          spark, sink, batch, destCol,
          graft.cdc.Router.UpsertMode(keyCols), regexp, replace)
        offsets.put(
          tables.map(t => s"stream/$t" -> batchId.toString).toMap)
      }
      .trigger(if (availableNow) Trigger.AvailableNow()
               else Trigger.ProcessingTime(1000L))
      .start()
  }
}

/** Dynamic batch-size throttle: the reference's DynamicBatchSizeWait
  * (batchsizewait/DynamicBatchSizeWait.java:84) grows the sleep while
  * batches run under the target size and shrinks it when they fill up, so
  * a slow source coalesces into fewer, fuller batches. Same computation,
  * engine-agnostic: feed it the observed batch size, sleep the returned
  * millis before polling again. */
class BatchSizeWait(val maxBatchSize: Int, val maxWaitMs: Long) {
  private var waitMs: Long = 0L

  def nextWaitMs(observedBatchSize: Int): Long = {
    waitMs =
      if (observedBatchSize >= maxBatchSize) 0L
      else {
        // proportional controller: wait scales with how empty the batch is
        val emptiness = 1.0 - observedBatchSize.toDouble / maxBatchSize
        math.min(maxWaitMs, math.round(emptiness * maxWaitMs))
      }
    waitMs
  }

  def currentWaitMs: Long = waitMs
}
