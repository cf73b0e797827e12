package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.llm.Dedup
import graft.sinks.WarehouseSink
import graft.state.OffsetStore

/** Continuous corpus ingestion with incremental dedup — the reference's
  * consume → convert → upsert loop ([[CdcStream]]) applied to the LLM
  * data pipeline: each micro-batch of NEW documents is deduped against
  * the persistent fingerprint store ([[Dedup.dedupIncremental]]), the
  * accepted docs land in the corpus table, and the accepted docs'
  * fingerprints roll the store forward — so the NEXT batch (and the next
  * run) dedups against everything ever ingested without re-reading any
  * corpus text.
  *
  * Scale shape per batch: O(batch) hashing map-side, a store probe pruned
  * to the batch's fingerprint buckets, one partitioned append of accepted
  * docs, one store append — nothing proportional to corpus size. State
  * across restarts is carried by the checkpoint + the store layout, not
  * executor memory (the [[CdcStream]] restart discipline). */
object CorpusIngest {

  /** Idempotent keyed upsert of documents: the corpus table is
    * bucket-partitioned by hash(doc_id); each write unions the touched
    * buckets with the incoming docs and dedups on doc_id before a
    * dynamic overwrite. Re-running the same write converges to the same
    * table — the property the crash-replay story below rests on. */
  private def upsertDocs(spark: SparkSession, sink: WarehouseSink,
                         table: String, docs: DataFrame,
                         numBuckets: Int): Unit = {
    val bucket = WarehouseSink.bucketPartition(Seq("doc_id"), numBuckets)
    if (!sink.tableExists(table)) {
      sink.write(docs.withColumn("part_bucket", bucket), table,
        "part_bucket", Seq("doc_id"))
    } else {
      val touched = docs.select(bucket.as("b")).distinct()
        .collect().map(_.getInt(0))
      val existing = sink.read(spark, table)
        .filter(col("part_bucket").isin(touched.toIndexedSeq.map(b => lit(b)): _*))
        .drop("part_bucket")
      val merged = existing.unionByName(docs).dropDuplicates("doc_id")
        .withColumn("part_bucket", bucket)
      sink.write(merged, table, "part_bucket", Seq("doc_id"),
        createDisposition = graft.sinks.CreateDisposition.CreateNever,
        writeDisposition = graft.sinks.WriteDisposition.WriteAppend,
        dynamicOverwrite = true)
    }
  }

  /** One ingestion step, shared by the stream loop and batch backfills:
    * dedup `batch` against the store, UPSERT survivors (docs whose
    * `dup_of == -1`) into the doc_id-bucketed `corpusTable`, extend the
    * fingerprint store with the survivors' hashes. Returns the accepted
    * row count.
    *
    * Replay safety (foreachBatch re-runs a batch after any crash): the
    * corpus write is a keyed UPSERT — replaying it converges — and it
    * commits BEFORE the store append. Crash between the two → replay
    * still sees the survivors as new (store unchanged), re-upserts them
    * (no duplicates) and completes the store append. Crash after both →
    * replay finds every survivor's hash in the store (each is its own
    * keeper), accepts nothing, and rewrites nothing. */
  def ingestBatch(spark: SparkSession, sink: WarehouseSink, batch: DataFrame,
                  corpusTable: String = "corpus",
                  fpTable: String = "fingerprints",
                  numBuckets: Int = 32): Long = {
    val cached = batch.persist()
    val accepted = Dedup.dedupIncremental(cached, spark, sink, fpTable, numBuckets)
      .filter(col("dup_of") === -1L)
      .select("doc_id")
    // dedupIncremental's result is materialized (Exec.materialize), so
    // the store append below cannot observe this batch's own writes
    val survivors = cached.join(accepted, "doc_id").persist()
    val n = survivors.count()
    if (n > 0) {
      upsertDocs(spark, sink, corpusTable, survivors, numBuckets)
      Dedup.buildFingerprintStore(survivors, sink, fpTable, numBuckets,
        append = true)
    }
    survivors.unpersist()
    cached.unpersist()
    n
  }

  /** Start the continuous loop over a directory of document parquet files
    * (each new file = one batch of scraped/ingested docs). Offsets record
    * the last batch id, mirroring [[CdcStream.start]]. */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
            sink: WarehouseSink, offsets: OffsetStore,
            checkpointDir: String,
            corpusTable: String = "corpus",
            fpTable: String = "fingerprints",
            availableNow: Boolean = true,
            maxFilesPerTrigger: Int = 1,
            triggerMs: Long = 1000L): StreamingQuery = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, sink, batch, corpusTable, fpTable)
        offsets.put(Map(s"ingest/$corpusTable" -> batchId.toString))
        ()
      }
      .trigger(if (availableNow) Trigger.AvailableNow()
               else Trigger.ProcessingTime(triggerMs))
      .start()
  }
}
