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

  /** One ingestion step, shared by the stream loop and batch backfills:
    * dedup `batch` against the store, append survivors (docs whose
    * `dup_of == -1`) to `corpusTable` partitioned by source, extend the
    * fingerprint store with the survivors' hashes. Returns the accepted
    * row count. */
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
      sink.write(
        survivors.withColumn("part_src", coalesce(col("source"), lit("unknown"))),
        corpusTable, "part_src", Seq("doc_id"))
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
