package graft.state

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offset checkpoint store: a tiny parquet key/value table, the analog of
  * the reference's `_debezium_offset_storage` BigQuery table
  * (BigqueryOffsetBackingStore.java — keyed rows, latest value wins on
  * reload). Writes append (key, value, seq); reads resolve latest per
  * key with a `max_by` aggregation — the same latest-wins shape the CDC
  * dedup uses, and safe against partially-compacted history.
  *
  * Commit cost is O(1): the sequence number is read from disk once per
  * instance and cached (r3 re-scanned the whole store per put), and every
  * `compactEvery` generations the store rewrites itself as a single
  * latest-per-key generation — a long-lived stream no longer accumulates
  * one file and one O(generations) read per micro-batch. */
class OffsetStore(val path: String, spark: SparkSession,
                  val compactEvery: Int = 64) {

  import spark.implicits._

  private def exists: Boolean = {
    val p = Paths.get(path)
    Files.exists(p) && Files.list(p).findFirst().isPresent
  }

  /** Highest seq written, cached after the first disk read; -1 = empty. */
  private var cachedSeq: Long = Long.MinValue

  private def lastSeq(): Long = {
    if (cachedSeq == Long.MinValue)
      cachedSeq =
        if (!exists) -1L
        else spark.read.parquet(path)
          .agg(max("seq")).as[Option[Long]].head().getOrElse(-1L)
    cachedSeq
  }

  /** Append a batch of key→value pairs as one new generation. */
  def put(offsets: Map[String, String]): Unit = {
    val seq = lastSeq() + 1L
    offsets.toSeq.toDF("key", "value")
      .withColumn("seq", lit(seq))
      .coalesce(1)
      .write.mode("append").parquet(path)
    cachedSeq = seq
    if (seq > 0 && seq % compactEvery == 0) compact()
  }

  /** Rewrite the store as ONE latest-per-key generation at the current
    * seq. State is collected first (the store is a handful of keys by
    * design) so the overwrite never reads the path it replaces. */
  def compact(): Unit = {
    val latest = load()
    if (latest.nonEmpty) {
      val seq = lastSeq()
      latest.toSeq.toDF("key", "value")
        .withColumn("seq", lit(seq))
        .coalesce(1)
        .write.mode("overwrite").parquet(path)
    }
  }

  /** Latest value per key across all generations. */
  def load(): Map[String, String] =
    if (!exists) Map.empty
    else spark.read.parquet(path)
      .groupBy("key")
      .agg(max_by(col("value"), col("seq")).as("value"))
      .as[(String, String)].collect().toMap
}

/** Schema-history store: an append-only parquet log, the analog of the
  * reference's `_debezium_database_history_storage`
  * (BigquerySchemaHistory.java — monotonically-ordered DDL records,
  * replayed in order on restart). Implements the reference's recovery
  * contract surface: `storageExists` (the storage table/path is present,
  * BigquerySchemaHistory.java:158-168), `exists` (it holds records,
  * :150-156) and `recover` (replay every record, in order, into a
  * consumer — the shape of `recoverRecords`, :127-143).
  *
  * Like [[OffsetStore]], the sequence is cached per instance and the log
  * compacts every `compactEvery` records into a single file — compaction
  * keeps EVERY record (replay needs the full history), it only merges the
  * one-file-per-append generations. */
class SchemaHistory(val path: String, spark: SparkSession,
                    val compactEvery: Int = 64) {

  import spark.implicits._

  /** The storage location exists (reference `storageExists`). */
  def storageExists: Boolean = {
    val p = Paths.get(path)
    Files.exists(p) && Files.list(p).findFirst().isPresent
  }

  /** The history holds at least one record (reference `exists`). */
  def exists: Boolean = storageExists && !asDF.isEmpty

  private var cachedSeq: Long = Long.MinValue

  private def lastSeq(): Long = {
    if (cachedSeq == Long.MinValue)
      cachedSeq =
        if (!storageExists) -1L
        else spark.read.parquet(path)
          .agg(max("seq")).as[Option[Long]].head().getOrElse(-1L)
    cachedSeq
  }

  /** Append one schema-change record (e.g. a DDL statement or schema
    * JSON). */
  def record(entry: String): Unit = {
    val seq = lastSeq() + 1L
    Seq((seq, entry, System.currentTimeMillis()))
      .toDF("seq", "entry", "recorded_at_ms")
      .coalesce(1)
      .write.mode("append").parquet(path)
    cachedSeq = seq
    if (seq > 0 && seq % compactEvery == 0) compact()
  }

  /** Merge all generations into one file, preserving every record. The
    * log is collected first (schema history is DDL-sized) so the
    * overwrite never reads the path it replaces. */
  def compact(): Unit = {
    val all = if (!storageExists) Seq.empty
      else spark.read.parquet(path)
        .orderBy("seq")
        .as[(Long, String, Long)].collect().toSeq
    if (all.nonEmpty)
      all.toDF("seq", "entry", "recorded_at_ms")
        .coalesce(1)
        .write.mode("overwrite").parquet(path)
  }

  /** Replay the full history in append order. */
  def replay(): Seq[String] =
    if (!storageExists) Seq.empty
    else spark.read.parquet(path)
      .orderBy("seq").select("entry").as[String].collect().toSeq

  /** Recovery: feed every record, oldest first, to `consume` — the
    * reference's `recoverRecords(Consumer<HistoryRecord>)` shape. */
  def recover(consume: String => Unit): Unit = replay().foreach(consume)

  def asDF: DataFrame = spark.read.parquet(path)
}
