package graft.state

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offset checkpoint store: a tiny parquet key/value table, the analog of
  * the reference's `_debezium_offset_storage` BigQuery table
  * (BigqueryOffsetBackingStore.java — keyed rows, latest value wins on
  * reload). Writes append (id, key, value, seq); reads resolve latest per
  * key with a `max_by` aggregation — the same latest-wins shape the CDC
  * dedup uses, and safe against partially-compacted history. */
class OffsetStore(val path: String, spark: SparkSession) {

  import spark.implicits._

  private def exists: Boolean = {
    val p = Paths.get(path)
    Files.exists(p) && Files.list(p).findFirst().isPresent
  }

  private def nextSeq(): Long =
    if (!exists) 0L
    else spark.read.parquet(path).agg(max("seq")).as[Option[Long]].head().getOrElse(-1L) + 1L

  /** Append a batch of key→value pairs as one new generation. */
  def put(offsets: Map[String, String]): Unit = {
    val seq = nextSeq()
    offsets.toSeq.toDF("key", "value")
      .withColumn("seq", lit(seq))
      .coalesce(1)
      .write.mode("append").parquet(path)
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
  * replayed in order on restart). */
class SchemaHistory(val path: String, spark: SparkSession) {

  import spark.implicits._

  private def exists: Boolean = {
    val p = Paths.get(path)
    Files.exists(p) && Files.list(p).findFirst().isPresent
  }

  private def nextSeq(): Long =
    if (!exists) 0L
    else spark.read.parquet(path).agg(max("seq")).as[Option[Long]].head().getOrElse(-1L) + 1L

  /** Append one schema-change record (e.g. a DDL statement or schema
    * JSON). */
  def record(entry: String): Unit = {
    val seq = nextSeq()
    Seq((seq, entry, System.currentTimeMillis()))
      .toDF("seq", "entry", "recorded_at_ms")
      .coalesce(1)
      .write.mode("append").parquet(path)
  }

  /** Replay the full history in append order. */
  def replay(): Seq[String] =
    if (!exists) Seq.empty
    else spark.read.parquet(path)
      .orderBy("seq").select("entry").as[String].collect().toSeq

  def asDF: DataFrame = spark.read.parquet(path)
}
