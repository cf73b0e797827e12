package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.WarehouseSink

/** Destination → table routing wired end-to-end: the reference's
  * `handleBatch` groups incoming change events by destination topic, maps
  * each to a table name (`getTableId`, BaseChangeConsumer.java:178-191)
  * and uploads the groups concurrently (`uploadDestination`).
  *
  * Spark-first: the distinct destinations of a micro-batch are collected
  * (bounded by the table count, not the row count), each slice is routed
  * through [[Cdc.routeDestination]] and written through the warehouse
  * sink — append mode lands every event under MONTH partitions, upsert
  * mode runs the bucket-pruned MERGE per table. Parallelism comes from
  * Spark inside each write; at the reference's cardinalities (tens of
  * tables per batch) the per-table loop is not the bottleneck. */
object Router {

  sealed trait Mode
  case object AppendMode extends Mode
  case class UpsertMode(keyCols: Seq[String]) extends Mode

  /** Heartbeat topic prefix skipped during upload
    * (`debezium.source.topic.heartbeat.prefix` +
    * `skip-consuming`, DebeziumConfig.java:82-88;
    * BaseChangeConsumer.java:171,212). */
  val HeartbeatPrefix = "__debezium-heartbeat"

  /** Route one batch to its destination tables. Returns the routed table
    * names written (heartbeat destinations are consumed for offsets but
    * never uploaded, matching the reference). */
  def routeAndWrite(spark: SparkSession, sink: WarehouseSink,
                    batch: DataFrame, destCol: String, mode: Mode,
                    regexp: Option[String] = None,
                    replace: Option[String] = None,
                    tsCol: String = "__source_ts_ms",
                    partitionType: String = "MONTH",
                    skipHeartbeat: Boolean = true): Seq[String] = {
    val dests = batch.select(destCol).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
      .filterNot(d => skipHeartbeat && d.startsWith(HeartbeatPrefix))
    dests.map { dest =>
      val table = Cdc.routeDestination(dest, regexp, replace)
      val slice = batch.filter(col(destCol) === dest).drop(destCol)
      mode match {
        case AppendMode =>
          sink.write(
            slice.withColumn("part_time",
              WarehouseSink.timePartition(tsCol, partitionType)),
            table, "part_time", Seq(tsCol))
        case UpsertMode(keyCols) =>
          MergePipeline.mergeBatch(spark, sink, table, slice, keyCols)
      }
      table
    }
  }
}
