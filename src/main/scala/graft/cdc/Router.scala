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
  * Spark inside each write, and `maxConcurrentUploads` additionally
  * overlaps per-table write JOBS — the reference's semaphore-bounded
  * executor (BaseChangeConsumer.java:83-113,218-244). Overlap matters
  * when tables are many and small (each write underfills the cluster);
  * one large table saturates executors on its own. */
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
                    skipHeartbeat: Boolean = true,
                    maxConcurrentUploads: Int = 1): Seq[String] = {
    val dests = batch.select(destCol).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
      .filterNot(d => skipHeartbeat && d.startsWith(HeartbeatPrefix))
    def uploadOne(dest: String): String = {
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
    if (maxConcurrentUploads <= 1 || dests.size <= 1) dests.map(uploadOne)
    else {
      // SparkSession actions are thread-safe; each table writes a disjoint
      // path, so overlapping the jobs is race-free
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(maxConcurrentUploads, dests.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(
        Future.sequence(dests.map(d => Future(uploadOne(d)))), Duration.Inf)
      finally pool.shutdown()
    }
  }
}
