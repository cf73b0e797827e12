package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{MergePipeline, Router}
import graft.sinks.WarehouseSink

class RouterSpec extends AnyFunSuite with SparkFixture {

  private def batch = {
    import spark.implicits._
    Seq(
      ("srv1.inventory.orders", 1L, 10L, "c", "2024-01-01 00:00:00"),
      ("srv1.inventory.orders", 2L, 10L, "u", "2024-01-02 00:00:00"),
      ("srv1.inventory.customers", 3L, 20L, "c", "2024-01-01 00:00:00"),
      ("srv1.inventory.customers", 4L, 20L, "d", "2024-01-03 00:00:00")
    ).toDF("destination", "event_id", "user_id", "__op", "__source_ts_ms")
      .withColumn("__source_ts_ms", col("__source_ts_ms").cast("timestamp"))
  }

  test("append mode routes each destination to its own month-partitioned table") {
    val sink = new WarehouseSink(tmpDir("route_append_"))
    val tables = Router.routeAndWrite(spark, sink, batch, "destination",
      Router.AppendMode, regexp = Some("^srv1\\."), replace = Some(""))
    assert(tables === Seq("inventory_customers", "inventory_orders"))
    assert(sink.read(spark, "inventory_orders").count() === 2)
    assert(sink.read(spark, "inventory_customers").count() === 2)
    // append keeps every change event, including the delete
    assert(sink.read(spark, "inventory_customers")
      .filter(col("__op") === "d").count() === 1)
  }

  test("upsert mode merges per table: latest state, hard deletes applied") {
    import spark.implicits._
    val sink = new WarehouseSink(tmpDir("route_upsert_"))
    Router.routeAndWrite(spark, sink, batch, "destination",
      Router.UpsertMode(Seq("user_id")),
      regexp = Some("^srv1\\."), replace = Some(""))
    val orders = sink.read(spark, "inventory_orders")
      .select("user_id", "event_id").as[(Long, Long)].collect()
    assert(orders === Array((10L, 2L))) // latest change wins
    // customers: user 20's last op is d → gone entirely
    assert(!sink.tableExists("inventory_customers"))
  }

  test("heartbeat destinations are skipped, not uploaded") {
    import spark.implicits._
    val sink = new WarehouseSink(tmpDir("route_hb_"))
    val withHb = batch.unionByName(
      Seq(("__debezium-heartbeat.srv1", 9L, 99L, "r", "2024-01-01 00:00:00"))
        .toDF("destination", "event_id", "user_id", "__op", "__source_ts_ms")
        .withColumn("__source_ts_ms", col("__source_ts_ms").cast("timestamp")))
    val tables = Router.routeAndWrite(spark, sink, withHb, "destination",
      Router.AppendMode, regexp = Some("^srv1\\."), replace = Some(""))
    assert(tables === Seq("inventory_customers", "inventory_orders"))
    assert(!sink.tableExists("__debezium-heartbeat_srv1"))
  }

  test("partition granularity is configurable (DAY makes daily dirs)") {
    val sink = new WarehouseSink(tmpDir("route_day_"))
    Router.routeAndWrite(spark, sink, batch, "destination",
      Router.AppendMode, regexp = Some("^srv1\\."), replace = Some(""),
      partitionType = "DAY")
    val dirs = java.nio.file.Files.list(
      java.nio.file.Paths.get(sink.tablePath("inventory_orders")))
      .toArray.map(_.toString).filter(_.contains("part_time="))
    assert(dirs.length === 2) // Jan 1 and Jan 2 events → two daily dirs
  }

  test("concurrent uploads produce the same tables and rows as sequential") {
    val seqSink = new WarehouseSink(tmpDir("route_seq_"))
    val parSink = new WarehouseSink(tmpDir("route_par_"))
    val t1 = Router.routeAndWrite(spark, seqSink, batch, "destination",
      Router.AppendMode, regexp = Some("^srv1\\."), replace = Some(""))
    val t2 = Router.routeAndWrite(spark, parSink, batch, "destination",
      Router.AppendMode, regexp = Some("^srv1\\."), replace = Some(""),
      maxConcurrentUploads = 4)
    assert(t1.sorted === t2.sorted)
    t1.foreach { t =>
      val a = seqSink.read(spark, t).orderBy("event_id").collect().toSeq
      val b = parSink.read(spark, t).orderBy("event_id").collect().toSeq
      assert(a === b)
    }
  }

  test("cast-deleted-field turns rewrite-mode strings into booleans") {
    import spark.implicits._
    val df = Seq((1L, "true"), (2L, "false")).toDF("id", "__deleted")
    val out = graft.cdc.Cdc.castDeleted(df)
    assert(out.schema("__deleted").dataType ===
      org.apache.spark.sql.types.BooleanType)
    assert(out.filter(col("__deleted")).count() === 1)
    // disabled → untouched
    assert(graft.cdc.Cdc.castDeleted(df, enabled = false)
      .schema("__deleted").dataType ===
      org.apache.spark.sql.types.StringType)
  }

  test("soft-delete merge keeps the tombstone row flagged") {
    import spark.implicits._
    val sink = new WarehouseSink(tmpDir("route_soft_"))
    val cust = batch.filter(col("destination").endsWith("customers"))
      .drop("destination")
    MergePipeline.mergeBatch(spark, sink, "cust", cust, Seq("user_id"),
      keepDeletes = true)
    val rows = sink.read(spark, "cust")
      .select("user_id", "event_id", "__op").as[(Long, Long, String)].collect()
    assert(rows === Array((20L, 4L, "d")))
  }
}
