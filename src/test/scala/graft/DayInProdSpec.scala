package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Cdc, MergePipeline, Scd2Store}
import graft.sinks.WarehouseSink
import graft.state.OffsetStore
import graft.streaming._

/** r12 verdict task 8 ("optional depth"): the day-in-production
  * composition — every streaming maintainer the repo ships, running in
  * ONE session over the same micro-batch cadence, with a redelivery
  * (crash-replay) injected mid-day into EACH component, pinning that the
  * whole composed system converges to the batch rebuild of full history:
  *
  *  - CDC json-wire ingest ([[CdcStream.startJson]]) → users snapshot;
  *  - SCD2 maintenance ([[StreamScd2]]) over the events changelog;
  *  - burst monitor ([[StreamBurst]]) and distinct-user sketch
  *    maintenance ([[StreamSketches]]) over the SAME events stream;
  *  - corpus ingest loop ([[CorpusIngest]]) with all three dedup stores
  *    (exact fingerprints + MinHash bands + embedding LSH).
  *
  * Every piece is individually spec'd; this is the integration surface —
  * cross-component replay idempotence after a mid-stream crash, the
  * foreachBatch redelivery contract exercised on all five at once. */
class DayInProdSpec extends AnyFunSuite with SparkFixture {

  test("five maintainers, one session: crash-replay converges to batch rebuild") {
    import spark.implicits._
    val base = tmpDir("dayprod_")
    val events = Tables.events(spark, "/root/testdata/sf0.001")

    // ---- shared events input: three ts-ordered windows, one file each,
    // mtime-pinned so every consumer sees the same micro-batch order ----
    val evin = s"$base/evin"
    val cuts = Seq("2024-01-11", "2024-01-21")
    val windows = Seq(
      events.filter(col("ts") < lit(cuts.head).cast("timestamp")),
      events.filter(col("ts") >= lit(cuts.head).cast("timestamp") &&
        col("ts") < lit(cuts(1)).cast("timestamp")),
      events.filter(col("ts") >= lit(cuts(1)).cast("timestamp")))
    def landEvents(i: Int): Unit = {
      val dir = s"$evin/b$i"
      windows(i).coalesce(1).write.parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    def eventsStream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$evin/b*")

    // ---- wire input: Debezium payload lines (the reference's format) ----
    val wirein = s"$base/wirein"
    new java.io.File(wirein).mkdirs()
    val wireSchema =
      """{"type":"struct","fields":[
        |{"field":"user_id","type":"int64"},
        |{"field":"event_id","type":"int64"},
        |{"field":"amount","type":"float64"},
        |{"field":"__op","type":"string"},
        |{"field":"__source_ts_ms","type":"int64","name":"io.debezium.time.Timestamp"},
        |{"field":"__deleted","type":"string"}]}""".stripMargin
    def wireLine(u: Long, e: Long, a: Double, op: String, ts: Long) =
      s"""{"user_id":$u,"event_id":$e,"amount":$a,"__op":"$op",""" +
        s""""__source_ts_ms":$ts,"__deleted":"${op == "d"}"}"""
    def landWire(i: Int, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(s"$wirein/w$i.txt")
      java.nio.file.Files.writeString(p, lines.mkString("\n"))
      p.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    val wire0 = Seq(wireLine(1, 10, 1.0, "c", 1000),
      wireLine(2, 11, 5.0, "c", 1000))
    val wire1 = Seq(wireLine(1, 12, 2.0, "u", 2000),
      wireLine(2, 13, 0.0, "d", 2000))
    val wire2 = Seq(wireLine(3, 14, 7.0, "c", 3000),
      wireLine(1, 15, 9.0, "u", 3000))

    // ---- docs input: exact-dup / minhash-near-dup / embed-dup traffic ----
    val docsin = s"$base/docsin"
    def vec(xs: Double*) = xs.map(_.toFloat).toArray
    val baseText = (1 to 20).map(i => s"token$i").mkString(" ")
    val nearText =
      (1 to 20).map(i => if (i == 20) "changed" else s"token$i").mkString(" ")
    val otherText = (100 to 119).map(i => s"other$i").mkString(" ")
    val freshText = (200 to 219).map(i => s"fresh$i").mkString(" ")
    val lastText = (300 to 319).map(i => s"last$i").mkString(" ")
    def docs(rows: (Long, String, Array[Float])*): DataFrame =
      rows.toSeq.toDF("doc_id", "text", "embedding")
    val d0 = docs((1L, baseText, vec(1, 0, 0, 0)),
      (2L, otherText, vec(0, 1, 0, 0)))
    val d1 = docs(
      (10L, baseText, vec(0, 0, 1, 0)),   // exact dup of doc 1
      (11L, nearText, vec(0, 0, 0, 1)),   // minhash near-dup of doc 1
      (12L, freshText, vec(0, 1, 0, 0)),  // embed dup of doc 2
      (13L, lastText, vec(1, 1, 1, 1)))   // clean
    val d2 = docs(
      (20L, lastText, vec(0.5, 0, 0, 0)), // exact dup of doc 13
      (21L, (400 to 419).map(i => s"new$i").mkString(" "),
        vec(-1, 0, 0, 0)))                // clean
    def landDocs(i: Int, df: DataFrame): Unit = {
      val dir = s"$docsin/d$i"
      df.coalesce(1).write.parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }

    // ---- component state ----
    val cdcSink = new WarehouseSink(s"$base/wh_cdc")
    val cdcOffsets = new OffsetStore(s"$base/off_cdc", spark)
    val scdSink = new WarehouseSink(s"$base/wh_scd")
    val scdStore = new Scd2Store(scdSink)
    val monSink = new WarehouseSink(s"$base/wh_mon")
    val ingSink = new WarehouseSink(s"$base/wh_ing")
    val ingOffsets = new OffsetStore(s"$base/off_ing", spark)
    val docsSchema = d0.schema

    def drainAll(): Unit = {
      val qs = Seq(
        CdcStream.startJson(spark, wirein, wireSchema, cdcSink, "users",
          Seq("user_id"), s"$base/cp_cdc", cdcOffsets,
          availableNow = true, maxFilesPerTrigger = 1),
        StreamScd2.scd2Stream(eventsStream, scdStore, scdSink,
          s"$base/cp_scd",
          Some(org.apache.spark.sql.streaming.Trigger.AvailableNow())),
        StreamBurst.eventsBurstStream(eventsStream, monSink,
          checkpoint = s"$base/cp_burst",
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow())),
        StreamSketches.eventsUsersStream(eventsStream, monSink,
          checkpoint = s"$base/cp_sketch",
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow())),
        CorpusIngest.start(spark, s"$docsin/d*", docsSchema, ingSink,
          ingOffsets, s"$base/cp_ing",
          nearDupMinEstSim = Some(0.5), embedTau = Some(0.9)))
      qs.foreach(_.awaitTermination())
    }

    // ================= morning: two batches land everywhere =============
    landEvents(0); landEvents(1)
    landWire(0, wire0); landWire(1, wire1)
    landDocs(0, d0); landDocs(1, d1)
    drainAll()

    // mid-day state worth trusting before the crash
    assert(ingSink.read(spark, "corpus").select("doc_id")
      .as[Long].collect().toSet === Set(1L, 2L, 13L))

    // ================= the crash: every foreachBatch REDELIVERS =========
    // (crash between sink write and checkpoint commit — the worker is
    // re-invoked with the same batch; each component must converge)
    def tableState(sink: WarehouseSink, t: String): Set[String] =
      sink.read(spark, t).collect().map(_.toString).toSet

    // CDC merge: replay the converted wire1 micro-batch
    val cdcBefore = tableState(cdcSink, "users")
    MergePipeline.mergeBatch(spark, cdcSink, "users",
      graft.cdc.TypeMap.convert(
        spark.read.text(s"$wirein/w1.txt"), wireSchema, valueCol = "value"),
      Seq("user_id"),
      ordering = MergePipeline.defaultOrdering)
    assert(tableState(cdcSink, "users") === cdcBefore,
      "replayed CDC MERGE must converge")

    // SCD2: redelivery at-or-below the marker is skipped whole
    val scdBefore = tableState(scdSink, "scd2")
    val marker = StreamScd2.lastApplied(scdSink)
    assert(marker >= 1L)
    StreamScd2.writeBatch(windows(1), marker, scdStore, scdSink)
    assert(tableState(scdSink, "scd2") === scdBefore,
      "replayed SCD2 fold must be skipped by the batch marker")

    // monitors: replaying batch 1 dynamic-overwrites its OWN partition
    val burstBefore = tableState(monSink, "events_hourly_counts")
    StreamBurst.writeBatch(windows(1), 1L, monSink, "events_hourly_counts")
    assert(tableState(monSink, "events_hourly_counts") === burstBefore,
      "replayed burst batch must rewrite, not double-count")
    StreamSketches.writeBatch(windows(1), 1L, monSink, "events_users_sketch")
    assert(monSink.read(spark, "events_users_sketch")
      .groupBy("hour", "event_type").count().filter(col("count") > 1)
      .isEmpty, "replayed sketch batch must not duplicate shards")

    // ingest: re-running the batch accepts nothing and rewrites idempotently
    val corpusBefore = tableState(ingSink, "corpus")
    assert(CorpusIngest.ingestBatch(spark, ingSink, d1,
      nearDupMinEstSim = Some(0.5), embedTau = Some(0.9)) === 0L)
    assert(tableState(ingSink, "corpus") === corpusBefore,
      "replayed ingest batch must converge")

    // ================= afternoon: one more batch, restart from checkpoints
    landEvents(2)
    landWire(2, wire2)
    landDocs(2, d2)
    drainAll()

    // ================= close of day: every surface equals batch rebuild =
    // users snapshot: 1 upserted twice, 2 deleted, 3 created
    val users = cdcSink.read(spark, "users")
      .select("user_id", "event_id", "amount").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(users === Set((1L, 15L, 9.0), (3L, 14L, 7.0)))

    // SCD2 == the batch build over ALL events
    val gotScd = scdStore.read(spark)
    val wantScd = Cdc.scd2(events).select(gotScd.columns.map(col): _*)
    assert(gotScd.exceptAll(wantScd).isEmpty &&
      wantScd.exceptAll(gotScd).isEmpty)

    // burst monitor == exact batch hourly counts over ALL events
    val gotHourly = StreamBurst.servedHourly(spark, monSink)
    val wantHourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(gotHourly.exceptAll(wantHourly).isEmpty &&
      wantHourly.exceptAll(gotHourly).isEmpty)

    // sketch monitor: served estimates == direct batch sketch estimates
    val gotEst = StreamSketches.servedSketchTable(spark, monSink)
      .select(col("hour"), col("event_type"),
        hll_sketch_estimate(col("sketch")).as("est"), col("n_events"))
    val wantEst = graft.llm.Sketches.eventsUserSketchTable(events)
      .select(col("hour"), col("event_type"),
        hll_sketch_estimate(col("sketch")).as("est"), col("n_events"))
    assert(gotEst.exceptAll(wantEst).isEmpty &&
      wantEst.exceptAll(gotEst).isEmpty)

    // corpus: exact dup (10, 20), near-dup (11), embed-dup (12) rejected
    assert(ingSink.read(spark, "corpus").select("doc_id")
      .as[Long].collect().toSet === Set(1L, 2L, 13L, 21L))
  }
}
