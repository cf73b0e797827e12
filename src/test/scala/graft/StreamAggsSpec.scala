package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Analytics
import graft.streaming.StreamAggs
import graft.streaming.StreamAggs.{Session, SessionEvent}

class StreamAggsSpec extends AnyFunSuite with SparkFixture {

  test("streaming hourly rollup over file triggers equals the batch aggregate") {
    val events = Tables.events(spark, sfDir)
      .select("ts", "event_type", "value")
    val inputDir = tmpDir("sagg_in_")
    val cutoff = lit("2024-01-15").cast("timestamp")
    events.filter(col("ts") < cutoff).coalesce(1).write.parquet(s"$inputDir/f0")
    events.filter(col("ts") >= cutoff).coalesce(1).write.parquet(s"$inputDir/f1")

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
    val q = StreamAggs.hourlyCounts(stream).writeStream
      .format("memory").queryName("hourly")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("sagg_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("hourly")
    val want = Analytics.qEventsHourly(spark, sfDir)
      .select(got.columns.map(col): _*)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming quality monitor equals the batch monitor and textGopher") {
    // documents with a synthetic deterministic ingest timestamp spread
    // over 6 hours, split into two micro-batch files at the 3h mark
    val docs = Tables.documents(spark, sfDir)
      .withColumn("ingest_ts",
        (lit(1704067200L) + col("doc_id") % 21600).cast("timestamp"))
      .select("doc_id", "text", "source", "ingest_ts")
    val inputDir = tmpDir("qmon_in_")
    docs.filter(col("doc_id") % 21600 < 10800).coalesce(1)
      .write.parquet(s"$inputDir/f0")
    docs.filter(col("doc_id") % 21600 >= 10800).coalesce(1)
      .write.parquet(s"$inputDir/f1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
    val q = StreamAggs.qualityMonitor(stream, minWords = 8, minStop = 1)
      .writeStream.format("memory").queryName("qmon")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("qmon_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("qmon")
    val want = StreamAggs.qualityMonitor(docs, minWords = 8, minStop = 1)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the monitor's totals agree with the batch textGopher gate
    val passTotal = graft.llm.TextOps
      .textGopher(docs, minWords = 8, minStop = 1)
      .filter(col("gopher_pass")).count()
    import spark.implicits._
    assert(got.agg(sum("n_pass")).as[Long].head() === passTotal)
  }

  test("streaming op-mix monitor equals the batch counts and cdc_op_mix") {
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts", "props")
    val inputDir = tmpDir("opmix_in_")
    val cutoff = lit("2024-01-15").cast("timestamp")
    events.filter(col("ts") < cutoff).coalesce(1).write.parquet(s"$inputDir/f0")
    events.filter(col("ts") >= cutoff).coalesce(1).write.parquet(s"$inputDir/f1")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
    val q = StreamAggs.opMixMonitor(stream)
      .writeStream.format("memory").queryName("opmix")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("opmix_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("opmix")
    assert(got.count() > 0)
    val want = StreamAggs.opMixMonitor(events)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // counts agree with the batch cdc_op_mix dashboard (same grain,
    // modulo its derived share column)
    val mix = graft.cdc.Cdc.opMix(events)
      .select(col("hour"), col("__op"), col("n_events"), col("n_deleted"))
    assert(got.exceptAll(mix).isEmpty && mix.exceptAll(got).isEmpty)
  }

  test("gateMonitor composes: a blocklist gate's totals match textBlocklist") {
    import spark.implicits._
    implicit val s = spark
    val docs = Tables.documents(spark, sfDir)
      .withColumn("ingest_ts",
        (lit(1704067200L) + col("doc_id") % 21600).cast("timestamp"))
    val toks = split(trim(lower(col("text"))), "\\s+")
    val cleanGate = size(org.apache.spark.sql.functions.filter(toks,
      t => t.isin(graft.llm.TextOps.DemoBlocklist: _*))) === 0
    val got = graft.streaming.StreamAggs.gateMonitor(docs, cleanGate)
    val wantClean = graft.llm.TextOps.textBlocklist(docs)
      .filter(!col("blocked")).count()
    assert(got.agg(sum("n_pass")).as[Long].head() === wantClean)
    assert(got.agg(sum("n_docs")).as[Long].head() === docs.count())
  }

  test("batch sessionization matches the window-based session counts") {
    import spark.implicits._
    implicit val s = spark
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts")).as[SessionEvent]
    val sessions = StreamAggs.sessionize(events)
    val counts = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val want = Analytics.qUserSessions(spark, sfDir)
      .select("user_id", "n_sessions", "n_events")
    val got = counts.select("user_id", "n_sessions", "n_events")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming sessionization emits a gap-closed session across micro-batches") {
    import spark.implicits._
    implicit val s = spark
    val inputDir = tmpDir("sess_in_")
    def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    // file 0: user 1 has two events 10 min apart (one session)
    Seq(SessionEvent(1L, ts(0)), SessionEvent(1L, ts(10)))
      .toDF().coalesce(1).write.parquet(s"$inputDir/f0")
    // file 1: user 1 returns 2h later -> the first session closes by gap
    Seq(SessionEvent(1L, ts(130)))
      .toDF().coalesce(1).write.parquet(s"$inputDir/f1")

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[SessionEvent]].schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
      .as[SessionEvent]
    val q = StreamAggs.sessionize(stream).writeStream
      .format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("sess_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val closed = spark.table("sessions").as[Session].collect()
    // the 2-event session must have been emitted when the third event
    // opened a new one (gap exceeded within the data, no timeout needed)
    assert(closed.exists(se =>
      se.user_id == 1L && se.n_events == 2 &&
        se.start_ms == ts(0).getTime && se.end_ms == ts(10).getTime))
  }

  test("streaming dedup drops a redelivered event across micro-batches") {
    import spark.implicits._
    val inputDir = tmpDir("ddup_in_")
    def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val schema = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP"
    // the same event (id=7) is delivered in both files; id=8 only in f1
    Seq((7L, 1L, ts(0))).toDF("event_id", "user_id", "ts")
      .coalesce(1).write.parquet(s"$inputDir/f0")
    Seq((7L, 1L, ts(0)), (8L, 1L, ts(5))).toDF("event_id", "user_id", "ts")
      .coalesce(1).write.parquet(s"$inputDir/f1")

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
    val q = StreamAggs.dedupEvents(stream).writeStream
      .format("memory").queryName("ddup")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ddup_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val ids = spark.table("ddup").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(7L, 8L))
  }

  test("late event behind the watermark is dropped, not a query-killer (ADVICE r2)") {
    import spark.implicits._
    implicit val s = spark
    val inputDir = tmpDir("late_in_")
    def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    // trigger 0: user 1 at t=0 and t=120 -> watermark advances to ~119min;
    // session [0,0] closes by gap, session [120,...] stays open in state
    Seq(SessionEvent(1L, ts(0)), SessionEvent(1L, ts(120)))
      .toDF().coalesce(1).write.parquet(s"$inputDir/f0")
    // trigger 1: a LATE user-1 event at t=10 (far behind the watermark).
    // Unfixed, it regressed the open session's last_ms to t=10 and produced
    // a timeout timestamp below the watermark -> IllegalArgumentException,
    // dead query. It must simply be dropped.
    Seq(SessionEvent(1L, ts(10)), SessionEvent(2L, ts(121)))
      .toDF().coalesce(1).write.parquet(s"$inputDir/f1")

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[SessionEvent]].schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
      .as[SessionEvent]
    val q = StreamAggs.sessionize(stream).writeStream
      .format("memory").queryName("late_sessions")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("late_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination() // throws StreamingQueryException if the bug is back

    val closed = spark.table("late_sessions").as[Session].collect()
    // the late event must not have closed or regressed the open t=120 session
    assert(!closed.exists(se => se.user_id == 1L && se.end_ms == ts(10).getTime))
    assert(closed.exists(se =>
      se.user_id == 1L && se.start_ms == ts(0).getTime && se.end_ms == ts(0).getTime))
  }
}
