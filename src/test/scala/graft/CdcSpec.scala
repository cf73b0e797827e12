package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Cdc

class CdcSpec extends AnyFunSuite with SparkFixture {

  test("routeDestination: plain destination maps dots to underscores") {
    assert(Cdc.routeDestination("db.schema.tbl") === "db_schema_tbl")
  }

  test("routeDestination: regexp replace applies before dot mapping") {
    // reference semantics: destination-regexp strips the server prefix
    assert(Cdc.routeDestination("srv1.inventory.orders",
      regexp = Some("^srv1\\."), replace = Some("")) === "inventory_orders")
  }

  test("routeDestination: no regexp configured means no replacement at all") {
    // an empty-pattern replaceAll would inject the replacement between
    // every character ("xdxbx_xtx") — guarded against
    assert(Cdc.routeDestination("db.t", regexp = None, replace = Some("x"))
      === "db_t")
    assert(Cdc.routeDestination("db.t", regexp = Some(""), replace = Some("x"))
      === "db_t")
  }

  test("dedupLatest keeps the row with highest (ts, op-priority, id)") {
    import spark.implicits._
    val df = Seq(
      // key 1: same ts — op priority decides (d > u > r > c)
      (1L, "u", 100L, 10L), (1L, "d", 100L, 11L), (1L, "c", 100L, 12L),
      // key 2: later ts wins regardless of priority
      (2L, "d", 100L, 20L), (2L, "c", 200L, 21L),
      // key 3: full tie — highest id wins
      (3L, "u", 100L, 30L), (3L, "u", 100L, 31L)
    ).toDF("user_id", "__op", "__source_ts_ms", "event_id")
    val out = Cdc.dedupLatest(df, Seq("user_id"),
      Seq(col("__source_ts_ms"), Cdc.opPriorityCol(col("__op")), col("event_id")))
      .select("user_id", "__op", "event_id").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(out === Array((1L, "d", 11L), (2L, "c", 21L), (3L, "u", 31L)))
  }

  test("dedupLatestConfigured: upsert-dedup-column override changes the winner") {
    import spark.implicits._
    // key 1: the DEFAULT ordering (source ts) picks seq=11 (ts 200),
    // but an operator re-pointing upsert-dedup-column at the source
    // LSN picks seq=10 (lsn 7 > 5) — the weak-timestamp scenario the
    // reference's StreamConsumerConfig.java:75-76 override exists for
    val df = Seq(
      (1L, "u", 200L, 5L, 10L), (1L, "d", 100L, 7L, 11L),
      // key 2: lsn tie — op priority via the RENAMED op column decides
      (2L, "c", 100L, 9L, 20L), (2L, "u", 100L, 9L, 21L)
    ).toDF("user_id", "opcode", "__source_ts_ms", "lsn", "seq")
    val default = Cdc.dedupLatestConfigured(df, Seq("user_id"),
      dedupColumn = Some("__source_ts_ms"), arrivalCol = "seq",
      opColumn = "opcode")
      .select("user_id", "seq").as[(Long, Long)].collect().sortBy(_._1)
    val byLsn = Cdc.dedupLatestConfigured(df, Seq("user_id"),
      dedupColumn = Some("lsn"), arrivalCol = "seq", opColumn = "opcode")
      .select("user_id", "seq").as[(Long, Long)].collect().sortBy(_._1)
    assert(default === Array((1L, 10L), (2L, 21L)))
    assert(byLsn === Array((1L, 11L), (2L, 21L)))
  }

  test("dedupLatestConfigured: blank dedup column = newest arrival wins") {
    import spark.implicits._
    // reference's blank-config branch (compareByTsThenOp returns -1 →
    // the merge keeps the newer arrival regardless of ts or op)
    val df = Seq(
      (1L, "d", 900L, 10L), (1L, "c", 100L, 11L)
    ).toDF("user_id", "__op", "__source_ts_ms", "seq")
    val out = Cdc.dedupLatestConfigured(df, Seq("user_id"),
      dedupColumn = None, arrivalCol = "seq")
      .select("user_id", "__op", "seq").as[(Long, String, Long)].collect()
    assert(out === Array((1L, "c", 11L)))
  }

  test("dedupLatestConfigured: NULL op ties with 'c' — arrival decides") {
    import spark.implicits._
    // reference reads the op with asText("c") (compareByTsThenOp:
    // 244-245): a record missing its op column ties with a create on a
    // primary-ordering tie, so the newer ARRIVAL wins — it must not be
    // demoted to priority -1 below even unknown op codes (ADVICE r15)
    val df = Seq(
      // key 1: ts tie, NULL op arrives after "c" → NULL-op row wins
      (1L, Some("c"), 100L, 10L), (1L, None, 100L, 11L),
      // key 2: ts tie, "c" arrives after NULL op → "c" row wins
      (2L, None, 100L, 20L), (2L, Some("c"), 100L, 21L),
      // key 3: a real op code still outranks NULL on the tie
      (3L, Some("u"), 100L, 31L), (3L, None, 100L, 32L)
    ).toDF("user_id", "__op", "__source_ts_ms", "seq")
    val out = Cdc.dedupLatestConfigured(df, Seq("user_id"),
      dedupColumn = Some("__source_ts_ms"), arrivalCol = "seq")
      .select("user_id", "seq").as[(Long, Long)].collect().sortBy(_._1)
    assert(out === Array((1L, 11L), (2L, 21L), (3L, 31L)))
  }

  test("cdc_dedup_nullop entry: the NULL→'c' default DECIDES winners") {
    // discrimination pin for the r17 driver entry: with the coalesce
    // default dropped (NULL demoted to -1 like an unknown code), the
    // winner set must CHANGE — otherwise the gate row would ride along
    // without pinning the branch (8 of 15 sf0.001 winners flip)
    val synth = Cdc.nullOpSynth(Cdc.flatten(Tables.events(spark, sfDir)))
    val withDefault = Cdc.dedupNullOpQ(spark, sfDir)
      .select("user_id", "event_id")
    val rawPriority = Cdc.dedupLatest(synth, Seq("user_id"),
      Seq(col("batch_seq"), Cdc.opPriorityCol(col("__op")), col("event_id")))
      .select("user_id", "event_id")
    assert(withDefault.except(rawPriority).count() >= 8)
    // and every planted top batch actually surfaces: all winners come
    // from the batch_seq=1 slice
    assert(Cdc.dedupNullOpQ(spark, sfDir)
      .filter(col("batch_seq") =!= 1).count() === 0)
  }

  test("mergeIncremental equals upsertSnapshot over the full changelog") {
    val events = Tables.events(spark, sfDir)
    val full = Cdc.upsertSnapshot(events)
    val merged = Cdc.mergeIncremental(events, lit("2024-01-15").cast("timestamp"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("timeTravel at head equals upsertSnapshot with no next change") {
    val events = Tables.events(spark, sfDir)
    val head = Cdc.timeTravel(events, lit("2100-01-01").cast("timestamp"))
    assert(head.filter(col("next_change_ms") =!= -1L).count() === 0)
    val snap = Cdc.upsertSnapshot(events)
    val travelled = head.drop("next_change_ms")
    assert(travelled.exceptAll(snap).isEmpty && snap.exceptAll(travelled).isEmpty)
    // before the changelog began, the table did not exist
    assert(Cdc.timeTravel(events, lit("1990-01-01").cast("timestamp")).isEmpty)
  }

  test("timeTravel reconstructs mid-history state with validity horizon") {
    import spark.implicits._
    // events-shaped fixture: key 1 updated before and after asOf (old value
    // wins, horizon = next change); key 2 deleted before asOf (absent) then
    // re-created after (still absent AS OF); key 3 untouched after (horizon -1)
    def ev(id: Long, uid: Long, typ: String, ts: String) =
      (id, uid, typ, 1.0, java.sql.Timestamp.valueOf(ts), """{"k":1}""")
    val events = Seq(
      ev(1, 1, "signup", "2024-01-01 00:00:00"),
      ev(2, 1, "click", "2024-01-20 00:00:00"),
      ev(3, 2, "signup", "2024-01-02 00:00:00"),
      ev(4, 2, "error", "2024-01-03 00:00:00"),
      ev(5, 2, "signup", "2024-01-25 00:00:00"),
      ev(6, 3, "purchase", "2024-01-05 00:00:00")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Cdc.timeTravel(events, lit("2024-01-10").cast("timestamp"))
      .select("user_id", "event_id", "next_change_ms")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val jan20 = java.sql.Timestamp.valueOf("2024-01-20 00:00:00").getTime
    assert(out === Array((1L, 1L, jan20), (3L, 6L, -1L)))
  }

  test("tiebreakAudit counts same-ts collision groups and flags delete conflicts") {
    import spark.implicits._
    def ev(id: Long, uid: Long, typ: String, ts: String) =
      (id, uid, typ, 1.0, java.sql.Timestamp.valueOf(ts), """{"k":1}""")
    val events = Seq(
      // key 1: one collision pair including a delete
      ev(1, 1, "click", "2024-01-01 00:00:00"),
      ev(2, 1, "error", "2024-01-01 00:00:00"),
      // key 2: a 3-change collision plus a lone change — one group
      ev(3, 2, "click", "2024-01-02 00:00:00"),
      ev(4, 2, "view", "2024-01-02 00:00:00"),
      ev(5, 2, "click", "2024-01-02 00:00:00"),
      ev(6, 2, "click", "2024-01-03 00:00:00"),
      // key 3: no collisions → absent from the audit
      ev(7, 3, "click", "2024-01-04 00:00:00"),
      ev(8, 3, "click", "2024-01-05 00:00:00")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Cdc.tiebreakAudit(events)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out === Array((1L, 1L, 2L, true), (2L, 1L, 3L, false)))
  }

  test("snapshotDiff classifies added/removed/changed; unchanged emit nothing") {
    import spark.implicits._
    def ev(id: Long, uid: Long, typ: String, ts: String) =
      (id, uid, typ, 1.0, java.sql.Timestamp.valueOf(ts), """{"k":1}""")
    val events = Seq(
      ev(1, 1, "signup", "2024-01-01 00:00:00"), // key 1: unchanged → no row
      ev(2, 2, "signup", "2024-01-12 00:00:00"), // key 2: added in (t1,t2]
      ev(3, 3, "signup", "2024-01-02 00:00:00"), // key 3: removed (error@01-15)
      ev(4, 3, "error", "2024-01-15 00:00:00"),
      ev(5, 4, "signup", "2024-01-03 00:00:00"), // key 4: changed (new winner)
      ev(6, 4, "click", "2024-01-16 00:00:00"),
      ev(7, 5, "error", "2024-01-04 00:00:00"),  // key 5: dead both sides → none
      ev(8, 6, "signup", "2024-01-25 00:00:00")  // key 6: after t2 → no row
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Cdc.snapshotDiff(events,
        lit("2024-01-10").cast("timestamp"), lit("2024-01-20").cast("timestamp"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      (2L, "added", -1L, 2L),
      (3L, "removed", 3L, -1L),
      (4L, "changed", 5L, 6L)))
  }

  test("snapshotDiff agrees with the two timeTravel snapshots on the corpus") {
    val events = Tables.events(spark, sfDir)
    val (t1, t2) = (lit("2024-01-10").cast("timestamp"),
      lit("2024-01-20").cast("timestamp"))
    val s1 = Cdc.timeTravel(events, t1).select(col("user_id"),
      col("event_id").as("e1"))
    val s2 = Cdc.timeTravel(events, t2).select(col("user_id"),
      col("event_id").as("e2"))
    val joined = s1.join(s2, Seq("user_id"), "full_outer")
    val expect = Map(
      "added" -> joined.filter(col("e1").isNull && col("e2").isNotNull).count(),
      "removed" -> joined.filter(col("e1").isNotNull && col("e2").isNull).count(),
      "changed" -> joined.filter(col("e1").isNotNull && col("e2").isNotNull &&
        col("e1") =!= col("e2")).count())
    val got = Cdc.snapshotDiff(events, t1, t2)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect.filter(_._2 > 0))
  }

  test("softDeleteSnapshot keeps deleted keys flagged, upsertSnapshot drops them") {
    val events = Tables.events(spark, sfDir)
    val soft = Cdc.softDeleteSnapshot(events)
    val hard = Cdc.upsertSnapshot(events)
    val deleted = soft.filter(col("__op") === "d").count()
    assert(soft.count() === hard.count() + deleted)
    assert(hard.filter(col("__op") === "d").count() === 0)
  }

  test("op mix: per-hour shares sum to 1, deletes counted only under op d") {
    import spark.implicits._
    val mix = Cdc.opMix(Tables.events(spark, sfDir))
    // shares within each hour form a distribution
    val badShare = mix.groupBy("hour")
      .agg(sum("op_share").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9)
    assert(badShare.isEmpty)
    // the __deleted flag tracks the d op exactly (error events)
    val badDel = mix.filter(
      (col("__op") === "d" && col("n_deleted") =!= col("n_events")) ||
        (col("__op") =!= "d" && col("n_deleted") =!= 0L))
    assert(badDel.isEmpty)
    // totals reconcile with the raw stream
    val total = mix.agg(sum("n_events")).as[Long].head()
    assert(total === Tables.events(spark, sfDir).count())
  }

  test("key churn: totals reconcile, subsets bounded, hot flag matches the mean") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val churn = Cdc.keyChurn(events)
    assert(churn.agg(sum("n_changes")).as[Long].head() === events.count())
    // updates + deletes never exceed changes; span is ordered
    assert(churn.filter(col("n_updates") + col("n_deletes") > col("n_changes")
      || col("first_ts") > col("last_ts")).isEmpty)
    // the flag is exactly the >= 3x-mean predicate
    val mean = churn.agg(avg("n_changes")).head().getDouble(0)
    val bad = churn.filter(
      col("is_hot") =!= (col("n_changes") >= 3.0 * mean))
    assert(bad.isEmpty)
  }

  test("retention matrix: week-0 rate is 1.0 and no cell exceeds its cohort") {
    import spark.implicits._
    val m = graft.queries.Analytics.qRetentionMatrix(spark, sfDir)
    val wk0 = m.filter(col("week_n") === 0)
    assert(wk0.count() > 0)
    assert(wk0.filter(col("retention_rate") =!= 1.0).isEmpty)
    val over = m.as("x").join(wk0.select(col("cohort_week"),
        col("n_users").as("size0")), "cohort_week")
      .filter(col("n_users") > col("size0"))
    assert(over.isEmpty)
    // cohorts partition the user base: week-0 sizes sum to all users
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(wk0.agg(sum("n_users")).as[Long].head() === users)
  }
}
