package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Cdc

/** Invariants of the CDC semantics over the real test warehouse. (Pure
  * functions get full ScalaCheck treatment in [[PureProperties]].) */
class CdcPropertiesSpec extends AnyFunSuite with SparkFixture {

  test("mergeIncremental equals upsertSnapshot for any cutoff") {
    val events = Tables.events(spark, sfDir)
    val want = Cdc.upsertSnapshot(events)
    // cutoffs sampled across and beyond the data's time range
    for (cut <- Seq("2023-12-01", "2024-01-08", "2024-01-21", "2025-01-01")) {
      val got = Cdc.mergeIncremental(events, lit(cut).cast("timestamp"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"cutoff $cut diverged")
    }
  }

  test("timeTravel and snapshotDiff equal a plain-Scala replay on random changelogs") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val types = Array("signup", "view", "click", "purchase", "error")
    // 400 changes over 40 keys and a 40-day span: dense enough that
    // keys churn, delete, and resurrect across the probed cutoffs
    val rows = (1L to 400L).map { id =>
      (id, rnd.nextInt(40).toLong, types(rnd.nextInt(5)), 1.0,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          1704067200L + rnd.nextInt(40 * 86400))), """{"k":1}""")
    }
    val events = rows
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    // plain-Scala oracle: latest change per key at or before t wins by
    // (ts, op priority, id); op from the same event_type map
    def op(t: String) = t match {
      case "signup" => "c"; case "view" => "r"; case "error" => "d"
      case _ => "u"
    }
    def refSnap(tSec: Long): Map[Long, Long] = rows
      .filter(_._5.getTime / 1000 <= tSec)
      .groupBy(_._2)
      .flatMap { case (uid, ch) =>
        val w = ch.maxBy(r =>
          (r._5.getTime, Cdc.OpPriority(op(r._3)), r._1))
        if (op(w._3) == "d") None else Some(uid -> w._1)
      }
    for (day <- Seq(5, 20, 39)) {
      val tSec = 1704067200L + day * 86400L
      val t = lit(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(tSec)))
      val got = Cdc.timeTravel(events, t)
        .select("user_id", "event_id").as[(Long, Long)].collect().toMap
      assert(got === refSnap(tSec), s"timeTravel diverged at day $day")
    }
    // snapshotDiff between two replayed snapshots
    val (s1, s2) = (refSnap(1704067200L + 10 * 86400L),
      refSnap(1704067200L + 30 * 86400L))
    val want = (s1.keySet ++ s2.keySet).flatMap { uid =>
      (s1.get(uid), s2.get(uid)) match {
        case (None, Some(e)) => Some((uid, "added", -1L, e))
        case (Some(e), None) => Some((uid, "removed", e, -1L))
        case (Some(a), Some(b)) if a != b => Some((uid, "changed", a, b))
        case _ => None
      }
    }
    val got = Cdc.snapshotDiff(events,
        lit(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          1704067200L + 10 * 86400L))),
        lit(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          1704067200L + 30 * 86400L))))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("dedupLatest is idempotent and insensitive to input order") {
    val flat = Cdc.flatten(Tables.events(spark, sfDir))
    def dedup(df: org.apache.spark.sql.DataFrame) =
      Cdc.dedupLatest(df, Seq("user_id"),
        Seq(col("__source_ts_ms"), Cdc.opPriorityCol(col("__op")), col("event_id")))
    val once = dedup(flat)
    val twice = dedup(once)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    val shuffled = dedup(flat.orderBy(rand(42)))
    assert(once.exceptAll(shuffled).isEmpty && shuffled.exceptAll(once).isEmpty)
  }
}
