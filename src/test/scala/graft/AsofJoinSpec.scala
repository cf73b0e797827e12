package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite with SparkFixture {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def trades = {
    import spark.implicits._
    Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:10")),
      (3L, "B", ts("2024-01-01 10:00:10")),
      (4L, "C", ts("2024-01-01 10:00:10"))
    ).toDF("trade_id", "sym", "t")
  }

  private def quotes = {
    import spark.implicits._
    Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:00:05"), 2.0), // ties trade 1's ts exactly
      ("A", ts("2024-01-01 10:00:07"), 3.0),
      ("B", ts("2024-01-01 10:00:20"), 9.0)  // only AFTER trade 3
    ).toDF("sym", "qt", "px")
  }

  private def run(strict: Boolean, tolSec: Option[Long] = None) =
    AsofJoin.asof(trades, quotes, Seq("sym"), "t", "qt", Seq("px"),
      strict = strict, toleranceSec = tolSec)
      .select(col("trade_id"), col("r_px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

  test("strict as-of: latest strictly-earlier right row per key") {
    val m = run(strict = true)
    assert(m(1L) === Some(1.0)) // 10:00:05 quote ties → excluded (strict)
    assert(m(2L) === Some(3.0)) // latest of the three earlier quotes
    assert(m(3L) === None)      // B's only quote is later
    assert(m(4L) === None)      // C has no quotes at all
  }

  test("inclusive as-of: a right row at the exact timestamp wins") {
    val m = run(strict = false)
    assert(m(1L) === Some(2.0)) // the tie now qualifies and is latest
    assert(m(2L) === Some(3.0))
    assert(m(3L) === None)
  }

  test("tolerance bounds the lookback") {
    val m = run(strict = true, tolSec = Some(3L))
    assert(m(1L) === None)      // nearest strict match is 5s back > 3s
    assert(m(2L) === Some(3.0)) // 3s back, within tolerance
  }

  test("every left row appears exactly once with original columns") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
    assert(out.columns.toSeq === Seq("trade_id", "sym", "t", "r_px"))
    assert(out.count() === 4)
    assert(out.select("trade_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("plan: one shuffle on the key, no nested-loop or cartesian join") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "as-of join must not expand to a product")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "union+window shape has no join at all")
  }

  test("driver query agrees with a per-row reference on real events") {
    import spark.implicits._
    val out = AsofJoin.eventsAsofQ(spark, sfDir)
      .select("event_id", "click_event_id")
      .as[(Long, Long)].collect().toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long").as("tsl"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicks = ev.filter(_._3 == "click")
    val purchases = ev.filter(_._3 == "purchase")
    assert(out.size === purchases.length)
    // spot-check 50 purchases against a brute-force driver-side scan
    purchases.sortBy(_._1).take(50).foreach { case (eid, uid, _, t) =>
      val expect = clicks.filter(c => c._2 == uid && c._4 < t)
        .sortBy(c => (c._4, c._1)).lastOption.map(_._1).getOrElse(-1L)
      assert(out(eid) === expect, s"purchase $eid")
    }
  }
}
