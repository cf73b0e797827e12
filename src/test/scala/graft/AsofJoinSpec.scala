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

  test("salted as-of equals the plain as-of on real events, any bucket size") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select(col("event_id"), coalesce(col("c_click_id"), lit(-1L)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = run(AsofJoin.asof(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("click_id"), rightPrefix = "c"))
    // hour buckets (many boundaries) and week buckets (few) both agree
    Seq(3600L, 7 * 86400L).foreach { b =>
      val salted = run(AsofJoin.asofSalted(purchases, clicks, Seq("user_id"),
        "ts", "ts", Seq("click_id"), rightPrefix = "c", bucketSeconds = b))
      assert(salted === plain, s"bucketSeconds=$b")
    }
    // tolerance composes with salting identically too
    val pt = run(AsofJoin.asof(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("click_id"), rightPrefix = "c",
      toleranceSec = Some(36000L)))
    val st = run(AsofJoin.asofSalted(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("click_id"), rightPrefix = "c",
      toleranceSec = Some(36000L), bucketSeconds = 3600L))
    assert(st === pt)
  }

  test("salted as-of spreads a hot key across bucket partitions") {
    import spark.implicits._
    // one key owns every row: the plain window is one task; the salted
    // window must partition by (key, bucket)
    val hotL = (0 until 200).map(i => (1L, i.toLong, ts("2024-01-01 00:00:00")))
      .map { case (k, id, t0) =>
        (k, id, new java.sql.Timestamp(t0.getTime + id * 3600_000L)) }
      .toDF("k", "id", "t")
    val hotR = (0 until 200).map(i => (1L, 1000L + i,
      new java.sql.Timestamp(ts("2024-01-01 00:30:00").getTime + i * 3600_000L)))
      .toDF("k", "rid", "rt")
    val out = AsofJoin.asofSalted(hotL, hotR, Seq("k"), "t", "rt",
      Seq("rid"), bucketSeconds = 86400L)
    // row i at hour i sees the right row of hour i-1 (:30 past) — except
    // row 0, which precedes every right
    val got = out.select(col("id"), col("r_rid")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got(0L) === None)
    (1 until 200).foreach(i => assert(got(i.toLong) === Some(1000L + i - 1), s"row $i"))
    // the heavy window's partition key includes the bucket
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"), "salted window must key on the time bucket")
  }

  test("randomized corpus: plain and salted agree with brute force, both tie modes") {
    import spark.implicits._
    // fixed-seed random data with deliberate ts collisions (coarse grid)
    val rnd = new scala.util.Random(7)
    def randTs() = new java.sql.Timestamp(
      ts("2024-01-01 00:00:00").getTime + rnd.nextInt(500) * 60_000L)
    val lRows = (0 until 300).map(i => (rnd.nextInt(20).toLong, i.toLong, randTs()))
    val rRows = (0 until 300).map(i => (rnd.nextInt(20).toLong, 10000L + i, randTs()))
    val lDf = lRows.toDF("k", "lid", "t")
    val rDf = rRows.toDF("k", "rid", "rt")
    Seq(true, false).foreach { strict =>
      // brute force: per left row, the best qualifying right TIMESTAMP
      val want = lRows.map { case (k, lid, t) =>
        val cands = rRows.filter { case (rk, _, rt) =>
          rk == k && (if (strict) rt.getTime < t.getTime else rt.getTime <= t.getTime)
        }
        // order by (rt, payload-hash) matches the operator's tie-break;
        // ids are unique per ts collision set only through the hash, so
        // restrict the check to rows whose best ts is UNAMBIGUOUS
        val best = cands.map(_._3.getTime).maxOption
        lid -> best
      }.toMap
      def gotOf(df: org.apache.spark.sql.DataFrame) = df
        .select(col("lid"), col("r_rt"))
        .collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(1)).map(_.getTime))
        .toMap
      val plain = gotOf(AsofJoin.asof(lDf, rDf, Seq("k"), "t", "rt",
        Seq("rt"), strict = strict))
      val salted = gotOf(AsofJoin.asofSalted(lDf, rDf, Seq("k"), "t", "rt",
        Seq("rt"), strict = strict, bucketSeconds = 3600L))
      // the matched TIMESTAMP is tie-insensitive (ties share a ts) — check
      // it against brute force for every row; and the two operators must
      // agree exactly
      lRows.foreach { case (_, lid, _) =>
        assert(plain(lid) === want(lid), s"plain strict=$strict lid=$lid")
      }
      assert(salted === plain, s"salted != plain at strict=$strict")
    }
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
