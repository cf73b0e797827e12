package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann
import graft.queries.Analytics6

/** r13 wave-3 operators: worked-by-hand fixtures (the Round13bSpec
  * discipline) for the Analytics6 family and the new graph/panel ops. */
class Round13cSpec extends AnyFunSuite with SparkFixture {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)
  private def day(d: Long): Timestamp = new Timestamp(d * 86400000L)

  test("events_streaks: islands split on gaps, best-streak attribution") {
    import spark.implicits._
    // user 1 active days {1,2,3, 10}: streaks 3 and 1; user 2 day {5}: 1
    val ev = Seq((1L, day(1)), (2L, day(1)), (3L, day(2)), (4L, day(3)),
      (5L, day(10)), (6L, day(5)))
      .zip(Seq(1L, 1L, 1L, 1L, 1L, 2L))
      .map { case ((id, t), u) => (id, t, u) }
      .toDF("event_id", "ts", "user_id")
    val out = Analytics6.eventsStreaksOn(ev).orderBy("streak_days")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((1L, 2L, 1L), (3L, 1L, 1L)))
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.6667, 0.3333))
  }

  test("events_error_load_corr: exact moments on a two-hour fixture") {
    import spark.implicits._
    // h0: a=2, b=1 (load 3); h1: a=4, b=2 (load 6) — both types track
    // load perfectly (corr 1) with slopes 2/3 and 1/3
    val rows =
      (1 to 2).map(i => (i.toLong, ts(i), "a")) ++
        Seq((3L, ts(5), "b")) ++
        (4 to 7).map(i => (i.toLong, ts(60 + i), "a")) ++
        Seq((8L, ts(70), "b"), (9L, ts(71), "b"))
    val ev = rows.toDF("event_id", "ts", "event_type")
    val out = Analytics6.eventsErrorLoadCorrOn(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) === 2L && a.getLong(2) === 6L)
    assert(a.getDouble(3) === 0.6667)          // load share 6/9
    assert(a.getDouble(4) === 1.0)             // corr
    assert(a.getDouble(5) === 0.6667)          // slope 6/9
    val b = out("b")
    assert(b.getDouble(4) === 1.0 && b.getDouble(5) === 0.3333)
  }

  test("q_balance_activity: bands keep orderless customers, exact rollup") {
    import spark.implicits._
    val cust = Seq((1L, -50.0), (2L, 100.0), (3L, 2600.0), (4L, 9000.0),
      (5L, 9500.0)).toDF("c_custkey", "c_acctbal")
    val orders = Seq((2L, 100.0), (2L, 200.0), (4L, 1000.0))
      .toDF("o_custkey", "o_totalprice")
    val out = Analytics6.qBalanceActivityOn(cust, orders)
      .orderBy("band").collect()
    assert(out.map(_.getString(0)).toSeq ===
      Seq("1_negative", "2_low", "3_mid", "5_top"))
    val low = out(1)
    assert(low.getLong(1) === 1L && low.getLong(2) === 2L)
    assert(low.getDouble(3) === 2.0)           // orders per customer
    assert(low.getDouble(4) === 300.0)
    assert(low.getDouble(5) === 0.2308)        // 300/1300
    assert(low.getDouble(6) === 150.0)
    val neg = out.head                         // no orders at all
    assert(neg.getLong(2) === 0L && neg.getDouble(4) === 0.0)
    val top = out.last                         // two customers, one orders
    assert(top.getLong(1) === 2L && top.getLong(2) === 1L)
    assert(top.getDouble(3) === 0.5)
  }

  test("events_window_funnel: hops bounded by the window, min-based") {
    import spark.implicits._
    // user 1: view@0, click@30, purchase@80 (each hop <= 60 min)
    // user 2: view@0, click@120 (outside the window) — stalls at step 1
    val ev = Seq(
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(30)),
      (3L, 1L, "purchase", ts(80)),
      (4L, 2L, "view", ts(0)), (5L, 2L, "click", ts(120)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics6.eventsWindowFunnelOn(ev).orderBy("step")
      .collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 1L, 1L))
    assert(out(1).getDouble(3) === 0.5 && out(1).getDouble(4) === 0.5)
    assert(out(2).getDouble(3) === 1.0 && out(2).getDouble(4) === 0.5)
  }

  test("q_order_width_profile: width histogram with exact revenue") {
    import spark.implicits._
    val li = Seq((1L, 100.0, 0.0), (2L, 100.0, 0.0), (2L, 300.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val out = Analytics6.qOrderWidthProfileOn(li)
      .orderBy("lines_per_order").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (2L, 1L)))
    assert(out.head.getDouble(3) === 100.0)    // width-1 revenue
    assert(out.last.getDouble(3) === 400.0)
    assert(out.last.getDouble(4) === 0.8)      // 400/500
    assert(out.last.getDouble(5) === 400.0)    // avg order revenue
  }

  test("lsh_bucket_profile: occupancy identities on the real corpus") {
    val out = Ann.lshBucketProfile(Tables.embeddings(spark, sfDir))
      .collect()
    assert(out.length === Ann.NumBands)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.forall(_.getLong(2) === n))     // every band holds all vecs
    assert(out.forall(r => r.getLong(1) <= (1L << Ann.BitsPerBand)))
    // expected_pairs >= the top bucket's own pair count, and > 0
    assert(out.forall { r =>
      val mx = r.getLong(3).toDouble
      r.getDouble(4) >= mx * (mx - 1) / 2 && r.getDouble(4) >= 0
    })
  }

  test("embed_distance_profile: orthogonal/identical fixture bands") {
    import spark.implicits._
    val e1 = Array(1.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f)
    val emb = Seq((0L, e1), (1L, e1), (2L, e2))
      .toDF("vec_id", "embedding")
    val out = Ann.embedDistanceProfile(emb).orderBy("band").collect()
    // pairs: (0,1) cos 1 -> clamped band 9; (0,2), (1,2) cos 0 -> band 0
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((0L, 2L), (9L, 1L)))
    assert(out.head.getDouble(1) === 0.0)      // cos_lo
    assert(out.head.getDouble(3) === 0.6667)
    assert(out.last.getDouble(4) === 1.0)      // cum ends at 1
  }

  test("knn_components: known components on an explicit substrate graph") {
    import spark.implicits._
    // mutual triangle 1-2-3, mutual pair 4-5, 6 -> 1 unreciprocated
    val g = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
      (3L, 2L), (4L, 5L), (5L, 4L), (6L, 1L)).toDF("vec_id", "nbr_id")
    val out = Ann.knnComponents(spark.emptyDataFrame, graph = Some(g))
      .orderBy("component_size").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)))
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.1667, 0.3333, 0.5))
  }

  test("knn_components: fixed 25-iteration schedule has converged (25 == 35)") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = Ann.knnComponents(emb, iters = 25)
    val b = Ann.knnComponents(emb, iters = 35)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val g = Ann.knnGraph(emb, 5).select("vec_id", "nbr_id")
    val c = Ann.knnComponents(emb, graph = Some(g))
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
  }
}
