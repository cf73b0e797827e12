package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann

/** Round-14 wave 5: SNN edge-strength histogram (knn_edge_jaccard) —
  * worked-by-hand mutual-graph fixture plus a randomized plain-Scala
  * replay over an arbitrary injected substrate (the consumer never
  * sees embeddings when `graph` is supplied, so the fixtures drive it
  * with explicit edge frames). */
class Round14eSpec extends AnyFunSuite with SparkFixture {

  private val rnd = new Random(1418)

  private def graphDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    // inject both directions: the operator's mutual semi-join keeps
    // exactly the reciprocated pairs
    edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("vec_id", "nbr_id")
  }

  private def emptyEmb = {
    import spark.implicits._
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  }

  test("knn_edge_jaccard: triangle + pendant, worked by hand") {
    // N(1)={2,3} N(2)={1,3} N(3)={1,2,4} N(4)={3}
    val g = graphDf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    val got = Ann.knnEdgeJaccard(emptyEmb, graph = Some(g)).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toMap
    // (1,2): J=1/3 → b3; (1,3),(2,3): J=1/4 → b2; (3,4): J=0 → b0
    assert(got === Map(
      0L -> ((0.0, 1L, 0.25)),
      2L -> ((0.2, 2L, 0.5)),
      3L -> ((0.3, 1L, 0.25))))
  }

  test("events_ewma_baseline: exact dyadic EWMA, worked by hand") {
    import spark.implicits._
    // one type, days 100..103 with counts 8, 4, 2, 16 (last = 16):
    // ewma over days 100..102 = 8·2⁻³ + 4·2⁻² + 2·2⁻¹ = 3.0 exactly
    val day = 86400000L
    val rows = Seq((100L, 8), (101L, 4), (102L, 2), (103L, 16))
      .flatMap { case (d, n) => (1 to n).map(i =>
        (d * 100 + i, new java.sql.Timestamp(d * day), 1L, "click",
          1.0, "{}")) }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val r = graft.queries.Analytics8.eventsEwmaBaselineOn(df)
      .collect().head
    assert(r.getLong(1) === 3L)       // days_used
    assert(r.getDouble(2) === 3.0)    // exact dyadic sum
    assert(r.getLong(3) === 16L)
    assert(r.getDouble(4) === round4(16.0 / 3.0))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("events_session_profile randomized replay vs plain-Scala sessionization") {
    import spark.implicits._
    val gap = 1800000L
    val rows = (1 to 8).flatMap { u =>
      var t = 1000000L
      (1 to 20 + rnd.nextInt(40)).map { i =>
        t += (if (rnd.nextInt(5) == 0) gap + 1 + rnd.nextInt(100000)
              else rnd.nextInt(600000).toLong)
        (u * 1000L + i, new java.sql.Timestamp(t), u.toLong, "e", 1.0, "{}")
      }
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val got = graft.queries.Analytics8.eventsSessionProfileOn(df)
      .collect().head
    // plain-Scala sessionization + sorted percentiles
    val sess = rows.groupBy(_._3).values.flatMap { evs =>
      val ms = evs.map(_._2.getTime).sorted
      val cuts = ms.zip(ms.head +: ms.init)
        .map { case (c, p) => c - p > gap }
      val sids = cuts.scanLeft(0) { case (s, n) => if (n) s + 1 else s }
        .tail
      ms.zip(sids).groupBy(_._2).values
        .map(g => (g.map(_._1).max - g.map(_._1).min, g.size.toLong))
    }.toSeq
    def at(xs: Seq[Long], q: Double) = {
      val s = xs.sorted; s(math.ceil(q * s.length).toInt - 1)
    }
    assert(got.getLong(0) === sess.size.toLong)
    assert((1 to 3).map(i => got.getLong(i)) ===
      Seq(0.5, 0.9, 0.99).map(q => at(sess.map(_._1), q)))
    assert((4 to 6).map(i => got.getLong(i)) ===
      Seq(0.5, 0.9, 0.99).map(q => at(sess.map(_._2), q)))
  }

  test("q_revenue_pareto: crossing inside a tie class takes the exact j") {
    import spark.implicits._
    // brand A revenues (dollars): 4.00, 2.00, 2.00, 2.00 → T=10.00;
    // 80% bar crosses inside the 2.00 tie class at the 3rd part
    // brand B: 5.00, 3.00, 1.00, 1.00 → crossing at part 2 exactly
    val li = Seq(
      (1L, 4.00), (2L, 2.00), (3L, 2.00), (4L, 2.00),
      (11L, 5.00), (12L, 3.00), (13L, 1.00), (14L, 1.00))
      .toDF("l_partkey", "l_extendedprice")
    val part = (1L to 4L).map((_, "A")) ++ (11L to 14L).map((_, "B"))
    val got = graft.queries.Analytics8.qRevenueParetoOn(li,
        part.toDF("p_partkey", "p_brand")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got("A") === ((4L, 10.0, 3L, 0.75)))
    assert(got("B") === ((4L, 10.0, 2L, 0.5)))
  }

  test("sessionExactGraph equals a fresh exact kNN build exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val cached = Ann.sessionExactGraph(spark, sfDir)
    val fresh = Ann.knnGraph(emb)
    assert(cached.exceptAll(fresh).isEmpty &&
      fresh.exceptAll(cached).isEmpty)
    // second read serves the same store
    val again = Ann.sessionExactGraph(spark, sfDir)
    assert(again.exceptAll(fresh).isEmpty)
  }

  test("knn_snn_cluster: the SNN cut severs the hub bridge raw components keep") {
    // two triangles bridged by 3–4, plus the isolated pair 7–8:
    // bridge J = 0 (no shared neighbor) < 0.2 → cut; pair J = 0 → cut
    val g = graphDf(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L), (7L, 8L)))
    val got = Ann.knnSnnCluster(emptyEmb, graph = Some(g)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got === Map(1L -> ((2L, 2L, 0.25)), 3L -> ((2L, 6L, 0.75))))
    // contrast: the raw mutual graph is one 6-component + the pair
    val raw = Ann.knnComponents(emptyEmb, graph = Some(g)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw === Map(6L -> 1L, 2L -> 1L))
  }

  test("events_top_movers: lag deltas and the |Δ|-desc top-3 cut, by hand") {
    import spark.implicits._
    // one type, five active weeks: counts 10, 14, 5, 6, 26
    // deltas: +4, −9, +1, +20 → top3 = wk4(+20), wk2(−9), wk1(+4)
    val day = 86400000L
    val rows = Seq.tabulate(5)(w => (w, Seq(10, 14, 5, 6, 26)(w)))
      .flatMap { case (w, n) => (1 to n).map(i =>
        ((w * 7L + 1) * day * 1000L, s"e${w}_$i")) }
    val df = rows.zipWithIndex.map { case ((us, _), i) =>
      (i.toLong, new java.sql.Timestamp(us / 1000), 1L, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.queries.Analytics8.eventsTopMoversOn(df).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(1) === ((4L, 26L, 6L, 20L)))
    assert(got(2) === ((2L, 5L, 14L, -9L)))
    assert(got(3) === ((1L, 14L, 10L, 4L)))
  }

  test("q_ship_delay_profile replay vs plain-Scala sort on the sf corpus") {
    val got = graft.queries.Analytics8.qShipDelayProfile(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val epochDay = (c: String) =>
      expr(s"datediff($c, DATE'1970-01-01')").cast("long")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), epochDay("l_shipdate")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val om = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), epochDay("o_orderdate"),
        col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    li.flatMap { case (ok, ship) => om.get(ok).map { case (od, pri) =>
      pri -> (ship - od) } }
      .groupBy(_._1).foreach { case (pri, grp) =>
        val ds = grp.map(_._2).sorted
        def at(q: Double) = ds(math.ceil(q * ds.length).toInt - 1)
        assert(got(pri) === ((ds.length.toLong, at(0.5), at(0.9),
          at(0.99))), s"priority $pri")
      }
  }

  test("knn_edge_jaccard randomized replay vs plain-Scala neighborhoods") {
    for (trial <- 1 to 3) {
      val n = 30
      val es = (for {
        a <- 1 to n; b <- (a + 1) to n
        if rnd.nextInt(6) == 0
      } yield (a.toLong, b.toLong)).toSeq
      if (es.nonEmpty) {
        val got = Ann.knnEdgeJaccard(emptyEmb, graph = Some(graphDf(es)))
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        val nbrs = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val want = es.map { case (a, b) =>
          val cmn = (nbrs(a) & nbrs(b)).size
          val j = cmn.toDouble / (nbrs(a).size + nbrs(b).size - cmn)
          math.floor(10.0 * j).toLong
        }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        assert(got === want, s"trial $trial")
      }
    }
  }
}
