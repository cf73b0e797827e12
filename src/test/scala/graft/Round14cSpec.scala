package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.OrderedPrefix
import graft.queries.Analytics8

/** Round-14 wave 3: the distributed exclusive-prefix operator
  * ([[OrderedPrefix]]) and its three consumers — exact Gini, Lorenz
  * deciles, 2-D skyline. Ground truth is a plain-Scala sorted scan on
  * seeded random inputs plus worked-by-hand fixtures for every edge
  * the operator claims (tie classes, bucket collapse, NULL prefix at
  * the minimum, equal-price skyline dominance). */
class Round14cSpec extends AnyFunSuite with SparkFixture {

  private val rnd = new Random(1416)

  test("distinctPrefix: counts, exclusive count/mass prefixes, by hand") {
    import spark.implicits._
    val df = Seq(("a", 5L), ("a", 2L), ("a", 5L), ("a", 9L), ("a", 2L),
      ("b", 7L)).toDF("g", "v")
    val got = OrderedPrefix.distinctPrefix(df, Seq("g"), "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDecimal(4).longValueExact()))
      .toMap
    // a: 2×2 below 5; 2×2+2×5 below 9
    assert(got(("a", 2L)) === ((2L, 0L, 0L)))
    assert(got(("a", 5L)) === ((2L, 2L, 4L)))
    assert(got(("a", 9L)) === ((1L, 4L, 14L)))
    assert(got(("b", 7L)) === ((1L, 0L, 0L)))
  }

  test("distinctPrefix: exclusive max prefix, NULL at the group minimum") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10), ("a", 1L, 40), ("a", 3L, 20), ("a", 7L, 30))
      .toDF("g", "v", "m")
    val got = OrderedPrefix.distinctPrefix(df, Seq("g"), "v",
        maxCol = Some("m"))
      .collect()
      .map(r => r.getLong(1) ->
        (r.getInt(5), if (r.isNullAt(6)) -1 else r.getInt(6)))
      .toMap
    assert(got(1L) === ((40, -1))) // minimum: nothing below → NULL
    assert(got(3L) === ((20, 40)))
    assert(got(7L) === ((30, 40)))
  }

  test("distinctPrefix randomized replay vs plain-Scala sorted scan") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      // tiny bucket count forces multi-value buckets; heavy ties
      val rows = (1 to 300).map { _ =>
        (s"g${rnd.nextInt(3)}", rnd.nextInt(40).toLong, rnd.nextInt(100)) }
      val df = rows.toDF("g", "v", "m")
      val got = OrderedPrefix.distinctPrefix(df, Seq("g"), "v",
          maxCol = Some("m"), buckets = 7)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDecimal(4).longValueExact(),
            r.getInt(4 + 1), if (r.isNullAt(6)) None else Some(r.getInt(6))))
        .toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        grp.groupBy(_._2).foreach { case (v, tie) =>
          val below = grp.filter(_._2 < v)
          val want = (tie.size.toLong, below.size.toLong,
            below.map(_._2).sum,
            tie.map(_._3).max,
            if (below.isEmpty) None else Some(below.map(_._3).max))
          assert(got((g, v)) === want, s"trial $trial g=$g v=$v")
        }
      }
    }
  }

  test("gini: perfect equality → 0, single holder → (n−1)/n") {
    import spark.implicits._
    val eq = (1 to 8).map(i => ("S", 500.0, i.toLong))
      .toDF("c_mktsegment", "c_acctbal", "k").drop("k")
    val gEq = Analytics8.qAcctbalGiniOn(eq).collect().head
    assert(gEq.getDouble(3) === 0.0)
    // one customer holds everything that's positive-filtered in
    val one = (("S", 800.0) +: (1 to 7).map(_ => ("S", 0.01)))
      .toDF("c_mktsegment", "c_acctbal")
    val gOne = Analytics8.qAcctbalGiniOn(one).collect().head
    // near-total concentration: G ≈ (n−1)/n − tiny correction
    assert(gOne.getLong(1) === 8L && gOne.getDouble(3) > 0.87)
  }

  test("events_user_gini randomized replay vs plain-Scala rank formula") {
    import spark.implicits._
    val rows = (1 to 600).map { i =>
      val t = s"t${rnd.nextInt(2)}"
      // zipf-ish: a few heavy users
      val u = if (rnd.nextInt(4) == 0) rnd.nextInt(3).toLong
              else 10L + rnd.nextInt(100)
      (i.toLong, t, u)
    }
    val df = rows.toDF("event_id", "event_type", "user_id")
      .withColumn("ts", current_timestamp())
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val got = Analytics8.eventsUserGiniOn(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    rows.groupBy(_._2).foreach { case (t, grp) =>
      val counts = grp.groupBy(_._3).map(_._2.size.toLong).toSeq.sorted
      val n = counts.size
      val tot = counts.sum.toDouble
      val rs = counts.zipWithIndex.map { case (x, i) => (i + 1) * x.toDouble }.sum
      val want = BigDecimal(2 * rs / (n * tot) - (n + 1.0) / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(t)._1 === n.toLong)
      assert(math.abs(got(t)._2 - want) < 2e-4, s"type $t")
    }
  }

  test("q_acctbal_lorenz: decile landing mid-tie takes the exact partial") {
    import spark.implicits._
    // 10 customers all at 100.00 except two at 900.00: decile d rank
    // r=d; for d ≤ 8 boundary value 100, share = d·100/2600
    val cust = ((1 to 8).map(_ => ("S", 100.0)) ++ Seq(("S", 900.0), ("S", 900.0)))
      .toDF("c_mktsegment", "c_acctbal")
    val got = Analytics8.qAcctbalLorenzOn(cust).collect()
      .map(r => r.getInt(1) -> (r.getDouble(2), r.getDouble(3))).toMap
    for (dcl <- 1 to 8)
      assert(got(dcl) === ((100.0,
        BigDecimal(dcl * 100.0 / 2600.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)), s"d$dcl")
    assert(got(9) === ((900.0,
      BigDecimal((800.0 + 900.0) / 2600.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(10) === ((900.0, 1.0)))
  }

  test("q_part_skyline: dominance edges worked by hand") {
    import spark.implicits._
    val part = Seq(
      (1L, "p1", "B", "T", 10, 100.0), // frontier (cheapest)
      (2L, "p2", "B", "T", 15, 200.0), // frontier (bigger, dearer)
      (3L, "p3", "B", "T", 10, 200.0), // dominated by p1 (same size, dearer)
      (4L, "p4", "B", "T", 15, 200.0), // duplicate point of p2 — survives
      (5L, "p5", "B", "T", 12, 300.0), // dominated by p2
      (6L, "p6", "B", "T", 20, 300.0)  // frontier
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice")
    val got = Analytics8.qPartSkylineOn(part).collect()
      .map(r => (r.getDouble(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === Map((100.0, 10) -> 1L, (200.0, 15) -> 2L,
      (300.0, 20) -> 1L))
  }

  test("skyline randomized replay vs quadratic dominance scan") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val rows = (1 to 200).map { i =>
        (i.toLong, s"p$i", "B", "T", rnd.nextInt(15) + 1,
          (rnd.nextInt(50) + 1) * 10.0) }
      val df = rows.toDF("p_partkey", "p_name", "p_brand", "p_type",
        "p_size", "p_retailprice")
      val got = Analytics8.qPartSkylineOn(df).collect()
        .map(r => (r.getDouble(0), r.getInt(1))).toSet
      val pts = rows.map(r => (r._6, r._5)).distinct
      val want = pts.filter { case (pr, sz) =>
        !pts.exists { case (pr2, sz2) =>
          (pr2 <= pr && sz2 >= sz) && (pr2 < pr || sz2 > sz) } }.toSet
      assert(got === want, s"trial $trial")
    }
  }
}
