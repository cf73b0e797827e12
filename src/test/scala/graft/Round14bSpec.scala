package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankSelect
import graft.queries.Analytics8

/** Round-14 wave 2: WEIGHTED exact selection — the rank over the
  * weight-expanded multiset computed without the expansion — and its
  * two consumers (quantity-weighted median price, winsorized mean).
  * The ground truth here is the literal expansion: every weighted
  * call is replayed against [[RankSelect.selectValues]] over rows
  * repeated weight times, on seeded random inputs. */
class Round14bSpec extends AnyFunSuite with SparkFixture {

  private val rnd = new Random(1415)

  test("selectValuesWeighted: worked-by-hand weighted median") {
    import spark.implicits._
    // g=a: expanded multiset 1,1,1,5,9,9 (w: 3,1,2) → W=6, rank 3 → 1
    // g=b: 2 w4, 7 w1 → W=5, rank 3 → 2
    val df = Seq(("a", 1.0, 3L), ("a", 5.0, 1L), ("a", 9.0, 2L),
      ("b", 2.0, 4L), ("b", 7.0, 1L)).toDF("g", "v", "w")
    val got = RankSelect.selectValuesWeighted(df, Seq("g"), "v", "w",
        RankSelect.lowMedian)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got === Map("a" -> 1.0, "b" -> 2.0))
  }

  test("selectValuesWeighted ≡ selectValues on the expanded multiset (random)") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val rows = (1 to 400).map { _ =>
        val g = s"g${rnd.nextInt(4)}"
        // heavy ties: values from a small set so tie classes span ranks
        (g, rnd.nextInt(12).toDouble, rnd.nextInt(5).toLong) // w ∈ 0..4
      }
      val df = rows.toDF("g", "v", "w")
      val expanded = rows.flatMap { case (g, v, w) =>
        Seq.fill(w.toInt)((g, v)) }.toDF("g", "v")
      val ranks: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        n => array(lit(1L),
          ((n + lit(1L)) / lit(2L)).cast("long"), n.cast("long"))
      val got = RankSelect.selectValuesWeighted(df, Seq("g"), "v", "w", ranks)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2))
        .toMap
      val want = RankSelect.selectValues(expanded, Seq("g"), "v", ranks)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2))
        .toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("selectValuesWeighted: zero-weight rows shift no rank, never selected") {
    import spark.implicits._
    // zero-weight 99.0 sits above every positive-weight value; the
    // median of the expanded multiset (1,1,3) ignores it entirely
    val df = Seq(("a", 1.0, 2L), ("a", 3.0, 1L), ("a", 99.0, 0L))
      .toDF("g", "v", "w")
    val got = RankSelect.selectValuesWeighted(df, Seq("g"), "v", "w",
      RankSelect.lowMedian).collect()
    assert(got.length === 1 && got.head.getDouble(2) === 1.0)
  }

  test("q_price_weighted_median: bulk-cheap lines pull the weighted median down") {
    import spark.implicits._
    // flag A: cheap line carries qty 8, expensive lines qty 1 each —
    // row median 50 (ranks: 10,50,90 → rank 2), weighted median over
    // 10 units (8×10, 1×50, 1×90) rank (10+1)/2=5 → 10
    val li = Seq(
      ("A", 10.0, 8.0), ("A", 50.0, 1.0), ("A", 90.0, 1.0),
      ("B", 20.0, 1.0), ("B", 40.0, 1.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val got = Analytics8.qPriceWeightedMedianOn(li).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got("A") === ((3L, 10L, 50.0, 10.0)))
    assert(got("B") === ((2L, 2L, 20.0, 20.0)))
  }

  test("q_order_value_deciles: ties land together; randomized replay") {
    import spark.implicits._
    import graft.queries.Analytics8
    // all-tied corpus: every boundary equals v → ONE band holds all
    val tied = (1 to 10).map(_ => 50.0).toDF("o_totalprice")
    val gotTied = Analytics8.qOrderValueDecilesOn(tied).collect()
    assert(gotTied.length === 1 && gotTied.head.getInt(0) === 1 &&
      gotTied.head.getLong(1) === 10L)
    // randomized replay vs plain-Scala banding
    for (trial <- 1 to 2) {
      val vals = (1 to 300).map(_ => (rnd.nextInt(40) + 1) * 1.0)
      val got = Analytics8.qOrderValueDecilesOn(vals.toDF("o_totalprice"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1),
          r.getDouble(2))).toMap
      val cents = vals.map(v => math.round(v * 100)).sorted
      val n = cents.length
      val bounds = (1 to 9).map(d => cents(math.ceil(d * n / 10.0).toInt - 1))
      val want = vals.map(v => math.round(v * 100))
        .groupBy(c => 1 + bounds.count(_ < c))
        .map { case (b, g) => b -> ((g.size.toLong,
          BigDecimal(g.sum) / 100)) }
      assert(got.keySet === want.keySet, s"trial $trial")
      want.foreach { case (b, (cnt, rev)) =>
        assert(got(b)._1 === cnt && BigDecimal(got(b)._2) ===
          rev.setScale(2), s"trial $trial band $b") }
    }
  }

  test("events_value_winsorized randomized replay vs plain-Scala clamp") {
    import spark.implicits._
    val rows = (1 to 500).map { i =>
      val t = s"t${rnd.nextInt(3)}"
      // cents-valued like the events table; a fat tail every ~20 rows
      val v = if (rnd.nextInt(20) == 0) 900.0 + rnd.nextInt(100)
              else rnd.nextInt(5000) / 100.0
      (i.toLong, t, v)
    }
    val df = rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", current_timestamp())
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val got = Analytics8.eventsValueWinsorizedOn(df).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._2).foreach { case (t, grp) =>
      val vs = grp.map(_._3).sorted
      val n = vs.length
      val lo = vs(math.ceil(0.1 * n).toInt - 1)
      val hi = vs(math.ceil(0.9 * n).toInt - 1)
      val wmean = vs.map(v => BigDecimal(math.max(lo, math.min(hi, v)))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum / n
      val r = got(t)
      assert(r.getLong(1) === n.toLong)
      assert(r.getDouble(2) === lo && r.getDouble(3) === hi)
      assert(math.abs(r.getDouble(5) -
        wmean.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"type $t")
    }
  }
}
