package graft

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Analytics5, Analytics6}

/** Randomized plain-Scala replays for the round-13 math-bearing
  * operators (the r12 optional-depth pattern): a THIRD independent
  * implementation — seeded random data, the expected table recomputed
  * with Scala collections, compared against the Spark result. The
  * DuckDB gate proves engine agreement; these prove the MATH, on
  * inputs neither fixture authors nor the driver tables chose.
  *
  * Rounded 4dp outputs are compared with a ±5.1e-5 tolerance: the
  * replay's double-sum association order legitimately differs from
  * Spark's, and equality at the rounding boundary is not part of the
  * operator contract (the oracle gate pins THAT, where both engines
  * share one expression tree).
  */
class Round13ReplaySpec extends AnyFunSuite with SparkFixture {

  private val rnd = new Random(42)

  private def close(got: Double, exp: Double, tol: Double = 5.1e-5)
      : Boolean = math.abs(got - exp) <= tol

  test("q_price_elasticity replay: OLS moments on 2000 random lines") {
    import spark.implicits._
    val lines = Seq.fill(2000)((rnd.nextInt(40).toLong + 1,
      rnd.nextInt(11) / 100.0, (rnd.nextInt(50) + 1).toDouble))
    val parts = (1L to 40L).map(p => (p, s"B${p % 5}"))
    val li = lines.toDF("l_partkey", "l_discount", "l_quantity")
    val pt = parts.toDF("p_partkey", "p_brand")
    val got = Analytics5.qPriceElasticityOn(li, pt).collect()
      .map(r => r.getString(0) -> r).toMap
    val brandOf = parts.toMap
    val byBrand = lines.groupBy { case (p, _, _) => brandOf(p) }
    assert(got.keySet === byBrand.keySet)
    for ((brand, ls) <- byBrand) {
      val xs = ls.map { case (_, d, _) => math.round(d * 100) }
      val ys = ls.map { case (_, _, q) => q.toLong }
      val n = ls.size.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val syy = ys.map(y => y * y).sum
      val cov = (n * sxy - sx * sy).toDouble
      val varx = (n * sxx - sx * sx).toDouble
      val vary = (n * syy - sy * sy).toDouble
      val r = got(brand)
      assert(r.getLong(1) === n)
      assert(close(r.getDouble(2), sx.toDouble / n / 100.0))
      assert(close(r.getDouble(3), sy.toDouble / n))
      assert(close(r.getDouble(4), cov * 100.0 / varx, 2e-3))
      assert(close(r.getDouble(5), cov / math.sqrt(varx * vary)))
    }
  }

  test("q_supplier_hhi replay: decimal revenue shares on random lines") {
    import spark.implicits._
    val lines = Seq.fill(1500)((rnd.nextInt(20).toLong + 1,
      math.round(rnd.nextDouble() * 99999) / 100.0,
      rnd.nextInt(11) / 100.0))
    val sups = (1L to 20L).map(s => (s, s % 4 + 1))
    val nats = (1L to 4L).map(n => (n, s"N$n"))
    val got = Analytics5.qSupplierHhiOn(
      lines.toDF("l_suppkey", "l_extendedprice", "l_discount"),
      sups.toDF("s_suppkey", "s_nationkey"),
      nats.toDF("n_nationkey", "n_name")).collect()
      .map(r => r.getString(0) -> r).toMap
    val natOf = sups.toMap
    def disc(p: Double, d: Double): BigDecimal =
      (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        * (BigDecimal(1).setScale(2)
          - BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val bySup = lines.groupBy(_._1).map { case (s, ls) =>
      (s, ls.map(l => disc(l._2, l._3)).sum)
    }
    val byNat = bySup.groupBy { case (s, _) => s"N${natOf(s)}" }
    assert(got.keySet === byNat.keySet)
    for ((nat, supRevs) <- byNat) {
      val tot = supRevs.values.sum
      val hhi = supRevs.values
        .map(r => math.pow((r / tot).toDouble, 2)).sum
      val r = got(nat)
      assert(r.getLong(1) === supRevs.size.toLong)
      assert(close(r.getDouble(2), tot.toDouble, 0.01))
      assert(close(r.getDouble(3), hhi))
      assert(close(r.getDouble(4), 1.0 / hhi, 2e-3))
      assert(close(r.getDouble(5),
        (supRevs.values.max / tot).toDouble))
    }
  }

  test("events_streaks replay: islands on 300 random user-day sets") {
    import spark.implicits._
    val userDays = (1L to 300L).map { u =>
      u -> Seq.fill(rnd.nextInt(12) + 1)(rnd.nextInt(20).toLong + 1)
        .distinct.sorted
    }
    val ev = userDays.flatMap { case (u, days) =>
      days.map(d => (u, new Timestamp(d * 86400000L +
        rnd.nextInt(86400000))))
    }.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "ts")
    val got = Analytics6.eventsStreaksOn(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def streaks(days: Seq[Long]): Seq[Long] =
      days.foldLeft(List.empty[(Long, Long)]) {
        case ((start, len) :: tail, d) if d == start + len =>
          (start, len + 1) :: tail
        case (acc, d) => (d, 1L) :: acc
      }.map(_._2)
    val all = userDays.flatMap { case (_, days) => streaks(days) }
    val best = userDays.map { case (_, days) => streaks(days).max }
    val expHist = all.groupBy(identity).map { case (l, g) =>
      l -> g.size.toLong }
    val expBest = best.groupBy(identity).map { case (l, g) =>
      l -> g.size.toLong }
    assert(got.keySet === expHist.keySet)
    for ((len, (nStreaks, nBest)) <- got) {
      assert(nStreaks === expHist(len))
      assert(nBest === expBest.getOrElse(len, 0L))
    }
  }

  test("events_transition_entropy replay: 200 random user walks") {
    import spark.implicits._
    val types = Vector("a", "b", "c", "d")
    val walks = (1L to 200L).map { u =>
      u -> Seq.fill(rnd.nextInt(15) + 2)(types(rnd.nextInt(4)))
    }
    val ev = walks.flatMap { case (u, w) =>
      w.zipWithIndex.map { case (t, i) =>
        (u * 1000 + i, u, new Timestamp(i * 60000L), t) }
    }.toDF("event_id", "user_id", "ts", "event_type")
    val got = Analytics5.eventsTransitionEntropyOn(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val pairs = walks.flatMap { case (_, w) => w.zip(w.tail) }
    val byFrom = pairs.groupBy(_._1)
    assert(got.keySet === byFrom.keySet)
    for ((from, ps) <- byFrom) {
      val counts = ps.groupBy(_._2).map { case (t, g) =>
        t -> g.size.toLong }
      val n = counts.values.sum
      def log2(x: Double) = math.log(x) / math.log(2.0)
      val h = log2(n.toDouble) -
        counts.values.map(c => c * log2(c.toDouble)).sum / n
      val mx = counts.values.max
      val top = counts.filter(_._2 == mx).keys.min
      val r = got(from)
      assert(r.getLong(1) === n && r.getLong(2) === counts.size.toLong)
      assert(close(r.getDouble(3), h))
      assert(r.getString(4) === top)
      assert(close(r.getDouble(5), mx.toDouble / n))
    }
  }

  test("q_join_cardinality replay: product sums on random key bags") {
    import spark.implicits._
    val ka = Seq.fill(800)(rnd.nextInt(60).toLong)
    val kb = Seq.fill(1200)(rnd.nextInt(80).toLong)
    val got = graft.queries.Analytics7.joinCardinality("r",
      ka.toDF("k"), "k", kb.toDF("k"), "k").collect().head
    val ca = ka.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val cb = kb.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val common = ca.keySet & cb.keySet
    val prods = common.map(k => k -> ca(k) * cb(k)).toMap
    val est = prods.values.sum
    val mx = prods.values.max
    assert(got.getLong(1) === 800L && got.getLong(2) === 1200L)
    assert(got.getLong(3) === common.size.toLong)
    assert(got.getDouble(4) === est.toDouble)
    assert(close(got.getDouble(5), est.toDouble / 1200.0))
    assert(got.getLong(6) === prods.filter(_._2 == mx).keys.min)
    assert(close(got.getDouble(7), mx.toDouble / est))
  }
}
