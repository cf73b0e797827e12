package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Analytics3

/** Randomized plain-Scala replay cross-checks for the r11 analytics
  * trio (VERDICT r11 #8): events_attribution, events_lifecycle,
  * events_forecast_baseline. Same treatment as the
  * Round11PropertiesSpec replays — an independent sequential
  * re-derivation over randomized inputs, compared exactly. */
class Round12PropertiesSpec extends AnyFunSuite with SparkFixture {

  private def r4(d: Double) = BigDecimal(d)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  private def tsOf(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("events_lifecycle equals a plain-Scala replay on random " +
    "activity patterns") {
    import spark.implicits._
    val rnd = new scala.util.Random(1201)
    val base = 1704067200L // 2024-01-01 in seconds
    // 40 users: steady weekly actives, gappy resurrectors, one-shots
    val rows = (0 until 40).flatMap { u =>
      val weeks = u % 3 match {
        case 0 => (0 until 10).toSeq // every week
        case 1 => Seq(0, 1, 4, 5, 9) // churn + resurrection
        case 2 => Seq(rnd.nextInt(10)) // one-shot
      }
      weeks.flatMap { wk =>
        (0 to rnd.nextInt(2)).map { i =>
          (u.toLong * 1000 + wk * 10 + i, u.toLong, "view", 1.0,
            tsOf(base + wk * 604800L + rnd.nextInt(604800)), """{"k":1}""")
        }
      }
    }
    val events = rows
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Analytics3.eventsLifecycleOn(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // replay: per user the sorted distinct active weeks, then the
    // weekly accounting with the gap-aware churn rule
    val act = rows.map(e => (e._2, e._5.getTime / 1000 / 604800))
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val status = act.toSeq.flatMap { case (_, weeks) =>
      weeks.zipWithIndex.map { case (wk, i) =>
        val st = if (i == 0) "new"
          else if (weeks(i - 1) == wk - 1) "retained"
          else "resurrected"
        (wk, st)
      }
    }
    val weekly = status.groupBy(_._1).view.mapValues { sts =>
      (sts.size.toLong,
        sts.count(_._2 == "new").toLong,
        sts.count(_._2 == "retained").toLong,
        sts.count(_._2 == "resurrected").toLong)
    }.toMap
    val sortedWeeks = weekly.keys.toSeq.sorted
    val expect = sortedWeeks.zipWithIndex.map { case (wk, i) =>
      val (na, nn, nr, nz) = weekly(wk)
      val churn =
        if (i == 0) 0L
        else {
          val (pa, _, _, _) = weekly(sortedWeeks(i - 1))
          if (sortedWeeks(i - 1) == wk - 1) pa - nr else pa
        }
      val qr = if (churn > 0) r4((nn + nz).toDouble / churn) else 0.0
      wk -> ((na, nn, nr, nz, churn, qr))
    }.toMap
    assert(out === expect)
    // the planted regimes exercised every branch
    assert(out.values.map(_._4).sum > 0, "no resurrections planted")
    assert(out.values.map(_._5).sum > 0, "no churn planted")
  }

  test("events_forecast_baseline equals a plain-Scala replay on a " +
    "random sparse stream") {
    import spark.implicits._
    val rnd = new scala.util.Random(1202)
    val base = 1704067200L
    val types = Seq("view", "purchase", "error")
    // ~3 weeks of sparse traffic with dead hours and a weekly rhythm:
    // type 'view' is strongly seasonal (same hours each week), the
    // others are noise
    val rows = (0 until 2000).map { i =>
      val t = types(rnd.nextInt(3))
      val hour =
        if (t == "view") (i % 3) * 168L + Seq(9, 12, 18)(rnd.nextInt(3))
        else rnd.nextInt(3 * 168).toLong
      (i.toLong, rnd.nextInt(50).toLong, t, 1.0,
        tsOf(base + hour * 3600L + rnd.nextInt(3600)), """{"k":1}""")
    }
    val events = rows
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Analytics3.eventsForecastBaselineOn(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // replay over the dense global [min,max] hour grid
    val counts = rows.groupBy(e => (e._3, e._5.getTime / 1000 / 3600))
      .view.mapValues(_.size.toLong).toMap
    val hours = counts.keys.map(_._2)
    val (h0, h1) = (hours.min, hours.max)
    val expect = types.map { t =>
      val dense = (h0 to h1).map(h => counts.getOrElse((t, h), 0L))
      val scored = (168 until dense.size).map { i =>
        (dense(i), dense(i - 168), dense(i - 1))
      }
      val n = scored.size.toLong
      val se = scored.map { case (y, s, _) => math.abs(y - s) }.sum
      val pe = scored.map { case (y, _, p) => math.abs(y - p) }.sum
      t -> ((n, r4(se.toDouble / n), r4(pe.toDouble / n),
        if (pe > 0) r4(se.toDouble / pe) else 0.0))
    }.toMap
    assert(out === expect)
    // seasonality is real: the seasonal forecast beats persistence on
    // the planted rhythmic type
    assert(out("view")._4 < 1.0, s"view skill ${out("view")._4}")
  }

  test("events_attribution equals a plain-Scala replay on random " +
    "journeys") {
    import spark.implicits._
    val rnd = new scala.util.Random(1203)
    val base = 1704067200L
    val touchTypes = Seq("view", "click", "signup")
    val horizon = 168L * 3600L
    // 30 users, journeys with in-window touches, out-of-window decoys
    // (8+ days before), direct purchases, and same-second ties
    val rows = (0 until 30).flatMap { u =>
      val n = 5 + rnd.nextInt(15)
      var t = base + rnd.nextInt(86400)
      (0 until n).map { i =>
        t += (rnd.nextInt(4) match {
          case 0 => 0L // same-second tie with the previous event
          case 1 => 9L * 86400L // hop past the lookback horizon
          case _ => rnd.nextInt(43200).toLong + 1L
        })
        val et = if (rnd.nextInt(3) == 0) "purchase"
          else touchTypes(rnd.nextInt(3))
        (u.toLong * 1000 + i, u.toLong, et,
          (rnd.nextInt(10000) + 1).toDouble / 100.0, tsOf(t), """{"k":1}""")
      }
    }
    val events = rows
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Analytics3.eventsAttributionOn(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // replay: per purchase scan the user's events in [t-168h, t-1s],
    // first/last touch by the (tsec, event_id) total order; money sums
    // as exact cents
    val byUser = rows.groupBy(_._2)
    val cells = byUser.values.toSeq.flatMap { evs =>
      evs.filter(_._3 == "purchase").map { p =>
        val pt = p._5.getTime / 1000
        val touches = evs.filter(e => e._3 != "purchase" && {
          val et = e._5.getTime / 1000
          et >= pt - horizon && et <= pt - 1
        })
        val key = (e: (Long, Long, String, Double, java.sql.Timestamp,
          String)) => (e._5.getTime / 1000, e._1)
        val ft = if (touches.isEmpty) "(direct)"
          else touches.minBy(key)._3
        val lt = if (touches.isEmpty) "(direct)"
          else touches.maxBy(key)._3
        (ft, lt, BigDecimal(p._4).setScale(2,
          BigDecimal.RoundingMode.HALF_UP))
      }
    }
    val typesSeen = (cells.map(_._1) ++ cells.map(_._2)).distinct
    val expect = typesSeen.map { t =>
      val f = cells.filter(_._1 == t)
      val l = cells.filter(_._2 == t)
      t -> ((f.size.toLong, l.size.toLong,
        f.map(_._3).sum.toDouble + 0.0, l.map(_._3).sum.toDouble + 0.0))
    }.toMap
    assert(out === expect)
    // the regimes landed: both direct and touched conversions exist
    assert(out.contains("(direct)") && out.size > 1)
  }
}
