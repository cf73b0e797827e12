package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Analytics3

/** Plain-Scala replays of the session-4 analytics ops over the real
  * sf0.001 tables (the randomized-cross-check convention: an
  * independent reference implementation, not a second copy of the
  * Spark plan), plus degenerate-case fixtures.
  */
class Analytics3Spec extends AnyFunSuite with SparkFixture {

  test("events_new_users equals a plain-Scala first-seen replay") {
    val out = Analytics3.eventsNewUsers(spark, sfDir)
      .orderBy("day_n")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    val epoch = java.time.LocalDate.parse("1990-01-01")
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate))
    val firstDay = events.groupBy(_._1).map { case (_, rows) =>
      rows.map(r => java.time.temporal.ChronoUnit.DAYS
        .between(epoch, r._2)).min
    }.toSeq
    val daily = firstDay.groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy(_._1)
    val total = firstDay.size.toLong
    var cum = 0L
    val expect = daily.map { case (d, n) =>
      cum += n
      (d, n.toLong, cum,
        BigDecimal(cum.toDouble / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(out.toSeq === expect)
    // the curve's invariants: monotone, lands exactly on the population
    assert(out.last._3 === total)
    assert(out.last._4 === 1.0)
  }

  test("q_order_gaps equals a plain-Scala cadence replay") {
    val out = Analytics3.qOrderGaps(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toMap

    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val expect = orders.groupBy(_._1).collect {
      case (ck, rows) if rows.length >= 2 =>
        val sorted = rows.sortBy(r => (r._3.toEpochDay, r._2))
        val gaps = sorted.sliding(2)
          .map(p => p(1)._3.toEpochDay - p(0)._3.toEpochDay).toSeq
        val span = sorted.last._3.toEpochDay - sorted.head._3.toEpochDay
        val mean = BigDecimal(span.toDouble / (rows.length - 1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        // mean-gap-from-span really is the mean of the lag gaps: the
        // gap sum telescopes to the span on every customer
        assert(gaps.sum === span)
        ck -> ((rows.length.toLong, span, mean, gaps.max))
    }
    assert(out === expect)
  }

  test("q_discount_effect equals a plain-Scala Pearson from the same sums") {
    val out = Analytics3.qDiscountEffect(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

    val brandOf = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_discount"), col("l_quantity"))
      .collect()
      .map(r => (brandOf(r.getLong(0)),
        math.round(r.getDouble(1) * 100), r.getDouble(2).toLong))
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = li.groupBy(_._1).map { case (b, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum.toDouble
      val sy = rows.map(_._3).sum.toDouble
      val sxy = rows.map(r => r._2 * r._3).sum.toDouble
      val sx2 = rows.map(r => r._2 * r._2).sum.toDouble
      val sy2 = rows.map(r => r._3 * r._3).sum.toDouble
      val varx = n * sx2 - sx * sx
      val vary = n * sy2 - sy * sy
      val corr = if (varx > 0 && vary > 0)
        r4((n * sxy - sx * sy) / (math.sqrt(varx) * math.sqrt(vary)))
      else 0.0
      b -> ((rows.length.toLong, r4(sx / n), r4(sy / n), corr))
    }
    assert(out === expect)
    // correlations are genuine values, not all the 0.0 sentinel
    assert(out.values.exists(_._4 != 0.0))
  }

  test("q_fulfillment_lag equals a plain-Scala distribution replay") {
    val out = Analytics3.qFulfillmentLag(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))
      .toMap

    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate").cast("date"),
        col("o_orderpriority"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDate(1).toLocalDate, r.getString(2))))
      .toMap
    val lags = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate").cast("date"))
      .collect()
      .map { r =>
        val (od, prio) = orders(r.getLong(0))
        prio -> (r.getDate(1).toLocalDate.toEpochDay - od.toEpochDay)
      }
    val expect = lags.groupBy(_._1).map { case (prio, rows) =>
      val v = rows.map(_._2).sorted
      val n = v.length
      // exact LOWER median: the element at 1-based rank ceil(n/2)
      val med = v((n + 1) / 2 - 1)
      val mean = BigDecimal(v.sum.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      prio -> ((n.toLong, mean, med, v.head, v.last))
    }
    assert(out === expect)
  }

  test("q_discount_effect pins zero-variance groups to the 0.0 sentinel") {
    import spark.implicits._
    // one brand all at the same discount (zero x-variance), one brand
    // with a perfect positive discount→quantity line (corr exactly 1)
    val li = Seq(
      (1L, 0.05, 10.0), (1L, 0.05, 20.0), (1L, 0.05, 30.0),
      (2L, 0.01, 10.0), (2L, 0.02, 20.0), (2L, 0.03, 30.0)
    ).toDF("l_partkey", "l_discount", "l_quantity")
    val part = Seq((1L, "FLAT"), (2L, "LINE")).toDF("p_partkey", "p_brand")
    val m = Analytics3.qDiscountEffectOn(li, part).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(m("FLAT") === 0.0)
    assert(m("LINE") === 1.0)
  }

  test("q_cohort_ltv equals a plain-Scala cohort replay") {
    val out = Analytics3.qCohortLtv(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5))))
      .toMap

    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        r.getDouble(3)))
    val cohortOf = events.groupBy(_._1).map { case (u, rows) =>
      u -> rows.map(_._2).minBy(_.getTime)
    }
    val sizes = cohortOf.values.groupBy(identity).view.mapValues(_.size)
    val cells = events.filter(_._3 == "purchase")
      .groupBy { case (u, wk, _, _) =>
        val cw = cohortOf(u)
        (cw, ((wk.getTime - cw.getTime) / (7L * 86400000L)).toInt)
      }
      .map { case (k, rows) =>
        k -> rows.map(r => BigDecimal(r._4).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum
      }
    val expect = cells.groupBy(_._1._1).flatMap { case (cw, cs) =>
      val sorted = cs.toSeq.sortBy(_._1._2)
      var cum = BigDecimal(0)
      sorted.map { case ((_, wn), rev) =>
        cum += rev
        val n = sizes(cw).toLong
        (cw, wn) -> ((rev.toDouble, cum.toDouble, n,
          BigDecimal(cum.toDouble / n).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    assert(out === expect)
  }

  test("events_bot_profile flags metronome cadence, spares humans") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(ms: Long) = new java.sql.Timestamp(base + ms)
    // user 1: 25 events exactly 60 s apart (scripted client)
    val bot = (0 until 25).map(i =>
      (1000L + i, ts(i * 60000L), 1L, "view", 0.0, "{}"))
    // user 2: 25 events with wildly irregular gaps
    val gaps2 = Seq(1L, 50L, 3L, 400L, 7L, 1000L, 2L, 90L, 13L, 700L,
      5L, 300L, 1L, 60L, 21L, 900L, 4L, 150L, 9L, 500L, 6L, 45L, 30L, 80L)
    val t2 = gaps2.scanLeft(0L)(_ + _)
    val human = t2.zipWithIndex.map { case (sec, i) =>
      (2000L + i, ts(sec * 1000L), 2L, "view", 0.0, "{}") }
    // user 3: perfectly regular but only 5 events (below minEvents)
    val lowVol = (0 until 5).map(i =>
      (3000L + i, ts(i * 60000L), 3L, "view", 0.0, "{}"))
    val events = (bot ++ human ++ lowVol)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("bot_")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Analytics3.eventsBotProfile(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out(1L)._2 === 0.0)          // zero gap variation
    assert(out(1L)._3 === true)
    assert(out(2L)._2 > 0.2)            // heavy-tailed human cadence
    assert(out(2L)._3 === false)
    assert(out(3L)._2 === 0.0)          // regular but low volume
    assert(out(3L)._3 === false)
  }

  test("q_order_gaps: same-date orders tie-break cleanly to a zero gap") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val orders = Seq(
      (11L, 1L, ts("2024-03-01 00:00:00")),
      (12L, 1L, ts("2024-03-01 00:00:00")), // same day: gap 0
      (13L, 1L, ts("2024-03-11 00:00:00")),
      (21L, 2L, ts("2024-05-05 00:00:00"))  // single order: filtered
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val rows = Analytics3.qOrderGapsOn(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.toSeq === Seq((1L, 3L, 10L, 5.0, 10L)))
  }
}
