package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankSelect
import graft.queries.{Analytics2, Analytics5}

/** Round-14 wave 1: the distributed exact-selection operator
  * ([[RankSelect]]) that retires the repo's last single-task-per-group
  * sorted windows (the r13 verdict's top task), and the equality of the
  * three rewritten consumers (events_value_outliers, q_median_order,
  * events_rfm) against their old window constructions — replayed here
  * as plain sort-based references on seeded random inputs the fixtures
  * didn't choose. */
class Round14Spec extends AnyFunSuite with SparkFixture {

  private val rnd = new Random(1414)

  // --- RankSelect worked-by-hand fixtures ---

  test("selectValues: low median per group, worked by hand") {
    import spark.implicits._
    val df = Seq(
      ("a", 5.0), ("a", 1.0), ("a", 3.0), ("a", 2.0), ("a", 4.0), // med 3
      ("b", 10.0), ("b", 10.0), ("b", 1.0),                       // med 10
      ("c", 7.0),                                                 // med 7
      ("d", 4.0), ("d", 2.0), ("d", 6.0), ("d", 8.0),             // med 4
      ("e", 2.0), ("e", 2.0), ("e", 2.0), ("e", 2.0)              // med 2
    ).toDF("g", "v")
    val got = RankSelect.selectValues(df, Seq("g"), "v", RankSelect.lowMedian)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got === Map("a" -> 3.0, "b" -> 10.0, "c" -> 7.0,
      "d" -> 4.0, "e" -> 2.0))
  }

  test("selectValues: multiple ranks (min and max) per group") {
    import spark.implicits._
    val df = Seq(("a", 5L), ("a", 1L), ("a", 3L), ("b", -2L), ("b", 9L))
      .toDF("g", "v")
    val got = RankSelect.selectValues(df, Seq("g"), "v",
        n => array(lit(1L), n.cast("long")))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(("a", 0) -> 1L, ("a", 1) -> 5L,
      ("b", 0) -> -2L, ("b", 1) -> 9L))
  }

  test("selectValues is exact where the double image collapses (2^63 longs)") {
    import spark.implicits._
    // three adjacent Long.MaxValue-area values share one double image —
    // the bucket collapses, the in-bucket distinct-value pass resolves
    val df = Seq(Long.MaxValue, Long.MaxValue - 1, Long.MaxValue - 2)
      .toDF("v").withColumn("g", lit("x"))
    val got = RankSelect.selectValues(df, Seq("g"), "v", RankSelect.lowMedian)
      .collect()
    assert(got.length === 1 && got.head.getLong(2) === Long.MaxValue - 1)
  }

  test("selectValues: tiny bucket count still exact (multi-value buckets)") {
    import spark.implicits._
    val vals = Seq.fill(500)(rnd.nextInt(1000).toDouble)
    val df = vals.map(("g", _)).toDF("g", "v")
    val exp = vals.sorted.apply((vals.size + 1) / 2 - 1)
    val got = RankSelect.selectValues(df, Seq("g"), "v",
      RankSelect.lowMedian, buckets = 2).collect()
    assert(got.length === 1 && got.head.getDouble(2) === exp)
  }

  test("selectValues randomized replay vs plain-Scala sort (spread + tied)") {
    import spark.implicits._
    for (tied <- Seq(false, true)) {
      val rows = Seq.tabulate(2000) { i =>
        val g = s"g${i % 7}"
        val v = if (tied) rnd.nextInt(6).toDouble
                else rnd.nextDouble() * 200 - 100
        (g, v)
      }
      val got = RankSelect.selectValues(rows.toDF("g", "v"), Seq("g"), "v",
          RankSelect.lowMedian)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      val exp = rows.groupBy(_._1).map { case (g, gs) =>
        val s = gs.map(_._2).sorted
        g -> s((s.size + 1) / 2 - 1)
      }
      assert(got === exp, s"tied=$tied")
    }
  }

  test("selectRowsTied matches ntile boundary rows (heavy ties, small n)") {
    import spark.implicits._
    for (n <- Seq(1, 2, 3, 4, 5, 7, 1000)) {
      val rows = Seq.tabulate(n)(i => (rnd.nextInt(4).toLong, i.toLong))
      val df = rows.toDF("v", "uid")
      val quintile: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => array((1 to 4).map { t =>
          lit(t.toLong) * (c / lit(5L)).cast("long") +
            least(lit(t.toLong), c % lit(5L))
        }: _*)
      val bounds = RankSelect.selectRowsTied(df, Nil, "v", "uid", quintile)
        .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
        .toMap
      // reference: the rank-cum(t) row of the (v, uid) sort
      val sorted = rows.sorted
      val (q, m) = (n / 5, n % 5)
      val exp = (1 to 4).map(t => (t - 1) ->
        sorted(t * q + math.min(t, m) - 1)).toMap
      assert(bounds === exp, s"n=$n")
    }
  }

  test("events_value_percentiles: randomized replay vs plain-Scala sort") {
    import spark.implicits._
    val ev = Seq.tabulate(2500)(i =>
      (s"t${i % 3}", rnd.nextDouble() * 100)).toDF("event_type", "value")
    val got = graft.queries.Analytics7.eventsValuePercentilesOn(ev)
      .collect().map(r => r.getString(0) -> r).toMap
    val rows = ev.collect().map(r => (r.getString(0), r.getDouble(1)))
    for ((t, xs0) <- rows.groupBy(_._1)) {
      val xs = xs0.map(_._2).sorted
      val r = got(t)
      assert(r.getLong(1) === xs.length.toLong)
      for ((q, i) <- Seq(0.25, 0.5, 0.75, 0.9, 0.99).zipWithIndex) {
        val exp = xs(math.ceil(q * xs.length).toInt - 1)
        assert(r.getDouble(i + 2) === exp, s"$t q=$q")
      }
    }
  }

  test("events_value_trimmed: boundary ties trim exactly l copies") {
    import spark.implicits._
    // n=20 → l=1: one of the three tied 1.0s and the single 100.0 go
    val vals = Seq(1.0, 1.0, 1.0, 9.0, 9.0, 100.0) ++ Seq.fill(14)(5.0)
    val ev = vals.map(("x", _)).toDF("event_type", "value")
    val r = graft.queries.Analytics7.eventsValueTrimmedOn(ev).collect().head
    val trimmed = (vals.sum - 1.0 - 100.0) / 18.0
    assert(r.getLong(1) === 20L && r.getLong(2) === 18L)
    assert(r.getDouble(4) ===
      BigDecimal(trimmed).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("events_value_trimmed randomized replay (incl. n<20 → plain mean)") {
    import spark.implicits._
    val rows = Seq.tabulate(3000) { i =>
      // 2dp values so the DECIMAL(12,2) accumulation is exact
      (s"t${i % 4}", math.rint(rnd.nextDouble() * 10000) / 100.0)
    } ++ Seq.tabulate(7)(i => ("tiny", math.rint(i * 123.0) / 100.0))
    val got = graft.queries.Analytics7
      .eventsValueTrimmedOn(rows.toDF("event_type", "value"))
      .collect().map(r => r.getString(0) -> r).toMap
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((t, xs0) <- rows.groupBy(_._1)) {
      val xs = xs0.map(x => BigDecimal(x._2)).sorted
      val n = xs.length
      val l = math.floor(0.05 * n).toInt
      val kept = xs.slice(l, n - l)
      val r = got(t)
      assert(r.getLong(1) === n.toLong && r.getLong(2) === (n - 2 * l).toLong)
      assert(r.getDouble(3) === r4((xs.sum / n).toDouble), s"$t mean")
      assert(r.getDouble(4) === r4((kept.sum / kept.length).toDouble),
        s"$t trimmed")
    }
  }

  test("q_integrity_audit: orphans and childless counted both ways") {
    import spark.implicits._
    val dir = tmpDir("integ14_")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // orders 1..5 belong to customers 1..3 (4 is referenced but absent
    // -> orphan order); customer 5 exists with no orders (childless);
    // lineitems reference orders {1,1,2,9} (9 is an orphan lineitem);
    // orders 3,4,5 are childless; parts: lineitems use {1,2}, 2 absent
    Seq((1L, 1L, "O", 10.0, ts, "1-URGENT"), (2L, 2L, "O", 10.0, ts, "1-URGENT"),
      (3L, 3L, "O", 10.0, ts, "1-URGENT"), (4L, 4L, "O", 10.0, ts, "1-URGENT"),
      (5L, 1L, "O", 10.0, ts, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, "a", 1L, 100.0), (2L, "b", 1L, 100.0), (3L, "c", 1L, 100.0),
      (5L, "e", 1L, 100.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts),
      (1L, 1L, 1L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ts),
      (2L, 2L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts),
      (9L, 2L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "p1", "B1", "T1", 1.0), (3L, "p3", "B1", "T1", 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    val got = graft.queries.Analytics7.qIntegrityAudit(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    // (n_child, n_orphans, n_parent, n_childless)
    assert(got("lineitem_orderkey") === ((4L, 1L, 5L, 3L)))
    assert(got("orders_custkey") === ((5L, 1L, 4L, 1L)))
    assert(got("lineitem_partkey") === ((4L, 2L, 2L, 1L)))
  }

  // --- consumer equality vs the retired window constructions ---

  test("events_value_outliers ≡ old sorted-window construction (random)") {
    import spark.implicits._
    val ev = Seq.tabulate(3000) { i =>
      (i.toLong, s"t${i % 4}",
        if (i % 11 == 0) rnd.nextDouble() * 500 else rnd.nextDouble() * 10)
    }.toDF("event_id", "event_type", "value")
    val got = Analytics5.eventsValueOutliersOn(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    // plain-Scala reference of the r13 contract
    val data = ev.collect().map(r => (r.getString(1), r.getDouble(2)))
    val ref = data.groupBy(_._1).map { case (t, xs) =>
      val vs = xs.map(_._2).sorted
      val med = vs((vs.size + 1) / 2 - 1)
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = devs((devs.size + 1) / 2 - 1)
      val out = devs.count(_ > 3.0 * 1.4826 * mad)
      (t, vs.size.toLong, med, mad, out.toLong)
    }
    def r4(x: Double): Double = // Spark round() is HALF_UP
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((t, n, med, mad, out) <- ref) {
      val r = got(t)
      assert(r.getLong(1) === n)
      assert(r.getDouble(2) === r4(med))
      assert(r.getDouble(3) === r4(mad))
      assert(r.getLong(4) === out)
    }
  }

  test("events_rfm scores ≡ ntile(5) windows (random purchases)") {
    import spark.implicits._
    // write a small random events table and run BOTH constructions
    val dir = tmpDir("rfm14_")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    Seq.tabulate(2500) { i =>
      (i.toLong, new java.sql.Timestamp(base + rnd.nextInt(100) * 86400000L),
        (i % 443).toLong, if (i % 3 == 0) "purchase" else "view",
        rnd.nextInt(5) + 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Analytics2.eventsRfm(spark, dir)
    val old = {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      def asDouble(c: org.apache.spark.sql.Column) = c.cast("double")
      val p = Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val anchor = broadcast(p.agg(max(col("ts")).as("anchor_ts")))
      val per = p.groupBy("user_id")
        .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("frequency"),
          sum(dec(col("value"))).as("mon_dec"))
        .crossJoin(anchor)
      per.select(col("user_id"),
        datediff(col("anchor_ts").cast("date"), col("last_ts").cast("date"))
          .as("recency_days"),
        col("frequency"), asDouble(col("mon_dec")).as("monetary"),
        ntile(5).over(Window.orderBy(col("last_ts").asc, col("user_id").asc))
          .as("r_score"),
        ntile(5).over(Window.orderBy(col("frequency").asc, col("user_id").asc))
          .as("f_score"),
        ntile(5).over(Window.orderBy(col("mon_dec").asc, col("user_id").asc))
          .as("m_score"))
    }
    val k = (r: org.apache.spark.sql.Row) => r.getLong(0)
    val gm = got.collect().map(r => k(r) -> r.toSeq).toMap
    val om = old.collect().map(r => k(r) -> r.toSeq).toMap
    assert(gm === om)
  }

  // --- physical-plan pins: the sorted windows are GONE ---

  test("rewritten order-statistic plans carry no row_number / ntile") {
    val plans = Seq(
      Analytics5.eventsValueOutliers(spark, sfDir),
      Analytics2.qMedianOrder(spark, sfDir),
      Analytics2.eventsRfm(spark, sfDir),
      Analytics2.qRevenueConcentration(spark, sfDir))
      .map(_.queryExecution.executedPlan.toString)
    for (p <- plans) {
      assert(!p.contains("row_number"), p.take(600))
      assert(!p.contains("ntile"), p.take(600))
    }
  }

  // --- r13 advice closures ---

  test("table_profile oracle's hardcoded lineitem schema still matches") {
    // the oracle in SparkEntry.tableProfileOracle spells out one UNION
    // ALL stanza per lineitem column; if the warehouse schema drifts,
    // THIS assertion names the drift instead of a bare row-count
    // mismatch at the gate (r13 advice)
    val expected = Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz")
    val got = Tables.lineitem(spark, sfDir).schema.fields
      .map(f => f.name -> f.dataType.simpleString).toSeq
    assert(got === expected,
      "lineitem schema drifted — update SparkEntry.tableProfileOracle's stanzas")
  }

  test("degenerate fits land NULL, not NaN/Infinity") {
    import spark.implicits._
    import graft.queries.{Analytics6, Analytics7}
    // flat retention: every user active every day → slope 0 → half-life
    // NULL ("no decay measurable"), lambda -0.0/0.0
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val flat = (for (u <- 0L until 20L; d <- 0 to 20) yield
      (u * 100 + d, new java.sql.Timestamp(base + d * 86400000L), u))
      .toDF("event_id", "ts", "user_id")
    val hf = Analytics7.qRetentionHalflifeOn(flat).collect().head
    assert(!hf.isNullAt(3), "lambda stays defined on a flat curve")
    assert(hf.isNullAt(4), "half_life_days must be NULL on a flat curve")
    // single active day (k=1): OLS denominator 0 → both NULL
    val oneDay = Seq(
      (1L, new java.sql.Timestamp(base), 1L),
      (2L, new java.sql.Timestamp(base + 86400000L), 1L))
      .toDF("event_id", "ts", "user_id")
    val hf1 = Analytics7.qRetentionHalflifeOn(oneDay).collect().head
    assert(hf1.isNullAt(3) && hf1.isNullAt(4))
    // single-discount brand: varx = 0 → slope and corr NULL
    val li = Seq((1L, 0.05, 10.0), (1L, 0.05, 20.0), (2L, 0.0, 5.0),
      (2L, 0.1, 7.0)).toDF("l_partkey", "l_discount", "l_quantity")
    val pt = Seq((1L, "FLAT"), (2L, "VAR")).toDF("p_partkey", "p_brand")
    val el = graft.queries.Analytics5.qPriceElasticityOn(li, pt)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(el("FLAT").isNullAt(4) && el("FLAT").isNullAt(5))
    assert(!el("VAR").isNullAt(4) && !el("VAR").isNullAt(5))
    // constant-count type across hours (varx = 0) → corr NULL; the
    // organic type keeps its fit
    val ev = (for (h <- 0 until 12) yield Seq.tabulate(h + 2)(i =>
        (h * 100L + i, new java.sql.Timestamp(base + h * 3600000L + i),
          "organic")) :+
        ((h * 1000L + 99, new java.sql.Timestamp(base + h * 3600000L),
          "heartbeat"))).flatten
      .toDF("event_id", "ts", "event_type")
    val lc = Analytics6.eventsErrorLoadCorrOn(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(lc("heartbeat").isNullAt(4),
      "constant-rate type must land NULL corr")
    assert(!lc("organic").isNullAt(4))
  }

  test("events_value_outliers scan reads only (event_type, value)") {
    val p = Analytics5.eventsValueOutliers(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<event_type:string,value:double>"),
      p.take(800))
  }
}
