package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Cdc
import graft.llm.{Ann, TextOps}
import graft.queries.Analytics4

/** Fixtures and invariants for the round-12 session-B analytics wave:
  * events_power_users, events_changepoint, events_type_affinity,
  * events_user_entropy, q_reorder_rate. */
class Round12bSpec extends AnyFunSuite with SparkFixture {

  test("events_power_users: hand-computed Gini and top shares") {
    import spark.implicits._
    // counts asc [1,1,2,4]: Σ i·c = 1+2+6+16 = 25,
    // G = (2·25 − 5·8)/(4·8) = 10/32 = 0.3125; k1 = k10 = 1 → top user
    // holds 4 of 8 events
    val events = Seq(1L, 2L, 3L, 3L, 4L, 4L, 4L, 4L).toDF("user_id")
    val r = Analytics4.eventsPowerUsersOn(events).collect()(0)
    assert(r.getAs[Long]("n_users") === 4L)
    assert(r.getAs[Long]("n_events") === 8L)
    assert(r.getAs[Double]("gini") === 0.3125)
    assert(r.getAs[Double]("top1pct_share") === 0.5)
    assert(r.getAs[Double]("top10pct_share") === 0.5)
  }

  test("events_power_users: uniform activity has Gini 0 and the " +
    "boundary tie-block contributes its deterministic partial") {
    import spark.implicits._
    // every user at c=2: one block, k=1 lands inside it → share = 2/4
    val events = Seq(1L, 1L, 2L, 2L).toDF("user_id")
    val r = Analytics4.eventsPowerUsersOn(events).collect()(0)
    assert(r.getAs[Double]("gini") === 0.0)
    assert(r.getAs[Double]("top1pct_share") === 0.5)
  }

  test("events_changepoint: a planted step lands the split, ties " +
    "break on the earlier hour") {
    import spark.implicits._
    // hours 1000..1003 with counts [1,1,5,5]: best split after hour
    // 1001 (score 16); t=1 and t=3 tie at 5.3333 → earlier hour ranks 2
    val rows = Seq.fill(1)(1000L) ++ Seq.fill(1)(1001L) ++
      Seq.fill(5)(1002L) ++ Seq.fill(5)(1003L)
    val events = rows.toDF("h")
      .select(timestamp_seconds(col("h") * 3600L).as("ts"))
    val out = Analytics4.eventsChangepointOn(events).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length === 3)
    assert(out(0).getAs[Long]("split_epoch_s") === 1002L * 3600L)
    assert(out(0).getAs[Long]("hours_left") === 2L)
    assert(out(0).getAs[Double]("mean_left") === 1.0)
    assert(out(0).getAs[Double]("mean_right") === 5.0)
    assert(out(0).getAs[Double]("shift") === 4.0)
    assert(out(0).getAs[Double]("score") === 16.0)
    assert(out(1).getAs[Long]("split_epoch_s") === 1001L * 3600L)
    assert(out(2).getAs[Long]("split_epoch_s") === 1003L * 3600L)
    assert(out(1).getAs[Double]("score") === out(2).getAs[Double]("score"))
  }

  test("events_changepoint: missing hours are real zeros in both " +
    "segments") {
    import spark.implicits._
    // events only at hours 1000 and 1003 → the dense grid has 4 hours;
    // with counts [2,0,0,2] the symmetric splits t=1/t=3 share the top
    // score and t=1 wins the tie
    val events = Seq(1000L, 1000L, 1003L, 1003L).toDF("h")
      .select(timestamp_seconds(col("h") * 3600L).as("ts"))
    val out = Analytics4.eventsChangepointOn(events).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out(0).getAs[Long]("hours_left") +
      out(0).getAs[Long]("hours_right") === 4L)
    assert(out(0).getAs[Long]("split_epoch_s") === 1001L * 3600L)
  }

  test("events_type_affinity: PMI/lift/jaccard from exact counts") {
    import spark.implicits._
    val events = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (3L, "b"), (4L, "a"), (4L, "b"),
      (4L, "a") // duplicate (user,type) rows must not double-count
    ).toDF("user_id", "event_type")
    val out = Analytics4.eventsTypeAffinityOn(events).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[String]("type_a") === "a")
    assert(r.getAs[Long]("users_a") === 3L)
    assert(r.getAs[Long]("users_b") === 3L)
    assert(r.getAs[Long]("users_both") === 2L)
    assert(r.getAs[Double]("jaccard") === 0.5)
    assert(r.getAs[Double]("lift") === 0.8889)
    assert(r.getAs[Double]("pmi") === -0.1178)
  }

  test("events_user_entropy: single-type users are exactly 0.0, " +
    "balanced two-type users hit ln 2 with norm 1") {
    import spark.implicits._
    val events = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"),
      (3L, "a"), (3L, "a"), (3L, "b")
    ).toDF("user_id", "event_type")
    val out = Analytics4.eventsUserEntropyOn(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_types"),
          r.getAs[Double]("entropy"), r.getAs[Double]("norm_entropy"))))
      .toMap
    assert(out(1L) === ((4L, 2L, 0.6931, 1.0)))
    assert(out(2L) === ((1L, 1L, 0.0, 0.0)))
    assert(out(3L) === ((3L, 2L, 0.6365, 0.9183)))
  }

  test("q_reorder_rate: same-order duplicate lines don't count as a " +
    "reorder; a second order does") {
    import spark.implicits._
    val lineitem = Seq(
      (10L, 100L), (11L, 100L), // c1 buys p100 in two orders → repeat
      (12L, 100L),              // c2 buys p100 once
      (10L, 200L), (10L, 200L)  // c1 buys p200 twice in ONE order
    ).toDF("l_orderkey", "l_partkey")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val out = Analytics4.qReorderRateOn(lineitem, orders).collect()
      .map(r => r.getAs[Long]("partkey") ->
        ((r.getAs[Long]("buyers"), r.getAs[Long]("repeat_buyers"),
          r.getAs[Long]("orders"), r.getAs[Long]("max_orders_per_buyer"),
          r.getAs[Double]("repeat_rate")))).toMap
    assert(out(100L) === ((2L, 1L, 3L, 2L, 0.5)))
    assert(out(200L) === ((1L, 0L, 1L, 1L, 0.0)))
  }

  test("events_power_users plan: the corpus shuffles once into the " +
    "histogram, and the operator never re-reads it past the cut") {
    // pin the pre-materialize histogram (the operator's only corpus
    // pass): exactly one user_id exchange
    val histPlan = Analytics4
      .activityHistogram(Tables.events(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id".r.findAllIn(histPlan).size === 1,
      s"histogram should shuffle the corpus once:\n$histPlan")
    // past the cut, everything is histogram-dimensional: no user_id
    // exchange (and no parquet scan) may appear in the final plan
    val plan = Analytics4.eventsPowerUsers(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(user_id"),
      s"final plan must not replay the corpus agg:\n$plan")
    assert(!plan.toLowerCase.contains("filescan"),
      s"final plan must not re-scan parquet:\n$plan")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("cdc_column_volatility: per-column flags count exactly, first " +
    "versions are not transitions") {
    import spark.implicits._
    val events = Seq(
      // user 1: signup → click (k changes, type changes, value holds)
      //         → click (value changes, k and type hold)
      (1L, 1L, "signup", 1.0, ts("2024-01-10 00:00:00"), """{"k":1}"""),
      (2L, 1L, "click", 1.0, ts("2024-01-10 01:00:00"), """{"k":2}"""),
      (3L, 1L, "click", 2.0, ts("2024-01-10 02:00:00"), """{"k":2}"""),
      // user 2: single change → contributes no transition
      (4L, 2L, "view", 9.0, ts("2024-01-10 00:00:00"), """{"k":9}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Cdc.columnVolatility(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(out("value") === ((2L, 1L, 1L, 0.5)))
    assert(out("prop_k") === ((2L, 1L, 1L, 0.5)))
    assert(out("event_type") === ((2L, 1L, 1L, 0.5)))
  }

  test("cdc_key_lifespan: buckets split on first→last change span, " +
    "single-change keys have their own bucket") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "signup", 1.0, ts("2024-01-10 00:00:00"), """{"k":1}"""),
      // user 2: 2 h life ending in a delete
      (2L, 2L, "signup", 1.0, ts("2024-01-10 00:00:00"), """{"k":1}"""),
      (3L, 2L, "error", 1.0, ts("2024-01-10 02:00:00"), """{"k":2}"""),
      // user 3: 10-day life, three changes
      (4L, 3L, "signup", 1.0, ts("2024-01-01 00:00:00"), """{"k":1}"""),
      (5L, 3L, "click", 1.0, ts("2024-01-05 00:00:00"), """{"k":2}"""),
      (6L, 3L, "click", 1.0, ts("2024-01-11 00:00:00"), """{"k":3}"""),
      // user 4: exactly 1 day → the < boundary puts it in 2_lt_7d
      (7L, 4L, "signup", 1.0, ts("2024-01-10 00:00:00"), """{"k":1}"""),
      (8L, 4L, "click", 1.0, ts("2024-01-11 00:00:00"), """{"k":2}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Cdc.keyLifespan(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(out("0_single") === ((1L, 0L, 1.0, 0L)))
    assert(out("1_lt_1d") === ((1L, 1L, 2.0, 2L * 3600000L)))
    assert(out("2_lt_7d") === ((1L, 0L, 2.0, 86400000L)))
    assert(out("3_lt_30d") === ((1L, 0L, 3.0, 10L * 86400000L)))
    assert(!out.contains("4_ge_30d"))
  }

  test("cdc_key_lifespan plan: one corpus exchange, no window sort") {
    val plan = Cdc.keyLifespan(Tables.events(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size === 1,
      s"key lifespan should shuffle the corpus once:\n$plan")
    assert(!plan.contains("Window"),
      s"the per-key reduction must be an agg, not a window:\n$plan")
  }

  test("text_lexical_diversity: TTR, hapax share and Yule's K from " +
    "exact counts") {
    import spark.implicits._
    val docs = Seq((1L, "x x y z")).toDF("doc_id", "text")
    val r = TextOps.textLexicalDiversity(docs).collect()(0)
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("n_types") === 3L)
    assert(r.getAs[Double]("ttr") === 0.75)
    assert(r.getAs[Double]("hapax_ratio") === 0.6667)
    // K = 10⁴·(Σc² − N)/N² = 10⁴·(6−4)/16
    assert(r.getAs[Double]("yule_k") === 1250.0)
  }

  test("corpus_length_profile: power-of-two buckets are exact at the " +
    "boundary and shares sum over the corpus") {
    import spark.implicits._
    val docs = Seq(("s1", "a b c d"), ("s1", "a")).toDF("source", "text")
    val out = TextOps.corpusLengthProfile(docs).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("bucket_lo"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"), r.getAs[Double]("token_share"))))
      .toMap
    // 4 tokens = exactly 2²: must land in bucket 2, not 1
    assert(out(2L) === ((4L, 1L, 4L, 0.8)))
    assert(out(0L) === ((1L, 1L, 1L, 0.2)))
  }

  test("text_keyword_rake: degree/frequency scoring prefers the long " +
    "collocation over its sub-phrase") {
    import spark.implicits._
    val docs = Seq((1L, "deep learning of deep learning systems"))
      .toDF("doc_id", "text")
    val out = TextOps.textKeywordRake(docs).collect()
      .map(r => r.getAs[String]("phrase") ->
        ((r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_words"),
          r.getAs[Double]("score")))).toMap
    // deg(deep)=deg(learning)=5, freq=2 → 2.5 each; deg(systems)=3/1
    assert(out("deep learning") === ((1L, 2L, 5.0)))
    assert(out("deep learning systems") === ((1L, 3L, 8.0)))
  }

  test("corpus_epoch_plan: capped sources repeat maxEpochs times and " +
    "report their shortfall, uncapped sources fill the target") {
    import spark.implicits._
    val a = (1 to 10).map(i => s"a$i").mkString(" ")
    val b = (1 to 50).map(i => s"b$i").mkString(" ")
    val docs = Seq(("A", a), ("B", b)).toDF("source", "text")
    val out = TextOps.corpusEpochPlan(docs, budgetTokens = 100L,
        maxEpochs = 4).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("avail_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("achieved_tokens"), r.getAs[Long]("shortfall"),
          r.getAs[Double]("epochs"), r.getAs[Double]("fill_rate"))))
      .toMap
    assert(out("A") === ((10L, 50L, 40L, 10L, 4.0, 0.8)))
    assert(out("B") === ((50L, 50L, 50L, 0L, 1.0, 1.0)))
  }

  test("embed_dim_stats: constant axes flag dead on exact min==max, " +
    "moments match by hand") {
    import spark.implicits._
    val embs = Seq((1L, Seq(1f, 0f), 0), (2L, Seq(3f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.embedDimStats(embs).collect()
      .map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean"),
          r.getAs[Double]("std"), r.getAs[Boolean]("is_dead"),
          r.getAs[Long]("n_zero")))).toMap
    // dim 0: mean 2, std = sqrt(5 − 4) = 1, live, no zeros
    assert(out(0) === ((2L, 2.0, 1.0, false, 0L)))
    assert(out(1) === ((2L, 0.0, 0.0, true, 2L)))
  }

  test("embed_class_margin: centroid geometry by hand, zero-spread " +
    "singleton guards the ratio") {
    import spark.implicits._
    val embs = Seq(
      (1L, Seq(0f, 0f), 0), (2L, Seq(2f, 0f), 0), // μ=(1,0), intra 1
      (3L, Seq(10f, 0f), 1)                       // singleton, intra 0
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.embedClassMargin(embs, dim = 2).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Double]("intra_rms"),
          r.getAs[Int]("nearest_label"), r.getAs[Double]("margin"),
          r.getAs[Double]("fisher_ratio")))).toMap
    assert(out(0) === ((2L, 1.0, 1, 9.0, 9.0)))
    assert(out(1) === ((1L, 0.0, 0, 9.0, 0.0)))
  }

  test("events_session_sweep: sessions = users + broken gaps, per tau " +
    "from one gap frame") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, 0L), (2L, 1L, 100L), (3L, 1L, 2000L), // gaps 100, 1900
      (4L, 2L, 0L)                                    // singleton user
    ).toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"))
    val out = Analytics4.eventsSessionSweepOn(events, Seq(60L, 1000L))
      .collect()
      .map(r => r.getAs[Long]("gap_s") ->
        ((r.getAs[Long]("n_sessions"),
          r.getAs[Double]("avg_events_per_session"),
          r.getAs[Double]("break_rate")))).toMap
    assert(out(60L) === ((4L, 1.0, 1.0)))
    assert(out(1000L) === ((3L, 1.3333, 0.5)))
  }

  test("text_predictability: a pure template corpus is fully " +
    "redundant (H2 = 0)") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val r = TextOps.textPredictability(docs).collect()(0)
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("vocab") === 2L)
    assert(r.getAs[Long]("n_bigrams") === 3L)
    assert(r.getAs[Double]("h_unigram") === 0.6931)
    assert(r.getAs[Double]("h_bigram_cond") === 0.0)
    assert(r.getAs[Double]("redundancy") === 1.0)
  }

  test("knn_reciprocity: a hub that doesn't reciprocate is counted " +
    "and loses its node to the mutual cut") {
    import spark.implicits._
    // A↔B mutual; C→B one-way (k=1)
    val embs = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(0.985f, 0.174f), 0),
      (3L, Seq(0f, 1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r = Ann.knnReciprocity(embs, k = 1).collect()(0)
    assert(r.getAs[Long]("n_nodes") === 3L)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("n_mutual_edges") === 2L)
    assert(r.getAs[Double]("reciprocity") === 0.6667)
    assert(r.getAs[Long]("n_one_way_nodes") === 1L)
  }

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("events_power_users agrees with a plain-Scala replay on " +
    "randomized activity books") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val counts = (1L to 30L).map(u => u -> (1 + rnd.nextInt(40))).toMap
      val rows = counts.toSeq.flatMap { case (u, c) => Seq.fill(c)(u) }
      val out = Analytics4.eventsPowerUsersOn(rows.toDF("user_id"))
        .collect()(0)
      // plain-Scala Gini over the explicit ascending rank
      val asc = counts.toSeq.map(_._2.toLong).sorted
      val n = asc.size.toLong
      val s = asc.sum
      val t = asc.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
      val gini = (2.0 * t - (n + 1) * s).toDouble / (n.toDouble * s.toDouble)
      // top-k share via the deterministic desc prefix
      def share(k: Long): Double = {
        val desc = asc.reverse
        desc.take(k.toInt).sum.toDouble / s.toDouble
      }
      assert(out.getAs[Long]("n_users") === n, s"trial $trial")
      assert(out.getAs[Long]("n_events") === s, s"trial $trial")
      assert(out.getAs[Double]("gini") === r4(gini), s"trial $trial")
      assert(out.getAs[Double]("top1pct_share") ===
        r4(share(math.max(1L, n / 100))), s"trial $trial")
      assert(out.getAs[Double]("top10pct_share") ===
        r4(share(math.max(1L, n / 10))), s"trial $trial")
    }
  }

  test("events_changepoint agrees with a plain-Scala replay on " +
    "randomized hourly series") {
    import spark.implicits._
    val rnd = new scala.util.Random(1212)
    for (trial <- 1 to 3) {
      val nh = 48
      // endpoints nonzero so the dense spine is exactly hours 0..47
      val cs = (0 until nh).map(h =>
        if (h == 0 || h == nh - 1) 1 + rnd.nextInt(20)
        else rnd.nextInt(20))
      val rows = cs.zipWithIndex.flatMap { case (c, h) =>
        Seq.fill(c)(2000L + h)
      }
      val out = Analytics4.eventsChangepointOn(
          rows.toDF("h").select(timestamp_seconds(col("h") * 3600L)
            .as("ts")))
        .collect().sortBy(_.getAs[Int]("rank"))
      // replay every split with the operator's own double tree
      val tot = cs.map(_.toLong).sum
      val pre = cs.map(_.toLong).scanLeft(0L)(_ + _).tail
      val scored = (1 until nh).map { t =>
        val s = pre(t - 1)
        val num = s.toDouble * nh.toDouble - tot.toDouble * t.toDouble
        val score = num * num /
          (t.toDouble * (nh.toDouble - t.toDouble) * nh.toDouble)
        (t, score)
      }
      val best = scored.sortBy { case (t, sc) => (-sc, t) }.take(5)
      assert(out.length === 5, s"trial $trial")
      out.zip(best).foreach { case (row, (t, sc)) =>
        assert(row.getAs[Long]("hours_left") === t.toLong, s"trial $trial")
        assert(row.getAs[Long]("split_epoch_s") === (2000L + t) * 3600L,
          s"trial $trial")
        assert(row.getAs[Double]("score") === r4(sc), s"trial $trial")
      }
    }
  }

  test("session-B ops run on the warehouse and return rows") {
    assert(Analytics4.eventsPowerUsers(spark, sfDir).count() === 1L)
    assert(Analytics4.eventsChangepoint(spark, sfDir).count() === 5L)
    assert(Analytics4.eventsTypeAffinity(spark, sfDir).count() === 10L)
    assert(Analytics4.eventsUserEntropy(spark, sfDir).count() > 0L)
    assert(Analytics4.qReorderRate(spark, sfDir).count() > 0L)
  }
}
