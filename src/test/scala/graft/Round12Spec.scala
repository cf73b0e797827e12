package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Cdc
import graft.llm.{Ann, TextOps}
import graft.queries.Analytics3

/** Fixtures and invariants for the round-12 operators:
  * cdc_lateness_profile, text_novelty, corpus_quality_pareto,
  * embed_silhouette, events_markov_stationary. */
class Round12Spec extends AnyFunSuite with SparkFixture {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("cdc_lateness_profile: planted delays land in their buckets") {
    import spark.implicits._
    // arrival order = event_id; user 1's changes arrive 1,2,3,4,5 but
    // source timestamps put 3 30s behind 2, 4 two hours behind, and 5
    // five days behind — one change per bucket, plus two on time
    val events = Seq(
      (1L, 1L, "signup", 1.0, ts("2024-01-10 00:00:00"), """{"k":1}"""),
      (2L, 1L, "click", 1.0, ts("2024-01-10 01:00:00"), """{"k":2}"""),
      (3L, 1L, "click", 1.0, ts("2024-01-10 00:59:30"), """{"k":3}"""),
      (4L, 1L, "click", 1.0, ts("2024-01-10 00:30:00"), """{"k":4}"""),
      (5L, 1L, "click", 1.0, ts("2024-01-09 20:00:00"), """{"k":5}"""),
      (6L, 1L, "click", 1.0, ts("2024-01-05 01:00:00"), """{"k":6}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Cdc.latenessProfile(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3)))).toMap
    assert(out("0_on_time")._1 === 2L)
    assert(out("1_lt_1m") === ((1L, 0.1667, 30000L)))      // 30 s
    assert(out("2_lt_1h") === ((1L, 0.1667, 1800000L)))    // 30 min
    assert(out("3_lt_1d") === ((1L, 0.1667, 18000000L)))   // 5 h
    assert(out("4_ge_1d")._1 === 1L)                       // 5 days
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-3)
  }

  test("cdc_lateness_profile shuffles the events exactly once") {
    val plan = Cdc.latenessProfile(Tables.events(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size === 1,
      s"lateness profile should shuffle once:\n$plan")
  }

  test("text_novelty: copies score 0, originals 1, short docs 1 on 0 " +
    "grams") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),       // both grams first here
      (2L, "alpha beta gamma delta"),       // exact copy -> novelty 0
      (3L, "hi"),                           // too short for a 3-gram
      (4L, "alpha beta gamma epsilon zeta") // 1 of 3 grams seen in doc 1
    ).toDF("doc_id", "text")
    val out = TextOps.textNovelty(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((1L, 2L, 2L, 1.0)))
    assert(out(1) === ((2L, 2L, 0L, 0.0)))
    assert(out(2) === ((3L, 0L, 0L, 1.0)))
    assert(out(3) === ((4L, 3L, 2L, 0.6667)))
  }

  test("corpus_quality_pareto: monotone curve, decile 10 covers the " +
    "corpus, greedy prefix is quality-sorted") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextOps.corpusQualityPareto(docs).orderBy("decile").collect()
    assert(out.length === 10)
    // budgets, docs and tokens all non-decreasing in the decile
    for (i <- 1 until 10) {
      assert(out(i).getLong(1) >= out(i - 1).getLong(1))
      assert(out(i).getLong(2) >= out(i - 1).getLong(2))
      assert(out(i).getLong(3) >= out(i - 1).getLong(3))
      // greedy best-first: mean quality can only fall as budget grows
      assert(out(i).getDouble(4) <= out(i - 1).getDouble(4) + 1e-9)
    }
    // decile 10's budget is the whole corpus (floor(10*T/10) = T)
    assert(out(9).getLong(3) === out(9).getLong(1))
    assert(out(9).getLong(2) === docs.count())
  }

  test("embed_silhouette: well-separated planted clusters score near " +
    "1, cells conserve the corpus") {
    import spark.implicits._
    // three tight orthogonal clusters, 20 vectors each
    val data = (0 until 60).map { i =>
      val c = i % 3
      val v = Array.tabulate(8)(j =>
        (if (j == c) 10.0 else 0.0) + 0.01 * ((i * 7 + j) % 5)).map(_.toFloat)
      (i.toLong, v, c)
    }
    val out = Ann.embedSilhouette(
      data.toDF("vec_id", "embedding", "label"), nlist = 3, iters = 3)
      .collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(1)).sum === 60L)
    out.filter(_.getLong(1) > 0).foreach { r =>
      assert(r.getDouble(4) > 0.9,
        s"tight cluster ${r.getInt(0)} silhouette ${r.getDouble(4)}")
    }
    // sf fixture: 16 cells always surface, members conserve
    val real = Ann.embedSilhouette(Tables.embeddings(spark, sfDir)).collect()
    assert(real.length === 16)
    assert(real.map(_.getLong(1)).sum ===
      Tables.embeddings(spark, sfDir).count())
    real.foreach { r =>
      assert(r.getDouble(4) >= -1.0 - 1e-9 && r.getDouble(4) <= 1.0 + 1e-9)
    }
  }

  test("events_stickiness: dense spine, trailing window, planted " +
    "regimes") {
    import spark.implicits._
    val dir = tmpDir("stick_")
    val base = 1704067200L
    // user 1 active days 0..9; user 2 only day 0; day 5 has NO events
    // from user 2 but user 1 keeps the spine alive; days 10..14 empty
    // except a final day-14 event keeping the span open
    val rows =
      (0 until 10).filter(_ != 5).map { d =>
        (d.toLong, 1L, "view", 1.0,
          new java.sql.Timestamp((base + d * 86400L) * 1000L), """{"k":1}""")
      } ++ Seq(
        (100L, 2L, "view", 1.0,
          new java.sql.Timestamp(base * 1000L), """{"k":1}"""),
        (101L, 1L, "view", 1.0,
          new java.sql.Timestamp((base + 14 * 86400L) * 1000L), """{"k":1}"""))
    rows.toDF("event_id", "user_id", "event_type", "value", "ts", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = graft.queries.Analytics3.eventsStickiness(spark, dir)
      .orderBy("d").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 15) // dense day spine 0..14
    assert(out(0) === ((2L, 2L, 1.0)))      // both users day 0
    assert(out(5) === ((0L, 2L, 0.0)))      // gap day: DAU 0, MAU holds
    assert(out(1) === ((1L, 2L, 0.5)))
    assert(out(14)._2 === 2L)               // both inside trailing 30d
  }

  test("text_ngram_coverage: a planted dominant shingle, monotone in k") {
    import spark.implicits._
    val docs = ((1 to 30).map(i => (i.toLong, "the same old boilerplate"))
      ++ Seq((100L, "completely fresh words here now"))).toDF("doc_id", "text")
    val out = TextOps.textNgramCoverage(docs).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 30 docs x 2 shingles of the template + 3 fresh = 63 occurrences;
    // top-10 covers everything
    assert(out(0) === ((10, 63L, 63L, 1.0)))
    assert(out(1)._1 === 100 && out(2)._1 === 1000)
    for (i <- 1 until 3) assert(out(i)._2 >= out(i - 1)._2)
    // real corpus: coverage monotone, within (0, 1]
    val real = TextOps.textNgramCoverage(Tables.documents(spark, sfDir))
      .orderBy("k").collect().map(_.getDouble(3))
    assert(real.toSeq === real.sorted)
    assert(real.forall(c => c > 0.0 && c <= 1.0))
  }

  test("corpus_family_purity: cross-lang family impure, same-lang pure") {
    import spark.implicits._
    import graft.llm.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "web", 30L),
      (2L, "alpha beta gamma delta epsilon", "de", "web", 30L), // mislabel
      (3L, "one two three four five six", "en", "web", 27L),
      (4L, "one two three four five six", "en", "web", 27L),
      (5L, "nothing like the others at all", "fr", "web", 30L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.dedupNgramJaccard(docs)
    val out = Dedup.corpusFamilyPurity(docs, pairs).orderBy("family")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    assert(out.length === 2)
    assert(out(0) === ((1L, 2L, 2L, "de", 0.5))) // tie -> lex smallest
    assert(out(1) === ((3L, 2L, 1L, "en", 1.0)))
  }

  test("ivf_elbow_report: inertia non-increasing on planted clusters, " +
    "gains reported off the unrounded curve") {
    import spark.implicits._
    // four tight orthogonal clusters: nlist=4 captures them, 8/16 can
    // only shave within-cluster noise
    val data = (0 until 80).map { i =>
      val c = i % 4
      val v = Array.tabulate(8)(j =>
        (if (j == c) 10.0 else 0.0) + 0.05 * ((i * 13 + j) % 7)).map(_.toFloat)
      (i.toLong, v, c)
    }
    val out = graft.llm.Ann.ivfElbowReport(
      data.toDF("vec_id", "embedding", "label")).orderBy("nlist").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq === Seq(4, 8, 16))
    assert(out(0)._3 === 0.0)
    assert(out(1)._2 <= out(0)._2 + 1e-9)
    assert(out(2)._2 <= out(1)._2 + 1e-9)
    // the planted structure: 4 cells already explain nearly everything
    assert(out(0)._2 < 0.01, s"4-cell inertia ${out(0)._2}")
  }

  test("cdc_snapshot_profile: planted nulls counted, key uniqueness " +
    "invariant on the real changelog") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "signup", 1.0, ts("2024-01-01 00:00:00"), """{"k":1}"""),
      (2L, 1L, "click", 5.5, ts("2024-01-02 00:00:00"), """{}"""),
      (3L, 2L, "signup", 2.0, ts("2024-01-03 00:00:00"), """{"k":9}"""),
      (4L, 3L, "signup", 3.0, ts("2024-01-01 00:00:00"), """{"k":2}"""),
      (5L, 3L, "error", 0.0, ts("2024-01-04 00:00:00"), """{"k":3}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val r = Cdc.snapshotProfile(events).head()
    // user 3 deleted; user 1's live state (e2) has no prop_k
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 2L) // click + signup survive
    assert(r.getLong(3) === 0L && r.getLong(4) === 1L)
    assert(r.getDouble(5) === 2.0 && r.getDouble(6) === 5.5)
    // real changelog: the MERGE invariant — one row per live key
    val real = Cdc.snapshotProfile(Tables.events(spark, sfDir)).head()
    assert(real.getLong(0) === real.getLong(1))
  }

  test("cdc_delete_debt: dead keys carry their whole history, " +
    "resurrected keys don't count") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "signup", 1.0, ts("2024-01-01 00:00:00"), """{"k":1}"""),
      (2L, 1L, "click", 1.0, ts("2024-01-15 00:00:00"), """{"k":2}"""),
      (3L, 1L, "error", 1.0, ts("2024-02-10 00:00:00"), """{"k":3}"""),
      (4L, 2L, "signup", 1.0, ts("2024-01-05 00:00:00"), """{"k":4}"""),
      (5L, 2L, "error", 1.0, ts("2024-01-20 00:00:00"), """{"k":5}"""),
      (6L, 2L, "signup", 1.0, ts("2024-03-01 00:00:00"), """{"k":6}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Cdc.deleteDebt(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // user 1 dead (3 changes, deleted in Feb); user 2 resurrected: free
    assert(out.toSeq === Seq(("2024-02-01", 1L, 3L)))
  }

  test("events_group_topk: exact counts, smaller-id ties, k bound") {
    import spark.implicits._
    val events = (1 to 12).map { i =>
      // type A: user 1 x3, users 2,3 x2 each (tie), user 4 x1
      val (u, t) = i match {
        case 1 | 2 | 3 => (1L, "a")
        case 4 | 5 => (2L, "a")
        case 6 | 7 => (3L, "a")
        case 8 => (4L, "a")
        case _ => (i.toLong, "b")
      }
      (i.toLong, u, t, 1.0, ts("2024-01-01 00:00:00"), """{"k":1}""")
    }.toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val dir = tmpDir("gtk_")
    events.write.parquet(s"$dir/events.parquet")
    val out = graft.operators.GroupTopK.eventsGroupTopKQ(spark, dir)
      .filter(col("event_type") === "a")
      .orderBy(col("n").desc, col("user_id")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 3L), (2L, 2L), (3L, 2L)))
  }

  test("q_trade_balance: global conservation — every export is " +
    "someone's import") {
    val out = graft.queries.Analytics.qTradeBalance(spark, sfDir).collect()
    val exports = out.map(_.getDouble(1)).sum
    val imports = out.map(_.getDouble(2)).sum
    val balance = out.map(_.getDouble(3)).sum
    assert(math.abs(exports - imports) < 1e-6, s"$exports vs $imports")
    assert(math.abs(balance) < 1e-6)
    assert(out.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(2) >= 0.0))
    assert(out.length > 1)
  }

  test("embed_pq_distortion: perfectly codable corpus scores 0, real " +
    "corpus reports all subspaces non-negative") {
    import spark.implicits._
    val rnd = new scala.util.Random(1204)
    // exactly 16 distinct patterns, the first 16 ids one of each: the
    // codebook init IS the pattern set and Lloyd keeps it -> zero error
    val patterns = (0 until 16).map { p =>
      Array.tabulate(64)(j => (math.sin(p * 31 + j) * 5).toFloat)
    }
    val data = (0 until 200).map { i =>
      val p = if (i < 16) i else rnd.nextInt(16)
      (i.toLong, patterns(p), p)
    }
    val zero = graft.llm.Ann.embedPqDistortion(
      data.toDF("vec_id", "embedding", "label")).collect()
    assert(zero.length === 16)
    zero.foreach(r => assert(r.getDouble(2) === 0.0,
      s"subspace ${r.getInt(0)} distortion ${r.getDouble(2)}"))
    val real = graft.llm.Ann.embedPqDistortion(
      Tables.embeddings(spark, sfDir)).collect()
    assert(real.length === 16)
    real.foreach { r =>
      assert(r.getDouble(2) >= 0.0)
      assert(r.getLong(1) === Tables.embeddings(spark, sfDir).count())
    }
  }

  test("r12 plan pins: coverage top-k is a TakeOrdered not a global " +
    "sort; pareto windows per qk cell; stickiness never joins " +
    "day-by-user ranges") {
    val docs = Tables.documents(spark, sfDir)
    val pc = TextOps.textNgramCoverage(docs)
      .queryExecution.executedPlan.toString
    assert(pc.contains("TakeOrderedAndProject"),
      s"coverage must cut top-k via TakeOrdered:\n$pc")
    val pp = TextOps.corpusQualityPareto(docs)
      .queryExecution.executedPlan.toString
    // the cumsum windows on the qk grid cell — a corpus-wide
    // single-partition sort would show an empty partition spec
    assert(!pp.contains("Window [sum") ||
      pp.contains("windowspecdefinition(qk"),
      s"pareto cumsum must partition by qk:\n$pp")
    assert("Exchange SinglePartition.*Window".r
      .findAllIn(pp.replaceAll("\n", " ")).isEmpty,
      "pareto must not sort the corpus in one partition")
    val ps = graft.queries.Analytics3.eventsStickiness(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!ps.contains("CartesianProduct"),
      s"stickiness must not day-by-user range join:\n$ps")
  }

  test("events_markov_stationary: a deterministic 2-cycle settles at " +
    "(0.5, 0.5); probabilities always sum to 1") {
    import spark.implicits._
    val dir = tmpDir("markov_")
    // A->B->A->B... for two users
    val rows = (0 until 40).map { i =>
      (i.toLong, (i % 2).toLong + 1L,
        if ((i / 2) % 2 == 0) "view" else "purchase", 1.0,
        new java.sql.Timestamp(1704067200000L + i * 60000L), """{"k":1}""")
    }
    rows.toDF("event_id", "user_id", "event_type", "value", "ts", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Analytics3.eventsMarkovStationary(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.keySet === Set("view", "purchase"))
    assert(out("view") === 0.5 && out("purchase") === 0.5)
    val real = Analytics3.eventsMarkovStationary(spark, sfDir).collect()
    assert(math.abs(real.map(_.getDouble(2)).sum - 1.0) < 2e-4)
    assert(math.abs(real.map(_.getDouble(3)).sum - 1.0) < 2e-4)
    // the stationary mass concentrates relative to raw outflow share
    // only through real structure; both are proper distributions here
    real.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("q_customer_survival: KM invariants — risk set telescopes by " +
    "exits, survival is a non-increasing product-limit, churn and " +
    "censoring both occur") {
    val out = Analytics3.qCustomerSurvival(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    val byWeek = out.sortBy(_._1)
    // telescoping: n_risk(t+1) = n_risk(t) - exits(t)
    byWeek.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 === a._2 - a._3 - a._4, s"risk set broke at week ${b._1}")
    }
    assert(byWeek.head._2 === byWeek.map(w => w._3 + w._4).sum)
    // survival: starts <= 1, never increases, equals the product limit
    val surv = byWeek.map(_._6)
    assert(surv.head <= 1.0)
    surv.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9) }
    var prod = 1.0
    byWeek.foreach { w =>
      prod *= (1.0 - w._3.toDouble / w._2)
      assert(math.abs(w._6 - prod) < 5e-4, s"product limit off at ${w._1}")
    }
    assert(byWeek.map(_._3).sum > 0L, "no churn events — degenerate")
    assert(byWeek.map(_._4).sum > 0L, "no censoring — degenerate")
  }

  test("text_zipf: a corpus with planted 1/r frequencies fits slope " +
    "-1 with r2 ~ 1; the real corpus slopes negative") {
    import spark.implicits._
    // term t_r appears floor(1024/r) times, r = 1..64: exact Zipf
    val words = (1 to 64).flatMap(r => Seq.fill(1024 / r)(f"t$r%02d"))
    val docs = words.grouped(97).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val planted = TextOps.textZipf(docs, topR = 64).head()
    assert(planted.getLong(0) === 64L)
    assert(math.abs(planted.getDouble(1) + 1.0) < 0.02,
      s"slope ${planted.getDouble(1)}")
    assert(planted.getDouble(3) > 0.999)
    // sf0.001's vocab is tiny (31 terms) and its token distribution is
    // deliberately near-flat (slope -0.18, r2 0.06) — the operator
    // correctly reports that this synthetic corpus does NOT follow the
    // law, which is exactly the audit it exists to perform
    val real = TextOps.textZipf(Tables.documents(spark, sfDir)).head()
    assert(real.getLong(0) > 10L && real.getLong(0) <= 500L)
    assert(real.getDouble(1) < 0.0)
    assert(real.getDouble(3) >= 0.0 && real.getDouble(3) <= 1.0)
  }

  test("q_basket_rules: directional bookkeeping — both directions " +
    "share n_both, confidence recovers the exact marginals") {
    import spark.implicits._
    // 4 orders: {1,2} x3, {1,3} x1 -> n(1)=4, n(2)=3, n(3)=1, N=4
    val li = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (40L, 1L), (40L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val out = graft.queries.Analytics2.qBasketRulesOn(li, topK = 10,
        minOrders = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out.size === 4) // (1,2), (2,1), (1,3), (3,1)
    assert(out((1L, 2L)) === ((3L, 0.75, 0.75, 1.0)))
    assert(out((2L, 1L)) === ((3L, 0.75, 1.0, 1.0)))
    assert(out((1L, 3L)) === ((1L, 0.25, 0.25, 1.0)))
    assert(out((3L, 1L)) === ((1L, 0.25, 1.0, 1.0)))
    // ranking: confidence DESC first
    val ranked = graft.queries.Analytics2.qBasketRulesOn(li, 10, 1)
      .collect().map(_.getDouble(4))
    ranked.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
  }

  test("knn_assortativity: a degree-regular graph hits the zero-" +
    "variance guard; the real graph stays in [-1, 1]") {
    import spark.implicits._
    // two orthogonal 6-cliques at k=5: every node's 5 NNs are its
    // clique mates, all degrees 5 -> zero degree variance -> r = 0.0
    val vecs = (0 until 12).map { i =>
      val base = Array.fill(64)(0.0f)
      base((i / 6) * 2) = 10.0f
      base(8 + i % 6) = 1.0f // distinct small offsets, same cluster
      (i.toLong, base, i / 6)
    }
    val out = graft.llm.Ann.knnAssortativity(
      vecs.toDF("vec_id", "embedding", "label")).head()
    assert(out.getLong(0) === 12L)       // all nodes in the graph
    assert(out.getLong(1) === 30L)       // 2 x C(6,2) mutual edges
    assert(out.getDouble(2) === 5.0)     // degree-regular
    assert(out.getDouble(3) === 0.0)     // zero-variance guard
    val real = graft.llm.Ann.knnAssortativityQ(spark, sfDir).head()
    assert(real.getDouble(3) >= -1.0 && real.getDouble(3) <= 1.0)
    assert(real.getLong(1) > 0L && real.getDouble(2) <= 5.0)
  }

  test("text_burstiness: a term packed into one doc scores Var/Mean " +
    "7, a perfectly even term scores 0") {
    import spark.implicits._
    val docs = (0 until 8).map { i =>
      val bursty = if (i == 0) " aaa" * 8 else ""
      (i.toLong, s"bbb filler$i$bursty")
    }.toDF("doc_id", "text")
    val out = TextOps.textBurstiness(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // aaa: sum x = 8 in one doc of N=8 -> 64/8 - 8/8 = 7.0
    assert(out("aaa") === ((8L, 1L, 7.0)))
    // bbb: one per doc -> 8/8 - 8/8 = 0.0 (deterministic-even,
    // sub-Poisson)
    assert(out("bbb") === ((8L, 8L, 0.0)))
    out.values.foreach(v => assert(v._3 >= 0.0 - 1e-9))
  }

  test("events_autocorrelation: a planted period-2 series alternates " +
    "±(n-k)/n exactly; lags count down the dense grid") {
    import spark.implicits._
    // 2 events in every EVEN hour of a 48-hour window; odd hours are
    // spine zeros -> c = [2,0,2,0,...], mu = 1, biased ACF
    // r_k = ±(n-k)/n
    val rows = for (h <- 0 until 48 if h % 2 == 0; i <- 0 until 2)
      yield (h.toLong * 2 + i, 1L, "click", 1.0,
        new java.sql.Timestamp((1704067200L + h * 3600L) * 1000L),
        """{"k":1}""")
    val out = graft.queries.Analytics3.eventsAutocorrelationOn(
        rows.toDF("event_id", "user_id", "event_type", "value", "ts",
          "props"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.size === 24)
    // series ends on hour 46 (the last even hour): n = 47 dense hours;
    // plain-Scala replay of the biased ACF is the expectation
    val c = (0 until 47).map(t => if (t % 2 == 0) 2.0 else 0.0)
    val n = 47.0
    val mu = c.sum / n
    val den = c.map(x => x * x).sum - n * mu * mu
    for (k <- 1 to 24) {
      val m = 47 - k
      val ab = (0 until m).map(t => (c(t), c(t + k)))
      val num = ab.map { case (a, b) => a * b }.sum -
        mu * ab.map(_._1).sum - mu * ab.map(_._2).sum + m * mu * mu
      val expect = math.rint(num / den * 1e4) / 1e4
      assert(out(k)._1 === m.toLong, s"n_pairs at lag $k")
      assert(math.abs(out(k)._2 - expect) < 2e-4,
        s"lag $k: ${out(k)._2} vs $expect")
      // sign structure of the planted period-2 cycle survives the
      // biased normalization: even lags positive, odd negative
      assert((out(k)._2 > 0) === (k % 2 == 0), s"sign at lag $k")
    }
    val real = graft.queries.Analytics3
      .eventsAutocorrelation(spark, sfDir).collect()
    assert(real.length === 24)
    real.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.001))
  }
}
