package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Ann, TextOps}
import graft.operators.SkewProfile
import graft.queries.{Analytics, Analytics2}

/** Specs for the session's audit/report additions: the key-skew
  * profiler, the closed-vocabulary OOV report, the pivoted revenue
  * matrix, the oracle-checked batch session table, and int8 scalar
  * quantization. */
class AuditOpsSpec extends AnyFunSuite with SparkFixture {

  test("skew_profile: exact counts, shares, ratios and salt factors") {
    import spark.implicits._
    // 12 rows over 5 keys: a×6, b×3, c/d/e ×1 → mean 2.4 rows/key
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d", "e"))
      .toDF("k")
    val out = SkewProfile.skewProfile(df, "k", topK = 2)
      .as[(String, Long, Double, Double, Long)].collect().sortBy(-_._2)
    assert(out.map(r => (r._1, r._2)).toSeq === Seq(("a", 6L), ("b", 3L)))
    val a = out(0); val b = out(1)
    assert(a._3 === 0.5 && b._3 === 0.25)               // share of 12 rows
    assert(a._4 === 2.5 && b._4 === 1.25)               // × mean (2.4)
    assert(a._5 === 3L && b._5 === 2L)                  // ceil(x_mean)
  }

  test("skew_profile: count ties at the top-K boundary break by key asc") {
    import spark.implicits._
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d", "e"))
      .toDF("k")
    val keys = SkewProfile.skewProfile(df, "k", topK = 4)
      .select("key").as[String].collect().toSet
    // c, d, e all count 1 — the 2 remaining slots go lexicographically
    assert(keys === Set("a", "b", "c", "d"))
  }

  test("vocab_coverage: hand corpus, including the cut's lexicographic tie") {
    import spark.implicits._
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    // counts: x→2, y→2, z→1. V=2 admits {x, y}
    val v2 = TextOps.vocabCoverage(docs, vocabSize = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(v2.toSeq === Seq((1L, 3L, 0L, 0.0), (2L, 2L, 1L, 0.5)))
    // V=1: x and y tie at 2 — x wins the binary-compare tie-break
    val v1 = TextOps.vocabCoverage(docs, vocabSize = 1)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(v1.toSeq === Seq((1L, 3L, 1L, 0.3333), (2L, 2L, 2L, 1.0)))
  }

  test("q_pivot_revenue matches the long-format conditional aggregation") {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
    val disc = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
    val expected = Tables.lineitem(spark, sfDir)
      .groupBy(year(col("l_shipdate")).as("ship_year"))
      .agg(
        sum(when(col("l_returnflag") === "A", disc)).cast("double").as("rev_a"),
        sum(when(col("l_returnflag") === "N", disc)).cast("double").as("rev_n"),
        sum(when(col("l_returnflag") === "R", disc)).cast("double").as("rev_r"))
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val got = Analytics2.qPivotRevenue(spark, sfDir)
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_pivot_revenue: a missing cell lands 0.0, not null") {
    import spark.implicits._
    // pivot explicit values include 'R' but no R rows exist for 1995
    val rows = Seq(
      ("A", "1995-03-01", 100.0, 0.1),
      ("N", "1995-06-01", 200.0, 0.0),
      ("A", "1996-03-01", 50.0, 0.0),
      ("R", "1996-07-01", 80.0, 0.25))
      .toDF("l_returnflag", "ship", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    // same pivot body as qPivotRevenue, applied to the synthetic frame
    val out = {
      val flags = Seq("A", "N", "R")
      val p = rows.groupBy(year(col("l_shipdate")).as("ship_year"))
        .pivot("l_returnflag", flags)
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))))
      flags.foldLeft(p) { (df, f) =>
        df.withColumn(s"rev_${f.toLowerCase}",
          coalesce(col(f), lit(0).cast("decimal(12,2)")).cast("double"))
      }.select("ship_year", "rev_a", "rev_n", "rev_r")
    }.as[(Int, Double, Double, Double)].collect().sortBy(_._1)
    assert(out(0) === ((1995, 90.0, 200.0, 0.0)))
    assert(out(1) === ((1996, 50.0, 0.0, 60.0)))
  }

  test("events_sessions agrees with q_user_sessions and respects the gap") {
    val sessions = graft.streaming.StreamAggs.eventsSessionsQ(spark, sfDir)
      .persist()
    val perUser = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("s_sessions"), sum(col("n_events")).as("s_events"))
    val counts = Analytics.qUserSessions(spark, sfDir)
    // same users, same session count, same total event count
    val joined = perUser.join(counts, "user_id").persist()
    assert(joined.count() === counts.count() && joined.count() === perUser.count())
    assert(joined.filter(col("s_sessions") =!= col("n_sessions") ||
      col("s_events") =!= col("n_events")).isEmpty)
    // session invariants: start ≤ end; consecutive sessions of one user
    // are separated by MORE than the 30-minute gap
    assert(sessions.filter(col("start_ms") > col("end_ms")).isEmpty)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("start_ms")
    val gaps = sessions.withColumn("prev_end", lag(col("end_ms"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("start_ms") - col("prev_end") <= graft.streaming.StreamAggs.DefaultGapMs)
    assert(gaps.isEmpty)
    sessions.unpersist(); joined.unpersist()
  }

  test("dedup_eval: identity, disjoint, orientation and duplicate immunity") {
    import spark.implicits._
    import graft.llm.Dedup
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    // self-eval is perfect
    val self = Dedup.dedupEval(truth, truth)
      .as[(Long, Long, Long, Double, Double, Double)].collect()(0)
    assert(self === ((3L, 3L, 3L, 1.0, 1.0, 1.0)))
    // swapped orientation and duplicate emissions must not change scores
    val messy = Seq((2L, 1L), (1L, 2L), (4L, 3L), (6L, 5L), (6L, 5L))
      .toDF("doc_a", "doc_b")
    val m = Dedup.dedupEval(messy, truth)
      .as[(Long, Long, Long, Double, Double, Double)].collect()(0)
    assert(m === ((3L, 3L, 3L, 1.0, 1.0, 1.0)))
    // disjoint sets: zero hits, zero scores, no NaN/null floats
    val other = Seq((7L, 8L)).toDF("doc_a", "doc_b")
    val d = Dedup.dedupEval(other, truth)
      .as[(Long, Long, Long, Double, Double, Double)].collect()(0)
    assert(d === ((1L, 3L, 0L, 0.0, 0.0, 0.0)))
    // partial overlap: P/R/F1 from exact counts (2 cand, 1 hit, 3 truth)
    val part = Seq((1L, 2L), (9L, 10L)).toDF("doc_a", "doc_b")
    val p = Dedup.dedupEval(part, truth)
      .as[(Long, Long, Long, Double, Double, Double)].collect()(0)
    assert(p === ((2L, 3L, 1L, 0.5, 0.3333, 0.4)))
  }

  test("dedup_eval on the real corpus: counts bounded and consistent") {
    val r = graft.llm.Dedup.dedupEvalQ(spark, sfDir).collect()(0)
    val (nc, nt, nh) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nh <= math.min(nc, nt))
    assert(nt > 0)  // the corpus has planted near-dups
    // exact-duplicate pairs (jaccard 1.0) collide in every band — the
    // minhash path cannot miss them, so some hits must exist
    assert(nh > 0)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("cell_topic_terms recovers planted per-cluster vocabularies") {
    import spark.implicits._
    // two well-separated embedding clusters, each with its own vocabulary:
    // cluster 0 near +e1 talks about "alpha beta", cluster 1 near +e2
    // about "gamma delta"; "common" appears everywhere (df = all cells →
    // lowest idf, must not win a top slot over the planted terms)
    val emb = (0 until 40).map { i =>
      val c = i % 2
      val base = if (c == 0) Seq(1.0f, 0.05f * (i % 5)) else Seq(0.05f * (i % 5), 1.0f)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val docs = (0 until 40).map { i =>
      val t = if (i % 2 == 0) "alpha beta alpha common" else "gamma delta gamma common"
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val cents = Ann.trainSemanticCentroids(emb, nlist = 2, iters = 4)
    val cells = Ann.semanticCells(emb, cents)
    // sanity: the quantizer separates the two planted clusters
    assert(cells.select("cid").distinct().count() === 2)
    val top = Ann.cellTopicTerms(docs, cells, topK = 2)
      .select("cid", "term").as[(Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(top.values.toSet === Set(Set("alpha", "beta"), Set("gamma", "delta")))
  }

  test("cell_topic_terms on the real corpus: bounded ranks, no cross-cell dupes") {
    val out = Ann.corpusTopicTermsQ(spark, sfDir).persist()
    val perCell = out.groupBy("cid").agg(count(lit(1)).as("n"))
    assert(perCell.filter(col("n") > 5).isEmpty)
    assert(out.count() > 0)
    // df is consistent: every reported term's df ≤ number of cells
    val nCells = out.select("cid").distinct().count()
    assert(out.filter(col("df") > nCells).isEmpty)
    out.unpersist()
  }

  test("embed_quantize: hand-computed codes, saturation, zero-dim safety") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, -0.5f, 0.0f)),
      (2L, Seq(0.5f, 0.25f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Ann.embedQuantize(emb, dim = 3)
      .select(col("vec_id"), col("q")).as[(Long, Seq[Long])].collect()
      .map(r => r._1 -> r._2).toMap
    // s = (1/127, 0.5/127, 0): extremes pin to ±127; 63.5 rounds HALF_UP
    // to 64; the all-zero dimension quantizes to 0, never 0/0
    assert(q(1L) === Seq(127L, -127L, 0L))
    assert(q(2L) === Seq(64L, 64L, 0L))
    assert(q(3L) === Seq(0L, 0L, 0L))
  }

  test("embed_quantize: real corpus — codes in range, error within s/2") {
    val q = Ann.embedQuantize(Tables.embeddings(spark, sfDir))
    val bad = q.select(
      size(filter(col("q"), e => abs(e) > 127L)).as("oor"),
      // per-dim |v − q·s| ≤ s/2 (+ half-ulp slack): round() guarantees it
      size(filter(
        zip_with(zip_with(col("v"), zip_with(col("q"), col("s"), (a, b) => a * b),
          (x0, d) => abs(x0 - d)), col("s"), (e, sc) => e > sc / 2 * 1.0000001),
        x => x)).as("overr"))
      .agg(sum(col("oor")).as("oor"), sum(col("overr")).as("overr"))
      .collect()(0)
    assert(bad.getLong(0) === 0L && bad.getLong(1) === 0L)
    // the driver entry's audit columns: every vector reconstructs within
    // 2% relative error and saturation only ever hits a few dims
    val audit = Ann.embedQuantizeQ(spark, sfDir)
    assert(audit.filter(col("recon_err") > 0.02).isEmpty)
    assert(audit.filter(col("n_sat") > 8).isEmpty)
  }

  test("q_revenue_concentration: monotone deciles, closure, top-heavy") {
    val out = Analytics2.qRevenueConcentration(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    assert(out.length === 10)
    val shares = out.map(_.getDouble(3))
    // deciles are revenue-ordered: share non-increasing from the top
    assert(shares.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(math.abs(shares.sum - 1.0) < 1e-2)
    assert(math.abs(out.last.getDouble(4) - 1.0) < 1e-3)
    // concentration exists: the top decile outweighs a uniform share
    assert(shares.head > 0.1)
    // customer counts balance within ntile's ±1 contract
    val counts = out.map(_.getLong(1))
    assert(counts.max - counts.min <= 1)
  }

  test("q_basket_pairs: hand-worked lift on a planted basket fixture") {
    import spark.implicits._
    // 6 orders: parts (1,2) together in 3, part 3 everywhere (lift ~1
    // with anything), part 4 alone once
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 3L),
      (4L, 3L), (4L, 4L),
      (5L, 3L), (6L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Analytics2.qBasketPairsOn(rows, topK = 10, minOrders = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // lift(1,2) = P(both)/(P(1)P(2)) = (3/6)/((3/6)(3/6)) = 2.0
    assert(out((1L, 2L))._3 === 3L && out((1L, 2L))._4 === 2.0)
    // (1,3) and (2,3): (3/6)/((3/6)(6/6)) = 1.0 — no signal
    assert(out((1L, 3L))._4 === 1.0 && out((2L, 3L))._4 === 1.0)
    // min-support: no other pair reaches 3 orders
    assert(out.size === 3)
  }

  test("text_script_profile: planted scripts, mixed flag, zero-letter doc") {
    import spark.implicits._
    val docs = Seq(
      (0L, "pure latin words only here"),
      (1L, "привет мир"),                        // pure cyrillic
      (2L, "password with а planted"),            // latin + 1 cyrillic а
      (3L, "123 456 !!!")                         // no letters at all
    ).toDF("doc_id", "text")
    val out = TextOps.textScriptProfile(docs)
      .as[(Long, Long, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L)._6 === 1.0 && !out(0L)._7)
    assert(out(1L)._4 === 9L && out(1L)._6 === 1.0 && !out(1L)._7)
    // 20 latin letters + 1 cyrillic homoglyph → share 20/21 < 0.96 is
    // still above 0.9 — construct the flagged case explicitly
    assert(out(2L)._4 === 1L && out(2L)._2 === 19L)
    val flagged = TextOps.textScriptProfile(
      Seq((9L, "abc где")).toDF("doc_id", "text")).head()
    assert(flagged.getBoolean(6), "3+3 split must flag mixed_script")
    assert(out(3L)._6 === 0.0 && out(3L)._7)
  }

  test("events_burst: planted spike flags, cold start and flat series never do") {
    import spark.implicits._
    // 30 flat hours of 10 events for type a, then one 100-event hour;
    // type b stays flat throughout (the sd floor keeps flat+spike
    // alarmable without making ±1 noise alarm)
    val base = 1704067200L // 2024-01-01 00:00 UTC
    val rows = (0 until 31).flatMap { h =>
      val ts = java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(base + h * 3600L))
      val na = if (h == 30) 100 else 10
      (0 until na).map(_ => (ts, "a")) ++ (0 until 10).map(_ => (ts, "b"))
    }
    val events = rows.toDF("ts", "event_type")
    val out = Analytics2.eventsBurstOn(events)
      .as[(java.sql.Timestamp, String, Long, Double, Double, Boolean)]
      .collect()
    val bursts = out.filter(_._6)
    // exactly one alarm: type a's spike hour (zero variance in the
    // baseline never alarms, so the flat hours and type b are silent)
    assert(bursts.length === 1)
    assert(bursts.head._2 === "a" && bursts.head._3 === 100L)
    // cold start: the first 12 hours carry the -1 sentinel baseline
    assert(out.filter(_._4 === -1.0).nonEmpty)
  }

  test("corpus_sample_stratified: exactly k per language, deterministic") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val out = TextOps.corpusSampleStratified(docs, k = 20)
    val per = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val langN = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    langN.foreach { case (l, n) => assert(per(l) === math.min(20L, n)) }
    // two runs agree exactly
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = TextOps.corpusSampleStratified(docs, k = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("events_dau_wau: bounds and brute-force agreement on a sample day") {
    import spark.implicits._
    val out = Analytics2.eventsDauWau(spark, sfDir)
    // DAU never exceeds WAU; stickiness in (0, 1]
    assert(out.filter(col("dau") > col("wau")).isEmpty)
    assert(out.filter(col("stickiness") <= 0 || col("stickiness") > 1).isEmpty)
    // brute-force one day: WAU(day) = distinct users in [day-6, day]
    val ev = Tables.events(spark, sfDir)
      .select(datediff(col("ts").cast("date"),
        lit("1990-01-01").cast("date")).cast("long").as("d"), col("user_id"))
    val someDay = out.select("day_n").as[Long].collect().max
    val brute = ev.filter(col("d") >= someDay - 6 && col("d") <= someDay)
      .select("user_id").distinct().count()
    val got = out.filter(col("day_n") === someDay)
      .select("wau").as[Long].head()
    assert(got === brute)
  }

  test("corpus_report: one row agreeing with independent drill-downs") {
    val docs = Tables.documents(spark, sfDir)
    val r = TextOps.corpusReportQ(spark, sfDir).head()
    assert(r.getLong(0) === docs.count())
    assert(r.getLong(1) ===
      graft.llm.Dedup.dedupExact(docs).count())
    val passRate = TextOps.textGopher(docs, minWords = 8, minStop = 1)
      .filter(col("gopher_pass")).count().toDouble / docs.count()
    assert(math.abs(r.getDouble(7) - passRate) < 1e-4)
    assert(r.getLong(5) ===
      TextOps.textTokens(docs).agg(sum("ws_tokens")).head().getLong(0))
  }

  test("events_paths: hand-worked journeys and windowing") {
    import spark.implicits._
    // user 1: a b a b  → triples (a,b,a), (b,a,b); user 2: a b a →
    // (a,b,a); user 3: one event, no triple
    def ev(id: Long, uid: Long, typ: String) =
      (id, uid, typ, java.sql.Timestamp.valueOf(s"2024-01-01 00:0$id:00"))
    val events = Seq(
      ev(1, 1, "a"), ev(2, 1, "b"), ev(3, 1, "a"), ev(4, 1, "b"),
      ev(5, 2, "a"), ev(6, 2, "b"), ev(7, 2, "a"),
      ev(8, 3, "a")
    ).toDF("event_id", "user_id", "event_type", "ts")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val out = events
      .withColumn("b2", lead(col("event_type"), 1).over(w))
      .withColumn("c2", lead(col("event_type"), 2).over(w))
      .filter(col("b2").isNotNull && col("c2").isNotNull)
      .groupBy(col("event_type"), col("b2"), col("c2")).count()
      .as[(String, String, String, Long)].collect().toSet
    assert(out === Set(("a", "b", "a", 2L), ("b", "a", "b", 1L)))
    // and the driver entry ranks with a total order at the cut
    val paths = Analytics2.eventsPaths(spark, sfDir).collect()
    assert(paths.length === 20)
    val counts = paths.map(_.getLong(3))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("events_seasonality: full grid bounds and conservation") {
    val ev = Tables.events(spark, sfDir)
    val out = Analytics2.eventsSeasonality(spark, sfDir)
    assert(out.filter(col("iso_dow") < 1 || col("iso_dow") > 7 ||
      col("hod") < 0 || col("hod") > 23).isEmpty)
    val agg = out.agg(sum(col("n_events")), sum(col("share"))).head()
    assert(agg.getLong(0) === ev.count())
    // 168 cells rounded 4dp each: the share total lands within 168·5e-5
    assert(math.abs(agg.getDouble(1) - 1.0) < 0.01)
    // distinct actives per cell never exceed the cell's event count
    assert(out.filter(col("n_users") > col("n_events")).isEmpty)
  }

  test("ann_ivf_balance: planted cells, explicit empties, conservation") {
    import spark.implicits._
    // 3 fixed centroids; 4 vectors near axis-x, 2 near axis-y, none near -x
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.95f, -0.05f)), (3L, Array(1.0f, 0.1f)),
      (4L, Array(0.0f, 1.0f)), (5L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0))
    val out = Ann.ivfBalance(vecs, cents)
      .as[(Int, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(0)._2 === 4L && out(1)._2 === 2L)
    // the unused centroid surfaces explicitly at zero
    assert(out(2)._2 === 0L && out(2)._3 === 0.0 && out(2)._4 === 0.0)
    // share sums to 1, balance = share · nlist (mean fill = 2)
    assert(out.values.map(_._2).sum === 6L)
    assert(out(0)._3 === math.rint(4.0 / 6.0 * 1e4) / 1e4 && out(0)._4 === 2.0)
    // degenerate nlist=1: everything in the one cell at balance 1.0
    val one = Ann.ivfBalance(vecs, Seq(Array(1.0, 0.0)))
      .as[(Int, Long, Double, Double)].head()
    assert(one === ((0, 6L, 1.0, 1.0)))
  }

  test("ann_ivf_balance on the real corpus: conservation and consistency") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Ann.ivfBalanceQ(spark, sfDir)
    assert(out.count() === 16L)
    assert(out.agg(sum(col("n_vecs"))).head().getLong(0) === emb.count())
    val bad = out.filter(
      abs(col("balance") - round(col("share") * 16.0, 4)) > 2e-4)
    assert(bad.isEmpty)
  }

  test("filter_agreement: hand-worked matrix over three planted gates") {
    import spark.implicits._
    // 8 docs, flags planted via the id: A = id < 6 (6 keeps),
    // B = id % 2 == 0 (4 keeps, 3 shared with A), C = false everywhere
    val docs = (0L until 8L).toDF("doc_id")
    val out = TextOps.filterAgreement(docs, Seq(
      "a" -> (col("doc_id") < 6),
      "b" -> (col("doc_id") % 2 === 0),
      "c" -> lit(false)))
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val ab = out(("a", "b"))
    // agree on {0,2,4} (both) and {7} (neither) = 4/8; union = 7
    assert((ab._3, ab._4, ab._5, ab._6) === ((8L, 6L, 4L, 3L)))
    assert(ab._7 === 0.5 && ab._8 === math.rint(3.0 / 7.0 * 1e4) / 1e4)
    val ac = out(("a", "c"))
    // c keeps nothing: overlap 0, agreement = the 2 docs a also drops,
    // and the empty-union Jaccard guard lands 0.0 (not NaN)
    assert((ac._4, ac._5, ac._6, ac._7) === ((6L, 0L, 0L, 0.25)))
    val bc = out(("b", "c"))
    assert(bc._6 === 0L && bc._7 === 0.5 && bc._8 === 0.0)
    // the full-false pair: only 3 unordered pairs, i<j order preserved
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("filter_agreement on the real corpus: bounds and symmetry-free order") {
    val out = TextOps.filterAgreementQ(spark, sfDir).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val (n, na, nb, both) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(both <= math.min(na, nb) && na <= n && nb <= n)
      val agree = r.getDouble(6)
      assert(agree >= 0.0 && agree <= 1.0)
    }
  }
}
