package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextOps

/** Round-11 session-B operators: readability, attribution, graph
  * triangles, binary-embedding retrieval, incremental SCD2, KN
  * perplexity. */
class Round11SessionBSpec extends AnyFunSuite with SparkFixture {

  test("text_readability matches the hand-computed Flesch fixture") {
    import spark.implicits._
    // "The cat sat. It ran!" — words 5, sentences 2 ([.] [!]),
    // syllables 5 (one vowel group per token) →
    // flesch = 206.835 − 1.015·(5/2) − 84.6·(5/5) = 119.6975
    // fk     = 0.39·2.5 + 11.8·1 − 15.59 = −2.815
    val docs = Seq((1L, "The cat sat. It ran!")).toDF("doc_id", "text")
    val r = TextOps.textReadability(docs).collect().head
    assert(r.getLong(1) === 5L && r.getLong(2) === 2L &&
      r.getLong(3) === 5L)
    assert(r.getDouble(4) === 119.6975 && r.getDouble(5) === -2.815)
  }

  test("text_readability floors: headline = 1 sentence, vowel-less " +
    "token = 1 syllable") {
    import spark.implicits._
    val docs = Seq(
      (1L, "no terminal punctuation here"), // 4 words, 1 sentence
      (2L, "xyz 123")                       // 2 words, 0 vowel groups
    ).toDF("doc_id", "text")
    val out = TextOps.textReadability(docs).orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 1L)
    // xyz has a y → 1 group; 123 has none → floored to 1
    assert(out(1).getLong(3) === 2L)
  }

  test("events_attribution matches the hand-built journey fixture") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-10 12:00:00")
    def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    val events = Seq(
      // user 1: view → click → purchase: first=view, last=click
      (1L, at(0), 1L, "view", 0.0),
      (2L, at(60), 1L, "click", 0.0),
      (3L, at(120), 1L, "purchase", 10.0),
      // user 2: cold purchase → (direct)
      (4L, at(0), 2L, "purchase", 7.0),
      // user 3: touch OUTSIDE the 168h lookback → (direct)
      (5L, at(0), 3L, "click", 0.0),
      (6L, at(8L * 86400), 3L, "purchase", 3.0),
      // user 4: same-second tie — event_id breaks it: first=signup(7),
      // last=error(8)
      (7L, at(0), 4L, "signup", 0.0),
      (8L, at(0), 4L, "error", 0.0),
      (9L, at(30), 4L, "purchase", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.queries.Analytics3.eventsAttributionOn(events)
      .orderBy("touch_type")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("(direct)", 2L, 2L, 10.0, 10.0),
      ("click", 0L, 1L, 0.0, 10.0),
      ("error", 0L, 1L, 0.0, 5.0),
      ("signup", 1L, 0L, 5.0, 0.0),
      ("view", 1L, 0L, 10.0, 0.0)))
  }

  test("events_attribution: first==last when exactly one touch") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-10 12:00:00")
    val events = Seq(
      (1L, t0, 1L, "view", 0.0),
      (2L, new java.sql.Timestamp(t0.getTime + 1000L), 1L, "purchase",
        2.5)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.queries.Analytics3.eventsAttributionOn(events)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "view" && r.getLong(1) === 1L &&
      r.getLong(2) === 1L && r.getDouble(3) === 2.5 &&
      r.getDouble(4) === 2.5)
  }

  test("knn_triangles: planted clique closes, satellite stays open") {
    import spark.implicits._
    // A/B/C a tight 2-D cluster (k=2 → their mutual graph is the
    // triangle), D orthogonal (in nobody's top-2 mutually)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f)),
      (2L, Array(0.95f, 0.2f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.llm.Ann.knnTriangles(vecs, k = 2)
      .orderBy("vec_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 1L, 1.0), (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 0L, 0L, 0.0)))
  }

  test("knn_triangles matches a randomized plain-Scala replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(411)
    val n = 40
    val dim = 6
    val data = (0L until n.toLong).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val k = 4
    // plain-Scala mirror of knnGraph's (sim desc, id asc) top-k +
    // mutual intersect + ordered-triple triangle count
    val v = data.map { case (id, a) => id -> a.map(_.toDouble) }.toMap
    def sim(a: Long, b: Long): Double = {
      val (x, y) = (v(a), v(b))
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- 0 until dim) {
        d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i)
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val ids = data.map(_._1)
    val nn = ids.map { a =>
      a -> ids.filter(_ != a)
        .sortBy(b => (-sim(a, b), b)).take(k).toSet
    }.toMap
    val mutual = (for {
      a <- ids; b <- nn(a) if a < b && nn(b).contains(a)
    } yield (a, b)).toSet
    val adj = ids.map(x =>
      x -> mutual.collect { case (a, b) if a == x => b
                            case (a, b) if b == x => a }).toMap
    val triangles = ids.map { x =>
      val ns = adj(x).toSeq
      x -> (for {
        i <- ns.indices; j <- (i + 1) until ns.size
        if mutual.contains((ns(i) min ns(j), ns(i) max ns(j)))
      } yield 1).size.toLong
    }.toMap
    val out = graft.llm.Ann.knnTriangles(
        data.toDF("vec_id", "embedding"), k)
      .orderBy("vec_id").as[(Long, Long, Long, Double)].collect()
    out.foreach { case (id, d, t, c) =>
      assert(d === adj(id).size.toLong, s"degree of $id")
      assert(t === triangles(id), s"triangles of $id")
      val expC = if (d >= 2)
        BigDecimal(2.0 * t / (d * (d - 1)).toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(c === expC, s"coefficient of $id")
    }
  }

  test("embed_binary_topk ranks by exact sign-bit hamming") {
    import spark.implicits._
    // 4-dim sign patterns: q=(+,+,+,+); candidates at hamming 0,1,2,4
    val vecs = Seq(
      (0L, Array(1f, 1f, 1f, 1f)),         // the query
      (1L, Array(2f, 3f, 4f, 5f)),         // hamming 0
      (2L, Array(-1f, 1f, 1f, 1f)),        // hamming 1
      (3L, Array(-1f, -1f, 1f, 1f)),       // hamming 2
      (4L, Array(-1f, -1f, -1f, -1f)),     // hamming 4
      (5L, Array(9f, 9f, 9f, 9f))          // hamming 0 — tie with 1
    ).toDF("vec_id", "embedding")
    val out = graft.llm.Ann
      .embedBinaryTopK(vecs, nQueries = 1, k = 5, dim = 4)
      .orderBy("rank").as[(Long, Int, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 1, 1L, 0L), (0L, 2, 5L, 0L), (0L, 3, 2L, 1L),
      (0L, 4, 3L, 2L), (0L, 5, 4L, 4L)))
  }

  test("embed_binary_topk matches a randomized plain-Scala replay " +
    "across the 64-bit word boundary") {
    import spark.implicits._
    val rnd = new scala.util.Random(911)
    val n = 60
    val dim = 96 // spans two packed words
    val data = (0L until n.toLong).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val bits = data.map { case (id, a) => id -> a.map(_ > 0f) }.toMap
    def ham(a: Long, b: Long): Long =
      bits(a).zip(bits(b)).count { case (x, y) => x != y }.toLong
    val expected = (0L until 3L).flatMap { q =>
      (0L until n.toLong).filter(_ != q)
        .sortBy(c => (ham(q, c), c)).take(7).zipWithIndex
        .map { case (c, r) => (q, r + 1, c, ham(q, c)) }
    }
    val out = graft.llm.Ann
      .embedBinaryTopK(data.toDF("vec_id", "embedding"),
        nQueries = 3, k = 7, dim = dim)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(out === expected)
  }

  test("cdc_scd2_incremental == full rebuild on randomized splits") {
    import spark.implicits._
    import graft.cdc.Cdc
    val rnd = new scala.util.Random(1121)
    val types = Seq("signup", "click", "purchase", "view", "error")
    val rows = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(25).toLong + 1L,
        types(rnd.nextInt(types.size)), rnd.nextDouble(),
        new java.sql.Timestamp(1704067200000L + rnd.nextInt(2000000) * 1000L),
        s"""{"k":${rnd.nextInt(100)}}""")
    }
    val events = rows
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val full = Cdc.scd2(events)
    for (cutSec <- Seq(500000, 1000000, 1500000)) {
      val t = new java.sql.Timestamp(1704067200000L + cutSec * 1000L)
      val inc = Cdc.scd2Incremental(
        Cdc.scd2(events.filter(col("ts") <= lit(t))),
        events.filter(col("ts") > lit(t)))
      assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
        s"split at +${cutSec}s diverges from the full rebuild")
    }
  }

  test("cdc_scd2_incremental: delete-then-readd across the split, " +
    "empty batch is identity") {
    import spark.implicits._
    import graft.cdc.Cdc
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 is created then DELETED before the split; the batch
    // re-creates it — history stays closed, one fresh current row
    val events = Seq(
      (1L, 1L, "signup", 1.0, ts("2024-01-01 00:00:00"), """{"k":1}"""),
      (2L, 1L, "error", 1.0, ts("2024-01-02 00:00:00"), """{"k":2}"""),
      (3L, 1L, "signup", 1.0, ts("2024-01-20 00:00:00"), """{"k":3}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val cut = lit("2024-01-10").cast("timestamp")
    val inc = Cdc.scd2Incremental(
      Cdc.scd2(events.filter(col("ts") <= cut)),
      events.filter(col("ts") > cut))
    val full = Cdc.scd2(events)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
    assert(inc.filter(col("is_current")).count() === 1L)
    // empty batch: the table passes through byte-identical
    val base = Cdc.scd2(events)
    val idem = Cdc.scd2Incremental(base, events.filter(lit(false)))
    assert(idem.exceptAll(base).isEmpty && base.exceptAll(idem).isEmpty)
  }

  test("cdc_scd2_incremental: out-of-order batch trips the strict " +
    "guard; strict=false folds it anyway") {
    import spark.implicits._
    import graft.cdc.Cdc
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val history = Seq(
      (1L, 1L, "signup", 1.0, ts("2024-01-01 00:00:00"), """{"k":1}"""),
      (2L, 1L, "click", 1.0, ts("2024-01-10 00:00:00"), """{"k":2}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    // batch change lands INSIDE user 1's closed [01-01, 01-10) interval
    val late = Seq(
      (3L, 1L, "view", 1.0, ts("2024-01-05 00:00:00"), """{"k":3}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val base = Cdc.scd2(history)
    val err = intercept[IllegalArgumentException] {
      Cdc.scd2Incremental(base, late).collect()
    }
    assert(err.getMessage.contains("in-order contract"))
    // non-strict still runs (accepting the stale closed row)
    assert(Cdc.scd2Incremental(base, late, strict = false).count() === 3L)
    // an in-order batch against the same history passes the guard
    val ok = Seq(
      (4L, 1L, "purchase", 1.0, ts("2024-01-20 00:00:00"), """{"k":4}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val inc = Cdc.scd2Incremental(base, ok)
    val full = Cdc.scd2(history.unionByName(ok))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("text_perplexity_kn matches the hand-computed fixture") {
    import spark.implicits._
    // "a b a b a c": c(ab)=2 c(ba)=2 c(ac)=1; ca: a=3 b=2;
    // N1+(a·)=2 N1+(b·)=1; N1+(·b)=1 N1+(·a)=1 N1+(·c)=1; types=3
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val pab = (2 - 0.75) / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    val pba = (2 - 0.75) / 2 + 0.75 * 1 / 2 * (1.0 / 3)
    val pac = (1 - 0.75) / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    def l2(x: Double) = math.log(x) / math.log(2)
    val bits = BigDecimal(
      -(2 * l2(pab) + 2 * l2(pba) + l2(pac)) / 5)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = graft.llm.TextOps.textPerplexityKn(docs).collect().head
    assert(r.getLong(1) === 5L)
    assert(math.abs(r.getDouble(2) - bits) < 2e-4)
  }

  test("text_perplexity_kn separates single-context collocation " +
    "tokens the JM model cannot see") {
    import spark.implicits._
    // francisco and common have IDENTICAL unigram counts, but
    // francisco completes 2 contexts while common completes 11 —
    // JM (unigram backoff) scores the two probe docs equally; KN
    // (continuation backoff) penalizes the collocation-bound token
    val docs = (
      (1 to 10).map(i => (i.toLong, "san francisco")) ++
      (1 to 10).map(i => (10L + i, s"u$i common")) ++
      Seq((21L, "probea francisco"), (22L, "probeb common"))
    ).toDF("doc_id", "text")
    val kn = graft.llm.TextOps.textPerplexityKn(docs)
      .filter(col("doc_id") >= 21L).orderBy("doc_id")
      .select("bits_per_transition").as[Double].collect()
    val jm = graft.llm.TextOps.textPerplexityBigram(docs)
      .filter(col("doc_id") >= 21L).orderBy("doc_id")
      .select("bits_per_transition").as[Double].collect()
    assert(jm(0) === jm(1), "JM sees the two probes as identical")
    assert(kn(0) > kn(1) + 0.5,
      "KN must penalize the single-context token")
  }

  test("cdc_gap_audit counts each anomaly class exactly once") {
    import spark.implicits._
    import graft.cdc.Cdc
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // event types: signup=c, view=r, error=d, click=u
    val events = Seq(
      // user 1: clean c → u
      (1L, 1L, "signup", ts("2024-01-01 00:00:00")),
      (2L, 1L, "click", ts("2024-01-02 00:00:00")),
      // user 2: orphan update
      (3L, 2L, "click", ts("2024-01-01 00:00:00")),
      // user 3: orphan delete
      (4L, 3L, "error", ts("2024-01-01 00:00:00")),
      // user 4: double create
      (5L, 4L, "signup", ts("2024-01-01 00:00:00")),
      (6L, 4L, "signup", ts("2024-01-02 00:00:00")),
      // user 5: double delete
      (7L, 5L, "signup", ts("2024-01-01 00:00:00")),
      (8L, 5L, "error", ts("2024-01-02 00:00:00")),
      (9L, 5L, "error", ts("2024-01-03 00:00:00")),
      // user 6: update after delete (resurrection)
      (10L, 6L, "signup", ts("2024-01-01 00:00:00")),
      (11L, 6L, "error", ts("2024-01-02 00:00:00")),
      (12L, 6L, "click", ts("2024-01-03 00:00:00")),
      // user 7: the SECOND-arrived change carries an EARLIER source ts
      (19L, 7L, "signup", ts("2024-01-01 00:00:00")),
      (20L, 7L, "click", ts("2024-01-05 00:00:00")),
      (21L, 7L, "click", ts("2024-01-04 00:00:00"))
    ).map { case (e, u, t, s) => (e, u, t, 1.0, s, """{"k":1}""") }
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val r = Cdc.gapAudit(events).collect().head
    assert(r.getLong(0) === 15L && r.getLong(1) === 7L) // changes, keys
    assert(r.getLong(2) === 1L, "orphan_updates")
    assert(r.getLong(3) === 1L, "orphan_deletes")
    assert(r.getLong(4) === 1L, "double_creates")
    assert(r.getLong(5) === 1L, "double_deletes")
    assert(r.getLong(6) === 1L, "resurrect_updates")
    assert(r.getLong(7) === 1L, "late_arrivals")
    assert(r.getLong(8) === 86400000L, "max_lateness_ms = one day")
  }

  test("knn_modularity matches the hand-computed partition terms") {
    import spark.implicits._
    // mutual graph = triangle A-B-C (m=3), D isolated.
    // labels {A,B}=0, {C,D}=1: q0 = 1/3 − (4/6)², q1 = 0 − (2/6)²
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f), 0),
      (2L, Array(0.95f, 0.2f), 1),
      (3L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.llm.Ann.knnModularity(vecs, k = 2)
      .orderBy("label").as[(Int, Long, Long, Long, Double)]
      .collect().toSeq
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq(
      (0, 2L, 1L, 4L, r4(1.0 / 3 - (4.0 / 6) * (4.0 / 6))),
      (1, 2L, 0L, 2L, r4(0.0 / 3 - (2.0 / 6) * (2.0 / 6)))))
    // aligned labels: one community holding every edge → Q = 1−1 = 0
    val aligned = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f), 0),
      (2L, Array(0.95f, 0.2f), 0),
      (3L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out2 = graft.llm.Ann.knnModularity(aligned, k = 2)
      .orderBy("label").as[(Int, Long, Long, Long, Double)]
      .collect().toSeq
    assert(out2 === Seq((0, 3L, 3L, 6L, 0.0), (1, 1L, 0L, 0L, 0.0)))
  }

  test("knn_modularity invariants hold on the real embeddings") {
    val out = graft.llm.Ann.knnModularity(
      Tables.embeddings(spark, sfDir)).collect()
    assert(out.map(_.getLong(1)).sum === 500L)
    // each term is bounded by the community's edge fraction ≤ 1
    assert(out.forall(r => r.getDouble(4) <= 1.0))
    // degree mass double-counts every edge exactly twice
    val m = out.map(_.getLong(2)).sum
    assert(out.map(_.getLong(3)).sum >= 2 * m)
  }

  test("events_forecast_baseline: a perfectly weekly series zeroes " +
    "the seasonal MAE but not persistence") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // two weeks, weekly pattern: 1 event/hour for 84h then 2/hour
    val rows = (for {
      h <- 0 until 336
      i <- 0 until (if (h % 168 < 84) 1 else 2)
    } yield (h * 10L + i, new java.sql.Timestamp(t0 + h * 3600000L),
      1L, "click", 1.0, """{"k":1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.queries.Analytics3.eventsForecastBaselineOn(rows)
      .collect().head
    assert(r.getString(0) === "click")
    assert(r.getLong(1) === 168L)
    assert(r.getDouble(2) === 0.0, "seasonal naive is exact here")
    // persistence misses the two level shifts in the eval week
    val pe = BigDecimal(2.0 / 168)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === pe)
    assert(r.getDouble(4) === 0.0, "skill ratio with zero numerator")
  }

  test("events_forecast_baseline: missing hours count as real zeros") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // one event at hour 0 and one at hour 169 — the 168 hours between
    // are dense zeros; at eval hour 168 the seasonal forecast is
    // count[0] = 1 vs actual 0, at hour 169 it is count[1] = 0 vs 1
    val rows = Seq(
      (1L, new java.sql.Timestamp(t0), 1L, "view", 1.0, """{"k":1}"""),
      (2L, new java.sql.Timestamp(t0 + 169L * 3600000L), 1L, "view",
        1.0, """{"k":1}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.queries.Analytics3.eventsForecastBaselineOn(rows)
      .collect().head
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0, "both eval hours miss by exactly 1")
  }

  test("events_lifecycle matches the hand-built growth ledger") {
    import spark.implicits._
    // epoch weeks w, w+1, w+2:
    //   u1 active all three weeks        (new, retained, retained)
    //   u2 active w only                 (new; churns at w+1)
    //   u3 active w and w+2              (new; churns at w+1; resurrects)
    //   u4 active w+1 only               (new at w+1; churns at w+2)
    val base = 1704067200L // 2024-01-01, week-aligned enough
    def at(week: Int) =
      new java.sql.Timestamp((base / 604800 * 604800 + week * 604800L +
        3600L) * 1000L)
    val rows = Seq(
      (1L, at(0), 1L), (2L, at(1), 1L), (3L, at(2), 1L),
      (4L, at(0), 2L),
      (5L, at(0), 3L), (6L, at(2), 3L),
      (7L, at(1), 4L)
    ).map { case (e, t, u) => (e, t, u, "click", 1.0, """{"k":1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.queries.Analytics3.eventsLifecycleOn(rows)
      .orderBy("week")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    val w0 = out.head._1
    assert(out.map { case (w, a, n, r, rs, c, q) =>
      (w - w0, a, n, r, rs, c, q) } === Seq(
      (0L, 3L, 3L, 0L, 0L, 0L, 0.0),
      (1L, 2L, 1L, 1L, 0L, 2L, 0.5),
      (2L, 2L, 0L, 1L, 1L, 1L, 1.0)))
    // the accounting identity: active = new + retained + resurrected
    out.foreach { case (_, a, n, r, rs, _, _) => assert(a === n + r + rs) }
  }

  test("embed_threshold_sweep: monotone, per-τ consistent with the " +
    "direct pass, zero τs still report") {
    import graft.llm.Ann
    val emb = Tables.embeddings(spark, sfDir)
    val grid = Seq(0.4, 0.7, 0.99)
    val out = Ann.embedThresholdSweep(emb, grid).orderBy("tau").collect()
    assert(out.map(_.getDouble(0)).toSeq === grid)
    val pairCounts = out.map(_.getLong(1))
    assert(pairCounts.sliding(2).forall(w => w(0) >= w(1)),
      "pair counts must not increase with tau")
    // each sweep row equals an independent dedupEmbed run at that tau
    for ((tau, i) <- grid.zipWithIndex) {
      assert(Ann.dedupEmbed(emb, tau = tau).count() === pairCounts(i),
        s"sweep row at tau=$tau")
    }
    assert(out.forall(r => r.getLong(2) <= 2 * r.getLong(1) &&
      r.getDouble(3) <= 1.0))
  }

  test("session-B plan pins: readability shuffle-free; gap audit and " +
    "attribution share ONE user_id exchange") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // readability: a pure projection fused into the scan
    val pr = plan(graft.llm.TextOps.textReadability(
      Tables.documents(spark, sfDir)))
    assert(!pr.contains("Exchange"), "readability must not shuffle")
    val readSchemas = "ReadSchema: struct<([^>]*)>?".r
      .findAllMatchIn(pr).map(_.group(1)).toList
    assert(readSchemas.nonEmpty &&
      readSchemas.forall(_.split(",").length <= 2),
      s"readability reads more than (doc_id, text): $readSchemas")
    // gap audit: the canonical-order and arrival-order windows must
    // ride one shared user_id hash exchange
    val pg = plan(graft.cdc.Cdc.gapAudit(Tables.events(spark, sfDir)))
    assert("hashpartitioning\\(user_id".r.findAllIn(pg).size === 1,
      s"gap audit should shuffle the events exactly once:\n$pg")
    // attribution: events shuffle once for the range window. The full
    // operator checkpoints the cell grid (so ITS plan starts from a
    // LogicalRDD); the exchange pin lives on the pre-materialize frame.
    val pa = plan(graft.queries.Analytics3.eventsAttributionCells(
      Tables.events(spark, sfDir)))
    assert("hashpartitioning\\(user_id".r.findAllIn(pa).size === 1,
      "attribution should shuffle the events exactly once")
    assert(!pa.contains("CartesianProduct"), "loop join in attribution")
    val paFull = plan(graft.queries.Analytics3.eventsAttributionOn(
      Tables.events(spark, sfDir)))
    assert(!paFull.contains("CartesianProduct"),
      "loop join in attribution rollups")
  }

  test("text_readability: polysyllabic words raise the FK grade") {
    import spark.implicits._
    val docs = Seq(
      (1L, "we go up now."),
      (2L, "extraordinary considerations nevertheless materialize.")
    ).toDF("doc_id", "text")
    val out = TextOps.textReadability(docs).orderBy("doc_id").collect()
    assert(out(0).getDouble(5) < out(1).getDouble(5))
    assert(out(0).getDouble(4) > out(1).getDouble(4))
  }
}
