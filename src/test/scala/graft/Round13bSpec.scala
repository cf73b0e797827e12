package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Ann, TextProfile}
import graft.queries.Analytics5

/** r13 wave-2 operators: hand fixtures with worked-by-hand expected
  * values for every new entry (the born-oracled discipline — the
  * DuckDB gate checks engine agreement, these check the MATH). */
class Round13bSpec extends AnyFunSuite with SparkFixture {

  private def ts(hour: Long): Timestamp = new Timestamp(hour * 3600000L)

  test("events_periodicity: all-one-phase fixture hits the chi2 identity") {
    import spark.implicits._
    // four events, all at hour ≡ 0 (mod 24): hours 0, 24, 48, 72
    val ev = Seq((1L, ts(0), "a"), (2L, ts(24), "a"),
      (3L, ts(48), "a"), (4L, ts(72), "a"))
      .toDF("event_id", "ts", "event_type")
    val out = Analytics5.eventsPeriodicityOn(ev)
      .orderBy("period_h").collect()
    // T=6: one cell n=4 -> chi2 = 6*16/4 - 4 = 20; T=24: 24*16/4-4 = 92;
    // T=168: four cells n=1 -> 168*4/4 - 4 = 164
    assert(out.map(r => (r.getLong(1), r.getDouble(4))).toSeq ===
      Seq((6L, 20.0), (24L, 92.0), (168L, 164.0)))
    // peak at phase 0 with lift T*max/N
    val t24 = out.find(_.getLong(1) == 24L).get
    assert(t24.getLong(5) === 0L && t24.getDouble(6) === 24.0)
    assert(out.forall(_.getLong(2) === 4L)) // n_events
  }

  test("events_transition_entropy: deterministic chain is 0 bits, coin flip 1 bit") {
    import spark.implicits._
    // user 1 alternates a,b,a,b,a (deterministic); user 2 goes c,c,d
    // and c,d (from c: {c:1, d:2}) — entropy log2(3) - (2log2 2)/3
    val ev = Seq(
      (1L, ts(0), 1L, "a"), (2L, ts(1), 1L, "b"), (3L, ts(2), 1L, "a"),
      (4L, ts(3), 1L, "b"), (5L, ts(4), 1L, "a"),
      (6L, ts(0), 2L, "c"), (7L, ts(1), 2L, "c"), (8L, ts(2), 2L, "d"),
      (9L, ts(3), 2L, "c"), (10L, ts(4), 2L, "d"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics5.eventsTransitionEntropyOn(ev)
      .orderBy("from_type").collect()
    val a = out.find(_.getString(0) == "a").get
    assert(a.getLong(1) === 2L && a.getDouble(3) === 0.0 &&
      a.getString(4) === "b" && a.getDouble(5) === 1.0)
    val c = out.find(_.getString(0) == "c").get
    // from c: next in {c:1, d:2}: H = log2(3) - (0 + 2*1)/3 = 0.9183
    assert(c.getLong(1) === 3L && c.getLong(2) === 2L)
    assert(c.getDouble(3) === 0.9183 && c.getString(4) === "d")
  }

  test("q_benford_audit: lexical first-digit extraction and Benford terms") {
    import spark.implicits._
    val orders = Seq(1013.70, 20.0, 0.35, 199.99)
      .toDF("o_totalprice")
    val li = Seq(5.0).toDF("l_extendedprice")
    val out = Analytics5.qBenfordAuditOn(orders, li).collect()
    val o = out.filter(_.getString(0) == "o_totalprice")
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    // first significant digits: 1 (1013.70), 2 (20.0), 3 (0.35), 1 (199.99)
    assert(o === Map(1 -> 2L, 2 -> 1L, 3 -> 1L))
    val d1 = out.find(r =>
      r.getString(0) == "o_totalprice" && r.getInt(1) == 1).get
    assert(d1.getDouble(3) === 0.5)            // share 2/4
    assert(d1.getDouble(4) === 0.3010)         // log10(2)
    assert(d1.getDouble(5) === 0.199)          // excess
  }

  test("q_price_elasticity: exact slope and corr on constructed moments") {
    import spark.implicits._
    // y = 2x + 1 exactly over discounts 0%, 5%, 10% -> per-percent
    // slope 2, per-unit-discount slope 200, corr 1
    val li = Seq((1L, 0.00, 1.0), (1L, 0.05, 11.0), (1L, 0.10, 21.0))
      .toDF("l_partkey", "l_discount", "l_quantity")
    val part = Seq((1L, "B1")).toDF("p_partkey", "p_brand")
    val out = Analytics5.qPriceElasticityOn(li, part).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.05 && r.getDouble(3) === 11.0)
    assert(r.getDouble(4) === 200.0 && r.getDouble(5) === 1.0)
  }

  test("q_order_value_bands: bands, shares, cumulative revenue") {
    import spark.implicits._
    val orders = Seq(15.0, 150.0, 1500.0, 1500.0).toDF("o_totalprice")
    val out = Analytics5.qOrderValueBandsOn(orders)
      .orderBy("band").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val b3 = out.last
    assert(b3.getLong(1) === 2L)               // two orders
    assert(b3.getDouble(2) === 0.5)            // share_orders
    assert(b3.getDouble(3) === 3000.0)         // revenue
    assert(b3.getDouble(5) === 1.0)            // cum share ends at 1
    assert(b3.getDouble(6) === 1500.0)         // avg_value
  }

  test("q_supplier_hhi: monopoly is 1.0, duopoly is 0.5") {
    import spark.implicits._
    val li = Seq((1L, 100.0, 0.0), (2L, 100.0, 0.0), (3L, 100.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    // nation 1: supplier 1 alone; nation 2: suppliers 2 and 3 equal
    val sup = Seq((1L, 1L), (2L, 2L), (3L, 2L))
      .toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1L, "MONO"), (2L, "DUO")).toDF("n_nationkey", "n_name")
    val out = Analytics5.qSupplierHhiOn(li, sup, nat).collect()
    val mono = out.find(_.getString(0) == "MONO").get
    assert(mono.getLong(1) === 1L && mono.getDouble(3) === 1.0 &&
      mono.getDouble(4) === 1.0 && mono.getDouble(5) === 1.0)
    val duo = out.find(_.getString(0) == "DUO").get
    assert(duo.getLong(1) === 2L && duo.getDouble(3) === 0.5 &&
      duo.getDouble(4) === 2.0 && duo.getDouble(5) === 0.5)
  }

  test("events_value_outliers: selected-row median/MAD and the 3-sigma cut") {
    import spark.implicits._
    val ev = (Seq(10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 100.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("event_id", "event_type", "value")
    val out = Analytics5.eventsValueOutliersOn(ev).collect()
    assert(out.length === 1)
    val r = out.head
    // low median of 8 values (rank 4) = 13; devs sorted: 0,1,1,2,2,3,3,87
    // -> MAD (rank 4) = 2; cut 3*1.4826*2 = 8.8956 -> only 87 exceeds
    assert(r.getLong(1) === 8L)
    assert(r.getDouble(2) === 13.0 && r.getDouble(3) === 2.0)
    assert(r.getLong(4) === 1L && r.getDouble(5) === 0.125)
  }

  test("text_numeric_density: numeric tokens, digit chars, long-number flag") {
    import spark.implicits._
    val docs = Seq(
      (1L, "call 12345678 now"),
      (2L, "price 1.5 or 2,000 up 10%"),
      (3L, "no digits here")).toDF("doc_id", "text")
    val out = TextProfile.textNumericDensity(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) === 3 && out(1L).getInt(2) === 1)
    assert(out(1L).getInt(3) === 8 && out(1L).getBoolean(6))
    // doc 2: tokens 6, numeric 3 ("1.5", "2,000", "10%"), no long number
    assert(out(2L).getInt(1) === 6 && out(2L).getInt(2) === 3)
    assert(!out(2L).getBoolean(6))
    assert(out(3L).getInt(2) === 0 && out(3L).getInt(3) === 0)
  }

  test("vocab_goodturing: V1/V2 mass on a counted fixture") {
    import spark.implicits._
    val docs = Seq((1L, "s", "a b a")).toDF("doc_id", "source", "text")
    val out = TextProfile.vocabGoodTuring(docs).collect()
    assert(out.length === 1)
    val r = out.head
    // counts a:2 b:1 -> V=2 N=3 V1=1 V2=1
    assert(r.getLong(1) === 2L && r.getLong(2) === 3L)
    assert(r.getLong(3) === 1L && r.getLong(4) === 1L)
    assert(r.getDouble(5) === 0.3333)          // p_unseen = 1/3
    assert(r.getDouble(6) === 0.5)             // singleton_share
    assert(r.getDouble(7) === 2.0)             // 2*V2/V1
  }

  test("text_word_length_profile: histogram, tail bucket, cumulative") {
    import spark.implicits._
    val docs = Seq((1L, "s", "a bb ccc " + "x" * 25))
      .toDF("doc_id", "source", "text")
    val out = TextProfile.textWordLengthProfile(docs)
      .orderBy("word_len").collect()
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 2, 3, 20))
    assert(out.forall(_.getDouble(3) === 0.25))
    assert(out.map(_.getDouble(4)).toSeq === Seq(0.25, 0.5, 0.75, 1.0))
  }

  test("text_case_profile: shouting and title-case shares") {
    import spark.implicits._
    val docs = Seq((1L, "NASA Is Great ok")).toDF("doc_id", "text")
    val r = TextProfile.textCaseProfile(docs).collect().head
    assert(r.getInt(1) === 4 && r.getInt(2) === 1)
    assert(r.getDouble(3) === 0.25)            // upper_share
    assert(r.getDouble(4) === 0.5)             // title: "Is", "Great"
    assert(r.getDouble(5) === 0.4615)          // caps 6 / alpha 13
    assert(r.getBoolean(6))                    // > 0.3 -> shouting
  }

  test("corpus_prefix_clusters: normalized prefixes group, singletons drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "sA", "Breaking   news: markets trade up on strong earnings"),
      (2L, "sB", "breaking news: markets trade up in a soft session"),
      (3L, "sA", "totally different document text here"))
      .toDF("doc_id", "source", "text")
    val out = TextProfile.corpusPrefixClusters(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "breaking news: markets trade up ")
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getLong(3) === 1L && r.getDouble(4) === 0.6667)
  }

  test("text_sentence_stats: sentence dup fraction and repeat counts") {
    import spark.implicits._
    val docs = Seq((1L, "Hi there. Hi there. Bye."))
      .toDF("doc_id", "text")
    val r = TextProfile.textSentenceStats(docs).collect().head
    assert(r.getLong(1) === 3L && r.getLong(2) === 2L)
    assert(r.getLong(3) === 2L)
    assert(r.getDouble(4) === 0.3333)
    assert(r.getDouble(5) === 1.6667)          // (2*2 + 1)/3 words
  }

  test("knn_kcore: known coreness on an explicit substrate graph") {
    import spark.implicits._
    // mutual triangle 1-2-3 (all six directed edges) + 4 -> 1 only
    // (unreciprocated): coreness 2,2,2 and 0
    val g = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
      (3L, 2L), (4L, 1L)).toDF("vec_id", "nbr_id")
    val out = Ann.knnKcore(spark.emptyDataFrame, graph = Some(g))
      .orderBy("coreness").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 1L), (2L, 3L)))
    assert(out.map(_.getDouble(2)).toSeq === Seq(0.25, 0.75))
  }

  test("knn_kcore: fixed 10-iteration schedule has converged (10 == 15)") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = Ann.knnKcore(emb, iters = 10)
    val b = Ann.knnKcore(emb, iters = 15)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // explicit exact substrate == default
    val g = Ann.knnGraph(emb, 5).select("vec_id", "nbr_id")
    val c = Ann.knnKcore(emb, graph = Some(g))
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
  }

  test("embed_jl_distortion: unbiased around 1, tighter at higher m") {
    val out = Ann.embedJlDistortionQ(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet === Set(8, 32))
    assert(out.values.forall(_.getLong(1) === 1225L))
    // JL: ratios concentrate around 1; m=32 strictly tighter than m=8
    assert(math.abs(out(8).getDouble(2) - 1.0) < 0.25)
    assert(math.abs(out(32).getDouble(2) - 1.0) < 0.15)
    assert(out(32).getDouble(5) < out(8).getDouble(5))
    assert(out(8).getDouble(3) < 1.0 && out(8).getDouble(4) > 1.0)
  }

  test("table_profile: exact per-column stats incl. nulls and timestamps") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("x"), Some(ts(0))),
      (2L, None, Some("y"), Some(ts(24))),
      (3L, Some(7.5), None, None))
      .toDF("id", "v", "s", "t")
    val out = graft.operators.TableProfile.tableProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("id", "v", "s", "t"))
    val id = out("id")
    assert(id.getString(1) === "bigint" && id.getLong(2) === 3L &&
      id.getLong(3) === 0L && id.getLong(4) === 3L &&
      id.getDouble(5) === 1.0 && id.getDouble(6) === 3.0)
    val v = out("v")
    assert(v.getLong(3) === 1L && v.getLong(4) === 2L &&
      v.getDouble(5) === 2.5 && v.getDouble(6) === 7.5)
    val s = out("s")
    assert(s.getString(1) === "string" && s.getLong(3) === 1L &&
      s.getString(7) === "x" && s.getString(8) === "y")
    val t = out("t")
    assert(t.getString(1) === "timestamp" && t.getLong(3) === 1L)
    assert(t.getDouble(5) === 0.0 &&
      t.getDouble(6) === 24L * 3600L * 1000000L.toDouble)
    assert(t.isNullAt(7) && t.isNullAt(8))
  }
}
