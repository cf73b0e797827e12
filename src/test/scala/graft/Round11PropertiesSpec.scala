package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextOps

class Round11PropertiesSpec extends AnyFunSuite with SparkFixture {

  test("corpus_mix_kl matches a hand-computed two-language fixture") {
    import spark.implicits._
    // lang a: 3 tokens, lang b: 1 token → p = (0.75, 0.25), uniform
    // q = 1/2 → KL = 0.75·ln(1.5) + 0.25·ln(0.5) ≈ 0.1308
    val docs = Seq(
      (1L, "a", "one two three"),
      (2L, "b", "solo")
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.corpusMixKl(docs)
      .orderBy("lang")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
    val klA = 0.75 * math.log(1.5)
    val klB = 0.25 * math.log(0.5)
    val tot = BigDecimal(klA + klB)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq ===
      Seq(("a", 1L, 3L, 0.75, 0.5), ("b", 1L, 1L, 0.25, 0.5)))
    assert(out(0)._6 === BigDecimal(klA)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(1)._6 === BigDecimal(klB)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.forall(_._7 === tot))
    // the overweight language's term is positive, the underweight
    // one's negative, and the total is non-negative (Gibbs)
    assert(out(0)._6 > 0 && out(1)._6 < 0 && tot >= 0)
  }

  test("corpus_mix_kl is zero on a uniform mixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "x y"), (2L, "b", "x y"), (3L, "c", "x y")
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.corpusMixKl(docs)
      .select("kl_term", "kl_total").as[(Double, Double)].collect()
    assert(out.forall { case (t, tot) => t === 0.0 && tot === 0.0 })
  }

  test("corpus_mix_kl guards the degenerate zero-mass language") {
    import spark.implicits._
    // a lang whose every doc has NULL text contributes no token mass:
    // size(split(NULL)) is NULL, sum over only-NULLs is NULL, so its p
    // is NULL — without the guard, p·log(p·nl) would be NULL and the
    // row would silently vanish from kl_total (and DuckDB's ln would
    // error on a literal 0). The guard pins the 0·ln 0 = 0 convention.
    val docs = Seq(
      (1L, "a", "one two three four"),
      (2L, "b", null.asInstanceOf[String])
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.corpusMixKl(docs).orderBy("lang").collect()
    assert(out.length === 2)
    val b = out(1)
    assert(b.getAs[Double]("kl_term") === 0.0)
    // every row carries a non-null total; a holds the full mass so its
    // term is 1·ln(1·2) = ln 2, which is also the total
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("kl_total"))))
    assert(out(0).getAs[Double]("kl_term") === ln2)
    assert(out.forall(_.getAs[Double]("kl_total") === ln2))
  }

  test("planted media twins straddle the store split at hamming 0") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import graft.llm.Multimodal
    val media = Multimodal.withMediaColumn(Tables.documents(spark, sfDir))
    val sigs = Multimodal.mediaPhash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every (50k+5, 50k+9) twin pair present and perceptually identical
    val bases = sigs.keySet.filter(_ % 50 == 5)
    assert(bases.nonEmpty)
    bases.foreach { b =>
      val probe = b + 4
      assert(sigs.contains(probe), s"probe twin $probe missing")
      assert(java.lang.Long.bitCount(sigs(b) ^ sigs(probe)) === 0)
    }
    // ...and the payloads still differ (near-dup, not byte-dup)
    val pay = media.collect().map(r => r.doc_id -> r.media).toMap
    bases.foreach { b =>
      assert(!java.util.Arrays.equals(pay(b), pay(b + 4)))
    }
    // which makes the driver's incremental entry non-vacuous
    val out = Multimodal.mediaPhashIncrementalQ(spark, sfDir)
    assert(out.count() >= bases.size)
  }

  test("driftReport counts columns through nested types and gates ALTERs") {
    val hist = new graft.state.SchemaHistory(tmpDir("drift2_hist_"), spark)
    // three columns whose sql types contain ', ' — the naive
    // split-on-comma counted 6 here
    hist.record("CREATE TABLE t (a MAP<STRING, INT>, " +
      "b STRUCT<x: INT, y: DECIMAL(12,2)>, c ARRAY<STRUCT<p: INT, q: INT>>)")
    hist.record("ALTER TABLE t ADD COLUMN d BIGINT")
    // drift events that are NOT width growth must not count as added
    hist.record("ALTER TABLE t ALTER COLUMN a SET DATA TYPE STRING")
    hist.record("ALTER TABLE t RENAME COLUMN c TO c2")
    val r = hist.driftReport().collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("n_initial_cols") === 3L)
    assert(row.getAs[Long]("n_added") === 1L)
    assert(row.getAs[Long]("n_columns") === 4L)
    assert(row.getAs[Long]("created_seq") === 0L)
    assert(row.getAs[Long]("last_change_seq") === 3L)
  }

  test("text_similar_topk: collapse path equals direct on duplicate mass") {
    import spark.implicits._
    import graft.llm.Dedup
    // duplicate-heavy corpus: 5 base texts sharing vocabulary overlap
    // (non-trivial cross-class jaccards), each replicated 12x, plus
    // unique docs and a shingle-free class (2-word texts, n=3)
    val bases = Seq(
      "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta epsilon eta",
      "alpha beta gamma theta iota kappa",
      "lambda mu nu xi omicron pi",
      "lambda mu nu xi omicron rho")
    val docs = (bases.zipWithIndex.flatMap { case (t, i) =>
      (0 until 12).map(c => (i * 100L + c, t))
    } ++ Seq((900L, "sigma tau upsilon phi chi psi"),
      (901L, "too short"), (902L, "too short"))).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = rows(Dedup.textSimilarTopk(docs, k = 3,
      collapseThreshold = 0.0))
    val collapsed = rows(Dedup.textSimilarTopk(docs, k = 3,
      collapseThreshold = 2.0))
    assert(collapsed === direct)
    // the shingle-free duplicate class must yield no rows in either path
    assert(!direct.exists(r => r._1 >= 901L || r._2 >= 901L))
    // and the gate on THIS corpus picks the collapse path on its own
    assert(rows(Dedup.textSimilarTopk(docs, k = 3)) === direct)
  }

  test("cdc_scd2 chains versions and closes them with deletes") {
    import spark.implicits._
    import java.sql.Timestamp
    import graft.cdc.Cdc
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: create, update, update, delete → 3 versions, none current
    // user 2: create, update → 2 versions, last current
    // user 3: lone create → 1 current version
    val events = Seq(
      (1L, 1L, "signup", 1.0, ts("2024-01-01 00:00:00"), """{"k":1}"""),
      (2L, 1L, "click", 1.0, ts("2024-01-02 00:00:00"), """{"k":2}"""),
      (3L, 1L, "purchase", 1.0, ts("2024-01-03 00:00:00"), """{"k":3}"""),
      (4L, 1L, "error", 1.0, ts("2024-01-04 00:00:00"), """{"k":4}"""),
      (5L, 2L, "signup", 1.0, ts("2024-01-01 00:00:00"), """{"k":5}"""),
      (6L, 2L, "click", 1.0, ts("2024-01-05 00:00:00"), """{"k":6}"""),
      (7L, 3L, "signup", 1.0, ts("2024-01-02 00:00:00"), """{"k":7}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Cdc.scd2(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(8), r.getBoolean(9)))
      .toList.sortBy(r => (r._1, r._2))
    def ms(s: String) = ts(s).getTime
    assert(out === List(
      (1L, 1L, ms("2024-01-02 00:00:00"), false),
      (1L, 2L, ms("2024-01-03 00:00:00"), false),
      (1L, 3L, ms("2024-01-04 00:00:00"), false), // closed by delete
      (2L, 5L, ms("2024-01-05 00:00:00"), false),
      (2L, 6L, -1L, true),
      (3L, 7L, -1L, true)))
  }

  test("cdc_scd2 invariants hold on the real changelog") {
    import graft.cdc.Cdc
    val events = Tables.events(spark, sfDir)
    val out = Cdc.scd2(events)
    // current set == the upsert snapshot's live keys, exactly
    val cur = out.filter(col("is_current")).select("user_id", "event_id")
    val snap = Cdc.upsertSnapshot(events).select("user_id", "event_id")
    assert(cur.exceptAll(snap).isEmpty && snap.exceptAll(cur).isEmpty)
    // at most one open version per key; intervals well-formed
    assert(out.filter(col("is_current")).groupBy("user_id").count()
      .filter(col("count") > 1).isEmpty)
    assert(out.filter(col("valid_to_ms") =!= -1L &&
      col("valid_to_ms") < unix_millis(col("valid_from"))).isEmpty)
    // both bounds comparable in ONE predicate (ADVICE r11): the plain
    // BETWEEN-style as-of read over epoch-ms equals the snapshot
    assert(out.filter(col("valid_from_ms") =!=
      unix_millis(col("valid_from"))).isEmpty)
    val asOfMs = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime
    val viaScd2 = out.filter(col("valid_from_ms") <= asOfMs &&
      (col("valid_to_ms") === -1L || col("valid_to_ms") > asOfMs))
      .select("user_id", "event_id")
    val viaTravel = Cdc.timeTravel(events,
        lit("2024-01-15 00:00:00").cast("timestamp"))
      .select("user_id", "event_id")
    assert(viaScd2.exceptAll(viaTravel).isEmpty &&
      viaTravel.exceptAll(viaScd2).isEmpty)
    // intervals chain: each non-final version's valid_to equals the
    // next version's valid_from OR a delete's timestamp — so every
    // valid_to is some change timestamp of the same key
    val f = Cdc.flatten(events).select(col("user_id"),
      col("__source_ts_ms").as("t"))
    val orphan = out.filter(col("valid_to_ms") =!= -1L)
      .join(f, out("user_id") === f("user_id") &&
        out("valid_to_ms") === unix_millis(f("t")), "left_anti")
    assert(orphan.isEmpty)
  }

  test("embed_truncation_eval: full width pins recall 1.0, monotone-ish") {
    import graft.llm.Ann
    val emb = Tables.embeddings(spark, sfDir)
    val out = Ann.embedTruncationEval(emb).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(8, 16, 32, 64))
    assert(out(64) === ((1.0, 1.0))) // truth vs itself
    // every recall is a valid /k rational in [0, 1], and wider prefixes
    // should not do materially worse than the narrowest
    out.values.foreach { case (m, mn) =>
      assert(m >= 0.0 && m <= 1.0 && mn >= 0.0 && mn <= m + 1e-9)
    }
    assert(out(32)._1 >= out(8)._1 - 0.1)
    // a PLANTED prefix-concentrated space: first 8 dims carry all the
    // signal, so d=8 must already achieve recall 1.0
    import spark.implicits._
    val planted = (0L until 60L).map { i =>
      val v = Array.tabulate(64)(j =>
        if (j < 8) math.cos(i.toDouble * (j + 1)).toFloat else 0.0f)
      (i, v, (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val p = Ann.embedTruncationEval(planted).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(p.values.forall(_ === 1.0))
  }

  test("ann_rrf_fusion: self-fusion is order-preserving, fusion interleaves") {
    import spark.implicits._
    import graft.llm.Ann
    val emb = Tables.embeddings(spark, sfDir)
    val lsh = Ann.annLshTopK(emb)
    // fusing a list with itself preserves its order exactly
    val self = Ann.annRrfFusion(lsh, lsh).select("query_id", "rank", "vec_id")
    assert(self.exceptAll(lsh.select("query_id", "rank", "vec_id")).isEmpty)
    // hand fixture: doc 100 (rank 1 in both lists) must outrank doc
    // 200/300 (rank 1 in only one); 2/(61) > 1/61 + 0 > ...
    val la = Seq((0L, 1, 100L), (0L, 2, 200L)).toDF("query_id", "rank", "vec_id")
    val lb = Seq((0L, 1, 100L), (0L, 2, 300L)).toDF("query_id", "rank", "vec_id")
    val f = Ann.annRrfFusion(la, lb).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(f.head === ((1, 100L,
      BigDecimal(2.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)))
    // the two single-list docs tie at 1/62 and break by vec_id
    assert(f.map(x => (x._1, x._2)).toSeq === Seq((1, 100L), (2, 200L), (3, 300L)))
  }

  test("dedup_threshold_sweep: monotone in tau, consistent with jaccard") {
    import graft.llm.Dedup
    val docs = Tables.documents(spark, sfDir)
    val out = Dedup.dedupThresholdSweep(docs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(0.3, 0.5, 0.7, 0.9))
    // pair and doc counts are non-increasing in tau
    assert(out.toSeq.sliding(2).forall { w =>
      w(0)._2 >= w(1)._2 && w(0)._3 >= w(1)._3 })
    // each step agrees with an independent jaccard run at that tau
    for ((tau, np, nd, _) <- out) {
      val p = Dedup.dedupNgramJaccard(docs, tau = tau)
      assert(p.count() === np, s"tau $tau pairs")
      val d = p.select(col("doc_a")).union(p.select(col("doc_b")))
        .distinct().count()
      assert(d === nd, s"tau $tau docs")
    }
    // zero-pair taus still report (grid with an unreachable threshold)
    val z = Dedup.dedupThresholdSweep(docs, taus = Seq(0.9999))
      .collect()(0)
    assert(z.getLong(2) === 0L && z.getDouble(3) === 0.0)
  }

  test("vocab_growth: monotone curve, exact counts, sane beta") {
    import spark.implicits._
    import graft.llm.TextOps
    val docs = Tables.documents(spark, sfDir)
    val out = TextOps.vocabGrowth(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1, 2, 4, 8))
    // all three counters non-decreasing along the curve; the last
    // checkpoint covers the whole corpus exactly
    assert(out.toSeq.sliding(2).forall { w =>
      w(0)._2 <= w(1)._2 && w(0)._3 <= w(1)._3 && w(0)._4 <= w(1)._4 })
    val last = out.last
    assert(last._2 === docs.count())
    assert(last._4 === docs.select(explode(TextOps.tokens(col("text"))))
      .distinct().count())
    // one beta on every row, within Heaps' possible range
    assert(out.map(_._5).distinct.length === 1)
    assert(last._5 >= 0.0 && last._5 <= 1.0)
    // hand fixture: vocab EXACTLY sqrt(tokens) at every checkpoint →
    // beta 0.5 on the grid. Ids 0..8 put the 1/2/4/8-eighth cutoffs on
    // whole docs; cumulative vocab after doc d is 2^(d+1), cumulative
    // tokens 4^(d+1), so every log-log point sits on the slope-0.5
    // line exactly.
    val fix = (0 until 9).map { d =>
      val newWords =
        if (d == 0) Seq("w1", "w2")
        else (math.pow(2, d).toLong + 1 to
          math.pow(2, d + 1).toLong).map(w => s"w$w")
      val pad = (if (d == 0) 4L else 3L * math.pow(4, d).toLong) -
        newWords.size
      (d.toLong, (newWords ++ Seq.fill(pad.toInt)("w1")).mkString(" "))
    }.toDF("doc_id", "text")
    val fb = TextOps.vocabGrowth(fix).collect().head.getDouble(4)
    assert(fb === 0.5, s"beta $fb")
  }

  test("dedup_edit_verify: order-blind jaccard vs order-aware edit sim") {
    import spark.implicits._
    import graft.llm.Dedup
    // docs 1/2: byte-identical → jaccard 1, edit 0, sim 1.
    // doc 3: the same shingle-heavy text with two blocks SWAPPED —
    // jaccard stays high while the edit metric exposes the rewrite.
    val block1 = "alpha beta gamma delta epsilon zeta eta theta"
    val block2 = "iota kappa lambda mu nu xi omicron pi"
    val docs = Seq(
      (1L, s"$block1 $block2"),
      (2L, s"$block1 $block2"),
      (3L, s"$block2 $block1")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupEditVerify(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getInt(3), r.getDouble(4)))).toMap
    assert(out((1L, 2L)) === ((1.0, 0, 1.0)))
    // swapped blocks: most shingles survive, edit distance is large
    val (j13, d13, s13) = out((1L, 3L))
    assert(j13 > 0.5 && d13 > 10 && s13 < 0.7)
    assert(out((1L, 3L)) === out((2L, 3L)))
    // on the real corpus: edit 0 iff identical text, sim bounds hold
    val real = Dedup.dedupEditVerify(Tables.documents(spark, sfDir))
    assert(real.filter(col("edit_sim") > 1.0 || col("edit_sim") < 0.0)
      .isEmpty)
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val zero = real.filter(col("edit_distance") === 0)
      .join(texts.as("x"), col("doc_a") === col("x.doc_id"))
      .join(texts.as("y"), col("doc_b") === col("y.doc_id"))
      .filter(col("x.text") =!= col("y.text"))
    assert(zero.isEmpty)
  }

  test("events_bot_profile equals a plain-Scala replay on random cadences") {
    import spark.implicits._
    import graft.queries.Analytics3
    val rnd = new scala.util.Random(1111)
    val base = 1704067200000000L // 2024-01-01 in micros
    // 30 users: metronomes (fixed gap), humans (heavy-tailed gaps),
    // same-timestamp degenerates, and sub-minEvents small fry
    val rows = (0 until 30).flatMap { u =>
      val n = u % 4 match {
        case 0 => 25 case 1 => 20 + rnd.nextInt(10)
        case 2 => 2 + rnd.nextInt(3) case 3 => 1
      }
      var t = base + rnd.nextInt(1000000)
      (0 until n).map { i =>
        val gap = u % 4 match {
          case 0 => 60000000L // exact metronome
          case 2 => 0L // all same timestamp
          case _ => (rnd.nextInt(500) * rnd.nextInt(500) + 1) * 1000L
        }
        if (i > 0) t += gap
        (u.toLong * 1000 + i, u.toLong, "view", 1.0,
          java.time.Instant.EPOCH.plusNanos(t * 1000) match {
            case inst => java.sql.Timestamp.from(inst)
          })
      }
    }
    val events = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = Analytics3.eventsBotProfileOn(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    def r4(d: Double) = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = rows.groupBy(_._2).collect {
      case (uid, evs) if evs.size >= 2 =>
        val micros = evs.sortBy(e =>
          (e._5.getTime * 1000 + e._5.getNanos / 1000 % 1000, e._1))
          .map(e => e._5.getTime / 1000 * 1000000L + e._5.getNanos / 1000)
        val gaps = micros.zip(micros.tail)
          .map { case (a, b) => Math.floorDiv(b - a, 1000000L) }
        val n = evs.size.toLong
        val span = Math.floorDiv(micros.max - micros.min, 1000000L)
        val (ng, sg, sg2) =
          (gaps.size.toDouble, gaps.sum.toDouble,
            gaps.map(g => g * g).sum.toDouble)
        val mean = sg / ng
        val variance = (ng * sg2 - sg * sg) / (ng * ng)
        val cv = if (gaps.nonEmpty && gaps.sum > 0)
          r4(math.sqrt(variance) / mean) else 0.0
        val rate = if (span > 0) r4(n * 3600.0 / span) else 0.0
        uid -> ((n, span, rate, cv, n >= 20 && cv <= 0.2))
    }.toMap
    assert(out === expect)
    // the planted regimes land where they should
    assert(out(0L)._5 && out(4L)._5) // metronomes flagged
    assert(!out(1L)._5) // heavy-tailed human at volume: spared
  }

  test("q_order_gaps equals a plain-Scala replay on random order books") {
    import spark.implicits._
    import graft.queries.Analytics3
    val rnd = new scala.util.Random(2222)
    val epoch = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 40).flatMap { c =>
      val n = 1 + rnd.nextInt(6)
      (0 until n).map { i =>
        // duplicate dates happen: same-day orders must tie to gap 0
        (c.toLong * 100 + i, c.toLong,
          java.sql.Date.valueOf(epoch.plusDays(rnd.nextInt(90))))
      }
    }
    val orders = rows.toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Analytics3.qOrderGapsOn(orders).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))).toMap
    def r4(d: Double) = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = rows.groupBy(_._2).collect {
      case (c, os) if os.size >= 2 =>
        val sorted = os.sortBy(o => (o._3.toLocalDate.toEpochDay, o._1))
          .map(_._3.toLocalDate.toEpochDay)
        val span = sorted.max - sorted.min
        val maxGap = sorted.zip(sorted.tail).map { case (a, b) => b - a }.max
        c -> ((os.size.toLong, span,
          r4(span.toDouble / (os.size - 1)), maxGap))
    }.toMap
    assert(out === expect)
  }

  test("q_discount_effect equals a plain-Scala replay on random books") {
    import spark.implicits._
    import graft.queries.Analytics3
    val rnd = new scala.util.Random(3333)
    val brands = (0 until 6).map(b => s"Brand#$b")
    val part = (0 until 60)
      .map(p => (p.toLong, brands(rnd.nextInt(brands.size))))
      .toDF("p_partkey", "p_brand")
    val partBrand = (0 until 60)
      .map(p => p.toLong -> brands.indexOf(
        part.collect().find(_.getLong(0) == p).get.getString(1)))
    val li = (0 until 400).map { i =>
      // Brand#5 gets constant discount → zero variance → 0.0 sentinel
      val pk = rnd.nextInt(60).toLong
      val d = if (partBrand(pk.toInt)._2 == 5) 0.05
        else rnd.nextInt(11) / 100.0
      (pk, d, (1 + rnd.nextInt(50)).toLong)
    }
    val lineitem = li.toDF("l_partkey", "l_discount", "l_quantity")
    val out = Analytics3.qDiscountEffectOn(lineitem, part).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    def r4(d: Double) = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val brandOf = partBrand.map { case (pk, bi) => pk -> brands(bi) }.toMap
    val expect = li.groupBy(l => brandOf(l._1)).map { case (b, ls) =>
      // x replays Spark's round(l_discount*100, 0): BigDecimal.valueOf
      val xs = ls.map(l => java.math.BigDecimal.valueOf(l._2 * 100)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
      val ys = ls.map(_._3)
      val n = ls.size.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
      val sx2 = xs.map(x => x * x).sum.toDouble
      val sy2 = ys.map(y => y * y).sum.toDouble
      val num = n * sxy - sx * sy
      val varx = n * sx2 - sx * sx
      val vary = n * sy2 - sy * sy
      val corr = if (varx > 0 && vary > 0)
        r4(num / (math.sqrt(varx) * math.sqrt(vary))) else 0.0
      b -> ((ls.size.toLong, r4(sx / n), r4(sy / n), corr))
    }
    assert(out === expect.toMap)
    assert(out("Brand#5")._4 === 0.0) // the planted zero-variance brand
  }

  test("corpus_mix_kl takes a caller-supplied target mix") {
    import spark.implicits._
    // p = (0.75, 0.25); target q = (0.75, 0.25) → KL exactly 0
    val docs = Seq(
      (1L, "a", "one two three"),
      (2L, "b", "solo")
    ).toDF("doc_id", "lang", "text")
    val exact = TextOps.corpusMixKl(docs, Map("a" -> 0.75, "b" -> 0.25))
      .orderBy("lang")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
    assert(exact.map(r => (r._5, r._6, r._7)).toSeq ===
      Seq((0.75, 0.0, 0.0), (0.25, 0.0, 0.0)))
    // q = (0.5, 0.5) must reproduce the uniform default bit-for-bit
    val uni = TextOps.corpusMixKl(docs, Map("a" -> 0.5, "b" -> 0.5))
      .orderBy("lang").collect()
    val dflt = TextOps.corpusMixKl(docs).orderBy("lang").collect()
    assert(uni.toSeq === dflt.toSeq)
    // a language missing from a partial map falls back to uniform
    val partial = TextOps.corpusMixKl(docs, Map("a" -> 0.5))
      .orderBy("lang").collect()
    assert(partial.toSeq === dflt.toSeq)
  }
}
