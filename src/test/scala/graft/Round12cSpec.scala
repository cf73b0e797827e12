package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann
import graft.queries.Analytics4

/** Fixtures and invariants for the round-12 session-C wave:
  * events_conversion_lag, embed_intrinsic_dim (Levina–Bickel MLE),
  * vocab_overlap, cdc_compaction_plan, cdc_watermark_sweep,
  * dedup_cross_source, dedup_quality_impact, dedup_pair_budget,
  * corpus_curriculum (+ its per-doc assign twin), knn_confusion. */
class Round12cSpec extends AnyFunSuite with SparkFixture {

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def eventsDf(rows: Seq[(Long, Long, String, Double, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "value", "tsec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), timestamp_seconds(col("tsec")).as("ts"))
  }

  test("events_conversion_lag: hand-computed buckets, direct journeys, " +
    "lookback boundary, and the 127/128-minute bit-length edge") {
    val rows = Seq(
      // user 1: touch then purchase 90 s later → lag_min 1 → bucket 0
      (1L, 1L, "click", 0.0, 1000L),
      (2L, 1L, "purchase", 10.0, 1090L),
      // user 2: purchase with no touch → direct
      (3L, 2L, "purchase", 20.0, 5000L),
      // user 3: touch exactly ONE second outside the 604800 s lookback
      (4L, 3L, "view", 0.0, 0L),
      (5L, 3L, "purchase", 30.0, 604801L),
      // user 4: touch exactly AT the lookback bound (inclusive) →
      // lag 604800 s = 10080 min → bucket 13, lo_min 8192
      (6L, 4L, "view", 0.0, 0L),
      (7L, 4L, "purchase", 40.0, 604800L),
      // user 5: FIRST of two touches wins → lag 7680 s = 128 min →
      // bucket 7 (bit length of 128 is 8)
      (8L, 5L, "click", 0.0, 100L),
      (9L, 5L, "view", 0.0, 200L),
      (10L, 5L, "purchase", 50.0, 7780L),
      // user 6: lag 7679 s → 127 min floored → bucket 6
      (11L, 6L, "click", 0.0, 0L),
      (12L, 6L, "purchase", 60.0, 7679L),
      // user 7: purchases are NOT touches — both are direct
      (13L, 7L, "purchase", 70.0, 1000L),
      (14L, 7L, "purchase", 80.0, 2000L))
    val out = Analytics4.eventsConversionLagOn(eventsDf(rows)).collect()
      .map(r => r.getAs[Int]("bucket") -> r).toMap
    assert(out.keySet === Set(-1, 0, 6, 7, 13))
    // direct = user 2, user 3 (touch one second too old), user 7 twice
    assert(out(-1).getAs[Long]("n_conv") === 4L)
    assert(out(-1).getAs[Double]("conv_value") === 200.0)
    assert(out(0).getAs[Long]("lo_min") === 1L)
    assert(out(0).getAs[Long]("n_conv") === 1L)
    assert(out(0).getAs[Double]("conv_value") === 10.0)
    assert(out(6).getAs[Long]("lo_min") === 64L)
    assert(out(7).getAs[Long]("lo_min") === 128L)
    assert(out(13).getAs[Long]("lo_min") === 8192L)
    assert(out(-1).getAs[Long]("lo_min") === 0L)
    // shares over 8 conversions, cum in bucket order
    val n = out.values.map(_.getAs[Long]("n_conv")).sum
    assert(n === 8L)
    assert(out(-1).getAs[Double]("share") === 0.5)
    assert(out(-1).getAs[Double]("cum_share") === 0.5)
    assert(out(0).getAs[Double]("cum_share") === r4(5.0 / 8.0))
    assert(out(13).getAs[Double]("cum_share") === 1.0)
  }

  test("events_conversion_lag agrees with a plain-Scala replay on " +
    "randomized journeys") {
    val lookback = 604800L
    val rnd = new scala.util.Random(12321)
    for (trial <- 1 to 3) {
      val types = Seq("click", "view", "purchase")
      val rows = (1 to 120).map { i =>
        (i.toLong, (1 + rnd.nextInt(8)).toLong,
          types(rnd.nextInt(3)), rnd.nextInt(100).toDouble,
          rnd.nextLong(1000000L))
      }
      val out = Analytics4.eventsConversionLagOn(eventsDf(rows)).collect()
        .map(r => r.getAs[Int]("bucket") -> r).toMap
      // replay: per purchase, min-(tsec, event_id) touch in the window
      case class Conv(bucket: Int, value: Double)
      val convs = rows.filter(_._3 == "purchase").map { p =>
        val touches = rows.filter(t => t._2 == p._2 && t._3 != "purchase" &&
          t._5 >= p._5 - lookback && t._5 <= p._5 - 1)
        val bucket =
          if (touches.isEmpty) -1
          else {
            val ft = touches.minBy(t => (t._5, t._1))
            val lagMin = math.max(1L, (p._5 - ft._5) / 60L)
            java.lang.Long.toBinaryString(lagMin).length - 1
          }
        Conv(bucket, p._4)
      }
      val hist = convs.groupBy(_.bucket).map { case (b, cs) =>
        b -> (cs.size.toLong, cs.map(_.value).sum)
      }
      val tot = convs.size.toDouble
      assert(out.keySet === hist.keySet, s"trial $trial")
      val cum = hist.toSeq.sortBy(_._1)
        .scanLeft(0L) { case (acc, (_, (c, _))) => acc + c }.tail
      hist.toSeq.sortBy(_._1).zip(cum).foreach {
        case ((b, (c, v)), cumN) =>
          assert(out(b).getAs[Long]("n_conv") === c, s"trial $trial b=$b")
          assert(out(b).getAs[Double]("conv_value") === v,
            s"trial $trial b=$b")
          assert(out(b).getAs[Double]("share") === r4(c / tot),
            s"trial $trial b=$b")
          assert(out(b).getAs[Double]("cum_share") === r4(cumN / tot),
            s"trial $trial b=$b")
      }
    }
  }

  test("events_conversion_lag shuffles the events exactly once and " +
    "plans no loop join") {
    val df = Analytics4.eventsConversionLag(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size === 1,
      s"conversion lag should shuffle the events exactly once:\n$p")
    assert(!p.contains("CartesianProduct"), "loop join in conversion lag")
  }

  test("embed_intrinsic_dim agrees with a plain-Scala replay of the " +
    "exact kNN MLE on randomized corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7321)
    for (trial <- 1 to 2) {
      val n = 40; val dim = 8
      val vecs = (0 until n).map { i =>
        i.toLong -> Array.fill(dim)((rnd.nextInt(2000) - 1000) / 1000.0f)
      }
      val df = vecs.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>")
          .as("embedding"))
      val out = Ann.embedIntrinsicDim(df).collect()
        .map(r => r.getAs[Int]("k") -> r).toMap
      // replay: exact cosine ranks (sim DESC, id ASC), chordal distances
      val dbl = vecs.map { case (id, v) => id -> v.map(_.toDouble) }
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      val nrm = dbl.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
      val byId = dbl.toMap
      val topD: Map[Long, IndexedSeq[Double]] = dbl.map { case (id, v) =>
        val ds = dbl.filter(_._1 != id).map { case (jid, w) =>
          (dot(v, w) / (nrm(id) * nrm(jid)), jid)
        }.sortBy { case (s, j) => (-s, j) }.take(5)
          .map { case (s, _) =>
            math.sqrt(math.max(0.0, 2.0 - 2.0 * s)) }.toIndexedSeq
        id -> ds
      }.toMap
      for (k <- Seq(3, 4, 5)) {
        val mhats = topD.toSeq.sortBy(_._1).map { case (_, ds) =>
          val denom = (k - 1).toDouble * math.log(ds(k - 1)) -
            ds.take(k - 1).map(math.log).sum
          ((k - 1).toDouble / denom, denom)
        }
        val row = out(k)
        assert(row.getAs[Long]("n_pts") === n.toLong, s"trial $trial k=$k")
        assert(row.getAs[Long]("n_degenerate") === 0L, s"trial $trial k=$k")
        assert(row.getAs[Double]("mlid_mean") ===
          r4(mhats.map(_._1).sum / n), s"trial $trial k=$k")
        assert(row.getAs[Double]("mlid_min") === r4(mhats.map(_._1).min),
          s"trial $trial k=$k")
        assert(row.getAs[Double]("mlid_max") === r4(mhats.map(_._1).max),
          s"trial $trial k=$k")
        assert(row.getAs[Double]("mlid_global") ===
          r4((k - 1).toDouble * n / mhats.map(_._2).sum),
          s"trial $trial k=$k")
      }
    }
  }

  test("embed_intrinsic_dim counts exact-duplicate points as degenerate " +
    "instead of poisoning the pool") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val base = (0 until 20).map { i =>
      i.toLong -> Array.fill(6)((rnd.nextInt(2000) - 1000) / 1000.0f)
    }
    // vec 20 duplicates vec 0 exactly → both have a 0-distance 1-NN
    val vecs = base :+ (20L -> base(0)._2)
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val out = Ann.embedIntrinsicDim(df).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_degenerate") === 2L)
      assert(r.getAs[Long]("n_pts") === 19L)
      assert(r.getAs[Double]("mlid_mean") > 0.0)
    }
  }

  test("vocab_overlap: hand-computed pair table, zero-overlap pairs " +
    "present, empty-split token filtered") {
    import spark.implicits._
    val docs = Seq(
      ("A", "the cat sat"), ("A", "the dog"),
      ("B", "the cat runs"),
      ("C", "zebra"), ("C", "  ")) // tokenizes to [''] → filtered
      .toDF("source", "text")
    val out = graft.llm.TextOps.vocabOverlap(docs).collect()
      .map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b")) -> r).toMap
    assert(out.size === 3)
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("vocab_a") === 4L) // the cat sat dog
    assert(ab.getAs[Long]("vocab_b") === 3L) // the cat runs
    assert(ab.getAs[Long]("shared") === 2L)  // the, cat
    assert(ab.getAs[Double]("jaccard") === 0.4)
    assert(ab.getAs[Double]("containment_a") === 0.5)
    assert(ab.getAs[Double]("containment_b") === r4(2.0 / 3.0))
    val ac = out(("A", "C"))
    assert(ac.getAs[Long]("vocab_b") === 1L) // '' filtered, zebra stays
    assert(ac.getAs[Long]("shared") === 0L)
    assert(ac.getAs[Double]("jaccard") === 0.0)
  }

  test("cdc_compaction_plan: hand-computed day partitions — ceil " +
    "boundary exact, small-file debt, write amplification") {
    import spark.implicits._
    val pad56 = "x" * 56
    val rows = Seq.empty[(Long, String, String)] ++
      // day 1: 3×46 B in 2 batches → 138 B → 2 files at 100 B, debt 0
      Seq((3600L * 0, "view", "{}"), (3600L * 0 + 60, "view", "{}"),
        (3600L * 1, "view", "{}")) ++
      // day 2: 5×46 B across 5 batches → 230 B → 3 files, debt 2
      (0 until 5).map(h => (86400L + 3600L * h, "view", "{}")) ++
      // day 3: exactly 200 B (2×(40+4+56)) in 1 batch → exactly 2 files
      Seq((2 * 86400L, "view", pad56), (2 * 86400L + 60, "view", pad56))
    val events = rows.toDF("tsec", "event_type", "props")
      .select(timestamp_seconds(col("tsec")).as("ts"),
        col("event_type"), col("props"))
    val out = graft.cdc.Cdc.compactionPlan(events, targetBytes = 100L)
      .collect().map(r => r.getAs[java.sql.Date]("part_day").toString -> r)
      .toMap
    assert(out.size === 3)
    val d1 = out("1970-01-01")
    assert(d1.getAs[Long]("n_rows") === 3L)
    assert(d1.getAs[Long]("n_batches") === 2L)
    assert(d1.getAs[Long]("est_bytes") === 138L)
    assert(d1.getAs[Long]("compacted_files") === 2L)
    assert(d1.getAs[Long]("small_file_debt") === 0L)
    assert(d1.getAs[Double]("write_amplification") === 1.0)
    val d2 = out("1970-01-02")
    assert(d2.getAs[Long]("est_bytes") === 230L)
    assert(d2.getAs[Long]("compacted_files") === 3L)
    assert(d2.getAs[Long]("small_file_debt") === 2L)
    assert(d2.getAs[Double]("write_amplification") === r4(5.0 / 3.0))
    val d3 = out("1970-01-03")
    assert(d3.getAs[Long]("est_bytes") === 200L)
    assert(d3.getAs[Long]("compacted_files") === 2L) // exact ceil bound
    assert(d3.getAs[Long]("small_file_debt") === 0L)
  }

  test("dedup_cross_source: planted cross-feed mirrors land in the " +
    "off-diagonal cell, within-feed dups on the diagonal") {
    import spark.implicits._
    val txt = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, txt, "X"), (2L, txt, "Y"), (3L, txt, "X"),
      (4L, "totally different words here now", "Y"))
      .toDF("doc_id", "text", "source")
    val out = graft.llm.Dedup.dedupCrossSource(docs).collect()
      .map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b")) -> r).toMap
    assert(out.keySet === Set(("X", "X"), ("X", "Y")))
    val xy = out(("X", "Y")) // pairs (1,2) and (2,3)
    assert(xy.getAs[Boolean]("is_cross"))
    assert(xy.getAs[Long]("n_pairs") === 2L)
    assert(xy.getAs[Long]("n_docs") === 3L)
    assert(xy.getAs[Double]("pair_share") === r4(2.0 / 3.0))
    val xx = out(("X", "X")) // pair (1,3)
    assert(!xx.getAs[Boolean]("is_cross"))
    assert(xx.getAs[Long]("n_pairs") === 1L)
    assert(xx.getAs[Long]("n_docs") === 2L)
    assert(xx.getAs[Double]("pair_share") === r4(1.0 / 3.0))
  }

  test("dedup_quality_impact: keep-first family accounting with exact " +
    "hand-computed quality means") {
    import spark.implicits._
    // 8 single-letter tokens, no punctuation → qs = 8/64 = 0.125 exact
    val dup = "a b c d e f g h"                    // 15 chars
    val uniq = "p q r s t u v w x y z a b c d e"   // 16 toks → qs 0.25
    val docs = Seq((1L, dup, "s"), (2L, dup, "s"), (3L, uniq, "s"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")))
    val pairs = graft.llm.Dedup.dedupNgramJaccard(docs).persist()
    val out = graft.llm.Dedup.dedupQualityImpact(docs, pairs).collect()
      .map(r => r.getAs[String]("disposition") -> r).toMap
    pairs.unpersist()
    val kept = out("kept") // docs 1 and 3
    assert(kept.getAs[Long]("n_docs") === 2L)
    assert(kept.getAs[Long]("n_tokens") === 8L + 16L)
    assert(kept.getAs[Double]("mean_quality") === r4((0.125 + 0.25) / 2))
    assert(kept.getAs[Double]("mean_chars") === r4((15.0 + 31.0) / 2))
    val dropped = out("dropped") // doc 2
    assert(dropped.getAs[Long]("n_docs") === 1L)
    assert(dropped.getAs[Long]("n_tokens") === 8L)
    assert(dropped.getAs[Double]("mean_quality") === 0.125)
    assert(dropped.getAs[Double]("mean_chars") === 15.0)
    assert(dropped.getAs[Double]("token_share") === r4(8.0 / 32.0))
  }

  test("corpus_curriculum: exact dyadic fixture — power-of-two counts " +
    "make bits integral; straddling bins swallow stage labels") {
    import spark.implicits._
    // corpus total 16 tokens; counts 8/4/2/2 → per-doc bits are exact
    // integers: d1 = 4−3 = 1.0, d2 = 4−2 = 2.0, d3 = 4−1 = 3.0
    val docs = Seq(
      (1L, Seq.fill(8)("a").mkString(" ")),
      (2L, Seq.fill(4)("b").mkString(" ")),
      (3L, "c c d d")).toDF("doc_id", "text")
    val out = graft.llm.TextOps.corpusCurriculum(docs).collect()
      .map(r => r.getAs[Long]("stage") -> r).toMap
    // token mass 8/4/4: bin 200 starts at cum 8 → stage 3 (stage 2
    // swallowed by bin 100's half-mass block), bin 300 at 12 → stage 4
    assert(out.keySet === Set(1L, 3L, 4L))
    assert(out(1L).getAs[Long]("n_tokens") === 8L)
    assert(out(1L).getAs[Double]("min_bits") === 1.0)
    assert(out(1L).getAs[Double]("max_bits") === 1.0)
    assert(out(1L).getAs[Double]("token_share") === 0.5)
    assert(out(3L).getAs[Long]("n_tokens") === 4L)
    assert(out(3L).getAs[Double]("min_bits") === 2.0)
    assert(out(4L).getAs[Long]("n_tokens") === 4L)
    assert(out(4L).getAs[Double]("max_bits") === 3.0)
    // two stages: the same histogram re-cut at halves
    val two = graft.llm.TextOps.corpusCurriculum(docs, stages = 2)
      .collect().map(r => r.getAs[Long]("stage") -> r).toMap
    assert(two.keySet === Set(1L, 2L))
    assert(two(1L).getAs[Long]("n_tokens") === 8L)
    assert(two(2L).getAs[Long]("n_tokens") === 8L)
    assert(two(2L).getAs[Long]("n_bins") === 2L)
  }

  test("dedup_pair_budget: hand-computed df histogram and pair mass; " +
    "zero-pair corpus reports 0.0 shares, not NaN") {
    import spark.implicits._
    // shared shingle "a b c" df=3 → bucket 1, pair mass 3; the three
    // tail shingles df=1 → bucket 0, pair mass 0
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "a b c f"))
      .toDF("doc_id", "text")
    val out = graft.llm.Dedup.dedupPairBudget(docs).collect()
      .map(r => r.getAs[Int]("df_bucket") -> r).toMap
    assert(out.keySet === Set(0, 1))
    assert(out(0).getAs[Long]("lo_df") === 1L)
    assert(out(0).getAs[Long]("n_shingles") === 3L)
    assert(out(0).getAs[Long]("doc_slots") === 3L)
    assert(out(0).getAs[Long]("pair_mass") === 0L)
    assert(out(0).getAs[Double]("pair_share") === 0.0)
    assert(out(1).getAs[Long]("lo_df") === 2L)
    assert(out(1).getAs[Long]("n_shingles") === 1L)
    assert(out(1).getAs[Long]("pair_mass") === 3L)
    assert(out(1).getAs[Double]("pair_share") === 1.0)
    assert(out(1).getAs[Double]("cum_pair_share") === 1.0)
    val solo = graft.llm.Dedup.dedupPairBudget(
      Seq((1L, "x y z w")).toDF("doc_id", "text")).collect()
    assert(solo.length === 1)
    assert(solo(0).getAs[Long]("pair_mass") === 0L)
    assert(solo(0).getAs[Double]("pair_share") === 0.0)
    assert(solo(0).getAs[Double]("cum_pair_share") === 0.0)
  }

  test("cdc_watermark_sweep: hand-computed dead-letter table; an event " +
    "exactly AT the watermark survives (strict >)") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "view", 0.0, "{}", 100000L),
      (2L, 1L, "view", 0.0, "{}", 40000L), // arrives 60000 ms late
      (3L, 1L, "view", 0.0, "{}", 200000L))
      .toDF("event_id", "user_id", "event_type", "value", "props", "ms")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"), timestamp_millis(col("ms")).as("ts"))
    val out = graft.cdc.Cdc.watermarkSweep(events, Seq(50000L, 60000L))
      .collect().map(r => r.getAs[Long]("watermark_ms") -> r).toMap
    assert(out(50000L).getAs[Long]("n_changes") === 3L)
    assert(out(50000L).getAs[Long]("n_dead") === 1L)
    assert(out(50000L).getAs[Double]("dead_share") === r4(1.0 / 3.0))
    assert(out(50000L).getAs[Long]("worst_dead_ms") === 60000L)
    // lateness == W is NOT dead: the watermark admits it
    assert(out(60000L).getAs[Long]("n_dead") === 0L)
    assert(out(60000L).getAs[Long]("worst_dead_ms") === 0L)
    assert(out(60000L).getAs[Double]("dead_share") === 0.0)
  }

  test("knn_confusion: a mislabeled point inside the other cluster " +
    "lands in the off-diagonal cell; row shares normalize per true label") {
    import spark.implicits._
    // two tight clusters; vec 7 sits IN cluster B but carries label 0
    val vecs = Seq(
      (1L, Array(1.0f, 0.001f, 0f, 0f), 0),
      (2L, Array(1.0f, 0.002f, 0f, 0f), 0),
      (3L, Array(1.0f, 0.003f, 0f, 0f), 0),
      (4L, Array(0.001f, 1.0f, 0f, 0f), 1),
      (5L, Array(0.002f, 1.0f, 0f, 0f), 1),
      (6L, Array(0.003f, 1.0f, 0f, 0f), 1),
      (7L, Array(0.004f, 1.0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.knnConfusion(vecs, k = 3).collect()
      .map(r => (r.getAs[Int]("label_true"),
        r.getAs[Int]("label_pred")) -> r).toMap
    assert(out.keySet === Set((0, 0), (0, 1), (1, 1)))
    assert(out((0, 0)).getAs[Long]("n") === 3L)
    assert(out((0, 0)).getAs[Boolean]("is_correct"))
    assert(out((0, 0)).getAs[Double]("row_share") === 0.75)
    assert(out((0, 1)).getAs[Long]("n") === 1L) // vec 7
    assert(!out((0, 1)).getAs[Boolean]("is_correct"))
    assert(out((0, 1)).getAs[Double]("row_share") === 0.25)
    assert(out((1, 1)).getAs[Long]("n") === 3L)
    assert(out((1, 1)).getAs[Double]("row_share") === 1.0)
  }

  test("corpus_curriculum_assign: per-doc stages match the dyadic " +
    "fixture and regroup to the plan's books exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(8)("a").mkString(" ")),
      (2L, Seq.fill(4)("b").mkString(" ")),
      (3L, "c c d d")).toDF("doc_id", "text")
    val assign = graft.llm.TextOps.corpusCurriculumAssign(docs)
    val m = assign.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("stage")).toMap
    assert(m === Map(1L -> 1L, 2L -> 3L, 3L -> 4L))
    val plan = graft.llm.TextOps.corpusCurriculum(docs).collect()
      .map(r => r.getAs[Long]("stage") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    val re = assign.groupBy(col("stage"))
      .agg(count(lit(1)).as("d"), sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getAs[Long]("stage") ->
        ((r.getAs[Long]("d"), r.getAs[Long]("t")))).toMap
    assert(re === plan)
  }

  test("corpus_vocab_profile: hand-computed per-source lexical books") {
    import spark.implicits._
    val docs = Seq(("A", "a b a"), ("A", "c"), ("B", "x x x x"))
      .toDF("source", "text")
    val out = graft.llm.TextOps.corpusVocabProfile(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val a = out("A") // counts a=2 b=1 c=1
    assert(a.getAs[Long]("n_docs") === 2L)
    assert(a.getAs[Long]("n_tokens") === 4L)
    assert(a.getAs[Long]("vocab") === 3L)
    assert(a.getAs[Long]("hapax") === 2L)
    assert(a.getAs[Double]("ttr") === 0.75)
    assert(a.getAs[Double]("hapax_share") === r4(2.0 / 3.0))
    assert(a.getAs[Double]("mean_doc_tokens") === 2.0)
    val b = out("B")
    assert(b.getAs[Long]("vocab") === 1L)
    assert(b.getAs[Long]("hapax") === 0L)
    assert(b.getAs[Double]("ttr") === 0.25)
    assert(b.getAs[Double]("hapax_share") === 0.0)
    assert(b.getAs[Double]("mean_doc_tokens") === 4.0)
  }

  test("embed_anova: exact hand-computed decomposition; single-class " +
    "corpus reports zero eta2/F instead of dividing by zero") {
    import spark.implicits._
    // class means (1,0) and (1,2), global (1,1):
    // SS_total = 8, SS_between = 4 → η² = 0.5, F = (4/1)/(4/2) = 2
    val vecs = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(2f, 0f), 0),
      (3L, Array(0f, 2f), 1), (4L, Array(2f, 2f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Ann.embedAnova(vecs).collect()(0)
    assert(r.getAs[Long]("n_vecs") === 4L)
    assert(r.getAs[Long]("n_classes") === 2L)
    assert(r.getAs[Long]("dim") === 2L)
    assert(r.getAs[Double]("ss_total") === 8.0)
    assert(r.getAs[Double]("ss_between") === 4.0)
    assert(r.getAs[Double]("ss_within") === 4.0)
    assert(r.getAs[Double]("eta2") === 0.5)
    assert(r.getAs[Double]("f_stat") === 2.0)
    val solo = Ann.embedAnova(vecs.withColumn("label", lit(0)))
      .collect()(0)
    assert(solo.getAs[Double]("eta2") === 0.0)
    assert(solo.getAs[Double]("f_stat") === 0.0)
    assert(solo.getAs[Double]("ss_between") === 0.0)
  }

  test("events_concurrency: interval-stabbing counts with the exact " +
    "1800 s gap boundary (equal gap = same session)") {
    val rows = Seq(
      (1L, 1L, "view", 0.0, 0L), (2L, 1L, "view", 0.0, 100L),
      (3L, 1L, "view", 0.0, 4000L), // gap 3900 s → new session, hour 1
      (4L, 2L, "view", 0.0, 3000L),
      (5L, 2L, "view", 0.0, 4500L), // gap 1500 s → same session, hrs 0-1
      (6L, 3L, "view", 0.0, 10000L),
      (7L, 3L, "view", 0.0, 11800L)) // gap EXACTLY 1800 s → same session
    val out = Analytics4.eventsConcurrencyOn(eventsDf(rows)).collect()
      .map(r => r.getAs[Long]("hour_epoch_s") -> r).toMap
    assert(out.keySet === Set(0L, 3600L, 7200L, 10800L))
    assert(out(0L).getAs[Long]("n_active") === 2L)
    assert(out(0L).getAs[Long]("n_started") === 2L)
    assert(out(0L).getAs[Long]("n_ended") === 1L)
    assert(out(3600L).getAs[Long]("n_active") === 2L)
    assert(out(3600L).getAs[Long]("n_started") === 1L)
    assert(out(3600L).getAs[Long]("n_ended") === 2L)
    // the exact-boundary pair stays ONE session spanning hours 2-3
    assert(out(7200L).getAs[Long]("n_active") === 1L)
    assert(out(7200L).getAs[Long]("n_started") === 1L)
    assert(out(7200L).getAs[Long]("n_ended") === 0L)
    assert(out(10800L).getAs[Long]("n_active") === 1L)
    assert(out(10800L).getAs[Long]("n_ended") === 1L)
  }

  test("events_mix_drift: hand-computed KL/TV with an absent type — " +
    "the sparse L1 identity carries the missing mass") {
    // day 1: 2 views + 2 clicks; day 2: 4 views (clicks ABSENT)
    // corpus mix q = (views .75, clicks .25)
    val rows = Seq(
      (1L, 1L, "view", 0.0, 0L), (2L, 1L, "click", 0.0, 10L),
      (3L, 2L, "view", 0.0, 20L), (4L, 2L, "click", 0.0, 30L),
      (5L, 1L, "view", 0.0, 86400L), (6L, 2L, "view", 0.0, 86410L),
      (7L, 3L, "view", 0.0, 86420L), (8L, 4L, "view", 0.0, 86430L))
    val out = Analytics4.eventsMixDriftOn(eventsDf(rows)).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    val d1 = out("1970-01-01")
    assert(d1.getAs[Long]("n_events") === 4L)
    assert(d1.getAs[Long]("n_types") === 2L)
    assert(d1.getAs[Double]("kl_nats") ===
      r4(0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)))
    assert(d1.getAs[Double]("tv_dist") === 0.25)
    val d2 = out("1970-01-02")
    assert(d2.getAs[Long]("n_types") === 1L)
    assert(d2.getAs[Double]("kl_nats") === r4(math.log(1.0 / 0.75)))
    // |1−.75|/2 + the absent click's q/2 = .25
    assert(d2.getAs[Double]("tv_dist") === 0.25)
  }

  test("embed_sq_recall: integer vectors with per-dim max 127 quantize " +
    "losslessly — recall is exactly 1.0 on every query") {
    import spark.implicits._
    val rnd = new scala.util.Random(808)
    // per-dim scale = max|v|/127 = 1 exactly → q = v, dequantized == v
    val vecs = (0L until 12L).map { i =>
      val v = Array.fill(6)((rnd.nextInt(255) - 127).toFloat)
      (i, if (i == 0L) v.updated(0, 127f) else v)
    }.map { case (i, v) => (i, v.map(x => x: Float)) }
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    // force every dim's max to 127 via one saturating row
    val sat = Seq((12L, Array.fill(6)(127f))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = Ann.embedSqRecall(df.unionByName(sat), dim = 6).collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getAs[Long]("n_true") === 10L)
      assert(r.getAs[Long]("n_hit") === 10L)
      assert(r.getAs[Double]("recall_at_k") === 1.0)
    }
  }

  test("q_seasonal_index: partial years divide by their own cell " +
    "counts — hand-computed indices") {
    import spark.implicits._
    // cells: (1995,1)=2, (1995,2)=4, (1996,1)=4 → grand mean 10/3
    val days = Seq("1995-01-05", "1995-01-20") ++
      Seq.fill(4)("1995-02-10") ++ Seq.fill(4)("1996-01-15")
    val orders = days.zipWithIndex
      .map { case (d, i) => (i.toLong, d, 10.0) }
      .toDF("o_orderkey", "d", "o_totalprice")
      .select(col("o_orderkey"), col("d").cast("timestamp")
        .as("o_orderdate"), col("o_totalprice"))
    val out = Analytics4.qSeasonalIndexOn(orders).collect()
      .map(r => r.getAs[Int]("month") -> r).toMap
    assert(out.keySet === Set(1, 2))
    assert(out(1).getAs[Long]("n_years") === 2L)
    assert(out(1).getAs[Long]("n_orders") === 6L)
    assert(out(1).getAs[Double]("count_index") === 0.9) // 3 / (10/3)
    assert(out(1).getAs[Double]("revenue_index") === 0.9)
    assert(out(2).getAs[Long]("n_years") === 1L)
    assert(out(2).getAs[Double]("count_index") === 1.2) // 4 / (10/3)
    assert(out(2).getAs[Double]("revenue") === 40.0)
  }

  test("cdc_backfill_scope: only window-touched keys bill their tail; " +
    "untouched keys' changes never appear") {
    import spark.implicits._
    def t(d: String) = s"2024-01-$d 00:00:00"
    val events = Seq(
      (1L, t("11")), (1L, t("25")),  // touched → window + tail
      (2L, t("05")), (2L, t("25")),  // NOT touched → fully excluded
      (3L, t("19")))                 // touched, window only
      .toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val out = graft.cdc.Cdc.backfillScope(events,
        lit("2024-01-10").cast("timestamp"),
        lit("2024-01-20").cast("timestamp"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r)
      .toMap
    assert(out.keySet === Set("2024-01-11", "2024-01-19", "2024-01-25"))
    assert(out("2024-01-11").getAs[Long]("n_in_window") === 1L)
    assert(out("2024-01-11").getAs[Long]("n_tail") === 0L)
    assert(out("2024-01-25").getAs[Long]("n_keys") === 1L) // user 1 only
    assert(out("2024-01-25").getAs[Long]("n_changes") === 1L)
    assert(out("2024-01-25").getAs[Long]("n_tail") === 1L)
    assert(out("2024-01-19").getAs[Long]("n_in_window") === 1L)
  }

  test("events_dispersion: a one-hour burst reads Fano 3, perfectly " +
    "paced traffic reads 0 — zeros carried by the span, not a spine") {
    // global span hours 0..3; A bursts hour 0 ×4, B is 1/hour
    val rows = Seq(
      (1L, 1L, "A", 0.0, 100L), (2L, 1L, "A", 0.0, 200L),
      (3L, 1L, "A", 0.0, 300L), (4L, 1L, "A", 0.0, 400L),
      (5L, 2L, "B", 0.0, 0L), (6L, 2L, "B", 0.0, 3600L),
      (7L, 2L, "B", 0.0, 7200L), (8L, 2L, "B", 0.0, 10800L))
    val out = Analytics4.eventsDispersionOn(eventsDf(rows)).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = out("A") // dense grid [4,0,0,0]
    assert(a.getAs[Long]("n_hours") === 4L)
    assert(a.getAs[Long]("active_hours") === 1L)
    assert(a.getAs[Double]("mean_per_hour") === 1.0)
    assert(a.getAs[Double]("variance") === 3.0)
    assert(a.getAs[Double]("fano") === 3.0)
    val b = out("B") // dense grid [1,1,1,1]
    assert(b.getAs[Long]("active_hours") === 4L)
    assert(b.getAs[Double]("variance") === 0.0)
    assert(b.getAs[Double]("fano") === 0.0)
  }

  test("session-C ops run on the warehouse and return rows") {
    assert(Analytics4.eventsConversionLag(spark, sfDir).count() >= 2L)
    assert(Ann.embedIntrinsicDimQ(spark, sfDir).count() === 3L)
    assert(graft.llm.TextOps.vocabOverlapQ(spark, sfDir).count() > 0L)
    assert(graft.cdc.Cdc.compactionPlanQ(spark, sfDir).count() > 0L)
    assert(graft.llm.Dedup.dedupCrossSourceQ(spark, sfDir).count() > 0L)
    assert(graft.llm.Dedup.dedupQualityImpactQ(spark, sfDir).count() >= 1L)
    assert(graft.llm.TextOps.corpusCurriculumQ(spark, sfDir).count() >= 1L)
    assert(graft.llm.Dedup.dedupPairBudgetQ(spark, sfDir).count() > 0L)
    assert(graft.cdc.Cdc.watermarkSweepQ(spark, sfDir).count() === 5L)
    assert(Ann.knnConfusionQ(spark, sfDir).count() > 0L)
    assert(Ann.embedAnovaQ(spark, sfDir).count() === 1L)
    assert(graft.llm.TextOps.corpusVocabProfileQ(spark, sfDir).count() > 0L)
    assert(Analytics4.eventsConcurrency(spark, sfDir).count() > 0L)
    assert(Analytics4.eventsMixDrift(spark, sfDir).count() > 0L)
    assert(Ann.embedSqRecallQ(spark, sfDir).count() === 10L)
    assert(Analytics4.qSeasonalIndex(spark, sfDir).count() === 12L)
    assert(graft.cdc.Cdc.backfillScopeQ(spark, sfDir).count() > 0L)
    assert(Analytics4.eventsDispersion(spark, sfDir).count() === 5L)
  }
}
