package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sketches

class SketchesSpec extends AnyFunSuite with SparkFixture {

  private def ests(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("sketch-table rollup == direct coarse sketch, exactly") {
    val d = Tables.documents(spark, sfDir)
    val viaTable = ests(Sketches.rollupByLang(Sketches.sketchTable(d)))
    val direct = ests(Sketches.directByLang(d))
    assert(viaTable === direct,
      "HLL union-of-fine-sketches must equal the direct coarse sketch")
  }

  test("incrementally-built sketch tables merge to the same rollup") {
    val d = Tables.documents(spark, sfDir)
    // two "daily" increments, sketched independently, then unioned — the
    // way a 100 TB pipeline accumulates the table without re-reading history
    val day1 = Sketches.sketchTable(d.filter(col("doc_id") % 2 === 0))
    val day2 = Sketches.sketchTable(d.filter(col("doc_id") % 2 === 1))
    val merged = ests(Sketches.rollupByLang(day1.unionByName(day2)))
    assert(merged === ests(Sketches.directByLang(d)))
  }

  test("events user sketches: rollup == direct, and within 5% of exact") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val viaTable = Sketches.eventsUserRollup(
        Sketches.eventsUserSketchTable(ev))
      .orderBy("event_type").collect().toSeq
    val direct = Sketches.eventsUserDirect(ev)
      .orderBy("event_type").collect().toSeq
    assert(viaTable === direct,
      "hourly-sketch union must equal the direct per-type sketch")
    val exact = ev.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact"))
      .as[(String, Long)].collect().toMap
    for (r <- viaTable) {
      val est = r.getLong(1).toDouble
      val ex = exact(r.getString(0)).toDouble
      assert(math.abs(est - ex) / ex <= 0.05,
        s"${r.getString(0)}: est $est vs exact $ex")
    }
    // hourly grain appends: two daily halves sketched independently
    // union to the same rollup (the incremental-table contract)
    val h1 = Sketches.eventsUserSketchTable(ev.filter(col("event_id") % 2 === 0))
    val h2 = Sketches.eventsUserSketchTable(ev.filter(col("event_id") % 2 === 1))
    val merged = Sketches.eventsUserRollup(h1.unionByName(h2))
      .select("event_type", "est_users").orderBy("event_type").collect().toSeq
    assert(merged === direct.map(r => org.apache.spark.sql.Row(
      r.getString(0), r.getLong(1))))
  }

  // --- KLL quantile table ---

  /** Normalized rank of estimate `v` within a lang's exact token counts
    * (mid-rank of the value's position). */
  private def rankErrOk(d: org.apache.spark.sql.DataFrame,
                        quantiles: Map[String, Seq[(Double, Long)]],
                        tol: Double): Unit = {
    val exact = d.select(col("lang"),
      size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, a) => l -> a.map(_._2).sorted }
    quantiles.foreach { case (lang, qs) =>
      val sorted = exact(lang)
      qs.foreach { case (q, est) =>
        val below = sorted.count(_ < est)
        val atOrBelow = sorted.count(_ <= est)
        val rank = (below + atOrBelow) / 2.0 / sorted.length
        assert(math.abs(rank - q) <= tol,
          s"lang=$lang q=$q est=$est lands at rank $rank (tol $tol)")
      }
    }
  }

  private def kllQs(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Double, Long)]] =
    df.collect().map { r =>
      r.getString(0) -> Seq(0.5 -> r.getLong(2), 0.9 -> r.getLong(3),
        0.99 -> r.getLong(4))
    }.toMap

  test("KLL rollup and direct quantiles both land within rank tolerance") {
    val d = Tables.documents(spark, sfDir)
    val viaTable = kllQs(
      Sketches.quantileRollupByLang(Sketches.quantileSketchTable(d)))
    val direct = kllQs(Sketches.quantileDirectByLang(d))
    rankErrOk(d, viaTable, 0.03)
    rankErrOk(d, direct, 0.03)
  }

  test("incrementally-built KLL tables merge within rank tolerance") {
    val d = Tables.documents(spark, sfDir)
    val day1 = Sketches.quantileSketchTable(d.filter(col("doc_id") % 2 === 0))
    val day2 = Sketches.quantileSketchTable(d.filter(col("doc_id") % 2 === 1))
    val merged = kllQs(
      Sketches.quantileRollupByLang(day1.unionByName(day2)))
    rankErrOk(d, merged, 0.03)
  }

  // --- frequent-items (heavy hitters) table ---

  private def topk(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("top-k rollup == direct == exact counts when vocab fits the sketch") {
    val d = Tables.documents(spark, sfDir)
    // k beyond the synthetic vocabulary (~40 words): every token returns,
    // no tie-at-boundary ambiguity, and under maxItems the frequent-items
    // counts are EXACT — all three paths must agree precisely
    val k = 64
    val viaTable = topk(Sketches.topkRollupByLang(Sketches.topkSketchTable(d), k))
    val direct = topk(Sketches.topkDirectByLang(d, k))
    assert(viaTable === direct,
      "combine-of-fine-sketches must equal the direct coarse sketch")
    val exact = d.select(col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .groupBy("lang", "tok").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaTable === exact, "under-maxItems sketch counts must be exact")
  }

  test("incrementally-built top-k tables merge to the same rollup") {
    val d = Tables.documents(spark, sfDir)
    val day1 = Sketches.topkSketchTable(d.filter(col("doc_id") % 2 === 0))
    val day2 = Sketches.topkSketchTable(d.filter(col("doc_id") % 2 === 1))
    val merged = topk(Sketches.topkRollupByLang(day1.unionByName(day2), 64))
    assert(merged === topk(Sketches.topkDirectByLang(d, 64)))
  }

  test("estimates land within 5% of exact distinct counts") {
    val d = Tables.documents(spark, sfDir)
    val exact = d.groupBy(col("lang"))
      .agg(countDistinct(col("text")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = ests(Sketches.rollupByLang(Sketches.sketchTable(d)))
    exact.foreach { case (lang, n) =>
      val e = est(lang)._1
      assert(math.abs(e - n).toDouble / n < 0.05,
        s"lang=$lang exact=$n est=$e drifts > 5%")
    }
  }

  test("KMV overlap: complete sketches are exact; identical sets give J=1") {
    import spark.implicits._
    // |A|=30, |B|=20, |A∩B|=10 (members 20..29), plus C identical to A
    val rows = (0 until 30).map(i => ("A", i.toLong)) ++
      (20 until 40).map(i => ("B", i.toLong)) ++
      (0 until 30).map(i => ("C", i.toLong))
    val df = rows.toDF("key", "member")
    val sk = Sketches.kmvSketchTable(df, "key", "member", k = 64)
    val out = Sketches.kmvOverlap(sk, k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toMap
    // complete regime (k=64 > any union): every number exact
    assert(out(("A", "B")) === ((30L, 20L, 40L, 10L, 0.25)))
    assert(out(("B", "C")) === ((20L, 30L, 40L, 10L, 0.25)))
    val (na, nc, uni, inter, j) = out(("A", "C"))
    assert((na, nc, uni, j) === ((30L, 30L, 30L, 1.0)) && inter === 30L)
  }

  test("KMV overlap: k << n estimation regime lands near exact truth") {
    import spark.implicits._
    // |A|=4000, |B|=4000, overlap 2000 → |∪|=6000, J=1/3
    val rows = (0 until 4000).map(i => ("A", i.toLong)) ++
      (2000 until 6000).map(i => ("B", i.toLong))
    val sk = Sketches.kmvSketchTable(rows.toDF("key", "member"),
      "key", "member", k = 128)
    val r = Sketches.kmvOverlap(sk, k = 128).collect()(0)
    val (uni, inter, j) = (r.getLong(4), r.getLong(5), r.getDouble(6))
    // KMV error ~ 1/√k ≈ 9%: generous deterministic bounds (fixed hash
    // → fixed values; bounds document the regime, not luck)
    assert(math.abs(uni - 6000.0) / 6000.0 < 0.15, s"est_union=$uni")
    assert(math.abs(j - 1.0 / 3) < 0.12, s"jaccard_est=$j")
    assert(math.abs(inter - 2000.0) / 2000.0 < 0.30, s"est_inter=$inter")
  }

  // --- r14 deterministic sketch twins (the gate-flipped pair) ---

  test("DD log-bucket quantiles: estimates within the 4.43% relative bound") {
    import graft.llm.TextOps
    val docs = Tables.documents(spark, sfDir)
    val got = Sketches.ddQuantileRollup(Sketches.ddQuantileTable(docs))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val toks = docs.select(col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bound = math.pow(2.0, 1.0 / 16.0) - 1.0 // gamma = 2^(1/8)
    for ((lang, xs0) <- toks.groupBy(_._1)) {
      val xs = xs0.map(_._2).sorted
      val (n, p50, p90, p99) = got(lang)
      assert(n === xs.length)
      for ((q, est) <- Seq((0.5, p50), (0.9, p90), (0.99, p99))) {
        val exact = xs(math.ceil(q * xs.length).toInt - 1).toDouble
        assert(math.abs(est - exact) / exact <= bound + 1e-4,
          s"$lang q=$q est=$est exact=$exact")
      }
    }
  }

  test("DD quantile rollup == direct per-lang bucket build (merge = addition)") {
    import graft.llm.TextOps
    val docs = Tables.documents(spark, sfDir)
    val viaTable = Sketches.ddQuantileRollup(Sketches.ddQuantileTable(docs))
    // direct: same buckets built at the per-lang grain, one pass
    val direct = Sketches.ddQuantileRollup(
      Sketches.ddQuantileTable(docs.withColumn("source", lit("all"))))
    assert(viaTable.collect().map(_.toSeq).toSet
      === direct.collect().map(_.toSeq).toSet)
  }

  test("truncated-counter heavy hitters: bounds bracket exact truth, " +
      "guaranteed-tracked threshold holds, exact regime when vocab fits") {
    import graft.llm.TextOps
    val docs = Tables.documents(spark, sfDir)
    val tbl = Sketches.hhSketchTable(docs) // maxItems=16, truncation live
    // truncation IS live on this corpus (vocabs 16..31)
    val thr = tbl.select(col("lang"), col("source"), col("threshold"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(thr.values.exists(_ > 0L), "expected live truncation at maxItems=16")
    val rolled = Sketches.hhTopkRollup(tbl).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // exact per-lang truth
    val exact = docs.select(col("lang"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (((lang, tok), (lo, hi)) <- rolled) {
      val truth = exact((lang, tok))
      assert(lo <= truth && truth <= hi,
        s"$lang/$tok: bounds [$lo,$hi] must bracket exact $truth")
    }
    // mergeable-summaries guarantee: any token whose true count exceeds
    // the summed thresholds is tracked somewhere (appears as a candidate)
    val sumThr = thr.toSeq.groupBy(_._1._1)
      .map { case (l, xs) => l -> xs.map(_._2).sum }
    val candidates = tbl.select(col("lang"), col("tok")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    for (((lang, tok), truth) <- exact if truth > sumThr(lang))
      assert(candidates((lang, tok)),
        s"$lang/$tok count=$truth > sum-of-thresholds=${sumThr(lang)} must be tracked")
    // exact regime: maxItems >= vocab => thresholds 0, counts exact
    val wide = Sketches.hhTopkRollup(Sketches.hhSketchTable(docs, maxItems = 4096),
      k = 1000000).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
    for (((lang, tok), (lo, hi)) <- wide) {
      assert(lo === hi && lo === exact((lang, tok)))
    }
  }
}
