package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextProfile2

/** Round-14 wave 4: corpus profiling dashboards. The driver corpus is
  * clean prose with no markup, so the markup audit's fixtures here
  * carry the REAL assertion (counting identities on planted code /
  * HTML / links); diversity and budget-curve fixtures pin the
  * closed-form identities (uniform mix → entropy ln k, effective
  * sources k; threshold curve = descending prefix masses). */
class Round14dSpec extends AnyFunSuite with SparkFixture {

  private val rnd = new Random(1417)

  private def docs(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("corpus_source_diversity: uniform mix → entropy ln k, effective k") {
    val df = docs((1 to 12).map(i =>
      (i.toLong, "a b c", "en", s"s${i % 4}")))
    val r = TextProfile2.corpusSourceDiversity(df).collect().head
    assert(r.getLong(1) === 12L && r.getLong(2) === 4L)
    assert(r.getDouble(3) ===
      BigDecimal(math.log(4.0)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(4) === 0.25 && r.getDouble(5) === 4.0)
  }

  test("corpus_source_diversity: single source → entropy 0, simpson 1") {
    val df = docs((1 to 5).map(i => (i.toLong, "x", "fr", "only")))
    val r = TextProfile2.corpusSourceDiversity(df).collect().head
    assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 1.0 &&
      r.getDouble(5) === 1.0)
  }

  test("corpus_quality_budget_curve: descending prefix masses, by hand") {
    // 2 docs of 64 clean tokens (score 1.0 → bucket 19), 1 doc of 32
    // clean tokens (score 0.5 → bucket 10, token count 32)
    val hi = (1 to 64).map(_ => "word").mkString(" ")
    val mid = (1 to 32).map(_ => "word").mkString(" ")
    val df = docs(Seq((1L, hi, "en", "s"), (2L, hi, "en", "s"),
      (3L, mid, "en", "s")))
    val got = TextProfile2.corpusQualityBudgetCurve(df).collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got(0.95) === ((2L, 128L, 0.6667, 0.8)))
    assert(got(0.5) === ((3L, 160L, 1.0, 1.0)))
    assert(got.size === 2)
  }

  test("text_vocab_gini: uniform vocabulary → 0; replay vs rank formula") {
    val uni = docs(Seq((1L, "a b c d", "en", "s"), (2L, "a b c d", "en", "s")))
    assert(TextProfile2.textVocabGini(uni).collect().head.getDouble(3) === 0.0)
    // random corpus: replay against the plain-Scala rank-sum formula
    val words = Vector("agg", "scan", "join", "sort", "key", "row")
    val rows = (1 to 40).map { i =>
      val t = (1 to 10 + rnd.nextInt(20)).map(_ => words(rnd.nextInt(6)))
        .mkString(" ")
      (i.toLong, t, if (i % 2 == 0) "en" else "de", "s")
    }
    val got = TextProfile2.textVocabGini(docs(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    rows.groupBy(_._3).foreach { case (lang, grp) =>
      val freqs = grp.flatMap(_._2.split("\\s+")).groupBy(identity)
        .map(_._2.size.toLong).toSeq.sorted
      val n = freqs.size
      val tot = freqs.sum.toDouble
      val rs = freqs.zipWithIndex.map { case (x, i) => (i + 1) * x.toDouble }.sum
      val want = BigDecimal(2 * rs / (n * tot) - (n + 1.0) / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(lang)._1 === n.toLong)
      assert(math.abs(got(lang)._2 - want) < 2e-4, s"lang $lang")
    }
  }

  test("corpus_weighted_sample: integer priorities, plain-Scala replay, no sort exchange") {
    import graft.llm.TextOps
    val df = Tables.documents(spark, sfDir)
    val res = TextOps.corpusWeightedSample(df, k = 20)
    val got = res.collect().map(r => (r.getLong(0), r.getLong(4)))
    // plain-Scala replay of the priority arithmetic + top-k cut
    val want = df.select(col("doc_id"), col("n_chars")).collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(1)
        val u = ((id % TextOps.SampleIdPrime) * TextOps.WeightedMultiplier
          >> TextOps.SampleShift) % 1000000L
        (id, w * 1000000000000L / (u + 1L))
      }
      .sortBy { case (id, p) => (-p, id) }.take(20)
    assert(got.toSeq === want.toSeq)
    // the cut is a per-partition top-k, not a global sort
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("corpus_weighted_sample_stratified: per-lang top-k of the priority order") {
    import graft.llm.TextOps
    val df = Tables.documents(spark, sfDir)
    val got = TextOps.corpusWeightedSampleStratified(df, k = 5).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(4)))
    val want = df.select(col("doc_id"), col("lang"), col("n_chars"))
      .collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(2)
        val u = ((id % TextOps.SampleIdPrime) * TextOps.WeightedMultiplier
          >> TextOps.SampleShift) % 1000000L
        (r.getString(1), id, w * 1000000000000L / (u + 1L))
      }
      .groupBy(_._1).values.flatMap(
        _.sortBy { case (_, id, p) => (-p, id) }.take(5))
      .toSet
    assert(got.toSet === want)
    assert(got.map(_._1).distinct.length === 5) // every language drawn
  }

  test("text_markup_audit: planted code, HTML, links, emails counted exactly") {
    val df = docs(Seq(
      (1L, "def f(x): return {x: [1]};", "en", "code"),   // ( ) { } [ ] ; : → braces
      (2L, "<html><p>hi</p> see http://x.co and www.example", "en", "web"),
      (3L, "mail me at bob@example.com today", "en", "mail"),
      (4L, "clean prose only here", "en", "clean")))
    val got = TextProfile2.textMarkupAudit(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7)))
      .toMap
    // "def f(x): return {x: [1]};" → ( ) { } [ ] ; = 7 brace-class chars
    assert(got("code") === ((7L, 0L, 0L, 0L, 1L, 1.0)))
    // <html> <p> </p> → three '<letter-or-/' hits; http + www. → 2
    assert(got("web") === ((0L, 3L, 2L, 0L, 1L, 1.0)))
    assert(got("mail") === ((0L, 0L, 0L, 1L, 1L, 1.0)))
    assert(got("clean") === ((0L, 0L, 0L, 0L, 0L, 0.0)))
  }
}
