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
