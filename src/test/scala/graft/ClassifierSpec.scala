package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Classifier, TextOps}

class ClassifierSpec extends AnyFunSuite with SparkFixture {

  test("training is deterministic end-to-end") {
    val docs = Tables.documents(spark, sfDir)
    val a = Classifier.train(docs)
    val b = Classifier.train(docs)
    assert(a.w.toSeq === b.w.toSeq && a.b === b.b &&
      a.mu.toSeq === b.mu.toSeq && a.sd.toSeq === b.sd.toSeq)
    val sa = Classifier.qualityClassifier(docs).collect().toSeq
    val sb = Classifier.qualityClassifier(docs).collect().toSeq
    assert(sa === sb)
  }

  test("a separable fixture is classified perfectly") {
    import spark.implicits._
    // long prose (passes the gopher rules at minWords=8/minStop=1) vs
    // punctuation soup (fails several) — linearly separable on the
    // word-count + punct-ratio features alone
    val good = (0L until 40L).map(i => (i,
      s"the quick brown fox number $i jumps over the lazy dog and " +
        "keeps running through the field with great speed today"))
    val bad = (100L until 140L).map(i => (i, "!!! ??? ### $$$ %%% @@@"))
    val docs = (good ++ bad).toDF("doc_id", "text")
    val out = Classifier.qualityClassifier(docs)
      .join(TextOps.textGopher(docs, minWords = 8, minStop = 1)
        .select(col("doc_id"), col("gopher_pass")), "doc_id")
    assert(out.filter(col("keep") =!= col("gopher_pass")).isEmpty)
    // and the two classes actually differ in label (the fixture is live)
    assert(out.filter(col("gopher_pass")).count() === 40L)
    assert(out.filter(!col("gopher_pass")).count() === 40L)
  }

  test("distilled scores agree with the gopher rules on the real corpus") {
    val docs = Tables.documents(spark, sfDir)
    val out = Classifier.qualityClassifier(docs)
      .join(TextOps.textGopher(docs, minWords = 8, minStop = 1)
        .select(col("doc_id"), col("gopher_pass")), "doc_id")
    val n = out.count()
    assert(n === docs.count())
    val agree = out.filter(col("keep") === col("gopher_pass")).count()
    // a linear model can't reproduce a rule CASCADE exactly — 90%
    // agreement is the distillation bar (fasttext-vs-rules territory)
    assert(agree.toDouble / n >= 0.9, s"agreement ${agree.toDouble / n}")
    // scores are probabilities, rounded to 4 decimals
    val bad = out.filter(col("quality_score") < 0.0 ||
      col("quality_score") > 1.0).count()
    assert(bad === 0L)
  }
}
