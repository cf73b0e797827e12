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

  test("scoreCol serve path: streaming scores equal the batch scores") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "source")
    val m = Classifier.train(Tables.documents(spark, sfDir))
    // Column form == DataFrame form on batch (same arithmetic)
    val viaCol = docs.select(col("doc_id"),
      Classifier.scoreCol(m).as("quality_score"),
      Classifier.keepCol(m).as("keep"))
    val viaDf = Classifier.score(Tables.documents(spark, sfDir), m)
    assert(viaCol.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaCol).isEmpty)
    // the same expression scores a FILE STREAM unchanged (stateless)
    val inputDir = tmpDir("clf_in_")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$inputDir/f0")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$inputDir/f1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
    val q = stream.select(col("doc_id"),
        Classifier.scoreCol(m).as("quality_score"),
        Classifier.keepCol(m).as("keep"))
      .writeStream.format("memory").queryName("clf_scores")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("clf_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("clf_scores")
    assert(got.count() === docs.count())
    assert(got.exceptAll(viaDf).isEmpty && viaDf.exceptAll(got).isEmpty)
  }

  test("classifierMonitor pass totals equal the batch keep count") {
    import spark.implicits._
    val m = Classifier.train(Tables.documents(spark, sfDir))
    val docs = Tables.documents(spark, sfDir)
      .withColumn("ingest_ts",
        (lit(1704067200L) + col("doc_id") % 21600).cast("timestamp"))
    val got = Classifier.classifierMonitor(docs, m)
    val wantKeep = Classifier.score(Tables.documents(spark, sfDir), m)
      .filter(col("keep")).count()
    assert(got.agg(sum("n_pass")).as[Long].head() === wantKeep)
    assert(got.agg(sum("n_docs")).as[Long].head() === docs.count())
  }

  test("sampleByQuality is deterministic, bucket-exact and quality-shifting") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val m = Classifier.train(docs)
    val a = Classifier.sampleByQuality(docs, m)
    val b = Classifier.sampleByQuality(docs, m)
    assert(a.collect().toSeq.sortBy(_.getLong(0)) ===
      b.collect().toSeq.sortBy(_.getLong(0)))
    // membership is exactly bucket < permille(score) — recomputed
    // independently from the scored frame
    val scored = Classifier.score(docs, m)
      .join(docs.select(col("doc_id"), TextOps.sampleBucket.as("bk")),
        "doc_id")
    val want = scored
      .filter(col("bk") < round(col("quality_score") * 1000).cast("long"))
      .select(col("doc_id"), col("quality_score"))
    assert(a.exceptAll(want).isEmpty && want.exceptAll(a).isEmpty)
    // soft filtering shifts quality mass UP: mean kept score strictly
    // above mean corpus score (true unless scores are constant)
    val meanAll = scored.agg(avg("quality_score")).as[Double].head()
    val meanKept = a.agg(avg("quality_score")).as[Double].head()
    assert(meanKept > meanAll,
      s"kept mean $meanKept not above corpus mean $meanAll")
  }

  test("corpus_refine_learned keeps one exchange and gates like the model") {
    import spark.implicits._
    // real-ish prose: the learned gate distills gopher, so the good doc
    // needs stopwords and alpha words, not just length
    val good = (1 to 12)
      .map(i => s"the quick brown fox number$i jumps over the lazy dog and")
      .mkString(" ")
    val d = Seq(
      (1L, good, "en", "web"),
      (2L, good, "en", "web"),              // exact dup of 1 → dropped
      (3L, "x", "en", "web"),               // under the token floor
      (4L, ("!! ?? ;; ,, ## $$ %% ^^ && **" + " !?") * 4, "en", "web"),
      // 5/6 differ ONLY by email — identical after scrub → dedup as one
      (5L, good + " contact a@b.com", "en", "web"),
      (6L, good + " contact z@w.org", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    // train on the REAL corpus (the fixture is too tiny to learn from)
    val m = Classifier.train(Tables.documents(spark, sfDir))
    val out = graft.llm.TextOps.corpusRefineLearned(d, m,
        ratesPermille = Seq("en" -> 1000))
      .select("doc_id").as[Long].collect().sorted
    // prose survives the learned gate, punct soup and the short doc
    // don't, and the scrub-then-dedup collapse keeps first ids
    assert(out === Array(1L, 5L))
    // the defining plan property survives the learned gate: exactly ONE
    // exchange (the dedup window's content-hash shuffle) — metrics,
    // sigmoid, and sampler all fused map-side
    val plan = graft.llm.TextOps.corpusRefineLearned(d, m)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      plan.take(500))
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

  test("qualityCalibration: separable fixture polarizes, ties never split") {
    import spark.implicits._
    // the separable fixture: 40 identical good texts, 40 identical bad —
    // two score values, so ties-never-split forces exactly TWO deciles
    val good = (0L until 40L).map(i => (i,
      "the quick brown fox jumps over the lazy dog and " +
        "keeps running through the field with great speed today"))
    val bad = (100L until 140L).map(i => (i, "!!! ??? ### $$$ %%% @@@"))
    val docs = (good ++ bad).toDF("doc_id", "text")
    val out = Classifier.qualityCalibration(docs)
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .sortBy(_._1)
    assert(out.length === 2)
    // top decile: all good docs, pass rate 1.0; the other: all bad, 0.0
    assert(out(0)._1 === 0L && out(0)._2 === 40L && out(0)._4 === 1.0)
    assert(out(1)._2 === 40L && out(1)._4 === 0.0)
    assert(out(0)._3 > out(1)._3)
  }

  test("qualityCalibration on the real corpus: closure and monotone scores") {
    val docs = Tables.documents(spark, sfDir)
    val out = Classifier.qualityCalibrationQ(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(out.map(_.getLong(1)).sum === docs.count())
    // deciles are score-ordered: each decile's min never below the next's max
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) >= b.getDouble(5) - 1e-9)
    case _ => ()
    }
    out.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }
}
