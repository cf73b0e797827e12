package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Classifier

/** Pins the r17 session-cached classifier model ([[Classifier
  * .sessionModel]]) to the fresh-train contract: same dir + same
  * hyperparameters ⇒ the exact model a fresh [[Classifier.train]]
  * produces (train is deterministic — deterministic sample, fixed
  * iterations, sequential driver arithmetic), and the second call
  * serves the cached instance instead of retraining. The four
  * train-then-serve driver entries therefore compute identical results
  * whether the model is fresh or served — the SessionStores equality
  * discipline applied to a model object. */
class SessionModelSpec extends AnyFunSuite with SparkFixture {

  test("sessionModel equals a fresh train, field for field") {
    val fresh = Classifier.train(Tables.documents(spark, sfDir))
    val cached = Classifier.sessionModel(spark, sfDir)
    assert(cached.mu.toSeq === fresh.mu.toSeq)
    assert(cached.sd.toSeq === fresh.sd.toSeq)
    assert(cached.w.toSeq === fresh.w.toSeq)
    assert(cached.b === fresh.b)
  }

  test("second call serves the cached instance; params key the cache") {
    val a = Classifier.sessionModel(spark, sfDir)
    val b = Classifier.sessionModel(spark, sfDir)
    assert(a eq b)
    // different hyperparameters are a different cache entry (and a
    // genuinely different model)
    val c = Classifier.sessionModel(spark, sfDir, iters = 10)
    assert(!(c eq a))
    assert(c.w.toSeq !== a.w.toSeq)
  }

  test("session semantic centroids equal a fresh Lloyd train; entries agree") {
    import graft.llm.Ann
    val emb = Tables.embeddings(spark, sfDir)
    val fresh = Ann.trainSemanticCentroids(emb)
    val cached = Ann.sessionSemanticCentroids(spark, sfDir)
    assert(cached.map(_.toSeq) === fresh.map(_.toSeq))
    assert(Ann.sessionSemanticCentroids(spark, sfDir) eq cached)
    // the four serving entries equal their fresh-train compositions
    assert(Ann.ivfBalanceQ(spark, sfDir).collect().toSet ===
      Ann.ivfBalance(emb, fresh).collect().toSet)
    assert(Ann.dedupSemanticQ(spark, sfDir).collect().toSet ===
      Ann.dedupSemantic(emb).collect().toSet)
    assert(Ann.embedSilhouetteQ(spark, sfDir).collect().toSet ===
      Ann.embedSilhouette(emb).collect().toSet)
    assert(Ann.corpusTopicTermsQ(spark, sfDir).collect().toSet ===
      Ann.cellTopicTerms(Tables.documents(spark, sfDir),
        Ann.semanticCells(emb, fresh)).collect().toSet)
  }

  test("index-family entries equal their fresh-quantizer compositions") {
    import graft.llm.Ann
    val emb = Tables.embeddings(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSet
    // cached-quantizer entries vs fully-fresh library compositions
    assert(rows(Ann.annIvfTopKQ(spark, sfDir)) === rows(Ann.annIvfTopK(emb)))
    assert(rows(Ann.annPqTopKQ(spark, sfDir)) === rows(Ann.annPqTopK(emb)))
    assert(rows(Ann.annIvfPqTopKQ(spark, sfDir))
      === rows(Ann.annIvfPqTopK(emb)))
    assert(rows(Ann.annIvfRecallQ(spark, sfDir))
      === rows(Ann.annIvfRecall(emb)))
    assert(rows(Ann.annPqRecallQ(spark, sfDir)) === rows(Ann.annPqRecall(emb)))
    assert(rows(Ann.annIvfPqRecallQ(spark, sfDir))
      === rows(Ann.annIvfPqRecall(emb)))
    assert(rows(Ann.embedPqDistortionQ(spark, sfDir))
      === rows(Ann.embedPqDistortion(emb)))
    assert(rows(Ann.ivfElbowReportQ(spark, sfDir))
      === rows(Ann.ivfElbowReport(emb)))
  }

  test("train-then-serve entries are identical under the session model") {
    // fresh-model arms, composed exactly as the entries compose them
    val docs = Tables.documents(spark, sfDir)
    val fresh = Classifier.train(docs)
    assert(Classifier.score(docs, fresh).collect().toSet ===
      Classifier.qualityClassifierQ(spark, sfDir).collect().toSet)
    assert(Classifier.sampleByQuality(docs, fresh).collect().toSet ===
      Classifier.corpusSampleQualityQ(spark, sfDir).collect().toSet)
    assert(Classifier.qualityCalibration(docs).collect().toSet ===
      Classifier.qualityCalibrationQ(spark, sfDir).collect().toSet)
    assert(graft.llm.TextOps.corpusRefineLearned(docs, fresh).collect().toSet ===
      graft.llm.TextOps.corpusRefineLearnedQ(spark, sfDir).collect().toSet)
  }
}
