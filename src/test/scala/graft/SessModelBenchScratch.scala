package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.llm.{Ann, Classifier, TextOps}

/** Scratch A/B harness (r17) for the session-cached classifier model
  * and the ivf_tuning_report session-truth handoff — Test/runMain
  * graft.SessModelBenchScratch. Old shapes are the pre-change entry
  * compositions VERBATIM (fresh [[Classifier.train]] per invocation /
  * in-query brute truth); new shapes are the live entries. Interleaved,
  * bench protocol (untimed warmup, then alternating timed runs),
  * local[32], sf0.1. FoldBenchScratch convention: profiling tool, not a
  * spec. */
object SessModelBenchScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("sessmodel-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    def docs = Tables.documents(spark, dir)
    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("quality_classifier",
        () => Classifier.qualityClassifier(docs),
        () => Classifier.qualityClassifierQ(spark, dir)),
      ("quality_calibration",
        () => Classifier.qualityCalibration(docs),
        () => Classifier.qualityCalibrationQ(spark, dir)),
      ("corpus_sample_quality",
        () => Classifier.sampleByQuality(docs, Classifier.train(docs)),
        () => Classifier.corpusSampleQualityQ(spark, dir)),
      ("corpus_refine_learned",
        () => TextOps.corpusRefineLearned(docs, Classifier.train(docs)),
        () => TextOps.corpusRefineLearnedQ(spark, dir)),
      ("ivf_tuning_report",
        () => Ann.ivfTuningReport(Tables.embeddings(spark, dir)),
        () => Ann.ivfTuningReportQ(spark, dir)),
      // r17 second wave: the shared-semantic-quantizer servers — old
      // arms are the fresh-train compositions the entries used to run
      ("ann_ivf_balance",
        () => { val e = Tables.embeddings(spark, dir)
          Ann.ivfBalance(e, Ann.trainSemanticCentroids(e)) },
        () => Ann.ivfBalanceQ(spark, dir)),
      ("corpus_topic_terms",
        () => { val e = Tables.embeddings(spark, dir)
          Ann.cellTopicTerms(Tables.documents(spark, dir),
            Ann.semanticCells(e, Ann.trainSemanticCentroids(e))) },
        () => Ann.corpusTopicTermsQ(spark, dir)),
      ("dedup_semantic",
        () => Ann.dedupSemantic(Tables.embeddings(spark, dir)),
        () => Ann.dedupSemanticQ(spark, dir)),
      ("embed_silhouette",
        () => Ann.embedSilhouette(Tables.embeddings(spark, dir)),
        () => Ann.embedSilhouetteQ(spark, dir)),
      // r17 third wave: the index-family quantizer caches — old arms
      // train fresh (no cache key), new arms are the live entries
      ("ann_ivf_topk",
        () => Ann.annIvfTopK(Tables.embeddings(spark, dir)),
        () => Ann.annIvfTopKQ(spark, dir)),
      ("ann_pq_topk",
        () => Ann.annPqTopK(Tables.embeddings(spark, dir)),
        () => Ann.annPqTopKQ(spark, dir)),
      ("ann_ivfpq_topk",
        () => Ann.annIvfPqTopK(Tables.embeddings(spark, dir)),
        () => Ann.annIvfPqTopKQ(spark, dir)),
      ("ann_ivf_recall",
        () => Ann.annIvfRecall(Tables.embeddings(spark, dir),
          truth = Some(Ann.sessionBruteTruth(spark, dir))),
        () => Ann.annIvfRecallQ(spark, dir)),
      ("ann_pq_recall",
        () => Ann.annPqRecall(Tables.embeddings(spark, dir),
          truth = Some(Ann.sessionBruteTruth(spark, dir))),
        () => Ann.annPqRecallQ(spark, dir)),
      ("ann_ivfpq_recall",
        () => Ann.annIvfPqRecall(Tables.embeddings(spark, dir),
          truth = Some(Ann.sessionBruteTruth(spark, dir))),
        () => Ann.annIvfPqRecallQ(spark, dir)))

    cases.foreach { case (name, mkOld, mkNew) =>
      mkOld().write.format("noop").mode("overwrite").save()
      mkNew().write.format("noop").mode("overwrite").save()
      var tOld, tNew = List.empty[Double]
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime()
        mkOld().write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        mkNew().write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        tOld = tOld :+ (t1 - t0) / 1e9
        tNew = tNew :+ (t2 - t1) / 1e9
      }
      println(f"[sessmodel] $name%-24s old min=${tOld.min}%.2f all=${tOld.map(t => f"$t%.2f").mkString(",")}")
      println(f"[sessmodel] $name%-24s new min=${tNew.min}%.2f all=${tNew.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
