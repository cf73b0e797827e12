package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.llm.{Ann, Dedup}
import graft.cdc.{Cdc, MergePipeline}
import graft.sinks.WarehouseSink

/** Synthetic 10x scale smoke: replicate sf0.1 with shifted ids and check
  * the hot operators complete with ~linear cost. */
object ScaleSmoke {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def times10(df: DataFrame, idCol: String, shift: Long): DataFrame =
    (0 until 10).map(i => df.withColumn(idCol, col(idCol) + lit(i * shift)))
      .reduce(_ unionByName _)
  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val docs10 = times10(Tables.documents(spark, dir), "doc_id", 1000000L)
    val emb10 = times10(Tables.embeddings(spark, dir), "vec_id", 1000000L)
    val ev10 = (0 until 10).map { i =>
      Tables.events(spark, dir)
        .withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i * 100000L))
    }.reduce(_ unionByName _)
    println("=== docs: " + docs10.count() + " emb: " + emb10.count() + " events: " + ev10.count())
    t("dedup_minhash 50k docs")(Dedup.dedupMinhash(docs10).write.format("noop").mode("overwrite").save())
    t("dedup_simhash 50k docs")(Dedup.dedupSimhash(docs10).write.format("noop").mode("overwrite").save())
    t("dedup_jaccard 50k docs")(Dedup.dedupNgramJaccard(docs10).write.format("noop").mode("overwrite").save())
    // the 10x-replicated corpus's pair set is ~20x the corpus (every
    // 10-clique contributes 45 pairs) — forces the DISTRIBUTED
    // connected-components path end-to-end on a pair graph >> corpus
    t("dedup_corpus 50k docs (distributed CC)")(
      Dedup.dedupedCorpus(docs10, Dedup.dedupNgramJaccard(docs10), maxDriverPairs = 0L)
        .write.format("noop").mode("overwrite").save())
    t("text_rarity 50k docs")(graft.llm.TextOps.textRarity(docs10).write.format("noop").mode("overwrite").save())
    t("ngram_topk 50k docs")(graft.llm.TextOps.textNgramTopK(docs10).write.format("noop").mode("overwrite").save())
    t("corpus_pack 50k docs")(graft.llm.TextOps.corpusPack(docs10).write.format("noop").mode("overwrite").save())
    t("corpus_budget_select 50k docs")(
      graft.llm.TextOps.corpusBudgetSelect(docs10)
        .write.format("noop").mode("overwrite").save())
    t("corpus_interleave 50k docs")(
      graft.llm.TextOps.corpusInterleave(docs10)
        .write.format("noop").mode("overwrite").save())
    t("minhash_tuning_report 50k docs x 3 bandings")(
      Dedup.minhashTuningReport(docs10)
        .write.format("noop").mode("overwrite").save())
    t("decontaminate_report 50k docs x 20 bench")(
      graft.llm.TextOps.decontaminateReport(
        docs10.filter(col("doc_id") >= 20), docs10.filter(col("doc_id") < 20))
        .write.format("noop").mode("overwrite").save())
    t("ann_topk 20k vecs")(Ann.annTopK(emb10).write.format("noop").mode("overwrite").save())
    t("ann_pq 20k vecs")(Ann.annPqTopK(emb10).write.format("noop").mode("overwrite").save())
    t("ann_ivfpq 20k vecs")(Ann.annIvfPqTopK(emb10).write.format("noop").mode("overwrite").save())
    // nlist scales with the corpus in the SemDeDup regime: 10x vectors,
    // 10x cells keeps |cell| and the within-cell quadratic constant
    t("dedup_semantic 20k vecs")(Ann.dedupSemantic(emb10, nlist = 160)
      .write.format("noop").mode("overwrite").save())
    t("dedup_containment 50k docs")(Dedup.dedupContainment(docs10)
      .write.format("noop").mode("overwrite").save())
    t("text_boilerplate 50k docs")(graft.llm.SpanDedup.removeBoilerplate(docs10)
      .write.format("noop").mode("overwrite").save())
    t("text_perplexity 50k docs")(graft.llm.TextOps.textPerplexity(docs10)
      .write.format("noop").mode("overwrite").save())
    t("text_gopher 50k docs")(graft.llm.TextOps.textGopher(docs10, minWords = 8, minStop = 1)
      .write.format("noop").mode("overwrite").save())
    t("corpus_bpe_pairs 50k docs")(graft.llm.TextOps.corpusBpePairs(docs10)
      .write.format("noop").mode("overwrite").save())
    t("text_blocklist 50k docs")(graft.llm.TextOps.textBlocklist(docs10)
      .write.format("noop").mode("overwrite").save())
    t("text_lang_confusion 50k docs")(graft.llm.TextOps.textLangConfusion(docs10)
      .write.format("noop").mode("overwrite").save())
    t("quality monitor 50k docs")(graft.streaming.StreamAggs.qualityMonitor(
      docs10.withColumn("ingest_ts",
        (lit(1704067200L) + col("doc_id") % 21600).cast("timestamp")),
      minWords = 8, minStop = 1)
      .write.format("noop").mode("overwrite").save())
    t("embed_outliers 20k vecs")(Ann.embedOutliers(emb10)
      .write.format("noop").mode("overwrite").save())
    // NOTE: this harness's 10-way union amplifies PLAN-time cost for
    // expression-heavy projections (10 branches × 1024 terms ≈ 700k
    // optimizer nodes → ~7 s here, vs 0.5 s on the bench's single-scan
    // plan at sf0.1) — a shape artifact of the replicated-input test, not
    // a data-scale property: a real corpus is one scan branch
    t("embed_project 20k vecs")(Ann.embedProject(emb10)
      .write.format("noop").mode("overwrite").save())
    t("corpus_split 50k docs")(graft.llm.TextOps.corpusSplit(docs10)
      .write.format("noop").mode("overwrite").save())
    t("corpus_chunk 50k docs")(graft.llm.TextOps.corpusChunk(docs10)
      .write.format("noop").mode("overwrite").save())
    t("text_tfidf 50k docs")(graft.llm.TextOps.textTfidf(docs10)
      .write.format("noop").mode("overwrite").save())
    t("text_perplexity_bigram 50k docs")(
      graft.llm.TextOps.textPerplexityBigram(docs10)
        .write.format("noop").mode("overwrite").save())
    t("dsir_score 50k docs x 20-doc target")(
      graft.llm.TextOps.dsirScore(docs10.filter(col("doc_id") >= 20),
        docs10.filter(col("doc_id") < 20))
        .write.format("noop").mode("overwrite").save())
    t("embed_whiten 20k vecs")(Ann.embedWhiten(emb10)
      .write.format("noop").mode("overwrite").save())
    // like embed_project above, the 10-branch union amplifies PLAN-time
    // cost for the 2 145-expression moment aggregate — shape artifact
    t("embed_pca 20k vecs")(Ann.embedPca(emb10)
      .write.format("noop").mode("overwrite").save())
    t("ann_filtered_topk 20k vecs")(Ann.annFilteredTopK(emb10)
      .write.format("noop").mode("overwrite").save())
    t("knn_label_prop 10k vecs (4x pair work vs sf0.1)")(
      Ann.knnLabelProp(emb10.filter(col("vec_id") < 2000000L),
        k = 3, iters = 2)
        .write.format("noop").mode("overwrite").save())
    t("bpe_encode 50k docs (20 trained merges)") {
      import spark.implicits._
      val merges = graft.llm.TextOps.bpeTrain(docs10)
        .orderBy(col("merge_rank")).select(col("left"), col("right"))
        .as[(String, String)].collect().toSeq
      graft.llm.TextOps.bpeEncode(docs10, merges)
        .write.format("noop").mode("overwrite").save()
    }
    t("quality_classifier 50k docs (train + score)")(
      graft.llm.Classifier.qualityClassifier(docs10)
        .write.format("noop").mode("overwrite").save())
    t("embed_decontaminate 20k vecs x 100 bench") {
      Ann.embedDecontaminate(emb10.filter(col("vec_id") >= 100),
        emb10.filter(col("vec_id") < 100))
        .write.format("noop").mode("overwrite").save()
    }
    t("sketch tables 50k docs") {
      graft.llm.Sketches.rollupByLang(graft.llm.Sketches.sketchTable(docs10))
        .write.format("noop").mode("overwrite").save()
      graft.llm.Sketches.quantileRollupByLang(
        graft.llm.Sketches.quantileSketchTable(docs10))
        .write.format("noop").mode("overwrite").save()
    }
    // the 10×-replicated corpus is 90% exact duplicates — the regime the
    // exact-collapse stage inside dedupEmbed exists for (uncollapsed this
    // took 435 s: duplicate groups share every bucket at any banding)
    t("dedup_embed 20k vecs")(Ann.dedupEmbed(emb10)
      .write.format("noop").mode("overwrite").save())
    t("ann_ivf 20k vecs")(Ann.annIvfTopK(emb10).write.format("noop").mode("overwrite").save())
    // realistic coarse-quantizer size: the point is the PLAN — with the
    // centroid matrix as one reference object, plan build + codegen must
    // stay sane at nlist ≥ 1024 (the per-centroid-literal form built a
    // multi-hundred-MB expression tree here)
    t("ann_ivf 20k vecs nlist=1024")(Ann.annIvfTopK(emb10, nlist = 1024, nprobe = 64)
      .write.format("noop").mode("overwrite").save())
    t("cdc_key_churn 1M events")(Cdc.keyChurn(ev10)
      .write.format("noop").mode("overwrite").save())
    t("embed_centroid_shift 2x10k vecs")(
      Ann.embedCentroidShift(emb10.filter(col("vec_id") % 2 === 0),
        emb10.filter(col("vec_id") % 2 === 1))
        .write.format("noop").mode("overwrite").save())
    t("dedup_latest 1M events")(Cdc.dedupLatestEvents(ev10).write.format("noop").mode("overwrite").save())
    val sink = new WarehouseSink(java.nio.file.Files.createTempDirectory("scale_wh_").toString)
    t("bucket merge 1M events")(MergePipeline.mergeBatch(spark, sink, "s", Cdc.flatten(ev10), Seq("user_id")))
    t("asof 1M events") {
      val p = ev10.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val c = ev10.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      graft.operators.AsofJoin.asof(p, c, Seq("user_id"), "ts", "ts",
        Seq("click_id")).write.format("noop").mode("overwrite").save()
    }
    // 10× incremental near-dup: 30k-doc store probed by a 20k-doc batch
    val mhSink = new WarehouseSink(java.nio.file.Files.createTempDirectory("scale_mh_").toString)
    t("minhash store build 30k docs")(Dedup.buildMinhashStore(
      docs10.filter(pmod(col("doc_id"), lit(10)) < 6), mhSink))
    t("incremental minhash probe 20k docs")(Dedup.dedupIncrementalMinhash(
      docs10.filter(pmod(col("doc_id"), lit(10)) >= 6), spark, mhSink)
      .write.format("noop").mode("overwrite").save())
    // Bloom sidecar at 10×: store + sidecar build, then the pruned probe
    val fpSink = new WarehouseSink(
      java.nio.file.Files.createTempDirectory("scale_fp_").toString)
    t("fingerprint store + bloom build 30k docs") {
      Dedup.buildFingerprintStore(
        docs10.filter(pmod(col("doc_id"), lit(10)) < 6), fpSink)
      Dedup.buildFingerprintBloom(spark, fpSink)
    }
    t("bloom-pruned probe 20k docs")(Dedup.dedupIncrementalBloom(
      docs10.filter(pmod(col("doc_id"), lit(10)) >= 6), spark, fpSink)
      .write.format("noop").mode("overwrite").save())
    // persisted IVF-PQ index at 10×: build once, probe-only serve path
    val pqSink = new WarehouseSink(
      java.nio.file.Files.createTempDirectory("scale_ivfpq_").toString)
    t("ivfpq index build 20k vecs")(Ann.buildIvfPqIndex(emb10, pqSink))
    t("ivfpq index probe 10 queries")(Ann.annIvfPqIndexTopK(
      emb10.filter(col("vec_id") < 10), spark, pqSink)
      .write.format("noop").mode("overwrite").save())
    // semantic cell store at 10×: nlist scaled with the corpus (160)
    val semSink = new WarehouseSink(
      java.nio.file.Files.createTempDirectory("scale_sem_").toString)
    t("semantic store build 12k vecs")(Ann.buildSemanticStore(
      emb10.filter(pmod(col("vec_id"), lit(10)) < 6), semSink, nlist = 160))
    t("incremental semantic probe 8k vecs")(Ann.dedupSemanticIncremental(
      emb10.filter(pmod(col("vec_id"), lit(10)) >= 6), spark, semSink)
      .write.format("noop").mode("overwrite").save())
    // round-6 operators at 10×
    t("dedup_substrings 50k docs (stride-1 windows)")(
      graft.llm.SpanDedup.dedupSubstrings(docs10)
        .write.format("noop").mode("overwrite").save())
    t("dedup_spans 50k docs")(graft.llm.SpanDedup.dedupChunks(docs10)
      .write.format("noop").mode("overwrite").save())
    val spSink = new WarehouseSink(
      java.nio.file.Files.createTempDirectory("scale_sp_").toString)
    t("span store build 30k docs")(graft.llm.SpanDedup.buildSpanStore(
      docs10.filter(pmod(col("doc_id"), lit(10)) < 6), spSink))
    t("span store probe 20k docs")(graft.llm.SpanDedup.dedupChunksIncremental(
      docs10.filter(pmod(col("doc_id"), lit(10)) >= 6), spark, spSink)
      .write.format("noop").mode("overwrite").save())
    // 200k points × 200k 15-min windows (~70 concurrently open) ≈ 14M
    // pairs — the bin join must stream through it, no loop join
    t("interval join 1M events") {
      val p = ev10.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      val w = ev10.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), col("ts").as("i_start"),
          (col("ts") + expr("INTERVAL 15 MINUTES")).as("i_end"))
      graft.operators.IntervalJoin.join(p, "p_ts", w, "i_start", "i_end")
        .write.format("noop").mode("overwrite").save()
    }
    t("funnel 1M events")(graft.queries.Analytics2.funnel(ev10)
      .write.format("noop").mode("overwrite").save())
    t("shard export 50k docs") {
      graft.llm.Export.exportShards(docs10,
        java.nio.file.Files.createTempDirectory("scale_shards_").toString,
        nShards = 16).write.format("noop").mode("overwrite").save()
    }
    t("split shard export 50k docs") {
      graft.llm.Export.exportSplitShards(docs10,
        java.nio.file.Files.createTempDirectory("scale_split_").toString,
        nShards = 16).write.format("noop").mode("overwrite").save()
    }
    // exact graph = quadratic dots by definition: 10× vectors ⇒ ~100×
    // dot work but still n·k exchange rows — the reading verifies the
    // bounded aggregate holds that shape (quadratic compute, linear
    // shuffle), not linear wall time
    t("knn_graph 10k vecs (4x pair work vs sf0.1)")(
      Ann.knnGraph(emb10.filter(col("vec_id") < 2000000L))
        .write.format("noop").mode("overwrite").save())
    t("bpe_train 50k docs")(graft.llm.TextOps.bpeTrain(docs10)
      .write.format("noop").mode("overwrite").save())
    t("events_anomaly 1M events")(
      graft.queries.Analytics2.eventsAnomalyOn(ev10)
        .write.format("noop").mode("overwrite").save())
    // media codecs at 100x: 500k REAL encoded payloads (PGM/PPM images,
    // WAV clips) synthesized, decoded, and feature-extracted in one
    // mapPartitions pass — no shuffle, so cost must track payload volume
    locally {
      implicit val s = spark
      val docs100 = times10(docs10, "doc_id", 100000000L)
        .repartition(spark.sparkContext.defaultParallelism)
      t("netpbm decode 500k images")(
        graft.llm.Multimodal.extractFeatures(
          graft.llm.Multimodal.withMediaColumn(docs100))
          .write.format("noop").mode("overwrite").save())
      t("wav decode 500k clips")(
        graft.llm.Audio.extractFeatures(
          graft.llm.Audio.withAudioColumn(docs100))
          .write.format("noop").mode("overwrite").save())
      t("y4m decode 500k videos")(
        graft.llm.Video.extractFeatures(
          graft.llm.Video.withVideoColumn(docs100))
          .write.format("noop").mode("overwrite").save())
    }
    // r10 s3 operators at 10×
    t("cdc_time_travel 1M events")(Cdc.timeTravel(ev10,
        lit("2024-01-15").cast("timestamp"))
      .write.format("noop").mode("overwrite").save())
    t("cdc_snapshot_diff 1M events")(Cdc.snapshotDiff(ev10,
        lit("2024-01-10").cast("timestamp"), lit("2024-01-20").cast("timestamp"))
      .write.format("noop").mode("overwrite").save())
    t("filter_agreement 50k docs")(graft.llm.TextOps.filterAgreement(docs10, Seq(
        "gopher" -> graft.llm.TextOps.gopherPassCol(8, 100000, 1),
        "quality" -> (graft.llm.TextOps.qualityScoreCol >= 0.5),
        "clean" -> (size(filter(graft.llm.TextOps.tokens(col("text")),
          tk => tk.isin(graft.llm.TextOps.DemoBlocklist: _*))) === 0)))
      .write.format("noop").mode("overwrite").save())
    t("corpus_temperature_sample 50k docs")(
      graft.llm.TextOps.corpusTemperatureSample(docs10)
        .write.format("noop").mode("overwrite").save())
    t("ann_ivf_balance 20k vecs nlist=160")(
      Ann.ivfBalance(emb10, Ann.trainSemanticCentroids(emb10, nlist = 160))
        .write.format("noop").mode("overwrite").save())
    t("link_jaccard 25k x 25k docs")(
      Dedup.linkJaccard(docs10.filter(col("doc_id") % 2 === 0),
        docs10.filter(col("doc_id") % 2 === 1))
        .write.format("noop").mode("overwrite").save())
    // graph build dominates (quadratic dots, n·k exchange — see
    // knn_graph above); the quality joins add two slim co-partitioned
    // hops on top
    t("knn_quality_score 10k vecs")(
      Ann.knnQualityScore(docs10.filter(col("doc_id") < 2000000L),
        emb10.filter(col("vec_id") < 2000000L))
        .write.format("noop").mode("overwrite").save())
    t("knn_coreset 10k vecs (one shared graph build)")(
      Ann.knnCoreset(emb10.filter(col("vec_id") < 2000000L))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
