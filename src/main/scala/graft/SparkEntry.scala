package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cdc.{Cdc, MergePipeline, TypeMap}
import graft.llm.{Ann, Audio, Dedup, Multimodal, Sketches, SpanDedup, TextOps, TextProfile, TextProfile2, Video}
import graft.queries.{Analytics, Analytics2, Analytics3, Analytics4, Analytics5, Analytics6, Analytics7, Analytics8}

/** Driver contract — see /root/repo/SURVEY.md §2/§5 + the builder prompt.
  *
  * Each `queries` entry is one capability from SURVEY.md §2; `oracleSql`
  * holds the DuckDB-equivalent SQL the driver replays over the same parquet
  * tables. Column names/types are aligned on both sides (the comparator
  * sorts columns by name before hashing). Money/measure aggregates go
  * through DECIMAL on both sides so sums are exact and order-independent.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CDC core (SURVEY §2A)
    "cdc_flatten" -> (Cdc.flattenQ _),
    "cdc_dedup_latest" -> (Cdc.dedupLatestQ _),
    "cdc_dedup_configured" -> (Cdc.dedupConfiguredQ _),
    "cdc_dedup_arrival" -> (Cdc.dedupArrivalQ _),
    "cdc_dedup_nullop" -> (Cdc.dedupNullOpQ _),
    "cdc_upsert_snapshot" -> (Cdc.upsertSnapshotQ _),
    "cdc_soft_delete" -> (Cdc.softDeleteQ _),
    "cdc_append" -> (Cdc.appendQ _),
    "cdc_partition_month" -> (Cdc.partitionMonthQ _),
    "cdc_compaction_plan" -> (Cdc.compactionPlanQ _),
    "cdc_watermark_sweep" -> (Cdc.watermarkSweepQ _),
    "cdc_backfill_scope" -> (Cdc.backfillScopeQ _),
    "cdc_lifecycle_audit" -> (Cdc.lifecycleAuditQ _),
    "cdc_op_mix" -> (Cdc.opMixQ _),
    "cdc_key_churn" -> (Cdc.keyChurnQ _),
    "cdc_tiebreak_audit" -> (Cdc.tiebreakAuditQ _),
    "cdc_typemap" -> (Cdc.typeMapQ _),
    "cdc_typemap_complex" -> (TypeMap.typeMapComplexQ _),
    "cdc_schema_evolution" -> (Cdc.schemaEvolutionQ _),
    "cdc_merge_incremental" -> (Cdc.mergeIncrementalQ _),
    "cdc_time_travel" -> (Cdc.timeTravelQ _),
    "cdc_scd2" -> (Cdc.scd2Q _),
    "cdc_scd2_incremental" -> (Cdc.scd2IncrementalQ _),
    "cdc_gap_audit" -> (Cdc.gapAuditQ _),
    "cdc_lateness_profile" -> (Cdc.latenessProfileQ _),
    "cdc_snapshot_profile" -> (Cdc.snapshotProfileQ _),
    "cdc_delete_debt" -> (Cdc.deleteDebtQ _),
    "cdc_column_volatility" -> (Cdc.columnVolatilityQ _),
    "cdc_key_lifespan" -> (Cdc.keyLifespanQ _),
    "cdc_snapshot_diff" -> (Cdc.snapshotDiffQ _),
    "cdc_merge_partitioned" -> (MergePipeline.mergePartitionedQ _),
    // Analytics (SURVEY §2B)
    "q1_pricing" -> (Analytics.q1Pricing _),
    "q3_shipping" -> (Analytics.q3Shipping _),
    "q5_region_volume" -> (Analytics.q5RegionVolume _),
    "q7_volume_shipping" -> ((s, d) => Analytics.q7VolumeShipping(s, d)),
    "q18_large_orders" -> ((s, d) => Analytics.q18LargeOrders(s, d)),
    "q4_priority" -> (Analytics.q4Priority _),
    "q10_returns" -> (Analytics.q10Returns _),
    "q21_sole_blame" -> (Analytics.q21SoleBlame _),
    "q16_supplier_diversity" -> (Analytics.q16SupplierDiversity _),
    "q_trade_balance" -> (Analytics.qTradeBalance _),
    "q2_min_cost_supplier" -> (Analytics2.q2MinCostSupplier _),
    "q6_forecast_revenue" -> (Analytics2.q6ForecastRevenue _),
    "q8_market_share" -> (Analytics2.q8MarketShare _),
    "q9_product_profit" -> (Analytics2.q9ProductProfit _),
    "q11_important_parts" -> (Analytics2.q11ImportantParts _),
    "q12_priority_lines" -> (Analytics2.q12PriorityLines _),
    "q13_order_distribution" -> (Analytics2.q13OrderDistribution _),
    "q15_top_supplier" -> (Analytics2.q15TopSupplier _),
    "q17_small_quantity" -> (Analytics2.q17SmallQuantity _),
    "q19_disjunctive" -> (Analytics2.q19Disjunctive _),
    "q20_excess_suppliers" -> (Analytics2.q20ExcessSuppliers _),
    "q22_dormant_customers" -> (Analytics2.q22DormantCustomers _),
    "q_funnel" -> (Analytics2.qFunnel _),
    "q_rollup_revenue" -> (Analytics2.qRollupRevenue _),
    "q_pivot_revenue" -> (Analytics2.qPivotRevenue _),
    "q_median_order" -> (Analytics2.qMedianOrder _),
    "events_next_within" -> (Analytics2.qNextPurchase _),
    "events_anomaly" -> (Analytics2.eventsAnomaly _),
    "events_transitions" -> (Analytics2.eventsTransitions _),
    "events_paths" -> ((s, d) => Analytics2.eventsPaths(s, d)),
    "events_dau_wau" -> (Analytics2.eventsDauWau _),
    "events_burst" -> (Analytics2.eventsBurst _),
    "q_basket_pairs" -> ((s, d) => Analytics2.qBasketPairs(s, d)),
    "q_basket_rules" -> ((s, d) => Analytics2.qBasketRules(s, d)),
    "q_revenue_concentration" -> (Analytics2.qRevenueConcentration _),
    "events_rfm" -> (Analytics2.eventsRfm _),
    "events_seasonality" -> (Analytics2.eventsSeasonality _),
    "q_running_total" -> (Analytics2.qRunningTotal _),
    "q_rolling_revenue" -> (Analytics2.qRollingRevenue _),
    "q_growth_yoy" -> (Analytics2.qGrowthYoy _),
    "events_new_users" -> (Analytics3.eventsNewUsers _),
    "q_order_gaps" -> (Analytics3.qOrderGaps _),
    "q_discount_effect" -> (Analytics3.qDiscountEffect _),
    "events_attribution" -> (Analytics3.eventsAttribution _),
    "events_forecast_baseline" -> (Analytics3.eventsForecastBaseline _),
    "events_lifecycle" -> (Analytics3.eventsLifecycle _),
    "events_markov_stationary" ->
      ((s, d) => Analytics3.eventsMarkovStationary(s, d)),
    "events_stickiness" -> ((s, d) => Analytics3.eventsStickiness(s, d)),
    "q_customer_survival" -> ((s, d) => Analytics3.qCustomerSurvival(s, d)),
    "events_autocorrelation" ->
      ((s, d) => Analytics3.eventsAutocorrelation(s, d)),
    "events_group_topk" ->
      (graft.operators.GroupTopK.eventsGroupTopKQ _),
    "events_power_users" -> (Analytics4.eventsPowerUsers _),
    "events_session_sweep" -> ((s, d) => Analytics4.eventsSessionSweep(s, d)),
    "events_changepoint" -> ((s, d) => Analytics4.eventsChangepoint(s, d)),
    "events_type_affinity" -> (Analytics4.eventsTypeAffinity _),
    "events_user_entropy" -> (Analytics4.eventsUserEntropy _),
    "events_conversion_lag" -> ((s, d) => Analytics4.eventsConversionLag(s, d)),
    "events_concurrency" -> (Analytics4.eventsConcurrency _),
    "events_mix_drift" -> (Analytics4.eventsMixDrift _),
    "q_seasonal_index" -> (Analytics4.qSeasonalIndex _),
    "events_dispersion" -> (Analytics4.eventsDispersion _),
    "q_customer_migration" -> ((s, d) => Analytics4.qCustomerMigration(s, d)),
    "q_reorder_rate" -> (Analytics4.qReorderRate _),
    "events_periodicity" -> (Analytics5.eventsPeriodicity _),
    "events_streaks" -> (Analytics6.eventsStreaks _),
    "events_error_load_corr" -> (Analytics6.eventsErrorLoadCorr _),
    "q_balance_activity" -> (Analytics6.qBalanceActivity _),
    "events_window_funnel" -> (Analytics6.eventsWindowFunnel _),
    "q_order_width_profile" -> (Analytics6.qOrderWidthProfile _),
    "events_interarrival" -> (Analytics7.eventsInterarrival _),
    "events_load_profile" -> (Analytics7.eventsLoadProfile _),
    "q_retention_halflife" -> (Analytics7.qRetentionHalflife _),
    "events_value_percentiles" -> (Analytics7.eventsValuePercentiles _),
    "events_value_trimmed" -> (Analytics7.eventsValueTrimmed _),
    "q_integrity_audit" -> (Analytics7.qIntegrityAudit _),
    "q_join_cardinality" -> (Analytics7.qJoinCardinality _),
    "q_price_weighted_median" -> (Analytics8.qPriceWeightedMedian _),
    "events_value_winsorized" -> (Analytics8.eventsValueWinsorized _),
    "q_acctbal_gini" -> (Analytics8.qAcctbalGini _),
    "events_user_gini" -> (Analytics8.eventsUserGini _),
    "q_acctbal_lorenz" -> (Analytics8.qAcctbalLorenz _),
    "q_part_skyline" -> (Analytics8.qPartSkyline _),
    "q_ship_delay_profile" -> (Analytics8.qShipDelayProfile _),
    "events_top_movers" -> (Analytics8.eventsTopMovers _),
    "q_revenue_pareto" -> (Analytics8.qRevenuePareto _),
    "events_session_profile" -> (Analytics8.eventsSessionProfile _),
    "q_order_value_deciles" -> (Analytics8.qOrderValueDeciles _),
    "events_ewma_baseline" -> (Analytics8.eventsEwmaBaseline _),
    "events_transition_entropy" -> (Analytics5.eventsTransitionEntropy _),
    "q_benford_audit" -> (Analytics5.qBenfordAudit _),
    "q_price_elasticity" -> (Analytics5.qPriceElasticity _),
    "q_order_value_bands" -> (Analytics5.qOrderValueBands _),
    "q_supplier_hhi" -> (Analytics5.qSupplierHhi _),
    "events_value_outliers" -> (Analytics5.eventsValueOutliers _),
    "q_fulfillment_lag" -> (Analytics3.qFulfillmentLag _),
    "events_bot_profile" -> ((s, d) => Analytics3.eventsBotProfile(s, d)),
    "q_cohort_ltv" -> (Analytics3.qCohortLtv _),
    "events_interval_join" -> (graft.operators.IntervalJoin.eventsIntervalJoinQ _),
    "q_top_customers" -> (Analytics.qTopCustomers _),
    "q14_promo_share" -> (Analytics.q14PromoShare _),
    "q_events_hourly" -> (Analytics.qEventsHourly _),
    "q_retention" -> (Analytics.qRetention _),
    "q_retention_matrix" -> (Analytics.qRetentionMatrix _),
    "q_user_sessions" -> (Analytics.qUserSessions _),
    "events_sessions" -> (graft.streaming.StreamAggs.eventsSessionsQ _),
    "skew_profile" -> (graft.operators.SkewProfile.skewProfileQ _),
    "table_profile" -> (graft.operators.TableProfile.tableProfileQ _),
    "events_asof" -> (graft.operators.AsofJoin.eventsAsofQ _),
    // LLM-data-pipeline: text analysis (SURVEY §2C)
    "text_tokens" -> (TextOps.textTokensQ _),
    "text_quality" -> (TextOps.textQualityQ _),
    "text_gopher" -> (TextOps.textGopherQ _),
    "text_blocklist" -> (TextOps.textBlocklistQ _),
    "filter_agreement" -> (TextOps.filterAgreementQ _),
    "corpus_quality_monitor" -> (graft.streaming.StreamAggs.corpusQualityMonitorQ _),
    "text_langid" -> (TextOps.textLangidQ _),
    "text_lang_confusion" -> (TextOps.textLangConfusionQ _),
    "text_fingerprint" -> (TextOps.textFingerprintQ _),
    "text_scrub" -> (TextOps.textScrubQ _),
    "text_html_strip" -> (TextOps.textHtmlStripQ _),
    "text_unicode_audit" -> (TextOps.textUnicodeAuditQ _),
    "text_script_profile" -> (TextOps.textScriptProfileQ _),
    "text_compressibility" -> (TextOps.textCompressibilityQ _),
    "text_decontaminate" -> (TextOps.textDecontaminateQ _),
    "decontaminate_report" -> (TextOps.decontaminateReportQ _),
    "decontaminate_sweep" -> (TextOps.decontaminateSweepQ _),
    "dsir_score" -> (TextOps.dsirScoreQ _),
    "text_repetition" -> (TextOps.textRepetitionQ _),
    "corpus_sample" -> (TextOps.corpusSampleQ _),
    "corpus_pack" -> (TextOps.corpusPackQ _),
    "corpus_budget_select" -> (TextOps.corpusBudgetSelectQ _),
    "corpus_budget_mix" -> (TextOps.corpusBudgetMixQ _),
    "corpus_interleave" -> (TextOps.corpusInterleaveQ _),
    "corpus_pack_bins" -> (TextOps.corpusPackBinsQ _),
    "text_rarity" -> (TextOps.textRarityQ _),
    "vocab_coverage" -> (TextOps.vocabCoverageQ _),
    "vocab_growth" -> (TextOps.vocabGrowthQ _),
    "vocab_overlap" -> (TextOps.vocabOverlapQ _),
    "text_numeric_density" -> (TextProfile.textNumericDensityQ _),
    "vocab_goodturing" -> (TextProfile.vocabGoodTuringQ _),
    "text_word_length_profile" -> (TextProfile.textWordLengthProfileQ _),
    "text_case_profile" -> (TextProfile.textCaseProfileQ _),
    "corpus_prefix_clusters" -> (TextProfile.corpusPrefixClustersQ _),
    "text_sentence_stats" -> (TextProfile.textSentenceStatsQ _),
    "corpus_source_diversity" -> (TextProfile2.corpusSourceDiversityQ _),
    "corpus_quality_budget_curve" -> (TextProfile2.corpusQualityBudgetCurveQ _),
    "text_vocab_gini" -> (TextProfile2.textVocabGiniQ _),
    "text_markup_audit" -> (TextProfile2.textMarkupAuditQ _),
    "corpus_vocab_profile" -> (TextOps.corpusVocabProfileQ _),
    "text_novelty" -> (TextOps.textNoveltyQ _),
    "corpus_quality_pareto" -> (TextOps.corpusQualityParetoQ _),
    "text_ngram_coverage" -> (TextOps.textNgramCoverageQ _),
    "text_tfidf" -> (TextOps.textTfidfQ _),
    "text_entropy" -> (TextOps.textEntropyQ _),
    "text_readability" -> (TextOps.textReadabilityQ _),
    "text_collocations" -> (TextOps.textCollocationsQ _),
    "text_perplexity" -> (TextOps.textPerplexityQ _),
    "corpus_curriculum" -> (TextOps.corpusCurriculumQ _),
    "corpus_curriculum_assign" -> (TextOps.corpusCurriculumAssignQ _),
    "text_perplexity_bigram" -> (TextOps.textPerplexityBigramQ _),
    "text_perplexity_kn" -> (TextOps.textPerplexityKnQ _),
    "corpus_split" -> (TextOps.corpusSplitQ _),
    "corpus_mix_report" -> (TextOps.corpusMixReportQ _),
    "corpus_mix_kl" -> (TextOps.corpusMixKlQ _),
    "corpus_report" -> (TextOps.corpusReportQ _),
    "text_ngram_topk" -> (TextOps.textNgramTopKQ _),
    "text_zipf" -> (TextOps.textZipfQ _),
    "text_burstiness" -> (TextOps.textBurstinessQ _),
    "text_lexical_diversity" -> (TextOps.textLexicalDiversityQ _),
    "text_predictability" -> (TextOps.textPredictabilityQ _),
    "corpus_length_profile" -> (TextOps.corpusLengthProfileQ _),
    "text_keyword_rake" -> (TextOps.textKeywordRakeQ _),
    "corpus_epoch_plan" -> (TextOps.corpusEpochPlanQ _),
    "corpus_bpe_pairs" -> (TextOps.corpusBpePairsQ _),
    "bpe_train" -> (TextOps.bpeTrainQ _),
    "bpe_encode" -> (TextOps.bpeEncodeQ _),
    "bpe_fertility" -> (TextOps.bpeFertilityQ _),
    "corpus_chunk" -> (TextOps.corpusChunkQ _),
    "quality_classifier" -> (graft.llm.Classifier.qualityClassifierQ _),
    "quality_calibration" -> (graft.llm.Classifier.qualityCalibrationQ _),
    "corpus_sample_quality" -> (graft.llm.Classifier.corpusSampleQualityQ _),
    "corpus_refine" -> (TextOps.corpusRefineQ _),
    "corpus_refine_learned" -> (TextOps.corpusRefineLearnedQ _),
    "corpus_diff" -> (TextOps.corpusDiffQ _),
    "corpus_diff_report" -> (TextOps.corpusDiffReportQ _),
    "corpus_rebalance" -> (TextOps.corpusRebalanceQ _),
    "corpus_temperature_sample" -> (TextOps.corpusTemperatureSampleQ _),
    "corpus_sample_fixed" -> (TextOps.corpusSampleFixedQ _),
    "corpus_weighted_sample" -> (TextOps.corpusWeightedSampleQ _),
    "corpus_weighted_sample_stratified" ->
      (TextOps.corpusWeightedSampleStratifiedQ _),
    "corpus_sample_stratified" -> (TextOps.corpusSampleStratifiedQ _),
    "corpus_shards" -> (graft.llm.Export.corpusShardsQ _),
    "corpus_split_shards" -> (graft.llm.Export.corpusSplitShardsQ _),
    // LLM-data-pipeline: dedup family (SURVEY §2C)
    "dedup_exact" -> (Dedup.dedupExactQ _),
    "dedup_fuzzy" -> (Dedup.dedupFuzzyQ _),
    "dedup_ngram_jaccard" -> (Dedup.dedupNgramJaccardQ _),
    "dedup_threshold_sweep" -> (Dedup.dedupThresholdSweepQ _),
    "dedup_edit_verify" -> (Dedup.dedupEditVerifyQ _),
    "dedup_cross_source" -> (Dedup.dedupCrossSourceQ _),
    "dedup_quality_impact" -> (Dedup.dedupQualityImpactQ _),
    "dedup_pair_budget" -> (Dedup.dedupPairBudgetQ _),
    "dedup_containment" -> (Dedup.dedupContainmentQ _),
    "text_similar_topk" -> (Dedup.textSimilarTopkQ _),
    "link_jaccard" -> (Dedup.linkJaccardQ _),
    "dedup_minhash" -> (Dedup.dedupMinhashQ _),
    "dedup_eval" -> (Dedup.dedupEvalQ _),
    "minhash_tuning_report" -> (Dedup.minhashTuningReportQ _),
    "dedup_simhash" -> (Dedup.dedupSimhashQ _),
    "dedup_corpus" -> (Dedup.dedupCorpusQ _),
    "corpus_families" -> (Dedup.corpusFamiliesQ _),
    "corpus_family_purity" -> (Dedup.corpusFamilyPurityQ _),
    "dedup_incremental" -> (Dedup.dedupIncrementalQ _),
    "dedup_incremental_bloom" -> (Dedup.dedupIncrementalBloomQ _),
    "dedup_incremental_minhash" -> (Dedup.dedupIncrementalMinhashQ _),
    "dedup_incremental_simhash" -> (Dedup.dedupIncrementalSimhashQ _),
    "dedup_spans" -> (SpanDedup.dedupChunksQ _),
    "dedup_substrings" -> (SpanDedup.dedupSubstringsQ _),
    "dedup_spans_incremental" -> (SpanDedup.dedupChunksIncrementalQ _),
    "text_boilerplate" -> (SpanDedup.removeBoilerplateQ _),
    "sketch_distinct" -> (Sketches.sketchDistinctQ _),
    "sketch_events_users" -> (Sketches.sketchEventsUsersQ _),
    "sketch_quantiles" -> (Sketches.sketchQuantilesQ _),
    "sketch_topk" -> (Sketches.sketchTopkQ _),
    "sketch_overlap" -> (Sketches.sketchOverlapQ _),
    // LLM-data-pipeline: similarity search (SURVEY §2C)
    "ann_topk" -> (Ann.annTopKQ _),
    "ann_filtered_topk" -> (Ann.annFilteredTopKQ _),
    "ann_mmr_topk" -> (Ann.annMmrTopKQ _),
    "ann_range" -> (Ann.annRangeQ _),
    "embed_decontaminate" -> (Ann.embedDecontaminateQ _),
    "dedup_embed_consistency" -> (Ann.dedupEmbedConsistencyQ _),
    "ann_lsh_topk" -> (Ann.annLshTopKQ _),
    "ann_recall_report" -> (Ann.annRecallReportQ _),
    "knn_graph" -> (Ann.knnGraphQ _),
    "knn_kcore" -> (Ann.knnKcoreQ _),
    "knn_components" -> (Ann.knnComponentsQ _),
    "knn_kcore_lsh" -> (Ann.knnKcoreLshQ _),
    "knn_components_lsh" -> (Ann.knnComponentsLshQ _),
    "knn_components_fast" -> (Ann.knnComponentsFastQ _),
    "knn_edge_jaccard" -> (Ann.knnEdgeJaccardQ _),
    "knn_edge_jaccard_lsh" -> (Ann.knnEdgeJaccardLshQ _),
    "knn_snn_cluster" -> (Ann.knnSnnClusterQ _),
    "knn_snn_cluster_fast" -> (Ann.knnSnnClusterFastQ _),
    "embed_jl_distortion" -> (Ann.embedJlDistortionQ _),
    "embed_distance_profile" -> (Ann.embedDistanceProfileQ _),
    "lsh_bucket_profile" -> (Ann.lshBucketProfileQ _),
    "knn_graph_lsh" -> (Ann.knnGraphLshQ _),
    "knn_cluster" -> (Ann.knnClusterQ _),
    "knn_triangles" -> (Ann.knnTrianglesQ _),
    "knn_assortativity" -> (Ann.knnAssortativityQ _),
    "knn_modularity" -> (Ann.knnModularityQ _),
    "knn_coreset" -> (Ann.knnCoresetQ _),
    "knn_hubness" -> (Ann.knnHubnessQ _),
    "knn_reciprocity" -> (Ann.knnReciprocityQ _),
    "embed_intrinsic_dim" -> (Ann.embedIntrinsicDimQ _),
    "knn_confusion" -> (Ann.knnConfusionQ _),
    "knn_quality_score" -> (Ann.knnQualityScoreQ _),
    "knn_label_prop" -> (Ann.knnLabelPropQ _),
    "knn_pagerank" -> (Ann.knnPagerankQ _),
    "embed_centroid_classify" -> (Ann.embedCentroidClassifyQ _),
    "ann_ivf_topk" -> (Ann.annIvfTopKQ _),
    "ann_ivf_balance" -> (Ann.ivfBalanceQ _),
    "ivf_tuning_report" -> (Ann.ivfTuningReportQ _),
    "ann_pq_topk" -> (Ann.annPqTopKQ _),
    "ann_ivfpq_topk" -> (Ann.annIvfPqTopKQ _),
    "ann_ivfpq_index" -> (Ann.annIvfPqIndexQ _),
    "embed_project" -> (Ann.embedProjectQ _),
    "embed_whiten" -> (Ann.embedWhitenQ _),
    "embed_norm_profile" -> (Ann.embedNormProfileQ _),
    "embed_dim_stats" -> (Ann.embedDimStatsQ _),
    "embed_class_margin" -> (Ann.embedClassMarginQ _),
    "embed_anova" -> (Ann.embedAnovaQ _),
    "embed_sq_recall" -> (Ann.embedSqRecallQ _),
    "ann_pq_recall" -> (Ann.annPqRecallQ _),
    "ann_ivf_recall" -> (Ann.annIvfRecallQ _),
    "ann_ivfpq_recall" -> (Ann.annIvfPqRecallQ _),
    "ann_index_recall" -> (Ann.annIndexRecallQ _),
    "embed_quantize" -> (Ann.embedQuantizeQ _),
    "embed_binary_topk" -> (Ann.embedBinaryTopKQ _),
    "corpus_topic_terms" -> (Ann.corpusTopicTermsQ _),
    "embed_pca" -> (Ann.embedPcaQ _),
    "embed_spectrum" -> (Ann.embedSpectrumQ _),
    "embed_centroid_shift" -> (Ann.embedCentroidShiftQ _),
    "embed_truncation_eval" -> (Ann.embedTruncationEvalQ _),
    "ann_rrf_fusion" -> (Ann.annRrfFusionQ _),
    "embed_outliers" -> (Ann.embedOutliersQ _),
    "dedup_embed" -> (Ann.dedupEmbedQ _),
    "embed_threshold_sweep" -> (Ann.embedThresholdSweepQ _),
    "embed_silhouette" -> (Ann.embedSilhouetteQ _),
    "ivf_elbow_report" -> (Ann.ivfElbowReportQ _),
    "embed_pq_distortion" -> (Ann.embedPqDistortionQ _),
    "dedup_semantic" -> (Ann.dedupSemanticQ _),
    "dedup_semantic_incremental" -> (Ann.dedupSemanticIncrementalQ _),
    "dedup_embed_incremental" -> (Ann.dedupEmbedIncrementalQ _),
    // LLM-data-pipeline: multimodal column plumbing (SURVEY §2C)
    "multimodal" -> (Multimodal.multimodalQ _),
    "media_resize" -> (Multimodal.mediaResizeQ _),
    "media_phash" -> (Multimodal.mediaPhashQ _),
    "media_phash_incremental" -> (Multimodal.mediaPhashIncrementalQ _),
    "media_audio" -> (Audio.mediaAudioQ _),
    "media_resample" -> (Audio.mediaResampleQ _),
    "media_video" -> (Video.mediaVideoQ _),
    "media_frames" -> (Video.mediaFramesQ _),
    "media_report" -> (Video.mediaReportQ _)
  )

  /** Shared k-NN CTE chain (norms → all-pairs dots → cosine → top-5
    * ranks), the base of the knn_graph / knn_cluster / knn_hubness
    * oracles. Ends with the `nn` CTE: (vec_id, rank, nbr_id). */
  private val knnNnSql: String =
    """norms AS (
      |  SELECT vec_id,
      |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))) AS nrm
      |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
      |  GROUP BY vec_id),
      |dots AS (
      |  SELECT q.vec_id AS vec_id, c.vec_id AS nbr_id,
      |    sum(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)) AS dt
      |  FROM embeddings q, embeddings c,
      |    unnest(generate_series(1, len(q.embedding))) AS g(i)
      |  WHERE c.vec_id <> q.vec_id GROUP BY 1, 2),
      |s AS (
      |  SELECT d.vec_id, d.nbr_id, dt / (nq.nrm * nc.nrm) AS sim
      |  FROM dots d
      |  JOIN norms nq ON d.vec_id = nq.vec_id
      |  JOIN norms nc ON d.nbr_id = nc.vec_id),
      |nn AS (
      |  SELECT vec_id, rank, nbr_id FROM (
      |    SELECT vec_id, nbr_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id) AS rank
      |    FROM s)
      |  WHERE rank <= 5)""".stripMargin

  /** DuckDB-flavored flatten of the `events` changelog, shared by the CDC
    * oracles. Matches graft.cdc.Cdc.flatten exactly. */
  private val flattenSql: String =
    """SELECT event_id, user_id, event_type, value, ts,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
      |  CASE event_type WHEN 'signup' THEN 'c' WHEN 'view' THEN 'r'
      |       WHEN 'error' THEN 'd' ELSE 'u' END AS __op,
      |  epoch_ms(ts) AS __ts_ms,
      |  ts AS __source_ts_ms,
      |  event_type = 'error' AS __deleted
      |FROM events""".stripMargin

  private val opPrioSql =
    "CASE __op WHEN 'c' THEN 1 WHEN 'r' THEN 2 WHEN 'u' THEN 3 WHEN 'd' THEN 4 ELSE -1 END"

  private val dedupLatestSql: String =
    s"""SELECT event_id, user_id, event_type, value, ts, prop_k, __op, __ts_ms,
       |  __source_ts_ms, __deleted
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY user_id
       |    ORDER BY __source_ts_ms DESC, $opPrioSql DESC, event_id DESC) AS rn
       |  FROM ($flattenSql) flat
       |) t WHERE rn = 1""".stripMargin

  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  // --- LSH oracle machinery (r11) -------------------------------------
  // The random-hyperplane coefficients are SEEDED literals
  // (Ann.hyperplanes), so the whole LSH candidate structure is
  // SQL-expressible: the oracle inlines the 32×64 plane matrix and
  // recomputes sign buckets with list_dot_product, whose left-to-right
  // fold matches the native VecDot/HyperplaneBuckets loops — verified
  // bit-identical on all 4000 bucket ints and 190 raw cosines at
  // sf0.01 before these oracles were wired in. Bucket assembly mirrors
  // HyperplaneBuckets: band t's bucket int is MSB-first over its 4
  // sign bits, sign strictly positive.
  private def lshCte(numBands: Int, bitsPerBand: Int): String = {
    val planes = graft.llm.Ann.hyperplanes(numBands * bitsPerBand)
    val rows = planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.mkString(",")}]::DOUBLE[])"
    }.mkString(",\n    ")
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
       |planes(pid, plane) AS (VALUES
       |    $rows),
       |bits AS (
       |  SELECT vec_id, pid // $bitsPerBand AS tbl, pid % $bitsPerBand AS b,
       |    CASE WHEN list_dot_product(v, plane) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM v, planes),
       |buckets AS (
       |  SELECT vec_id, tbl,
       |    sum(bit * (1 << (${bitsPerBand - 1} - b))) AS bucket
       |  FROM bits GROUP BY 1, 2)""".stripMargin
  }

  private lazy val lshCteSql: String =
    lshCte(graft.llm.Ann.NumBands, graft.llm.Ann.BitsPerBand)

  // --- JL distortion CTEs (r13) ---------------------------------------
  // Same seeded-literal discipline as lshCte: the projection rows are
  // Ann.hyperplanes(32) inlined, list_dot_product's left fold matches
  // the codegen'd VecDot bit-for-bit (verified for lshCte in r11).
  private lazy val jlCteSql: String = {
    val planes = graft.llm.Ann.hyperplanes(32)
    val rows = planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.mkString(",")}]::DOUBLE[])"
    }.mkString(",\n    ")
    s"""jv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE vec_id < 50),
       |jplanes(pid, plane) AS (VALUES
       |    $rows),
       |jy AS (SELECT vec_id, pid, list_dot_product(v, plane) AS y
       |  FROM jv, jplanes)""".stripMargin
  }

  // --- table_profile oracle (r13; single-sourced r15): one UNION ALL
  // stanza per lineitem column, GENERATED from
  // TableProfile.LineitemProfileColumns (pinned against the real
  // parquet schema by TableProfileSpec) so the oracle cannot drift
  // from the schema-driven operator; timestamps ride min_num/max_num
  // as epoch MICROSECONDS (NULL typed timestamps don't survive every
  // renderer — pd.NaT)
  private val tableProfileOracle: String = {
    def stanza(c: String, dt: String, mnNum: String, mxNum: String,
               mnStr: String, mxStr: String): String =
      s"""SELECT '$c' AS column_name, '$dt' AS data_type,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  $mnNum AS min_num, $mxNum AS max_num,
         |  $mnStr AS min_str, $mxStr AS max_str
         |FROM lineitem""".stripMargin
    def num(c: String, dt: String) = stanza(c, dt,
      s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)",
      "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
    def str(c: String) = stanza(c, "string",
      "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
      s"min($c)", s"max($c)")
    def ts(c: String) = stanza(c, "timestamp",
      s"CAST(epoch_us(min($c)) AS DOUBLE)",
      s"CAST(epoch_us(max($c)) AS DOUBLE)",
      "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
    graft.operators.TableProfile.LineitemProfileColumns.map {
      case (c, "string") => str(c)
      case (c, "timestamp") => ts(c)
      case (c, dt) => num(c, dt)
    }.mkString("\nUNION ALL\n")
  }

  // --- media dHash replay (r15, verdict task 5) ---------------------
  // The image pipeline is deterministic integer arithmetic end to end:
  // withMediaColumn renders each payload's raster from the doc's UTF-8
  // TEXT BYTES (twin pairs from a seeded ramp), the Netpbm
  // encode/decode roundtrip is the identity on the raster, dhash64 is
  // integer BT.601 grayscale + floor-index nearest-neighbor 9×8
  // resample + 64 neighbor comparisons. So the per-doc dHash — not
  // just its consumers — replays in DuckDB SQL: text bytes come from
  // hex(encode(text)) two-nibble lookups, and every arithmetic step
  // below mirrors Multimodal.withMediaColumn/dhash64 line by line
  // (the xxhashCtes precedent: the synthesis formula is part of the
  // contract — changing it breaks this oracle LOUDLY).
  /** Value 0..255 of byte `k` of the doc's UTF-8 text — two-nibble
    * lookup into `hx` = hex(encode(text)); caller guarantees L > 0. */
  private def mediaTextByte(k: String): String = {
    val hexd = "0123456789ABCDEF"
    s"""(16*strpos('$hexd', substr(hx, 2*(($k)%L)+1, 1))
       | + strpos('$hexd', substr(hx, 2*(($k)%L)+2, 1)) - 17)""".stripMargin
  }

  /** Byte i of the synthetic IMAGE raster (Multimodal.withMediaColumn
    * verbatim), over columns doc_id/sid/twin/shft/hx/L. */
  private def mediaRasterByte(i: String): String =
    s"""CASE WHEN twin THEN least((($i)*31 + sid) & 255, 254) + shft
       | WHEN L = 0 THEN (($i)*31 + doc_id) & 255
       | ELSE (${mediaTextByte(i)} + ($i)//L) % 256 END""".stripMargin

  /** Shared image-synthesis base: per-doc twin resolution, text hex,
    * and the store-twin-derived dimensions/format of
    * Multimodal.withMediaColumn. */
  private lazy val mediaBaseCtes: String =
    """mm AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 50 IN (5,9) THEN doc_id - doc_id % 50 + 5
      |         ELSE doc_id END AS sid,
      |    doc_id % 50 IN (5,9) AS twin,
      |    CASE WHEN doc_id % 50 = 9 THEN 1 ELSE 0 END AS shft,
      |    hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS L
      |  FROM documents),
      |md AS (SELECT *, sid % 64 + 16 AS w, sid % 48 + 16 AS h,
      |       sid % 2 = 0 AS rgb FROM mm)""".stripMargin

  private lazy val mediaSigCtes: String = {
    def bv(i: String): String = mediaRasterByte(i)
    val gray =
      s"""CASE WHEN rgb THEN (299*(${bv("3*p")}) + 587*(${bv("3*p+1")})
         |  + 114*(${bv("3*p+2")}))//1000 ELSE (${bv("p")}) END""".stripMargin
    s"""$mediaBaseCtes,
       |mg AS (
       |  SELECT doc_id, y, x, $gray AS g
       |  FROM (
       |    SELECT doc_id, sid, twin, shft, hx, L, rgb, yx.y, yx.x,
       |      ((yx.y*h)//8)*w + ((yx.x*w)//9) AS p
       |    FROM md, (SELECT a.range AS y, b.range AS x
       |              FROM range(8) a, range(9) b) yx)),
       |mbits AS (
       |  SELECT a.doc_id, CAST(a.y*8 + a.x AS INT) AS bit
       |  FROM mg a JOIN mg b ON a.doc_id = b.doc_id AND a.y = b.y
       |    AND b.x = a.x + 1
       |  WHERE a.x < 8 AND a.g < b.g),
       |msig AS (
       |  SELECT m.doc_id,
       |    coalesce(bit_or(CASE WHEN bit = 63
       |                    THEN (-9223372036854775808)::BIGINT
       |                    ELSE 1::BIGINT << bit END), 0)::BIGINT AS sig
       |  FROM md m LEFT JOIN mbits USING (doc_id) GROUP BY m.doc_id),
       |mblk AS (
       |  SELECT doc_id, sig, t.range AS blk,
       |    (sig >> (t.range::INT * 16)) & 65535 AS v
       |  FROM msig, range(4) t),
       |mpairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    bit_count(xor(x.sig, y.sig)) AS hamming
       |  FROM mblk x JOIN mblk y ON x.blk = y.blk AND x.v = y.v
       |    AND x.doc_id < y.doc_id
       |  WHERE bit_count(xor(x.sig, y.sig)) <= 3)""".stripMargin
  }

  /** multimodal oracle (r16, verdict task 1): the feature stage's
    * integer BT.601 accumulators replayed over the FULL synthesized
    * raster — per-pixel luminance ×1000 through [[mediaRasterByte]]
    * (`299r+587g+114b` RGB / `1000·gray`, the dhash64 integer-gray
    * convention), summed per doc and per 4×4 average-pool cell as
    * exact integers, then the SAME single divisions the Scala side
    * performs (`num::DOUBLE / (1000.0·count)` — numerator < 2⁵³,
    * quotient correctly rounded, so the doubles are bit-identical).
    * This is the flip that retires multimodal from the rows-only pin:
    * the old double-folded mean was accumulation-order-dependent; the
    * integer numerator is not. */
  private lazy val multimodalOracle: String = {
    def bv(i: String): String = mediaRasterByte(i)
    val lum =
      s"""CASE WHEN rgb THEN 299*(${bv("3*p")}) + 587*(${bv("3*p+1")})
         |  + 114*(${bv("3*p+2")}) ELSE 1000*(${bv("p")}) END""".stripMargin
    val gcols = (0 until 16).map(i =>
      s"max(CASE WHEN cell = $i THEN gv END) AS g$i").mkString(",\n  ")
    s"""WITH $mediaBaseCtes,
       |px AS (
       |  SELECT doc_id, cell, $lum AS lum
       |  FROM (
       |    SELECT doc_id, sid, twin, shft, hx, L, rgb,
       |      ((yx.y*4)//h)*4 + (yx.x*4)//w AS cell,
       |      yx.y*w + yx.x AS p
       |    FROM md, (SELECT a.range AS y, b.range AS x
       |              FROM range(63) a, range(79) b) yx
       |    WHERE yx.y < h AND yx.x < w)),
       |cagg AS (
       |  SELECT doc_id, cell, CAST(sum(lum) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM px GROUP BY 1, 2),
       |g AS (
       |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS num, $gcols
       |  FROM (SELECT doc_id, cell, n, c,
       |        CAST(n AS DOUBLE) / (1000.0 * c) AS gv FROM cagg)
       |  GROUP BY doc_id)
       |SELECT m.doc_id,
       |  CASE WHEN rgb THEN 'ppm' ELSE 'pgm' END AS format,
       |  length('P6' || chr(10) || w || ' ' || h || chr(10) || '255'
       |    || chr(10)) + w * h * (CASE WHEN rgb THEN 3 ELSE 1 END)
       |    AS n_bytes,
       |  CAST(g.num AS DOUBLE) / (1000.0 * w * h) AS mean_byte,
       |  ${(0 until 16).map(i => s"g.g$i").mkString(", ")}
       |FROM md m JOIN g USING (doc_id)""".stripMargin
  }

  // media health rollup: the report needs only per-doc payload LENGTHS,
  // all closed-form in the synthesis parameters (Netpbm/Wav/Y4m header
  // grammar + raster/sample/frame sizes) — Multimodal.withMediaColumn,
  // Audio.withAudioColumn, Video.withVideoColumn respectively
  // Audio.withAudioColumn / Video.withVideoColumn synthesis
  // parameters — SINGLE SOURCE for every oracle that restates them
  // (report, transform, feature), the TableProfile.
  // LineitemProfileColumns anti-drift rule: a synthesis change breaks
  // ONE Scala constant, not three hand-written SQL copies.
  private val audioChSql = "CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END"
  private val audioFrSql = "doc_id % 800 + 100"
  private val videoDimsSql =
    "(doc_id % 16) * 2 + 16 AS w, (doc_id % 12) * 2 + 16 AS hh, " +
      "doc_id % 2 = 1 AS mono, doc_id % 8 + 3 AS nf"
  // frame bytes + total payload length of the synthetic Y4M stream
  private val videoFbSql =
    "CASE WHEN mono THEN w * hh ELSE w * hh + 2 * ((w // 2) * (hh // 2)) END"
  // single-line ON PURPOSE: this interpolates into stripMargin
  // templates, where a continuation line starting with `||` would
  // lose a pipe to the outer stripMargin
  private val videoBytesSql =
    "length('YUV4MPEG2 W' || w || ' H' || hh || ' F25:1 Ip A1:1 ' || " +
      "(CASE WHEN mono THEN 'Cmono' ELSE 'C420' END)) + 1 " +
      s"+ nf * (6 + $videoFbSql)"

  private lazy val mediaReportOracle: String =
    s"""WITH $mediaBaseCtes,
      |img AS (
      |  SELECT 'image' AS modality,
      |    CASE WHEN rgb THEN 'ppm' ELSE 'pgm' END AS format,
      |    length('P6' || chr(10) || w || ' '
      |      || h || chr(10) || '255' || chr(10))
      |    + w * h * (CASE WHEN rgb THEN 3 ELSE 1 END) AS n_bytes
      |  FROM md),
      |aud AS (
      |  SELECT 'audio' AS modality, 'wav' AS format,
      |    44 + ($audioFrSql) * ($audioChSql) * 2 AS n_bytes
      |  FROM documents),
      |vid AS (
      |  SELECT 'video' AS modality,
      |    CASE WHEN mono THEN 'y4m_mono' ELSE 'y4m' END AS format,
      |    $videoBytesSql AS n_bytes
      |  FROM (SELECT doc_id, $videoDimsSql FROM documents)),
      |cells AS (
      |  SELECT modality, format, CAST(count(*) AS BIGINT) AS n_files,
      |    CAST(sum(n_bytes) AS BIGINT) AS total_bytes
      |  FROM (SELECT * FROM img UNION ALL SELECT * FROM aud
      |        UNION ALL SELECT * FROM vid)
      |  GROUP BY 1, 2)
      |SELECT modality, format, n_files, total_bytes,
      |  round(CAST(sum(CASE WHEN format <> 'invalid' THEN n_files
      |      ELSE 0 END) OVER (PARTITION BY modality) AS DOUBLE)
      |    / sum(n_files) OVER (PARTITION BY modality), 4) AS decode_rate
      |FROM cells""".stripMargin

  // little-endian integer → uppercase hex snippets, for binary header
  // reconstruction inside the payload oracles
  private def u16le(x: String): String =
    s"printf('%02X%02X', ($x)%256, (($x)//256)%256)"
  private def u32le(x: String): String =
    s"printf('%02X%02X%02X%02X', ($x)%256, (($x)//256)%256, " +
      s"(($x)//65536)%256, (($x)//16777216)%256)"

  /** media_resize oracle (r15): reconstruct the 16×16 nearest-neighbor
    * resized Netpbm payload BYTE-FOR-BYTE in SQL — header grammar +
    * resampled raster through [[mediaRasterByte]] (resize reads source
    * pixel (y·h/16, x·w/16), Netpbm.resize's floor mapping) — then
    * hash it with the XXH64 replay ([[xxhashHexCtes]]). The Spark
    * entry fingerprints with xxhash64 for exactly this reason. */
  private lazy val mediaResizeOracle: String = {
    val si = "((g.y*h//16)*w + (g.x*w//16))*ch + g.c"
    s"""WITH RECURSIVE $mediaBaseCtes,
       |rpix AS (
       |  SELECT doc_id, (g.y*16 + g.x)*ch + g.c AS opos,
       |    ${mediaRasterByte(si)} AS b
       |  FROM (SELECT *, CASE WHEN rgb THEN 3 ELSE 1 END AS ch FROM md) m,
       |    (SELECT a.range AS y, bb.range AS x, cc.range AS c
       |     FROM range(16) a, range(16) bb, range(3) cc) g
       |  WHERE g.c < ch),
       |rhex AS (SELECT doc_id,
       |    string_agg(printf('%02X', b), '' ORDER BY opos) AS rhx
       |  FROM rpix GROUP BY doc_id),
       |rsrc AS (
       |  SELECT m.doc_id AS key,
       |    hex(encode((CASE WHEN rgb THEN 'P6' ELSE 'P5' END) || chr(10)
       |      || '16 16' || chr(10) || '255' || chr(10))) || r.rhx AS hx,
       |    13 + 256*(CASE WHEN rgb THEN 3 ELSE 1 END) AS n
       |  FROM md m JOIN rhex r USING (doc_id)),
       |${xxhashHexCtes("rsrc", "rz")}
       |SELECT m.doc_id,
       |  CASE WHEN rgb THEN 'ppm' ELSE 'pgm' END AS format,
       |  16 AS width, 16 AS height,
       |  13 + 256*(CASE WHEN rgb THEN 3 ELSE 1 END) AS n_bytes,
       |  x.h AS media_fp
       |FROM md m JOIN rzxxh x ON m.doc_id = x.key""".stripMargin
  }

  /** media_resample oracle (r15): the 2× decimated WAV payload —
    * RIFF/fmt/data header fields little-endian ([[u16le]]/[[u32le]]),
    * kept samples (every 2nd frame, all channels) re-synthesized from
    * Audio.withAudioColumn's integer carrier formula, two's-complement
    * shorts little-endian — hashed with the XXH64 replay. */
  private lazy val mediaResampleOracle: String = {
    // original sample index i = 2k·ch + c; byte-driven carrier value
    val i = "((2*k.range)*ch + c.range)"
    val b = s"CASE WHEN L = 0 THEN ($i*31 + doc_id) & 255 " +
      s"ELSE ${mediaTextByte(i)} END"
    s"""WITH RECURSIVE asrc0 AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS L,
       |    $audioChSql AS ch,
       |    $audioFrSql AS fr
       |  FROM documents),
       |apix AS (
       |  SELECT doc_id, k.range*ch + c.range AS opos,
       |    ((((($b) - 128) * 200
       |      + ((($i*37 + doc_id) % 64) - 32) * 50) % 65536)
       |      + 65536) % 65536 AS u
       |  FROM asrc0, range(450) k, range(2) c
       |  WHERE k.range < (fr + 1) // 2 AND c.range < ch),
       |ahex AS (SELECT doc_id,
       |    string_agg(printf('%02X%02X', u % 256, u // 256), ''
       |      ORDER BY opos) AS shx
       |  FROM apix GROUP BY doc_id),
       |asrc AS (
       |  SELECT a0.doc_id AS key,
       |    hex(encode('RIFF')) || ${u32le("36 + dl")}
       |    || hex(encode('WAVEfmt ')) || ${u32le("16")}
       |    || ${u16le("1")} || ${u16le("ch")} || ${u32le("4000")}
       |    || ${u32le("4000*ch*2")} || ${u16le("ch*2")} || ${u16le("16")}
       |    || hex(encode('data')) || ${u32le("dl")} || a1.shx AS hx,
       |    44 + dl AS n
       |  FROM (SELECT *, ((fr + 1) // 2) * ch * 2 AS dl FROM asrc0) a0
       |    JOIN ahex a1 USING (doc_id)),
       |${xxhashHexCtes("asrc", "aw")}
       |SELECT a0.doc_id, 4000 AS sample_rate,
       |  (fr + 1) // 2 AS n_frames,
       |  44 + ((fr + 1) // 2) * ch * 2 AS n_bytes, x.h AS media_fp
       |FROM asrc0 a0 JOIN awxxh x ON a0.doc_id = x.key""".stripMargin
  }

  /** media_frames oracle (r15): the 2× frame-sampled Y4M payload —
    * stream header grammar, per-kept-frame FRAME marker + raster
    * re-synthesized from Video.withVideoColumn's per-frame drift
    * formula (f is the ORIGINAL frame index), flat 128 chroma — hashed
    * with the XXH64 replay. */
  private lazy val mediaFramesOracle: String = {
    val b = s"CASE WHEN L = 0 THEN (j.range*31 + doc_id) & 255 " +
      s"ELSE ${mediaTextByte("j.range")} END"
    s"""WITH RECURSIVE vsrc0 AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS L,
       |    $videoDimsSql
       |  FROM documents),
       |vdim AS (SELECT *,
       |    $videoFbSql AS fb,
       |    (nf + 1) // 2 AS keptn
       |  FROM vsrc0),
       |vfr AS (
       |  SELECT doc_id, k.range AS k, 2 * k.range AS f,
       |    string_agg(
       |      printf('%02X', CASE WHEN j.range < w * hh
       |        THEN (($b) + (2*k.range) * 11 + j.range // 64) & 255
       |        ELSE 128 END), '' ORDER BY j.range) AS fhx
       |  FROM vdim, range(5) k, range(2700) j
       |  WHERE k.range < keptn AND j.range < fb
       |  GROUP BY doc_id, k.range),
       |vhex AS (SELECT doc_id,
       |    string_agg(hex(encode('FRAME' || chr(10))) || fhx, ''
       |      ORDER BY k) AS phx
       |  FROM vfr GROUP BY doc_id),
       |vsrc AS (
       |  SELECT v.doc_id AS key,
       |    hex(encode('YUV4MPEG2 W' || w || ' H' || hh
       |      || ' F25:1 Ip A1:1 '
       |      || (CASE WHEN mono THEN 'Cmono' ELSE 'C420' END)
       |      || chr(10))) || h1.phx AS hx,
       |    length('YUV4MPEG2 W' || w || ' H' || hh || ' F25:1 Ip A1:1 '
       |      || (CASE WHEN mono THEN 'Cmono' ELSE 'C420' END)) + 1
       |    + keptn * (6 + fb) AS n
       |  FROM vdim v JOIN vhex h1 USING (doc_id)),
       |${xxhashHexCtes("vsrc", "vw")}
       |SELECT v.doc_id, v.w AS width, v.hh AS height,
       |  v.keptn AS n_frames,
       |  length('YUV4MPEG2 W' || v.w || ' H' || v.hh
       |    || ' F25:1 Ip A1:1 '
       |    || (CASE WHEN v.mono THEN 'Cmono' ELSE 'C420' END)) + 1
       |  + v.keptn * (6 + v.fb) AS n_bytes,
       |  x.h AS media_fp
       |FROM vdim v JOIN vwxxh x ON v.doc_id = x.key""".stripMargin
  }

  /** media_audio oracle (r15): every waveform moment is
    * order-independent EXACT in IEEE double (samples/2¹⁵ are dyadic
    * with ≤16-bit fractions, squares need ≤32 mantissa bits, ≤900
    * sub-1 terms keep partial sums under 2⁴²), so DuckDB's
    * arbitrary-order aggregation reproduces the decode loop
    * bit-for-bit — duration/rms/peak plus the 16 energy-bin columns
    * are a full value oracle with no fingerprint indirection. */
  private lazy val mediaAudioOracle: String = {
    def smp(i: String): String = {
      val b = s"CASE WHEN L = 0 THEN (($i)*31 + doc_id) & 255 " +
        s"ELSE ${mediaTextByte(i)} END"
      s"((($b) - 128) * 200 + (((($i)*37 + doc_id) % 64) - 32) * 50)"
    }
    // RAW doubles (r16, ADVICE r15 #3 — no rounding on either side):
    // mono = ivv/2¹⁶ with ivv = 2v (mono ch) or v0+v1 (stereo), bit-
    // identical to the decode loop's acc/channels (all dyadic); its
    // square is exact (≤32 mantissa bits), the ≤900-term sums are
    // exact (< 2⁴²), and every output below is ONE correctly-rounded
    // division/sqrt of those exact operands — the same IEEE double the
    // JVM loop produces, under ANY accumulation order. The r15
    // exact-integer HALF_UP rounding apparatus (and its documented
    // ~1e-9 tie window) is gone because the rounding it replicated is
    // gone.
    val bin = "(f * 16) // fr"
    val eCols = (0 until 16).map(i =>
      s"""(sum(CASE WHEN $bin = $i THEN (ivv/65536.0)*(ivv/65536.0) END)
         |  / count(CASE WHEN $bin = $i THEN 1 END)) AS e$i""".stripMargin)
      .mkString(",\n")
    s"""WITH aud0 AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS L,
       |    $audioChSql AS ch,
       |    $audioFrSql AS fr
       |  FROM documents),
       |amono AS (
       |  SELECT doc_id, f.range AS f, fr, ch,
       |    CASE WHEN ch = 1 THEN 2 * (${smp("f.range")})
       |         ELSE (${smp("f.range*2")}) + (${smp("f.range*2+1")})
       |    END AS ivv
       |  FROM aud0, range(900) f
       |  WHERE f.range < fr),
       |astat AS (
       |  SELECT doc_id, max(fr) AS fr, max(ch) AS ch,
       |    sum((ivv/65536.0)*(ivv/65536.0)) AS sumsq,
       |    max(abs(ivv)) AS pmax,
       |$eCols
       |  FROM amono GROUP BY doc_id)
       |SELECT doc_id, 'wav' AS format,
       |  44 + fr * ch * 2 AS n_bytes,
       |  fr / 8000.0 AS duration_s,
       |  sqrt(sumsq / fr) AS rms,
       |  pmax / 65536.0 AS peak,
       |  e0, e1, e2, e3, e4, e5, e6, e7,
       |  e8, e9, e10, e11, e12, e13, e14, e15
       |FROM astat""".stripMargin
  }

  /** media_video oracle (r15): luma/motion/grid moments accumulate
    * INTEGER pixel values (< 2⁵³ total), hence order-independent exact
    * — mean/motion/4×4-grid columns replay the frame-sampled decode
    * loop; the previous frame's pixel re-synthesizes in place (same
    * drift formula at f−2), so motion needs no self-join. */
  private lazy val mediaVideoOracle: String = {
    val b = s"CASE WHEN L = 0 THEN (j.range*31 + doc_id) & 255 " +
      s"ELSE ${mediaTextByte("j.range")} END"
    // RAW doubles (r16, ADVICE r15 #3): the luma sums are exact
    // integers, so each mean is ONE correctly-rounded division — the
    // identical IEEE double the JVM loop produces (the r15 integer
    // HALF_UP apparatus replicated a rounding that no longer exists;
    // doc 252's 131.4734375 7th-digit tie is now simply emitted as is)
    val cell = "((p // w) * 4 // hh) * 4 + (p % w) * 4 // w"
    val gCols = (0 until 16).map(i =>
      s"""(CAST(sum(CASE WHEN $cell = $i THEN l END) AS DOUBLE)
         |  / count(CASE WHEN $cell = $i THEN 1 END)) AS g$i""".stripMargin)
      .mkString(",\n")
    s"""WITH vq0 AS (
       |  SELECT *, (nf + 1) // 2 AS keptn FROM (
       |    SELECT doc_id, hex(encode(text)) AS hx,
       |      octet_length(encode(text)) AS L,
       |      $videoDimsSql
       |    FROM documents)),
       |vpx AS (
       |  SELECT doc_id, w, hh, keptn, j.range AS p,
       |    (($b) + (2*k.range) * 11 + j.range // 64) & 255 AS l,
       |    CASE WHEN k.range > 0
       |      THEN (($b) + (2*k.range - 2) * 11 + j.range // 64) & 255
       |    END AS lp
       |  FROM vq0, range(5) k, range(1748) j
       |  WHERE k.range < keptn AND j.range < w * hh),
       |vagg AS (
       |  SELECT doc_id, sum(l) AS lsum, sum(abs(l - lp)) AS msum,
       |$gCols
       |  FROM vpx GROUP BY doc_id)
       |SELECT q.doc_id,
       |  CASE WHEN mono THEN 'y4m_mono' ELSE 'y4m' END AS format,
       |  $videoBytesSql AS n_bytes,
       |  nf AS n_frames, keptn AS n_sampled,
       |  CAST(25.0 AS DOUBLE) AS fps,
       |  CAST(lsum AS DOUBLE) / (keptn * w * hh) AS mean_luma,
       |  CAST(msum AS DOUBLE) / ((keptn - 1) * w * hh) AS motion,
       |  g0, g1, g2, g3, g4, g5, g6, g7,
       |  g8, g9, g10, g11, g12, g13, g14, g15
       |FROM vq0 q JOIN vagg USING (doc_id)""".stripMargin
  }

  // --- LSH-substrate kNN graph + shared graph-consumer bodies (r14) --
  // The LSH pipeline is deterministic end to end (seeded plane
  // literals), so the 100 TB graph substrate is itself oracle-able:
  // `nn` below is knn_graph_lsh's edge construction verbatim (16×3
  // banding — the fixed banding the plane literals require), and the
  // kcore/components recursive bodies are FACTORED fragments shared by
  // the exact- and LSH-substrate entries so the two oracles cannot
  // drift.
  private lazy val lshNnSql: String =
    s"""${lshCte(16, 3)},
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst
       |  FROM buckets x JOIN buckets y
       |    ON x.tbl = y.tbl AND x.bucket = y.bucket
       |      AND x.vec_id <> y.vec_id),
       |sims AS (
       |  SELECT src, dst,
       |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
       |  FROM cand JOIN n a ON src = a.vec_id JOIN n b ON dst = b.vec_id),
       |nn AS MATERIALIZED (
       |  SELECT src AS vec_id, dst AS nbr_id FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst)
       |        AS rank
       |    FROM sims)
       |  WHERE rank <= 5)""".stripMargin

  /** SNN pair-stats CTE chain over an `nn (vec_id, nbr_id)` CTE:
    * mutual edges, wedge-join common neighbors, degree sums — the
    * `mje (a, b, cmn, dd)` frame matching Ann.mutualPairStats,
    * shared by the edge-strength histogram and the SNN clustering
    * bodies. */
  private val snnPairsSql: String =
    """mutual AS MATERIALIZED (
      |  SELECT a.vec_id, a.nbr_id FROM nn a
      |  JOIN nn b ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id),
      |mdeg AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS deg
      |  FROM mutual GROUP BY 1),
      |medges AS (SELECT vec_id AS a, nbr_id AS b FROM mutual
      |  WHERE vec_id < nbr_id),
      |mcmn AS (SELECT x.vec_id AS a, y.vec_id AS b,
      |    CAST(count(*) AS BIGINT) AS cmn
      |  FROM mutual x JOIN mutual y
      |    ON x.nbr_id = y.nbr_id AND x.vec_id < y.vec_id
      |  GROUP BY 1, 2),
      |mje AS (SELECT e.a, e.b, coalesce(c.cmn, 0) AS cmn,
      |    da.deg + db.deg AS dd
      |  FROM medges e
      |  LEFT JOIN mcmn c ON e.a = c.a AND e.b = c.b
      |  JOIN mdeg da ON e.a = da.vec_id
      |  JOIN mdeg db ON e.b = db.vec_id)""".stripMargin

  /** Edge-strength histogram body: open-neighborhood Jaccard
    * floor(10J)-bucketed — matches Ann.knnEdgeJaccard exactly. */
  private val edgeJaccardBodySql: String =
    s"""$snnPairsSql,
      |jb AS (SELECT CAST(floor(10.0 * CAST(cmn AS DOUBLE)
      |    / CAST(dd - cmn AS DOUBLE)) AS BIGINT) AS bucket FROM mje),
      |jt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM jb)
      |SELECT bucket,
      |  round(CAST(bucket AS DOUBLE) / 10.0, 1) AS jaccard_lo,
      |  CAST(count(*) AS BIGINT) AS n_edges,
      |  round(CAST(count(*) AS DOUBLE) / (SELECT n_total FROM jt), 4)
      |    AS share
      |FROM jb GROUP BY 1""".stripMargin

  /** Jarvis–Patrick clustering body: SNN edges clearing the EXACT
    * integer threshold 5·cmn ≥ 1·(dd−cmn) (τ = 0.2), then the
    * fixed-25-iteration min-label propagation of componentsBodySql
    * over survivors + a self-loop per BASE-graph node (losers land as
    * singletons) — matches Ann.knnSnnCluster exactly. */
  private val snnClusterBodySql: String =
    s"""$snnPairsSql,
      |snne AS MATERIALIZED (
      |  SELECT a AS vec_id, b AS nbr_id FROM mje
      |  WHERE cmn * 5 >= (dd - cmn) * 1
      |  UNION ALL
      |  SELECT b AS vec_id, a AS nbr_id FROM mje
      |  WHERE cmn * 5 >= (dd - cmn) * 1),
      |cuni AS MATERIALIZED (SELECT DISTINCT vec_id FROM nn),
      |adjs AS MATERIALIZED (
      |  SELECT vec_id, nbr_id FROM snne
      |  UNION ALL SELECT vec_id, vec_id AS nbr_id FROM cuni),
      |lab AS (
      |  SELECT 0 AS iter, vec_id, CAST(vec_id AS BIGINT) AS c
      |  FROM cuni
      |  UNION ALL
      |  SELECT l.iter + 1, a.vec_id, min(l.c) AS c
      |  FROM adjs a JOIN lab l ON a.nbr_id = l.vec_id
      |  WHERE l.iter < 25
      |  GROUP BY l.iter, a.vec_id),
      |fin AS (SELECT vec_id, c FROM lab WHERE iter = 25),
      |siz AS (SELECT c, CAST(count(*) AS BIGINT) AS component_size
      |  FROM fin GROUP BY 1),
      |tot AS (SELECT CAST(sum(component_size) AS BIGINT) AS n_total
      |  FROM siz)
      |SELECT component_size, CAST(count(*) AS BIGINT) AS n_components,
      |  CAST(component_size * count(*) AS BIGINT) AS n_nodes,
      |  round(CAST(component_size * count(*) AS DOUBLE)
      |    / CAST(n_total AS DOUBLE), 4) AS node_share
      |FROM siz, tot GROUP BY component_size, n_total""".stripMargin

  /** h-index fixed-point coreness body over an `nn (vec_id, nbr_id)`
    * CTE (FIXED 10-iteration schedule, MATERIALIZED adjacency). */
  private val kcoreBodySql: String =
    """adj AS MATERIALIZED (
      |  SELECT a.vec_id, a.nbr_id FROM nn a
      |  JOIN nn b ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id),
      |uni AS MATERIALIZED (SELECT DISTINCT vec_id FROM nn),
      |core AS (
      |  SELECT 0 AS iter, vec_id, CAST(count(*) AS BIGINT) AS c
      |  FROM adj GROUP BY vec_id
      |  UNION ALL
      |  SELECT iter + 1, vec_id,
      |    CAST(max(CASE WHEN nc >= rn THEN rn ELSE 0 END) AS BIGINT)
      |      AS c
      |  FROM (
      |    SELECT a.vec_id, co.iter, co.c AS nc,
      |      row_number() OVER (PARTITION BY a.vec_id
      |        ORDER BY co.c DESC) AS rn
      |    FROM adj a JOIN core co ON a.nbr_id = co.vec_id
      |    WHERE co.iter < 10) t
      |  GROUP BY iter, vec_id),
      |fin AS (
      |  SELECT u.vec_id, coalesce(core.c, 0) AS c
      |  FROM uni u LEFT JOIN core ON u.vec_id = core.vec_id
      |    AND core.iter = 10),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM fin)
      |SELECT c AS coreness, CAST(count(*) AS BIGINT) AS n_nodes,
      |  round(CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE), 4)
      |    AS share
      |FROM fin, tot GROUP BY c, n_total""".stripMargin

  /** min-label-propagation components body over an `nn (vec_id,
    * nbr_id)` CTE (FIXED 25-iteration schedule, self-loop augmented,
    * MATERIALIZED adjacency). */
  private val componentsBodySql: String =
    """madj AS MATERIALIZED (
      |  SELECT a.vec_id, a.nbr_id FROM nn a
      |  JOIN nn b ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id),
      |cuni AS MATERIALIZED (SELECT DISTINCT vec_id FROM nn),
      |adjs AS MATERIALIZED (
      |  SELECT vec_id, nbr_id FROM madj
      |  UNION ALL SELECT vec_id, vec_id AS nbr_id FROM cuni),
      |lab AS (
      |  SELECT 0 AS iter, vec_id, CAST(vec_id AS BIGINT) AS c
      |  FROM cuni
      |  UNION ALL
      |  SELECT l.iter + 1, a.vec_id, min(l.c) AS c
      |  FROM adjs a JOIN lab l ON a.nbr_id = l.vec_id
      |  WHERE l.iter < 25
      |  GROUP BY l.iter, a.vec_id),
      |fin AS (SELECT vec_id, c FROM lab WHERE iter = 25),
      |siz AS (SELECT c, CAST(count(*) AS BIGINT) AS component_size
      |  FROM fin GROUP BY 1),
      |tot AS (SELECT CAST(sum(component_size) AS BIGINT) AS n_total
      |  FROM siz)
      |SELECT component_size, CAST(count(*) AS BIGINT) AS n_components,
      |  CAST(component_size * count(*) AS BIGINT) AS n_nodes,
      |  round(CAST(component_size * count(*) AS DOUBLE)
      |    / CAST(n_total AS DOUBLE), 4) AS node_share
      |FROM siz, tot GROUP BY component_size, n_total""".stripMargin

  /** Approximate LSH top-k rows (query_id, rank, vec_id ≤ k) as a SQL
    * fragment over the [[lshCteSql]] CTEs — shared by the ann_lsh_topk
    * oracle and the recall report's approx side. */
  private val lshTopkSql: String =
    """lcand AS (
      |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
      |  FROM buckets q JOIN buckets c
      |    ON q.tbl = c.tbl AND q.bucket = c.bucket
      |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
      |lsims AS (
      |  SELECT query_id, l.vec_id AS vec_id,
      |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
      |  FROM lcand l
      |  JOIN n a ON l.query_id = a.vec_id
      |  JOIN n b ON l.vec_id = b.vec_id),
      |lsh_topk AS (
      |  SELECT query_id, rank, vec_id FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (
      |        PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |    FROM lsims)
      |  WHERE rank <= 10)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "cdc_flatten" -> flattenSql,
    "cdc_dedup_latest" -> dedupLatestSql,
    // configured dedup ordering (r16): same row_number shape, primary
    // ordering re-pointed at `value`; and the blank-config branch where
    // the newest arrival (event_id) wins outright. __op is never NULL
    // on this corpus (flatten synthesizes it), so the NULL→'c' default
    // lives in the Scala unit spec, not here.
    "cdc_dedup_configured" ->
      s"""SELECT event_id, user_id, event_type, value, ts, prop_k, __op,
         |  __ts_ms, __source_ts_ms, __deleted
         |FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id
         |    ORDER BY value DESC, $opPrioSql DESC, event_id DESC) AS rn
         |  FROM ($flattenSql) flat
         |) t WHERE rn = 1""".stripMargin,
    "cdc_dedup_arrival" ->
      s"""SELECT event_id, user_id, event_type, value, ts, prop_k, __op,
         |  __ts_ms, __source_ts_ms, __deleted
         |FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id ORDER BY event_id DESC) AS rn
         |  FROM ($flattenSql) flat
         |) t WHERE rn = 1""".stripMargin,
    // NULL-op default (r17): the synthesized broken-op batch — %13==0
    // loses its op (NULL → coalesce default 'c', priority 1), %13==1
    // carries the unmapped code 'x' (→ -1), batch_seq puts exactly that
    // slice at the top of the configured ordering so the priority CASE
    // decides between the two branches (66/150 sf0.01 winners flip
    // without the coalesce)
    "cdc_dedup_nullop" ->
      s"""SELECT event_id, user_id, event_type, value, ts, prop_k, __op,
         |  __ts_ms, __source_ts_ms, __deleted, batch_seq
         |FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id
         |    ORDER BY batch_seq DESC,
         |      CASE coalesce(__op, 'c') WHEN 'c' THEN 1 WHEN 'r' THEN 2
         |        WHEN 'u' THEN 3 WHEN 'd' THEN 4 ELSE -1 END DESC,
         |      event_id DESC) AS rn
         |  FROM (SELECT event_id, user_id, event_type, value, ts, prop_k,
         |      CASE WHEN event_id % 13 = 0 THEN NULL
         |        WHEN event_id % 13 = 1 THEN 'x' ELSE __op END AS __op,
         |      __ts_ms, __source_ts_ms, __deleted,
         |      CASE WHEN event_id % 13 < 2 THEN 1 ELSE 0 END AS batch_seq
         |    FROM ($flattenSql) f) flat
         |) t WHERE rn = 1""".stripMargin,
    "cdc_upsert_snapshot" -> s"SELECT * FROM ($dedupLatestSql) s WHERE __op <> 'd'",
    // one-row column-level stats over the live snapshot; exact ints,
    // exact stored doubles/timestamps, nothing rounded
    "cdc_snapshot_profile" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
         |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
         |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null_value,
         |  CAST(sum(CASE WHEN prop_k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null_prop_k,
         |  min(value) AS min_value, max(value) AS max_value,
         |  min(__source_ts_ms) AS oldest_state,
         |  max(__source_ts_ms) AS newest_state
         |FROM ($dedupLatestSql) s WHERE __op <> 'd'""".stripMargin,
    // tombstone debt: dead keys' final delete month + their whole
    // change history mass; max_by replayed as the rn=1 winner
    "cdc_delete_debt" ->
      s"""WITH pk AS (
         |  SELECT user_id,
         |    max(CASE WHEN rn = 1 THEN __op END) AS last_op,
         |    max(CASE WHEN rn = 1 THEN __source_ts_ms END) AS last_ts,
         |    CAST(count(*) AS BIGINT) AS n_changes
         |  FROM (
         |    SELECT user_id, __op, __source_ts_ms, row_number() OVER (
         |      PARTITION BY user_id
         |      ORDER BY __source_ts_ms DESC, $opPrioSql DESC,
         |        event_id DESC) AS rn
         |    FROM ($flattenSql) flat) t
         |  GROUP BY user_id)
         |SELECT CAST(date_trunc('month', last_ts) AS DATE) AS delete_month,
         |  CAST(count(*) AS BIGINT) AS n_deleted_keys,
         |  CAST(sum(n_changes) AS BIGINT) AS n_changes
         |FROM pk WHERE last_op = 'd' GROUP BY 1""".stripMargin,
    "cdc_column_volatility" ->
      s"""WITH st AS (
         |  SELECT user_id, value, prop_k, event_type,
         |    lag(value) OVER w AS p_value,
         |    lag(prop_k) OVER w AS p_k,
         |    lag(event_type) OVER w AS p_type
         |  FROM ($flattenSql) f
         |  WINDOW w AS (PARTITION BY user_id
         |    ORDER BY __source_ts_ms, $opPrioSql, event_id)),
         |t AS (SELECT * FROM st WHERE p_type IS NOT NULL),
         |u AS (
         |  SELECT user_id, 'value' AS col_name,
         |    value IS DISTINCT FROM p_value AS changed FROM t
         |  UNION ALL SELECT user_id, 'prop_k',
         |    prop_k IS DISTINCT FROM p_k FROM t
         |  UNION ALL SELECT user_id, 'event_type',
         |    event_type IS DISTINCT FROM p_type FROM t)
         |SELECT col_name, CAST(count(*) AS BIGINT) AS n_transitions,
         |  CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_changed,
         |  CAST(count(DISTINCT CASE WHEN changed THEN user_id END)
         |    AS BIGINT) AS n_keys_changed,
         |  round(CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 4) AS change_rate
         |FROM u GROUP BY 1""".stripMargin,
    "cdc_key_lifespan" ->
      s"""WITH pk AS (
         |  SELECT user_id,
         |    min(__ts_ms) AS first_ms, max(__ts_ms) AS last_ms,
         |    max(CASE WHEN rn = 1 THEN __op END) AS last_op,
         |    CAST(count(*) AS BIGINT) AS n_changes
         |  FROM (
         |    SELECT user_id, __op, __ts_ms, __source_ts_ms, row_number()
         |      OVER (PARTITION BY user_id
         |        ORDER BY __source_ts_ms DESC, $opPrioSql DESC,
         |          event_id DESC) AS rn
         |    FROM ($flattenSql) flat) t
         |  GROUP BY user_id),
         |b AS (SELECT *,
         |    last_ms - first_ms AS span,
         |    CASE WHEN n_changes = 1 THEN '0_single'
         |      WHEN last_ms - first_ms < 86400000 THEN '1_lt_1d'
         |      WHEN last_ms - first_ms < 604800000 THEN '2_lt_7d'
         |      WHEN last_ms - first_ms < 2592000000 THEN '3_lt_30d'
         |      ELSE '4_ge_30d' END AS lifespan_bucket
         |  FROM pk)
         |SELECT lifespan_bucket, CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(sum(CASE WHEN last_op = 'd' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_ended_deleted,
         |  round(CAST(sum(n_changes) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 4) AS avg_changes,
         |  CAST(max(span) AS BIGINT) AS max_lifespan_ms
         |FROM b GROUP BY 1""".stripMargin,
    "cdc_soft_delete" -> dedupLatestSql,
    "cdc_append" ->
      s"SELECT *, 'events' AS __table, 'graft' AS __db FROM ($flattenSql) f",
    "cdc_partition_month" ->
      """SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS part_month,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    // compaction planner: all-integer partition accounting (ceil via
    // integer div on both engines), one 4dp ratio
    "cdc_compaction_plan" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS part_day,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT date_trunc('hour', ts)) AS BIGINT)
        |      AS n_batches,
        |    CAST(sum(40 + length(event_type) + length(props)) AS BIGINT)
        |      AS est_bytes
        |  FROM events GROUP BY 1)
        |SELECT part_day, n_rows, n_batches, est_bytes,
        |  (est_bytes + 262143) // 262144 AS compacted_files,
        |  greatest(0, n_batches - (est_bytes + 262143) // 262144)
        |    AS small_file_debt,
        |  round(CAST(n_batches AS DOUBLE) /
        |    CAST((est_bytes + 262143) // 262144 AS DOUBLE), 4)
        |    AS write_amplification
        |FROM m""".stripMargin,
    // op-mix dashboard: integer counts; share = exact ratio of two
    // integer counts (deterministic double division on both engines)
    "cdc_op_mix" ->
      s"""WITH f AS ($flattenSql),
         |c AS (
         |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         |    __op,
         |    count(*) AS n_events,
         |    sum(CASE WHEN __deleted THEN 1 ELSE 0 END) AS n_deleted
         |  FROM f GROUP BY 1, 2)
         |SELECT hour, __op, n_events, CAST(n_deleted AS BIGINT) AS n_deleted,
         |  CAST(n_events AS DOUBLE) /
         |    sum(n_events) OVER (PARTITION BY hour) AS op_share
         |FROM c""".stripMargin,
    // hot-key churn: integer counts per PK; the mean is the q11-style
    // 1-row scalar, and the flag compares exact ints against 3x that
    // double on both engines
    "cdc_key_churn" ->
      s"""WITH f AS ($flattenSql),
         |per AS (
         |  SELECT user_id, count(*) AS n_changes,
         |    CAST(sum(CASE WHEN __op = 'u' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_updates,
         |    CAST(sum(CASE WHEN __op = 'd' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_deletes,
         |    min(ts) AS first_ts, max(ts) AS last_ts
         |  FROM f GROUP BY 1),
         |m AS (SELECT avg(n_changes) AS mean_changes FROM per)
         |SELECT user_id, n_changes, n_updates, n_deletes,
         |  first_ts, last_ts,
         |  n_changes >= 3.0 * (SELECT mean_changes FROM m) AS is_hot
         |FROM per""".stripMargin,
    "cdc_typemap" ->
      """SELECT event_id,
        |  CAST(epoch_ms(ts) // 86400000 AS INT) AS epoch_day,
        |  DATE '1970-01-01' + CAST(epoch_ms(ts) // 86400000 AS INT) AS day_date,
        |  epoch_ms(epoch_ms(ts)) AS ts_from_ms,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS iso_no_z
        |FROM events""".stripMargin,
    // full Connect-schema type surface: semantic date/ts/zoned-ts, JSON,
    // array, bytes, geometry struct, nested struct — flattened typed values
    "cdc_typemap_complex" ->
      """SELECT event_id AS id,
        |  DATE '1970-01-01' + CAST(epoch_ms(ts) // 86400000 AS INT) AS day,
        |  epoch_ms(epoch_ms(ts)) AS created_ms,
        |  ts AS zts,
        |  epoch_ms(epoch_ms(ts)) AS nano_ts,
        |  date_trunc('second', ts) AS iso_dt,
        |  strftime(ts, '%H:%M:%S') AS iso_t,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS attr_k,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS payload_k,
        |  2 AS n_tags,
        |  hex(event_type) AS blob_hex,
        |  4326 AS geo_srid,
        |  concat('PT-', user_id) AS geo_wkb,
        |  user_id AS nested_uid,
        |  value AS nested_val,
        |  epoch_ms(epoch_ms(ts)) AS ts,
        |  event_type = 'error' AS deleted
        |FROM events""".stripMargin,
    "cdc_schema_evolution" ->
      """SELECT event_id, user_id, event_type, CAST(NULL AS DOUBLE) AS value
        |FROM events WHERE event_id < 500
        |UNION ALL
        |SELECT event_id, user_id, event_type, value
        |FROM events WHERE event_id >= 500""".stripMargin,
    "cdc_merge_incremental" -> s"SELECT * FROM ($dedupLatestSql) s WHERE __op <> 'd'",
    // time travel AS OF 2024-01-15: latest pre-asOf change per key under
    // RRF fusion (r11): both retrieval paths replayed (LSH literal
    // hyperplanes + IVF Lloyd), then the two-term reciprocal-rank sum
    "ann_rrf_fusion" ->
      s"""WITH $lshCteSql,
         |$lshTopkSql,
         |${lloydCte("v", 16, 1, "i")},
         |${assignCte("v", "ic1", "ax")},
         |assigned AS (
         |  SELECT n.vec_id, n.v, n.nrm, ax.cid
         |  FROM n JOIN ax ON n.vec_id = ax.vec_id),
         |iprobes AS (
         |  SELECT query_id, j AS cid, qnrm FROM (
         |    SELECT q.vec_id AS query_id, cc.j, q.nrm AS qnrm,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.v, cc.c)
         |          - list_dot_product(cc.c, cc.c) / 2.0 DESC, cc.j ASC)
         |        AS rn
         |    FROM n q, ic1 cc WHERE q.vec_id < 10) WHERE rn <= 4),
         |icand AS (
         |  SELECT p.query_id, a.vec_id,
         |    list_dot_product(q.v, a.v) / (p.qnrm * a.nrm) AS sim
         |  FROM assigned a JOIN iprobes p ON a.cid = p.cid
         |  JOIN n q ON q.vec_id = p.query_id
         |  WHERE a.vec_id <> p.query_id),
         |ivf_topk AS (
         |  SELECT query_id, rank, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, vec_id) AS rank
         |    FROM icand) WHERE rank <= 10),
         |fused AS (
         |  SELECT coalesce(l.query_id, i.query_id) AS query_id,
         |    coalesce(l.vec_id, i.vec_id) AS vec_id,
         |    coalesce(1.0 / (60 + l.rank), 0.0)
         |      + coalesce(1.0 / (60 + i.rank), 0.0) AS rrf
         |  FROM lsh_topk l FULL OUTER JOIN ivf_topk i
         |    ON l.query_id = i.query_id AND l.vec_id = i.vec_id)
         |SELECT query_id, rank, vec_id, round(rrf, 6) AS rrf_score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, vec_id) AS rank FROM fused)
         |WHERE rank <= 10""".stripMargin,
    // truncation eval (r11): every prefix cosine from one pair scan
    "embed_truncation_eval" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sims AS (
        |  SELECT d.d AS dim, a.vec_id AS query_id, b.vec_id AS vec_id,
        |    list_dot_product(a.v[1:d.d], b.v[1:d.d])
        |      / (sqrt(list_dot_product(a.v[1:d.d], a.v[1:d.d]))
        |         * sqrt(list_dot_product(b.v[1:d.d], b.v[1:d.d]))) AS sim
        |  FROM v a JOIN v b ON b.vec_id <> a.vec_id,
        |    (VALUES (8), (16), (32), (64)) d(d)
        |  WHERE a.vec_id < 10),
        |topk AS (
        |  SELECT dim, query_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY dim, query_id
        |      ORDER BY sim DESC, vec_id) AS rn FROM sims)
        |  WHERE rn <= 10),
        |truth AS (SELECT query_id, vec_id FROM topk WHERE dim = 64),
        |hits AS (
        |  SELECT t2.dim, t2.query_id, CAST(count(*) AS BIGINT) AS h
        |  FROM topk t2 JOIN truth t
        |    ON t2.query_id = t.query_id AND t2.vec_id = t.vec_id
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT dims.dim, q.query_id
        |  FROM (SELECT DISTINCT dim FROM topk) dims,
        |    (SELECT DISTINCT query_id FROM truth) q),
        |recalls AS (
        |  SELECT g.dim, g.query_id,
        |    CAST(coalesce(h.h, 0) AS DOUBLE) / 10 AS r
        |  FROM grid g LEFT JOIN hits h
        |    ON g.dim = h.dim AND g.query_id = h.query_id)
        |SELECT dim, round(avg(r), 4) AS mean_recall,
        |  round(min(r), 4) AS min_recall
        |FROM recalls GROUP BY dim""".stripMargin,
    // SCD2 (r11): one version row per non-delete change, interval
    // closed by the NEXT change (of any kind) under the canonical order
    "cdc_scd2" ->
      s"""WITH f AS ($flattenSql),
         |w AS (
         |  SELECT *, lead(__source_ts_ms) OVER (
         |    PARTITION BY user_id
         |    ORDER BY __source_ts_ms, $opPrioSql, event_id) AS valid_to
         |  FROM f)
         |SELECT user_id, event_id, event_type, value, prop_k, __op,
         |  __source_ts_ms AS valid_from,
         |  epoch_ms(__source_ts_ms) AS valid_from_ms,
         |  coalesce(epoch_ms(valid_to), -1) AS valid_to_ms,
         |  valid_to IS NULL AS is_current
         |FROM w WHERE __op <> 'd'""".stripMargin,
    // changelog-health state machine: lag over the canonical order +
    // running arrival-order ts max, one summary row of exact integers
    "cdc_gap_audit" ->
      s"""WITH f AS ($flattenSql),
         |st AS (
         |  SELECT __op, __ts_ms,
         |    lag(__op) OVER (PARTITION BY user_id
         |      ORDER BY __source_ts_ms, $opPrioSql, event_id) AS prev_op,
         |    max(__ts_ms) OVER (PARTITION BY user_id ORDER BY event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS max_prev_ms,
         |    user_id
         |  FROM f)
         |SELECT count(*) AS n_changes,
         |  count(DISTINCT user_id) AS n_keys,
         |  CAST(sum(CASE WHEN __op = 'u' AND prev_op IS NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS orphan_updates,
         |  CAST(sum(CASE WHEN __op = 'd' AND prev_op IS NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS orphan_deletes,
         |  CAST(sum(CASE WHEN __op = 'c' AND prev_op IN ('c', 'r', 'u')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS double_creates,
         |  CAST(sum(CASE WHEN __op = 'd' AND prev_op = 'd'
         |    THEN 1 ELSE 0 END) AS BIGINT) AS double_deletes,
         |  CAST(sum(CASE WHEN __op = 'u' AND prev_op = 'd'
         |    THEN 1 ELSE 0 END) AS BIGINT) AS resurrect_updates,
         |  CAST(sum(CASE WHEN __ts_ms < max_prev_ms
         |    THEN 1 ELSE 0 END) AS BIGINT) AS late_arrivals,
         |  coalesce(max(CASE WHEN __ts_ms < max_prev_ms
         |    THEN max_prev_ms - __ts_ms END), 0) AS max_lateness_ms
         |FROM st""".stripMargin,
    // lateness histogram behind the gap audit's max: same arrival
    // window, bucketed to a <=5-row frame of exact ints + one ratio
    "cdc_lateness_profile" ->
      s"""WITH f AS (
         |  SELECT user_id, epoch_ms(ts) AS __ts_ms,
         |    (CASE WHEN event_id % 7 = 0
         |          THEN event_id + (event_id % 11 + 1) * 50
         |          ELSE event_id END) * 1000000 + event_id AS event_id
         |  FROM events),
         |lt AS (
         |  SELECT greatest(coalesce(
         |    max(__ts_ms) OVER (PARTITION BY user_id ORDER BY event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      - __ts_ms, 0), 0) AS lateness_ms
         |  FROM f),
         |b AS (
         |  SELECT CASE WHEN lateness_ms = 0 THEN '0_on_time'
         |              WHEN lateness_ms < 60000 THEN '1_lt_1m'
         |              WHEN lateness_ms < 3600000 THEN '2_lt_1h'
         |              WHEN lateness_ms < 86400000 THEN '3_lt_1d'
         |              ELSE '4_ge_1d' END AS bucket, lateness_ms
         |  FROM lt)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_changes,
         |  round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM b), 4)
         |    AS share,
         |  max(lateness_ms) AS max_lateness_ms
         |FROM b GROUP BY bucket""".stripMargin,
    // op-pair grammar audit over the canonical change order; illegal =
    // d→{u,d} or c→c
    "cdc_lifecycle_audit" ->
      s"""WITH f AS ($flattenSql),
         |p AS (
         |  SELECT lag(__op) OVER (PARTITION BY user_id
         |      ORDER BY __source_ts_ms, $opPrioSql, event_id) AS op_from,
         |    __op AS op_to
         |  FROM f),
         |g AS (SELECT op_from, op_to, CAST(count(*) AS BIGINT) AS n
         |  FROM p WHERE op_from IS NOT NULL GROUP BY 1, 2)
         |SELECT op_from, op_to, n,
         |  (op_from = 'd' AND op_to IN ('u', 'd'))
         |    OR (op_from = 'c' AND op_to = 'c') AS is_illegal,
         |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 4)
         |    AS share
         |FROM g""".stripMargin,
    // touched keys from the window slice, tail changes semi-joined,
    // per-day replay bill; exact integers
    "cdc_backfill_scope" ->
      """WITH touched AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-10'
        |    AND ts < TIMESTAMP '2024-01-20')
        |SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_keys,
        |  CAST(count(*) AS BIGINT) AS n_changes,
        |  CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-20'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_in_window,
        |  CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-20'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_tail
        |FROM events e JOIN touched t ON e.user_id = t.user_id
        |WHERE ts >= TIMESTAMP '2024-01-10'
        |GROUP BY 1""".stripMargin,
    // the lateness window reused, broadcast W-grid, per-W dead-letter
    // accounting (threshold-sweep shape on event time)
    "cdc_watermark_sweep" ->
      s"""WITH f AS (
         |  SELECT user_id, epoch_ms(ts) AS __ts_ms,
         |    (CASE WHEN event_id % 7 = 0
         |          THEN event_id + (event_id % 11 + 1) * 50
         |          ELSE event_id END) * 1000000 + event_id AS event_id
         |  FROM events),
         |lt AS (
         |  SELECT greatest(coalesce(
         |    max(__ts_ms) OVER (PARTITION BY user_id ORDER BY event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      - __ts_ms, 0), 0) AS lateness_ms
         |  FROM f),
         |ws(watermark_ms) AS (VALUES (60000), (600000), (3600000),
         |  (21600000), (86400000))
         |SELECT watermark_ms, CAST(count(*) AS BIGINT) AS n_changes,
         |  CAST(sum(CASE WHEN lateness_ms > watermark_ms
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dead,
         |  round(CAST(sum(CASE WHEN lateness_ms > watermark_ms
         |      THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 4) AS dead_share,
         |  coalesce(max(CASE WHEN lateness_ms > watermark_ms
         |    THEN lateness_ms END), 0) AS worst_dead_ms
         |FROM lt, ws GROUP BY 1""".stripMargin,
    // incremental SCD2 == the full rebuild (closed intervals immutable
    // under the in-order changelog contract) — same oracle as cdc_scd2
    "cdc_scd2_incremental" ->
      s"""WITH f AS ($flattenSql),
         |w AS (
         |  SELECT *, lead(__source_ts_ms) OVER (
         |    PARTITION BY user_id
         |    ORDER BY __source_ts_ms, $opPrioSql, event_id) AS valid_to
         |  FROM f)
         |SELECT user_id, event_id, event_type, value, prop_k, __op,
         |  __source_ts_ms AS valid_from,
         |  epoch_ms(__source_ts_ms) AS valid_from_ms,
         |  coalesce(epoch_ms(valid_to), -1) AS valid_to_ms,
         |  valid_to IS NULL AS is_current
         |FROM w WHERE __op <> 'd'""".stripMargin,
    // the exact dedup ordering, deletes absent; next_change_ms = first
    // post-asOf change (-1 sentinel — NULLs render asymmetrically)
    "cdc_time_travel" ->
      s"""WITH flat AS ($flattenSql),
         |past AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id
         |    ORDER BY __source_ts_ms DESC, $opPrioSql DESC, event_id DESC) AS rn
         |  FROM flat WHERE __source_ts_ms <= TIMESTAMP '2024-01-15'),
         |nxt AS (
         |  SELECT user_id, min(__ts_ms) AS next_ms FROM flat
         |  WHERE __source_ts_ms > TIMESTAMP '2024-01-15' GROUP BY 1)
         |SELECT p.event_id, p.user_id, p.event_type, p.value, p.ts, p.prop_k,
         |  p.__op, p.__ts_ms, p.__source_ts_ms, p.__deleted,
         |  CAST(coalesce(n.next_ms, -1) AS BIGINT) AS next_change_ms
         |FROM past p LEFT JOIN nxt n ON p.user_id = n.user_id
         |WHERE p.rn = 1 AND p.__op <> 'd'""".stripMargin,
    // tiebreak audit: (key, ts) collision groups >= 2, rolled per key;
    // exact integer counts only
    "cdc_tiebreak_audit" ->
      s"""WITH flat AS ($flattenSql),
         |c AS (
         |  SELECT user_id, __source_ts_ms, count(*) AS n,
         |    sum(CASE WHEN __deleted THEN 1 ELSE 0 END) AS n_del
         |  FROM flat GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT user_id, count(*) AS n_collisions,
         |  CAST(sum(n) AS BIGINT) AS n_conflicted_changes,
         |  max(n_del > 0) AS has_delete_conflict
         |FROM c GROUP BY 1""".stripMargin,
    // snapshot diff between AS OF 01-10 and AS OF 01-20: per-key winners
    // at both points, classified; unchanged keys emit nothing, absent
    // sides carry -1 sentinels
    "cdc_snapshot_diff" ->
      s"""WITH flat AS ($flattenSql),
         |w1 AS (
         |  SELECT user_id, event_id, __op, row_number() OVER (
         |    PARTITION BY user_id
         |    ORDER BY __source_ts_ms DESC, $opPrioSql DESC, event_id DESC) AS rn
         |  FROM flat WHERE __source_ts_ms <= TIMESTAMP '2024-01-10'),
         |w2 AS (
         |  SELECT user_id, event_id, __op, row_number() OVER (
         |    PARTITION BY user_id
         |    ORDER BY __source_ts_ms DESC, $opPrioSql DESC, event_id DESC) AS rn
         |  FROM flat WHERE __source_ts_ms <= TIMESTAMP '2024-01-20'),
         |s AS (
         |  SELECT coalesce(a.user_id, b.user_id) AS user_id,
         |    coalesce(a.__op <> 'd', FALSE) AS live1,
         |    coalesce(b.__op <> 'd', FALSE) AS live2,
         |    a.event_id AS e1, b.event_id AS e2
         |  FROM (SELECT * FROM w1 WHERE rn = 1) a
         |  FULL OUTER JOIN (SELECT * FROM w2 WHERE rn = 1) b
         |    ON a.user_id = b.user_id)
         |SELECT user_id,
         |  CASE WHEN NOT live1 AND live2 THEN 'added'
         |       WHEN live1 AND NOT live2 THEN 'removed'
         |       ELSE 'changed' END AS change_type,
         |  CAST(CASE WHEN live1 THEN e1 ELSE -1 END AS BIGINT) AS old_event_id,
         |  CAST(CASE WHEN live2 THEN e2 ELSE -1 END AS BIGINT) AS new_event_id
         |FROM s
         |WHERE (NOT live1 AND live2) OR (live1 AND NOT live2)
         |   OR (live1 AND live2 AND e1 <> e2)""".stripMargin,
    "cdc_merge_partitioned" -> s"SELECT * FROM ($dedupLatestSql) s WHERE __op <> 'd'",
    // Final aggregates are CAST(... AS DOUBLE) on BOTH sides: the driver
    // hashes rendered values, and Decimal "137431.00" ≠ float64 "137431.0"
    // (VERDICT r1). Accumulation stays DECIMAL for exactness.
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS sum_disc_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      s"""SELECT l_orderkey, o_orderdate,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey ASC
         |LIMIT 10""".stripMargin,
    "q5_region_volume" ->
      s"""SELECT n_name, CAST(sum($discPriceSql) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INT) AS l_year,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue
         |FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |  AND c_custkey = o_custkey
         |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
         |  AND n1.n_name IN ('NATION_1', 'NATION_2')
         |  AND n2.n_name IN ('NATION_1', 'NATION_2')
         |  AND n1.n_name <> n2.n_name
         |  AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1999-01-01'
         |GROUP BY 1, 2, 3""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
        |  sum_qty
        |FROM (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250
        |) big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,
    // top-20 cutoff ordered on the EXACT decimal revenue (tie-break
    // c_custkey) on both sides; double cast only in the final projection
    "q10_returns" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS c_acctbal,
         |  CAST(rev AS DOUBLE) AS revenue
         |FROM (
         |  SELECT o_custkey, sum($discPriceSql) AS rev
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '1997-01-01'
         |    AND o_orderdate < TIMESTAMP '1997-04-01'
         |  GROUP BY 1) r
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin,
    // EXISTS + NOT EXISTS chain; the Spark side plans it as semi + anti
    "q21_sole_blame" ->
      """WITH ret AS (SELECT DISTINCT l_orderkey, l_suppkey
        |             FROM lineitem WHERE l_returnflag = 'R'),
        |pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        |SELECT s_name, count(*) AS numwait
        |FROM ret r1 JOIN supplier ON s_suppkey = r1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM pairs o
        |              WHERE o.l_orderkey = r1.l_orderkey
        |                AND o.l_suppkey <> r1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM ret r2
        |                  WHERE r2.l_orderkey = r1.l_orderkey
        |                    AND r2.l_suppkey <> r1.l_suppkey)
        |GROUP BY 1""".stripMargin,
    // NOT IN as anti join + distinct count
    "q16_supplier_diversity" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_size <= 25
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY 1, 2""".stripMargin,
    // nation-level flow grid rolled both ways; DECIMAL-exact money,
    // domestic flows excluded as in q7
    "q_trade_balance" ->
      s"""WITH flows AS (
         |  SELECT sn.n_name AS sn, cn.n_name AS cn,
         |    sum($discPriceSql) AS v
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |  WHERE sn.n_name <> cn.n_name GROUP BY 1, 2),
         |e AS (SELECT sn AS nation, sum(v) AS ev FROM flows GROUP BY 1),
         |i AS (SELECT cn AS nation, sum(v) AS iv FROM flows GROUP BY 1)
         |SELECT coalesce(e.nation, i.nation) AS nation,
         |  CAST(coalesce(ev, 0) AS DOUBLE) AS exports,
         |  CAST(coalesce(iv, 0) AS DOUBLE) AS imports,
         |  CAST(coalesce(ev, 0) - coalesce(iv, 0) AS DOUBLE) AS balance
         |FROM e FULL OUTER JOIN i ON e.nation = i.nation""".stripMargin,
    // scan-side conjunctive filter → scalar agg
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    // per-group argmin with ties over a filtered join, deterministic top-100
    "q2_min_cost_supplier" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |cand AS (
        |  SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        |  FROM part p JOIN ps ON p.p_partkey = ps.l_partkey
        |  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE' AND p.p_size <= 15 AND p.p_type = 'STANDARD')
        |SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey FROM (
        |  SELECT *, min(s_acctbal) OVER (PARTITION BY p_partkey) AS mn FROM cand) t
        |WHERE s_acctbal = mn
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
        |LIMIT 100""".stripMargin,
    // conditional share-of-total; share divides as DOUBLE on both sides
    "q8_market_share" ->
      s"""SELECT yr,
         |  CAST(sum(CASE WHEN nat = 'NATION_2' THEN vol
         |           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |    / CAST(sum(vol) AS DOUBLE) AS mkt_share
         |FROM (SELECT CAST(year(o_orderdate) AS INT) AS yr, $discPriceSql AS vol,
         |        n2.n_name AS nat
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  JOIN part ON l_partkey = p_partkey
         |  WHERE r_name = 'ASIA' AND p_type = 'PROMO') a
         |GROUP BY yr""".stripMargin,
    // profit arithmetic over 5-way join (cost adapted: 5% of retail price)
    "q9_product_profit" ->
      s"""SELECT nat, yr, CAST(sum(amount) AS DOUBLE) AS sum_profit FROM (
         |  SELECT n_name AS nat, CAST(year(o_orderdate) AS INT) AS yr,
         |    $discPriceSql - CAST(p_retailprice AS DECIMAL(12,2))
         |      * CAST(0.05 AS DECIMAL(3,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS amount
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN part ON l_partkey = p_partkey
         |  WHERE p_name LIKE '%red%') a GROUP BY nat, yr""".stripMargin,
    // aggregate filtered by a scalar aggregate of itself
    "q11_important_parts" ->
      s"""WITH v AS (
         |  SELECT l_partkey, sum($discPriceSql) AS val
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_regionkey = 2 GROUP BY l_partkey)
         |SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value FROM v
         |WHERE CAST(val AS DOUBLE) >
         |  (SELECT CAST(sum(val) AS DOUBLE) FROM v) * 0.001""".stripMargin,
    // fact-fact join + conditional CASE counts
    "q12_priority_lines" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin,
    // LEFT OUTER with ON-clause filter → distribution agg
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t GROUP BY c_count""".stripMargin,
    // argmax by scalar subquery over a derived agg, exact DECIMAL ties
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, sum($discPriceSql) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin,
    // correlated per-group AVG (integral doubles: deterministic both sides)
    "q17_small_quantity" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |           / 7.0 AS DOUBLE) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_size <= 10
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    // disjunction of conjunctive predicate groups
    "q19_disjunctive" ->
      s"""SELECT CAST(sum($discPriceSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    // HAVING aggregate feeding a semi-join chain
    "q20_excess_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_regionkey = 1 AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 50)""".stripMargin,
    // scalar-subquery threshold + NOT EXISTS anti join
    "q22_dormant_customers" ->
      """SELECT c_nationkey AS cntry, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_nationkey < 10
        |  AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |                     / count(*)
        |                   FROM customer WHERE c_acctbal > 0.0 AND c_nationkey < 10)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey""".stripMargin,
    // ROLLUP hierarchy in one aggregate pass; null slots → 'ALL' both sides
    "q_rollup_revenue" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
         |  coalesce(l_linestatus, 'ALL') AS ls,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    // wide-format pivot = conditional sums over the long-format grain;
    // empty cells coalesce to 0.0 on both engines
    "q_pivot_revenue" ->
      s"""SELECT year(l_shipdate) AS ship_year,
         |  CAST(coalesce(sum(CASE WHEN l_returnflag = 'A'
         |    THEN $discPriceSql END), 0) AS DOUBLE) AS rev_a,
         |  CAST(coalesce(sum(CASE WHEN l_returnflag = 'N'
         |    THEN $discPriceSql END), 0) AS DOUBLE) AS rev_n,
         |  CAST(coalesce(sum(CASE WHEN l_returnflag = 'R'
         |    THEN $discPriceSql END), 0) AS DOUBLE) AS rev_r
         |FROM lineitem
         |GROUP BY 1""".stripMargin,
    // forward as-of: nearest FOLLOWING purchase via a DESC-scan window —
    // equal timestamps sort purchases after clicks (strictly-after), the
    // horizon compares in integer microseconds
    "events_next_within" ->
      """WITH tagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN event_type = 'purchase' THEN 2 ELSE 1 END AS side,
        |    CASE WHEN event_type = 'purchase' THEN
        |      struct_pack(p_us := epoch_us(ts), p_id := event_id) END AS p
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), w AS (
        |  SELECT *, last_value(p IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, side ASC, event_id DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS nxt
        |  FROM tagged
        |)
        |SELECT event_id, user_id,
        |  coalesce(CASE WHEN nxt.p_us - epoch_us(ts) <= 600000000
        |           THEN nxt.p_id END, -1) AS next_purchase_id,
        |  coalesce(CASE WHEN nxt.p_us - epoch_us(ts) <= 600000000
        |           THEN nxt.p_us - epoch_us(ts) END, -1) AS gap_us
        |FROM w WHERE side = 1""".stripMargin,
    // per-user z-score screen: z rounded to 4 decimals on BOTH engines
    // before the threshold compare and in the output (the embed_outliers
    // float rule); single-event users have null sample sd (unflaggable),
    // constant users excluded by sd > 0
    "events_anomaly" ->
      """WITH s AS (
        |  SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id,
        |  round((e.value - s.mu) / s.sd, 4) AS z
        |FROM events e JOIN s ON e.user_id = s.user_id
        |WHERE s.sd > 0 AND abs(round((e.value - s.mu) / s.sd, 4)) >= 3.0""".stripMargin,
    // exact lower median by rank construction — a selected ROW, never an
    // interpolated float (percentile_cont interpolation is engine-specific)
    "q_median_order" ->
      """SELECT o_orderpriority, o_totalprice AS median_price FROM (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders) t
        |WHERE rn = (n + 1) // 2""".stripMargin,
    // ROWS UNBOUNDED PRECEDING running total, DECIMAL-exact per prefix
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders""".stripMargin,
    // ordered funnel: staged keyed aggregates chained by strict ts order
    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT count(t1) AS n_signup, count(t2) AS n_click_after_signup,
        |  count(t3) AS n_purchase_after_click
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin,
    // interval containment: purchases inside 15-min incident windows.
    // epoch_us on both operands pins the compare to Spark's microsecond
    // domain (events.ts is parquet NANOS; Tables.events floors to micros).
    "events_interval_join" ->
      """SELECT p.event_id AS purchase_id, e.event_id AS incident_id
        |FROM events p, events e
        |WHERE p.event_type = 'purchase' AND e.event_type = 'error'
        |  AND epoch_us(p.ts) >= epoch_us(e.ts)
        |  AND epoch_us(p.ts) < epoch_us(e.ts) + 900000000""".stripMargin,
    // stride-1 repeated-substring stats: the oracle groups window STRINGS
    // where Spark hashes the token slice (space-free tokens → identical
    // grouping, the jaccard-oracle convention); coverage is the same
    // lead-window interval merge on both engines
    "dedup_substrings" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS ts FROM documents),
         |w AS (
         |  SELECT doc_id, g.i AS pos,
         |    array_to_string(ts[g.i:g.i+14], ' ') AS s
         |  FROM t, unnest(generate_series(1, len(ts) - 14)) AS g(i)
         |  WHERE len(ts) >= 15),
         |c AS (SELECT s FROM w GROUP BY s HAVING count(*) >= 2),
         |f AS (SELECT w.doc_id, w.pos FROM w JOIN c USING (s)),
         |cv AS (
         |  SELECT doc_id, pos,
         |    lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
         |  FROM f),
         |agg AS (
         |  SELECT doc_id,
         |    CAST(sum(least(15, coalesce(nxt - pos, 15))) AS BIGINT) AS nd
         |  FROM cv GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(len($tokSql) AS BIGINT) AS n_tokens,
         |  coalesce(a.nd, 0) AS n_dup_tokens,
         |  round(CAST(coalesce(a.nd, 0) AS DOUBLE) / len($tokSql), 4)
         |    AS dup_frac
         |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // span dedup: first occurrence of each 10-token chunk wins, docs
    // reassemble from surviving chunks (fully-duplicated docs vanish)
    "dedup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |chunks AS (
        |  SELECT doc_id, u.i AS chunk_ord,
        |         array_to_string(l[(u.i*10+1):(u.i*10+10)], ' ') AS chunk
        |  FROM toks, unnest(range(0, CAST(ceil(len(l)/10.0) AS BIGINT))) AS u(i)),
        |keep AS (
        |  SELECT doc_id, chunk_ord, chunk FROM (
        |    SELECT *, row_number() OVER (PARTITION BY chunk
        |               ORDER BY doc_id, chunk_ord) AS rn
        |    FROM chunks) t WHERE rn = 1)
        |SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_ord) AS text
        |FROM keep GROUP BY doc_id""".stripMargin,
    // boilerplate removal: chunks appearing in >= 3 DISTINCT docs are
    // dropped from every doc (vs dedup_spans, where the first survives)
    "text_boilerplate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |chunks AS (
        |  SELECT doc_id, u.i AS chunk_ord,
        |         array_to_string(l[(u.i*10+1):(u.i*10+10)], ' ') AS chunk
        |  FROM toks, unnest(range(0, CAST(ceil(len(l)/10.0) AS BIGINT))) AS u(i)),
        |freq AS (SELECT chunk, count(DISTINCT doc_id) AS df
        |         FROM chunks GROUP BY 1),
        |kept AS (SELECT c.doc_id, c.chunk_ord, c.chunk
        |         FROM chunks c JOIN freq f ON c.chunk = f.chunk
        |         WHERE f.df < 3)
        |SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_ord) AS text
        |FROM kept GROUP BY doc_id""".stripMargin,
    // incremental span dedup == the FULL span dedup restricted to the
    // batch slice (ids are ordered corpus-before-batch, so first-occurrence
    // semantics agree) — a strictly stronger oracle than the rows-only
    // checks the rest of the store family gets
    "dedup_spans_incremental" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |chunks AS (
        |  SELECT doc_id, u.i AS chunk_ord,
        |         array_to_string(l[(u.i*10+1):(u.i*10+10)], ' ') AS chunk
        |  FROM toks, unnest(range(0, CAST(ceil(len(l)/10.0) AS BIGINT))) AS u(i)),
        |keep AS (
        |  SELECT doc_id, chunk_ord, chunk FROM (
        |    SELECT *, row_number() OVER (PARTITION BY chunk
        |               ORDER BY doc_id, chunk_ord) AS rn
        |    FROM chunks) t WHERE rn = 1)
        |SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_ord) AS text
        |FROM keep WHERE doc_id >= 300 GROUP BY doc_id""".stripMargin,
    // snapshot diff: map-side content hashes, one full-outer key join
    "corpus_diff" ->
      """WITH prev AS (SELECT doc_id, md5(text) AS h FROM documents),
        |nxt AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, md5(text) FROM documents WHERE doc_id < 10)
        |SELECT coalesce(prev.doc_id, nxt.doc_id) AS doc_id,
        |  CASE WHEN prev.h IS NULL THEN 'added'
        |       WHEN nxt.h IS NULL THEN 'removed'
        |       WHEN prev.h <> nxt.h THEN 'changed' END AS status
        |FROM prev FULL OUTER JOIN nxt ON prev.doc_id = nxt.doc_id
        |WHERE prev.h IS NULL OR nxt.h IS NULL OR prev.h <> nxt.h""".stripMargin,
    // the diff rolled to (status, lang) with token deltas; tokens from
    // the side that defines the change (new for added/changed, old for
    // removed); exact integers only
    "corpus_diff_report" ->
      s"""WITH prev AS (
         |  SELECT doc_id, md5(text) AS h, lang, len($tokSql) AS t
         |  FROM documents),
         |nxt AS (
         |  SELECT doc_id,
         |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS h,
         |    lang,
         |    len(${tokSqlOf(
              "CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END")}) AS t
         |  FROM documents WHERE doc_id % 7 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, md5(text), lang, len($tokSql)
         |  FROM documents WHERE doc_id < 10),
         |j AS (
         |  SELECT
         |    CASE WHEN p.h IS NULL THEN 'added'
         |         WHEN n.h IS NULL THEN 'removed'
         |         WHEN p.h <> n.h THEN 'changed' END AS status,
         |    coalesce(n.lang, p.lang) AS lang,
         |    CASE WHEN p.h IS NULL OR p.h <> n.h THEN n.t ELSE p.t END AS t
         |  FROM prev p FULL OUTER JOIN nxt n ON p.doc_id = n.doc_id
         |  WHERE p.h IS NULL OR n.h IS NULL OR p.h <> n.h)
         |SELECT status, lang, count(*) AS n_docs,
         |  CAST(sum(t) AS BIGINT) AS n_tokens
         |FROM j GROUP BY 1, 2""".stripMargin,
    "q_top_customers" ->
      """SELECT c_custkey, c_name, n_orders, total_spent FROM (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
        |  FROM orders GROUP BY o_custkey
        |) j JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q14_promo_share" ->
      s"""SELECT
         |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $discPriceSql
         |           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS total_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin,
    "q_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // Kaplan–Meier: week grid = observed exit weeks only; counts exact
    // integers, survival = exp(Σ ln(1−h)) over the week-ordered window
    // (identical summation order both engines) with the h=1 zero guard
    "q_customer_survival" ->
      """WITH us AS (
        |  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS fd,
        |    max(CAST(o_orderdate AS DATE)) AS ld
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(ld) AS md FROM us),
        |ex AS (
        |  SELECT CAST(date_diff('day', fd, ld) // 7 AS INT) AS week,
        |    sum(CASE WHEN date_diff('day', ld, (SELECT md FROM mx)) > 90
        |        THEN 1 ELSE 0 END)::BIGINT AS n_churned,
        |    sum(CASE WHEN date_diff('day', ld, (SELECT md FROM mx)) > 90
        |        THEN 0 ELSE 1 END)::BIGINT AS n_censored
        |  FROM us GROUP BY 1),
        |km AS (
        |  SELECT week, n_churned, n_censored,
        |    CAST(sum(n_churned + n_censored) OVER ()
        |      - coalesce(sum(n_churned + n_censored) OVER (ORDER BY week
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM ex)
        |SELECT week, n_risk, n_churned, n_censored,
        |  round(CAST(n_churned AS DOUBLE) / n_risk, 4) AS hazard,
        |  round(CASE WHEN min(1.0 - CAST(n_churned AS DOUBLE) / n_risk)
        |      OVER (ORDER BY week) = 0.0 THEN 0.0
        |    ELSE exp(sum(ln(1.0 - CAST(n_churned AS DOUBLE) / n_risk))
        |      OVER (ORDER BY week)) END, 4) AS survival
        |FROM km""".stripMargin,
    "q_retention" ->
      """WITH m AS (SELECT DISTINCT user_id,
        |             CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        |           FROM events)
        |SELECT a.wk AS cohort_week, count(*) AS n_retained
        |FROM m a JOIN m b
        |  ON a.user_id = b.user_id AND b.wk = a.wk + INTERVAL 7 DAY
        |GROUP BY 1""".stripMargin,
    // cohort triangle: week boundaries align (both engines truncate to
    // ISO Monday), so datediff is an exact multiple of 7; rate = ratio
    // of two exact distinct counts, rounded 4dp
    "q_retention_matrix" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |               CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        |             FROM events),
        |coh AS (SELECT user_id, min(wk) AS cw FROM act GROUP BY 1),
        |m AS (
        |  SELECT c.cw AS cohort_week,
        |    CAST(datediff('day', CAST(c.cw AS DATE), CAST(a.wk AS DATE)) // 7
        |      AS INT) AS week_n,
        |    count(DISTINCT a.user_id) AS n_users
        |  FROM act a JOIN coh c USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_n, n_users,
        |  round(CAST(n_users AS DOUBLE) /
        |    max(CASE WHEN week_n = 0 THEN n_users END)
        |      OVER (PARTITION BY cohort_week), 4) AS retention_rate
        |FROM m""".stripMargin,
    "q_user_sessions" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(new_session) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM (
        |    SELECT user_id, ts,
        |      lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        |    FROM events
        |  ) w
        |) g GROUP BY user_id""".stripMargin,
    // first-order transition matrix: lag window then a tiny normalize
    // window over the |types|² frame; p = exact count ratio 4dp
    "events_transitions" ->
      """WITH t AS (
        |  SELECT prev_type, event_type AS next_type FROM (
        |    SELECT event_type,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |        AS prev_type
        |    FROM events) w
        |  WHERE prev_type IS NOT NULL),
        |c AS (SELECT prev_type, next_type, count(*) AS n FROM t GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 4)
        |    AS p
        |FROM c""".stripMargin,
    // RANGE-framed trailing week over the daily frame: calendar gaps
    // contribute nothing (the frame is value-based, not row-based);
    // decimal accumulation, double at the boundary
    "q_rolling_revenue" ->
      """WITH d AS (
        |  SELECT o_orderdate,
        |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
        |  FROM orders GROUP BY 1)
        |SELECT o_orderdate, CAST(rev_dec AS DOUBLE) AS day_rev,
        |  CAST(sum(rev_dec) OVER (
        |    ORDER BY date_diff('day', DATE '1990-01-01',
        |                       CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
        |FROM d""".stripMargin,
    // Pareto deciles by ntile over (rev DESC, custkey) — total order,
    // exact DECIMAL sums, shares 4dp, cum over the 10-row frame
    "q_revenue_concentration" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        |  FROM orders GROUP BY 1),
        |r AS (SELECT o_custkey, rev,
        |        ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
        |      FROM pc),
        |d AS (SELECT decile, count(*) AS n_customers,
        |        sum(rev) AS rev_dec FROM r GROUP BY 1),
        |t AS (SELECT sum(rev_dec) AS tot FROM d)
        |SELECT decile, n_customers,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  round(CAST(rev_dec AS DOUBLE) / CAST(tot AS DOUBLE), 4)
        |    AS rev_share,
        |  round(CAST(sum(rev_dec) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
        |    CAST(tot AS DOUBLE), 4) AS cum_share
        |FROM d, t""".stripMargin,
    // market-basket lift over within-order part pairs; exact counts,
    // lift 4dp before the total-order rank, min-support 3
    "q_basket_pairs" ->
      """WITH l AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |           FROM lineitem),
        |p AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_both
        |      FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |m AS (SELECT pk, count(*) AS n FROM l GROUP BY 1),
        |t AS (SELECT count(DISTINCT ok) AS n_orders FROM l)
        |SELECT part_a, part_b, n_both,
        |  round(CAST(n_both AS DOUBLE) * t.n_orders /
        |    (CAST(ma.n AS DOUBLE) * mb.n), 4) AS lift
        |FROM p JOIN m ma ON p.part_a = ma.pk
        |       JOIN m mb ON p.part_b = mb.pk, t
        |ORDER BY lift DESC, part_a, part_b LIMIT 50""".stripMargin,
    // directional rules: both directions of each min-support pair;
    // support/confidence/lift exact-integer ratios 4dp before the
    // total-order rank
    "q_basket_rules" ->
      """WITH l AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |           FROM lineitem),
        |p AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_both
        |      FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |r AS (SELECT pa AS antecedent, pb AS consequent, n_both FROM p
        |      UNION ALL
        |      SELECT pb, pa, n_both FROM p),
        |m AS (SELECT pk, count(*) AS n FROM l GROUP BY 1),
        |t AS (SELECT count(DISTINCT ok) AS n_orders FROM l)
        |SELECT antecedent, consequent, n_both,
        |  round(CAST(n_both AS DOUBLE) / t.n_orders, 4) AS support,
        |  round(CAST(n_both AS DOUBLE) / ma.n, 4) AS confidence,
        |  round(CAST(n_both AS DOUBLE) * t.n_orders /
        |    (CAST(ma.n AS DOUBLE) * mb.n), 4) AS lift
        |FROM r JOIN m ma ON r.antecedent = ma.pk
        |       JOIN m mb ON r.consequent = mb.pk, t
        |ORDER BY confidence DESC, lift DESC, antecedent, consequent
        |LIMIT 50""".stripMargin,
    // hourly burst z vs the trailing 24 observed hours; mean/var from
    // the window's INTEGER sums so both engines share the arithmetic
    "events_burst" ->
      """WITH h AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |    event_type, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT hour, event_type, n_events,
        |    count(n_events) OVER w AS b_cnt,
        |    sum(n_events) OVER w AS b_sum,
        |    sum(n_events * n_events) OVER w AS b_sum2
        |  FROM h
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT hour, event_type, n_events, b_cnt,
        |    CAST(b_sum AS DOUBLE) / b_cnt AS mean,
        |    (CAST(b_sum2 AS DOUBLE) * b_cnt -
        |     CAST(b_sum AS DOUBLE) * b_sum) /
        |      (CAST(b_cnt AS DOUBLE) * b_cnt) AS var
        |  FROM s)
        |SELECT hour, event_type, n_events,
        |  CASE WHEN b_cnt >= 12 THEN round(mean, 4) ELSE -1.0 END
        |    AS baseline_mean,
        |  CASE WHEN b_cnt >= 12
        |       THEN round((n_events - mean) / greatest(sqrt(var), 1.0), 4)
        |       ELSE 0.0 END AS z,
        |  CASE WHEN b_cnt >= 12
        |       THEN round((n_events - mean) / greatest(sqrt(var), 1.0), 4)
        |            >= 3.0
        |       ELSE FALSE END AS is_burst
        |FROM z""".stripMargin,
    // DAU/WAU/stickiness: trailing-7-day distinct via the explode-to-
    // target-day trick (generate_series mirrors sequence); integer day
    // index, exact-int ratio 4dp; activity days only (inner join)
    "events_dau_wau" ->
      """WITH du AS (
        |  SELECT DISTINCT
        |    date_diff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS day_n,
        |    user_id
        |  FROM events),
        |dau AS (SELECT day_n, count(*) AS dau FROM du GROUP BY 1),
        |wau AS (
        |  SELECT g.target_day AS day_n, count(DISTINCT user_id) AS wau
        |  FROM du, unnest(generate_series(du.day_n, du.day_n + 6))
        |    AS g(target_day)
        |  GROUP BY 1)
        |SELECT d.day_n, d.dau, w.wau,
        |  round(CAST(d.dau AS DOUBLE) / w.wau, 4) AS stickiness
        |FROM dau d JOIN wau w ON d.day_n = w.day_n""".stripMargin,
    // top-20 3-step journeys: two leads over the per-user time order,
    // exact counts, total (count DESC, steps ASC) order at the cut
    "events_paths" ->
      """WITH t AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER w AS step2,
        |    lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT step1, step2, step3, count(*) AS n_paths
        |FROM t WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, step1, step2, step3 LIMIT 20""".stripMargin,
    // seasonality heatmap: ISO weekday × hour cells (Spark weekday+1 ==
    // DuckDB isodow), exact ints + DECIMAL sum, share over the tiny frame
    "events_seasonality" ->
      """WITH c AS (
        |  SELECT isodow(ts) AS iso_dow, hour(ts) AS hod,
        |    count(*) AS n_events,
        |    count(DISTINCT user_id) AS n_users,
        |    CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2)
        |SELECT iso_dow, hod, n_events, n_users, sum_value,
        |  round(CAST(n_events AS DOUBLE) / sum(n_events) OVER (), 4) AS share
        |FROM c""".stripMargin,
    // YoY growth over the |years| frame; exact DECIMAL year sums, growth
    // divides their DOUBLE casts and rounds 4dp; first year 0.0 sentinel
    "q_growth_yoy" ->
      """WITH y AS (
        |  SELECT year(o_orderdate) AS yr,
        |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT yr, n_orders, CAST(rev_dec AS DOUBLE) AS revenue,
        |  coalesce(round(CAST(rev_dec AS DOUBLE) /
        |    CAST(lag(rev_dec) OVER (ORDER BY yr) AS DOUBLE) - 1.0, 4), 0.0)
        |    AS yoy_growth
        |FROM y""".stripMargin,
    // cumulative adoption: first-seen day per user (one agg), daily new
    // counts, running total + share over the |days| frame only
    "events_new_users" ->
      """WITH fs AS (
        |  SELECT user_id,
        |    min(date_diff('day', DATE '1990-01-01', CAST(ts AS DATE)))
        |      AS first_day
        |  FROM events GROUP BY 1),
        |d AS (SELECT first_day AS day_n, count(*) AS new_users
        |      FROM fs GROUP BY 1)
        |SELECT day_n, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day_n) AS BIGINT) AS cum_users,
        |  round(CAST(sum(new_users) OVER (ORDER BY day_n) AS DOUBLE) /
        |        CAST(sum(new_users) OVER () AS DOUBLE), 4) AS adoption
        |FROM d""".stripMargin,
    // purchase cadence: mean gap derives from span/(n-1) (no lag
    // needed), max gap from the ordered diff; repeat customers only
    "q_order_gaps" ->
      """WITH g AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
        |    date_diff('day',
        |      lag(CAST(o_orderdate AS DATE))
        |        OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
        |      CAST(o_orderdate AS DATE)) AS gap
        |  FROM orders)
        |SELECT o_custkey, count(*) AS n_orders,
        |  CAST(date_diff('day', min(od), max(od)) AS BIGINT) AS span_days,
        |  round(CAST(date_diff('day', min(od), max(od)) AS DOUBLE) /
        |        (count(*) - 1), 4) AS mean_gap_days,
        |  CAST(max(gap) AS BIGINT) AS max_gap_days
        |FROM g GROUP BY 1 HAVING count(*) >= 2""".stripMargin,
    // cohort LTV: the retention-matrix cohorts monetized — DECIMAL
    // revenue cells, cumulative over the matrix frame, per-member 4dp
    "q_cohort_ltv" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |               CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        |             FROM events),
        |coh AS (SELECT user_id, min(wk) AS cw FROM act GROUP BY 1),
        |sz AS (SELECT cw, count(*) AS n_cohort_users FROM coh GROUP BY 1),
        |cells AS (
        |  SELECT c.cw AS cohort_week,
        |    CAST(datediff('day', CAST(c.cw AS DATE),
        |      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT)
        |      AS week_n,
        |    sum(CAST(e.value AS DECIMAL(12,2))) AS rev_dec
        |  FROM events e JOIN coh c USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort_week, week_n, rev_dec,
        |    sum(rev_dec) OVER (PARTITION BY cohort_week ORDER BY week_n)
        |      AS cum_dec
        |  FROM cells)
        |SELECT m.cohort_week, m.week_n,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(cum_dec AS DOUBLE) AS cum_revenue,
        |  sz.n_cohort_users,
        |  round(CAST(cum_dec AS DOUBLE) / sz.n_cohort_users, 4)
        |    AS ltv_per_user
        |FROM cum m JOIN sz ON m.cohort_week = sz.cw""".stripMargin,
    // bot cadence profile: integer-second gaps, CV from integer sums
    // through one shared IEEE tree (the events_burst convention)
    "events_bot_profile" -> {
      val cv = """CASE WHEN ng > 0 AND sg > 0
                 |    THEN round(sqrt((CAST(ng AS DOUBLE) * CAST(sg2 AS DOUBLE)
                 |           - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) /
                 |          (CAST(ng AS DOUBLE) * CAST(ng AS DOUBLE))) /
                 |         (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)), 4)
                 |    ELSE 0.0 END""".stripMargin
      s"""WITH g AS (
         |  SELECT user_id, ts,
         |    (epoch_us(ts) - epoch_us(lag(ts) OVER
         |      (PARTITION BY user_id ORDER BY ts, event_id))) // 1000000
         |      AS gap
         |  FROM events),
         |a AS (
         |  SELECT user_id, count(*) AS n_events,
         |    (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS span_sec,
         |    count(gap) AS ng, sum(gap) AS sg, sum(gap * gap) AS sg2
         |  FROM g GROUP BY 1)
         |SELECT user_id, n_events, CAST(span_sec AS BIGINT) AS span_sec,
         |  CASE WHEN span_sec > 0
         |    THEN round(CAST(n_events AS DOUBLE) * 3600.0 /
         |               CAST(span_sec AS DOUBLE), 4)
         |    ELSE 0.0 END AS rate_per_hour,
         |  $cv AS gap_cv,
         |  n_events >= 20 AND $cv <= 0.2 AS is_bot
         |FROM a WHERE n_events >= 2""".stripMargin
    },
    // fulfillment-lag distribution off the count grid: exact lower
    // median = first lag with cum >= ceil(n/2); mean an exact-int ratio
    "q_fulfillment_lag" ->
      """WITH grid AS (
        |  SELECT o_orderpriority,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |                   CAST(l_shipdate AS DATE)) AS BIGINT) AS lag,
        |    count(*) AS cnt
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT o_orderpriority, lag, cnt,
        |    sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY lag) AS cum,
        |    sum(cnt) OVER (PARTITION BY o_orderpriority) AS n_lines,
        |    sum(lag * cnt) OVER (PARTITION BY o_orderpriority) AS lag_sum,
        |    min(lag) OVER (PARTITION BY o_orderpriority) AS min_lag,
        |    max(lag) OVER (PARTITION BY o_orderpriority) AS max_lag
        |  FROM grid)
        |SELECT o_orderpriority,
        |  CAST(min(n_lines) AS BIGINT) AS n_lines,
        |  round(CAST(min(lag_sum) AS DOUBLE) / CAST(min(n_lines) AS DOUBLE), 4)
        |    AS mean_lag_days,
        |  min(lag) AS median_lag_days,
        |  CAST(min(min_lag) AS BIGINT) AS min_lag_days,
        |  CAST(min(max_lag) AS BIGINT) AS max_lag_days
        |FROM g WHERE cum >= (n_lines + 1) // 2
        |GROUP BY 1""".stripMargin,
    // weekly growth accounting: distinct (user, week) → status lag →
    // week-dimension rollup + churn lag; integers, guarded quick ratio
    "events_lifecycle" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ms(ts) // 1000 // 604800 AS week
        |  FROM events),
        |st AS (
        |  SELECT week,
        |    CASE WHEN prev IS NULL THEN 'new'
        |         WHEN prev = week - 1 THEN 'retained'
        |         ELSE 'resurrected' END AS status
        |  FROM (SELECT week, lag(week) OVER (
        |          PARTITION BY user_id ORDER BY week) AS prev
        |        FROM act)),
        |weekly AS (
        |  SELECT week, count(*) AS n_active,
        |    CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new,
        |    CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_resurrected
        |  FROM st GROUP BY 1),
        |fin AS (
        |  SELECT week, n_active, n_new, n_retained, n_resurrected,
        |    CASE WHEN lag(week) OVER (ORDER BY week) = week - 1
        |      THEN lag(n_active) OVER (ORDER BY week) - n_retained
        |      ELSE coalesce(lag(n_active) OVER (ORDER BY week), 0)
        |      END AS n_churned
        |  FROM weekly)
        |SELECT week, n_active, n_new, n_retained, n_resurrected,
        |  n_churned,
        |  CASE WHEN n_churned > 0
        |    THEN round(CAST(n_new + n_resurrected AS DOUBLE)
        |      / n_churned, 4)
        |    ELSE 0.0 END AS quick_ratio
        |FROM fin""".stripMargin,
    // stationary distribution: transition counts -> row-stochastic P
    // (dangling rows uniform) -> 20 power steps; list_sum's sequential
    // order matches the driver loop's left-to-right sums exactly
    "events_markov_stationary" ->
      """WITH RECURSIVE tr AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev,
        |         event_type AS nxt
        |  FROM events),
        |cnt AS (SELECT prev, nxt, CAST(count(*) AS BIGINT) AS n
        |        FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2),
        |ty AS (SELECT t, CAST(row_number() OVER (ORDER BY t) AS INTEGER)
        |           AS r
        |       FROM (SELECT DISTINCT prev AS t FROM cnt
        |             UNION SELECT DISTINCT nxt FROM cnt)),
        |mm AS (SELECT CAST(count(*) AS INTEGER) AS m FROM ty),
        |rt AS (SELECT ty.t, ty.r,
        |         CAST(coalesce((SELECT sum(n) FROM cnt
        |                        WHERE prev = ty.t), 0) AS BIGINT) AS tot
        |       FROM ty),
        |pm AS (SELECT list(p ORDER BY j, k) AS pf FROM (
        |        SELECT a.r AS j, b.r AS k,
        |          CASE WHEN ra.tot = 0
        |               THEN 1.0 / mm.m
        |               ELSE CAST(coalesce((SELECT n FROM cnt
        |                     WHERE prev = a.t AND nxt = b.t), 0) AS DOUBLE)
        |                 / ra.tot END AS p
        |        FROM ty a, ty b, rt ra, mm WHERE ra.t = a.t)),
        |state(it, pi) AS (
        |  SELECT 0,
        |    (SELECT list(1.0 / (SELECT CAST(m AS DOUBLE) FROM mm)) FROM ty)
        |  UNION ALL
        |  SELECT st.it + 1,
        |    list_transform(generate_series(1, ms.m),
        |      k -> list_sum(list_transform(generate_series(1, ms.m),
        |             j -> st.pi[j] * pm.pf[(j - 1) * ms.m + k])))
        |  FROM state st, pm, mm ms WHERE st.it < 20),
        |fin AS (SELECT pi FROM state WHERE it = 20)
        |SELECT rt.t AS event_type, rt.tot AS n_transitions_out,
        |  round(fin.pi[rt.r], 4) AS stationary_prob,
        |  round(CAST(rt.tot AS DOUBLE)
        |    / (SELECT sum(tot) FROM rt), 4) AS outflow_share
        |FROM rt, fin""".stripMargin,
    // DAU over a dense day spine; MAU via bounded 30x cover explode —
    // no cumulative-distinct window, no day-by-user range join
    "events_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS di
        |  FROM events),
        |dau AS (SELECT di, CAST(count(*) AS BIGINT) AS dau
        |        FROM ud GROUP BY 1),
        |b AS (SELECT min(di) AS d0, max(di) AS d1 FROM ud),
        |cover AS (SELECT user_id, di + g.i AS di
        |          FROM ud, unnest(generate_series(0, 29)) AS g(i)),
        |mau AS (SELECT c.di,
        |          CAST(count(DISTINCT c.user_id) AS BIGINT) AS mau
        |        FROM cover c, b WHERE c.di <= b.d1 GROUP BY 1),
        |spine AS (SELECT g.di
        |          FROM b, unnest(generate_series(b.d0, b.d1)) AS g(di))
        |SELECT DATE '1990-01-01' + to_days(CAST(s.di AS INTEGER)) AS d,
        |  coalesce(dau.dau, 0) AS dau,
        |  coalesce(mau.mau, 0) AS mau,
        |  CASE WHEN coalesce(mau.mau, 0) > 0
        |       THEN round(CAST(coalesce(dau.dau, 0) AS DOUBLE) / mau.mau, 4)
        |       ELSE 0.0 END AS stickiness
        |FROM spine s LEFT JOIN dau ON s.di = dau.di
        |LEFT JOIN mau ON s.di = mau.di""".stripMargin,
    // per-type top-3 users, ties to the smaller id — the GroupTopK
    // operator behind an exact-count aggregate
    "events_group_topk" ->
      """WITH c AS (SELECT event_type, user_id,
        |             CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type, user_id, n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY n DESC, user_id ASC) AS r FROM c) t
        |WHERE r <= 3""".stripMargin,
    // seasonal-naive backtest: dense hour spine from the corpus' own
    // span (missing hours are real zeros), two lags, exact-int MAEs
    // dense-grid ACF: every sum an exact integer, r_k one shared IEEE
    // tree (mu recomputed identically at each occurrence), zero-variance
    // guard, 4dp
    "events_autocorrelation" ->
      """WITH hrs AS (
        |  SELECT epoch_ms(ts) // 1000 // 3600 AS h, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hrs),
        |dense AS (
        |  SELECT g.h, coalesce(hrs.c, 0) AS c
        |  FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM b) g
        |  LEFT JOIN hrs ON g.h = hrs.h),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(c) AS BIGINT) AS s1,
        |          CAST(sum(c * c) AS BIGINT) AS s2 FROM dense),
        |pairs AS (
        |  SELECT l.lag, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(a.c * d.c) AS BIGINT) AS sab,
        |    CAST(sum(a.c) AS BIGINT) AS sa,
        |    CAST(sum(d.c) AS BIGINT) AS sb
        |  FROM (SELECT unnest(generate_series(1, 24)) AS lag) l,
        |    dense a, dense d
        |  WHERE d.h = a.h + l.lag
        |  GROUP BY 1)
        |SELECT CAST(lag AS INTEGER) AS lag, m AS n_pairs,
        |  CASE WHEN CAST(s2 AS DOUBLE)
        |      - n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
        |      <> 0.0
        |    THEN round((CAST(sab AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) / n * sa
        |        - CAST(s1 AS DOUBLE) / n * sb
        |        + m * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
        |      / (CAST(s2 AS DOUBLE)
        |        - n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)),
        |      4)
        |    ELSE 0.0 END AS acf
        |FROM pairs, tot""".stripMargin,
    "events_session_sweep" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_ms(ts) // 1000
        |      - lag(epoch_ms(ts) // 1000) OVER (PARTITION BY user_id
        |        ORDER BY epoch_ms(ts) // 1000, event_id) AS g
        |  FROM events),
        |stats AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
        |      AS n_users,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN g IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_gaps
        |  FROM g),
        |grid AS (SELECT unnest([300, 900, 1800, 3600, 7200]) AS gap_s),
        |b AS (SELECT grid.gap_s,
        |    CAST(sum(CASE WHEN g.g > grid.gap_s THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_breaks
        |  FROM g, grid GROUP BY 1)
        |SELECT CAST(gap_s AS BIGINT) AS gap_s,
        |  n_users + n_breaks AS n_sessions,
        |  round(CAST(n_events AS DOUBLE)
        |    / CAST(n_users + n_breaks AS DOUBLE), 4)
        |    AS avg_events_per_session,
        |  CASE WHEN n_gaps > 0
        |    THEN round(CAST(n_breaks AS DOUBLE) / CAST(n_gaps AS DOUBLE),
        |      4) ELSE 0.0 END AS break_rate
        |FROM b, stats""".stripMargin,
    // Gini over the activity-value histogram: the tie-block identity
    // Σ i·c = c·(m·o + m(m+1)/2) makes both engines rank-free; shares
    // read the block containing rank k with a deterministic partial
    "events_power_users" ->
      """WITH counts AS (
        |  SELECT user_id, count(*) AS c FROM events GROUP BY 1),
        |hist AS (SELECT c, count(*) AS m FROM counts GROUP BY 1),
        |scored AS (
        |  SELECT c, m,
        |    sum(m) OVER w AS cum_u,
        |    sum(c * m) OVER w AS cum_e,
        |    sum(m) OVER w - m AS o
        |  FROM hist
        |  WINDOW w AS (ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT sum(m) AS n, sum(c * m) AS s,
        |    sum(c * (m * o + m * (m + 1) // 2)) AS t
        |  FROM scored),
        |x AS (SELECT scored.*, tot.n, tot.s, tot.t,
        |    greatest(1, tot.n // 100) AS k1,
        |    greatest(1, tot.n // 10) AS k10
        |  FROM scored, tot)
        |SELECT
        |  CAST(max(n) AS BIGINT) AS n_users,
        |  CAST(max(s) AS BIGINT) AS n_events,
        |  round(CAST(2 * max(t) - (max(n) + 1) * max(s) AS DOUBLE)
        |    / (CAST(max(n) AS DOUBLE) * CAST(max(s) AS DOUBLE)), 4)
        |    AS gini,
        |  round(CAST(max(CASE WHEN n - cum_u < k1
        |      THEN (s - cum_e) + least(m, k1 - (n - cum_u)) * c END)
        |      AS DOUBLE) / CAST(max(s) AS DOUBLE), 4) AS top1pct_share,
        |  round(CAST(max(CASE WHEN n - cum_u < k10
        |      THEN (s - cum_e) + least(m, k10 - (n - cum_u)) * c END)
        |      AS DOUBLE) / CAST(max(s) AS DOUBLE), 4) AS top10pct_share
        |FROM x""".stripMargin,
    // binary-segmentation first split over the dense hourly grid; the
    // score tree (s·n − S·t)²/(t·(n−t)·n) is all-double on both sides
    "events_changepoint" ->
      """WITH hrs AS (
        |  SELECT epoch_ms(ts) // 1000 // 3600 AS h, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hrs),
        |dense AS (
        |  SELECT g.h, coalesce(hrs.c, 0) AS c
        |  FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM b) g
        |  LEFT JOIN hrs ON g.h = hrs.h),
        |cum AS (SELECT h, c,
        |    CAST(count(*) OVER w AS BIGINT) AS t,
        |    CAST(sum(c) OVER w AS BIGINT) AS s
        |  FROM dense
        |  WINDOW w AS (ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT CAST(max(t) AS BIGINT) AS n,
        |    CAST(max(s) AS BIGINT) AS stot FROM cum),
        |sc AS (SELECT h, t, s, n, stot,
        |    (CAST(s AS DOUBLE) * CAST(n AS DOUBLE)
        |      - CAST(stot AS DOUBLE) * CAST(t AS DOUBLE)) AS num
        |  FROM cum, tot WHERE t < n),
        |sc2 AS (SELECT *, num * num
        |    / (CAST(t AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))
        |      * CAST(n AS DOUBLE)) AS score
        |  FROM sc),
        |rk AS (SELECT *, row_number() OVER (ORDER BY score DESC, h)
        |    AS rank FROM sc2)
        |SELECT CAST(rank AS INTEGER) AS rank,
        |  (h + 1) * 3600 AS split_epoch_s,
        |  t AS hours_left, n - t AS hours_right,
        |  round(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 4) AS mean_left,
        |  round((CAST(stot AS DOUBLE) - CAST(s AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)), 4) AS mean_right,
        |  round((CAST(stot AS DOUBLE) - CAST(s AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))
        |    - CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 4) AS shift,
        |  round(score, 4) AS score
        |FROM rk WHERE rank <= 5""".stripMargin,
    "events_type_affinity" ->
      """WITH ud AS (SELECT DISTINCT user_id, event_type FROM events),
        |marg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS users
        |  FROM ud GROUP BY 1),
        |nt AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n
        |  FROM ud),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS users_both
        |  FROM ud a JOIN ud b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, ma.users AS users_a, mb.users AS users_b,
        |  users_both,
        |  round(CAST(users_both AS DOUBLE)
        |    / CAST(ma.users + mb.users - users_both AS DOUBLE), 4)
        |    AS jaccard,
        |  round(CAST(users_both AS DOUBLE) * CAST(nt.n AS DOUBLE)
        |    / (CAST(ma.users AS DOUBLE) * CAST(mb.users AS DOUBLE)), 4)
        |    AS lift,
        |  round(ln(CAST(users_both AS DOUBLE) * CAST(nt.n AS DOUBLE)
        |    / (CAST(ma.users AS DOUBLE) * CAST(mb.users AS DOUBLE))), 4)
        |    AS pmi
        |FROM p
        |JOIN marg ma ON ma.event_type = p.type_a
        |JOIN marg mb ON mb.event_type = p.type_b
        |CROSS JOIN nt""".stripMargin,
    "events_user_entropy" ->
      """WITH ut AS (SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clogc
        |  FROM ut GROUP BY 1)
        |SELECT user_id, n_events, n_types,
        |  round(greatest(0.0, ln(CAST(n_events AS DOUBLE))
        |    - clogc / CAST(n_events AS DOUBLE)), 4) AS entropy,
        |  CASE WHEN n_types > 1
        |    THEN round(greatest(0.0, (ln(CAST(n_events AS DOUBLE))
        |      - clogc / CAST(n_events AS DOUBLE))
        |      / ln(CAST(n_types AS DOUBLE))), 4)
        |    ELSE 0.0 END AS norm_entropy
        |FROM u""".stripMargin,
    "q_reorder_rate" ->
      """WITH pco AS (SELECT DISTINCT l_partkey AS partkey,
        |    o_custkey AS custkey, o_orderkey AS orderkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |pb AS (SELECT partkey, custkey, CAST(count(*) AS BIGINT)
        |    AS n_orders
        |  FROM pco GROUP BY 1, 2)
        |SELECT partkey, CAST(count(*) AS BIGINT) AS buyers,
        |  CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS repeat_buyers,
        |  CAST(sum(n_orders) AS BIGINT) AS orders,
        |  CAST(max(n_orders) AS BIGINT) AS max_orders_per_buyer,
        |  round(CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS repeat_rate
        |FROM pb GROUP BY 1""".stripMargin,
    "events_forecast_baseline" ->
      """WITH hourly AS (
        |  SELECT epoch_ms(ts) // 1000 // 3600 AS h, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
        |spine AS (
        |  SELECT t.event_type, g.h
        |  FROM (SELECT DISTINCT event_type FROM hourly) t,
        |    b, unnest(generate_series(b.h0, b.h1)) AS g(h)),
        |dense AS (
        |  SELECT s.event_type, s.h, coalesce(hourly.n, 0) AS n
        |  FROM spine s LEFT JOIN hourly
        |    ON s.event_type = hourly.event_type AND s.h = hourly.h),
        |scored AS (
        |  SELECT event_type, n,
        |    lag(n, 168) OVER (PARTITION BY event_type ORDER BY h)
        |      AS season,
        |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY h)
        |      AS persist
        |  FROM dense),
        |agg AS (
        |  SELECT event_type, count(*) AS n_hours,
        |    CAST(sum(abs(n - season)) AS BIGINT) AS se,
        |    CAST(sum(abs(n - persist)) AS BIGINT) AS pe
        |  FROM scored WHERE season IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_hours,
        |  round(CAST(se AS DOUBLE) / n_hours, 4) AS mae_seasonal,
        |  round(CAST(pe AS DOUBLE) / n_hours, 4) AS mae_persist,
        |  CASE WHEN pe > 0 THEN round(CAST(se AS DOUBLE) / pe, 4)
        |    ELSE 0.0 END AS skill
        |FROM agg""".stripMargin,
    // first/last-touch attribution: one per-user RANGE window over
    // epoch seconds, min/max of a (tsec, event_id, type) struct —
    // event_id totalizes same-second ties on both engines; DECIMAL sums
    "events_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_ms(ts) // 1000 AS tsec
        |  FROM events),
        |t AS (
        |  SELECT event_type, value,
        |    min(CASE WHEN event_type <> 'purchase' THEN
        |      {'tsec': tsec, 'event_id': event_id, 'et': event_type}
        |      END) OVER w AS ft,
        |    max(CASE WHEN event_type <> 'purchase' THEN
        |      {'tsec': tsec, 'event_id': event_id, 'et': event_type}
        |      END) OVER w AS lt
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsec
        |    RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)),
        |c AS (
        |  SELECT coalesce(ft.et, '(direct)') AS first_type,
        |    coalesce(lt.et, '(direct)') AS last_type, value
        |  FROM t WHERE event_type = 'purchase'),
        |f AS (SELECT first_type AS touch_type, count(*) AS first_touch,
        |  sum(CAST(value AS DECIMAL(12,2))) AS fv FROM c GROUP BY 1),
        |l AS (SELECT last_type AS touch_type, count(*) AS last_touch,
        |  sum(CAST(value AS DECIMAL(12,2))) AS lv FROM c GROUP BY 1)
        |SELECT coalesce(f.touch_type, l.touch_type) AS touch_type,
        |  coalesce(first_touch, 0) AS first_touch,
        |  coalesce(last_touch, 0) AS last_touch,
        |  CAST(coalesce(fv, 0) AS DOUBLE) AS first_touch_value,
        |  CAST(coalesce(lv, 0) AS DOUBLE) AS last_touch_value
        |FROM f FULL OUTER JOIN l ON f.touch_type = l.touch_type""".stripMargin,
    // Pearson corr rebuilt from exact integer moment sums — one IEEE
    // expression tree both engines share (native corr() kernels differ
    // in partial order); discount as exact basis points
    "q_discount_effect" ->
      """WITH m AS (
        |  SELECT p_brand, count(*) AS n_lines,
        |    sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
        |    sum(x*x) AS sx2, sum(y*y) AS sy2
        |  FROM (SELECT l_partkey,
        |          CAST(round(l_discount * 100) AS BIGINT) AS x,
        |          CAST(l_quantity AS BIGINT) AS y
        |        FROM lineitem) l
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT p_brand, n_lines,
        |  round(CAST(sx AS DOUBLE) / CAST(n_lines AS DOUBLE), 4)
        |    AS avg_disc_bp,
        |  round(CAST(sy AS DOUBLE) / CAST(n_lines AS DOUBLE), 4) AS avg_qty,
        |  CASE WHEN CAST(n_lines AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |        AND CAST(n_lines AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |    THEN round((CAST(n_lines AS DOUBLE) * CAST(sxy AS DOUBLE)
        |                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      (sqrt(CAST(n_lines AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |       sqrt(CAST(n_lines AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
        |    ELSE 0.0 END AS corr_disc_qty
        |FROM m""".stripMargin,
    // attribution's range window reused for the FIRST touch only;
    // power-of-two minute buckets via bit length (length(bin(x)) − 1),
    // integer-exact on both engines — no floor(log2) boundary rounding
    "events_conversion_lag" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_ms(ts) // 1000 AS tsec
        |  FROM events),
        |t AS (
        |  SELECT event_type, value, tsec,
        |    min(CASE WHEN event_type <> 'purchase' THEN
        |      {'tsec': tsec, 'event_id': event_id}
        |      END) OVER w AS ft
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsec
        |    RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)),
        |c AS (
        |  SELECT value, tsec - ft.tsec AS lag_sec
        |  FROM t WHERE event_type = 'purchase'),
        |b AS (
        |  SELECT value,
        |    CASE WHEN lag_sec IS NULL THEN -1
        |      ELSE CAST(length(bin(greatest(1, lag_sec // 60))) - 1
        |        AS INTEGER) END AS bucket
        |  FROM c),
        |h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_conv,
        |    sum(CAST(value AS DECIMAL(12,2))) AS v
        |  FROM b GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_conv) AS DOUBLE) AS tn FROM h)
        |SELECT bucket,
        |  CASE WHEN bucket = -1 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(pow(2.0, CAST(bucket AS DOUBLE)) AS BIGINT)
        |    END AS lo_min,
        |  n_conv, CAST(v AS DOUBLE) AS conv_value,
        |  round(CAST(n_conv AS DOUBLE) / tn, 4) AS share,
        |  round(CAST(sum(n_conv) OVER (ORDER BY bucket) AS DOUBLE) / tn,
        |    4) AS cum_share
        |FROM h, tot""".stripMargin,
    // KMV overlap in its exact regime (k=512 > sf0.01 user population →
    // sketches complete): the estimators reduce to exact set counts, so
    // the oracle replays them as distinct-set algebra — including the
    // round(round(j,4)·|∪|) arithmetic of est_inter, replicated verbatim
    "sketch_overlap" ->
      """WITH s AS (SELECT DISTINCT event_type, user_id FROM events),
        |n AS (SELECT event_type, count(*) AS n FROM s GROUP BY 1),
        |i AS (SELECT a.event_type AS key_a, b.event_type AS key_b,
        |        count(*) AS ninter
        |      FROM s a JOIN s b ON a.user_id = b.user_id
        |        AND a.event_type < b.event_type
        |      GROUP BY 1, 2),
        |pairs AS (SELECT na.event_type AS key_a, nb.event_type AS key_b,
        |            na.n AS n_a, nb.n AS n_b
        |          FROM n na JOIN n nb ON na.event_type < nb.event_type),
        |j AS (SELECT p.key_a, p.key_b, p.n_a, p.n_b,
        |        coalesce(i.ninter, 0) AS ninter,
        |        p.n_a + p.n_b - coalesce(i.ninter, 0) AS nuni
        |      FROM pairs p LEFT JOIN i
        |        ON p.key_a = i.key_a AND p.key_b = i.key_b)
        |SELECT key_a, key_b, n_a, n_b,
        |  CAST(nuni AS BIGINT) AS est_union,
        |  CAST(round(round(ninter / CAST(nuni AS DOUBLE), 4) * nuni)
        |    AS BIGINT) AS est_inter,
        |  round(ninter / CAST(nuni AS DOUBLE), 4) AS jaccard_est
        |FROM j""".stripMargin,
    // RFM quintiles: per-user purchase rollup, then three total-ordered
    // ntile windows over the |users| frame; monetary exact DECIMAL
    "events_rfm" ->
      """WITH p AS (SELECT user_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |a AS (SELECT max(ts) AS anchor FROM p),
        |per AS (SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
        |        sum(CAST(value AS DECIMAL(12,2))) AS mon
        |        FROM p GROUP BY 1)
        |SELECT user_id,
        |  date_diff('day', CAST(last_ts AS DATE),
        |            CAST((SELECT anchor FROM a) AS DATE)) AS recency_days,
        |  frequency,
        |  CAST(mon AS DOUBLE) AS monetary,
        |  ntile(5) OVER (ORDER BY last_ts ASC, user_id ASC) AS r_score,
        |  ntile(5) OVER (ORDER BY frequency ASC, user_id ASC) AS f_score,
        |  ntile(5) OVER (ORDER BY mon ASC, user_id ASC) AS m_score
        |FROM per""".stripMargin,
    // session-grain table: the gap flag becomes a session id via a
    // cumulative sum; ties at one ms share a RANGE-framed window value,
    // matching the sessionizer (same-instant events co-session)
    "events_sessions" ->
      """WITH w AS (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ms
        |  FROM events),
        |g AS (
        |  SELECT user_id, ms,
        |    sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms) AS sid
        |  FROM w)
        |SELECT user_id, min(ms) AS start_ms, max(ms) AS end_ms,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,
    // power-of-two activity bands (bit length), band 0 = absent in
    // the half; the matrix rollup is bands², shares by window
    "q_customer_migration" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_orderdate < TIMESTAMP '1998-07-01'
        |      THEN 1 ELSE 2 END AS h,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT o_custkey,
        |    coalesce(max(CASE WHEN h = 1
        |      THEN CAST(length(bin(n)) AS INTEGER) END), 0) AS band_h1,
        |    coalesce(max(CASE WHEN h = 2
        |      THEN CAST(length(bin(n)) AS INTEGER) END), 0) AS band_h2
        |  FROM per GROUP BY 1),
        |g AS (SELECT band_h1, band_h2,
        |    CAST(count(*) AS BIGINT) AS n_customers
        |  FROM m GROUP BY 1, 2)
        |SELECT band_h1, band_h2, n_customers,
        |  round(CAST(n_customers AS DOUBLE)
        |    / CAST(sum(n_customers) OVER () AS DOUBLE), 4) AS share,
        |  band_h2 > band_h1 AS upgraded,
        |  band_h2 = 0 AS churned
        |FROM g""".stripMargin,
    // Fano factor over the dense hour grid without a spine: zeros
    // contribute nothing to the moments, only the span matters
    "events_dispersion" ->
      """WITH th AS (
        |  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT max(h) - min(h) + 1 AS n_hours FROM th)
        |SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
        |  CAST(count(*) AS BIGINT) AS active_hours,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  round(CAST(sum(n) AS DOUBLE) / CAST(n_hours AS DOUBLE), 4)
        |    AS mean_per_hour,
        |  round((CAST(n_hours AS DOUBLE) * CAST(sum(n * n) AS DOUBLE)
        |    - CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE))
        |    / (CAST(n_hours AS DOUBLE) * CAST(n_hours AS DOUBLE)), 4)
        |    AS variance,
        |  round((CAST(n_hours AS DOUBLE) * CAST(sum(n * n) AS DOUBLE)
        |    - CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE))
        |    / (CAST(n_hours AS DOUBLE) * CAST(sum(n) AS DOUBLE)), 4)
        |    AS fano
        |FROM th, sp GROUP BY event_type, n_hours""".stripMargin,
    // cell-counted seasonal index (partial years divide by their own
    // cell counts); DECIMAL revenue, one index tree 4dp
    "q_seasonal_index" ->
      """WITH ym AS (
        |  SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        |  FROM orders GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(sum(rev) AS DOUBLE) AS trev,
        |    CAST(count(*) AS BIGINT) AS cells
        |  FROM ym)
        |SELECT m AS month, CAST(count(*) AS BIGINT) AS n_years,
        |  CAST(sum(n) AS BIGINT) AS n_orders,
        |  CAST(sum(rev) AS DOUBLE) AS revenue,
        |  round((CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    / (CAST(tn AS DOUBLE) / CAST(cells AS DOUBLE)), 4)
        |    AS count_index,
        |  round((CAST(sum(rev) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    / (trev / CAST(cells AS DOUBLE)), 4) AS revenue_index
        |FROM ym, tot GROUP BY m, tn, trev, cells""".stripMargin,
    // epoch-folding chi2 = T*Q/N - N holds on the SPARSE phase frame
    // (absent cells add nothing to Q); integer moments, one tree 4dp
    "events_periodicity" ->
      """WITH th AS (
        |  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT event_type, CAST(p.period_h AS BIGINT) AS period_h,
        |    CAST(h % p.period_h AS BIGINT) AS phi,
        |    CAST(sum(n) AS BIGINT) AS n
        |  FROM th, (VALUES (6), (24), (168)) p(period_h) GROUP BY 1, 2, 3),
        |mx AS (SELECT *,
        |    max(n) OVER (PARTITION BY event_type, period_h) AS mxn
        |  FROM cells)
        |SELECT event_type, period_h,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(count(*) AS BIGINT) AS active_cells,
        |  round(CAST(period_h * sum(n * n) AS DOUBLE)
        |    / CAST(sum(n) AS DOUBLE) - CAST(sum(n) AS DOUBLE), 4) AS chi2,
        |  min(CASE WHEN n = mxn THEN phi END) AS peak_phase,
        |  round(CAST(period_h * max(n) AS DOUBLE)
        |    / CAST(sum(n) AS DOUBLE), 4) AS peak_lift
        |FROM mx GROUP BY event_type, period_h""".stripMargin,
    // outgoing-distribution entropy per state: H = log2(N) - sum c*log2(c)/N
    // (the textEntropy identity in bits); ties on top_next -> lexical min
    "events_transition_entropy" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |cij AS (
        |  SELECT from_type, next_type, CAST(count(*) AS BIGINT) AS c
        |  FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |mx AS (SELECT *, max(c) OVER (PARTITION BY from_type) AS mxc
        |  FROM cij)
        |SELECT from_type, CAST(sum(c) AS BIGINT) AS n_out,
        |  CAST(count(*) AS BIGINT) AS k_next,
        |  round(log2(CAST(sum(c) AS DOUBLE))
        |    - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
        |      / CAST(sum(c) AS DOUBLE), 4) AS entropy_bits,
        |  min(CASE WHEN c = mxc THEN next_type END) AS top_next,
        |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4)
        |    AS top_share
        |FROM mx GROUP BY from_type""".stripMargin,
    // first significant digit read LEXICALLY off the DECIMAL(18,2)
    // rendering (both engines render decimals identically) — no
    // floor(log10) edge cases at powers of ten
    "q_benford_audit" ->
      """WITH raw AS (
        |  SELECT 'o_totalprice' AS measure,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM orders
        |  UNION ALL
        |  SELECT 'l_extendedprice', CAST(l_extendedprice AS DECIMAL(18,2))
        |  FROM lineitem),
        |g AS (
        |  SELECT measure,
        |    CAST(NULLIF(regexp_extract(CAST(v AS VARCHAR), '[1-9]'), '')
        |      AS INT) AS digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM raw GROUP BY 1, 2),
        |t AS (SELECT *, CAST(sum(n) OVER (PARTITION BY measure) AS BIGINT)
        |    AS nn
        |  FROM g WHERE digit IS NOT NULL)
        |SELECT measure, digit, n,
        |  round(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE), 4) AS share,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4)
        |    AS benford_share,
        |  round(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
        |    - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4) AS excess,
        |  round(pow(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
        |    - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2)
        |    * CAST(nn AS DOUBLE)
        |    / log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4) AS chi2_term
        |FROM t""".stripMargin,
    // OLS on EXACT integer moments (discount -> percent 0..10,
    // quantity integer-valued): both engines' streaming corr/regr
    // differ in update algebra, raw moments don't
    "q_price_elasticity" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    CAST(round(l_discount * 100) AS BIGINT) AS x,
        |    CAST(l_quantity AS BIGINT) AS y
        |  FROM lineitem),
        |j AS (SELECT p.p_brand, li.x, li.y
        |  FROM li JOIN part p ON li.l_partkey = p.p_partkey),
        |m AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM j GROUP BY 1),
        |v AS (
        |  SELECT p_brand, n, sx, sy,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS varx,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS vary
        |  FROM m)
        |SELECT p_brand, n AS n_lines,
        |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 4)
        |    AS avg_discount,
        |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 4) AS avg_qty,
        |  CASE WHEN varx = 0 THEN NULL
        |       ELSE round(cov * 100.0 / varx, 4) END AS slope_qty_per_disc,
        |  CASE WHEN varx * vary = 0 THEN NULL
        |       ELSE round(cov / sqrt(varx * vary), 4) END AS corr
        |FROM v""".stripMargin,
    // magnitude bands: DECIMAL revenue, 6-row cumulative window;
    // prices carry cents so floor(log10) never lands on a power of ten
    "q_order_value_bands" ->
      """WITH b AS (
        |  SELECT CAST(floor(log10(o_totalprice)) AS BIGINT) AS band,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS tn,
        |    CAST(sum(rev) AS DOUBLE) AS tr FROM b),
        |c AS (SELECT *, sum(rev) OVER (ORDER BY band) AS cum_rev FROM b)
        |SELECT band, n_orders,
        |  round(CAST(n_orders AS DOUBLE) / CAST(tn AS DOUBLE), 4)
        |    AS share_orders,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  round(CAST(rev AS DOUBLE) / tr, 4) AS share_revenue,
        |  round(CAST(cum_rev AS DOUBLE) / tr, 4) AS cum_revenue_share,
        |  round(CAST(rev AS DOUBLE) / CAST(n_orders AS DOUBLE), 4)
        |    AS avg_value
        |FROM c, t""".stripMargin,
    // HHI over per-nation supplier revenue shares; DECIMAL revenue,
    // share squares summed on the supplier-sized frame only
    "q_supplier_hhi" ->
      s"""WITH bysup AS (
         |  SELECT n.n_name, l.l_suppkey, sum($discPriceSql) AS rev
         |  FROM lineitem l
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  GROUP BY 1, 2),
         |w AS (SELECT *, sum(rev) OVER (PARTITION BY n_name) AS tot
         |  FROM bysup)
         |SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
         |  CAST(sum(rev) AS DOUBLE) AS revenue,
         |  round(sum(pow(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 2)), 4)
         |    AS hhi,
         |  round(1.0
         |    / sum(pow(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 2)), 4)
         |    AS effective_suppliers,
         |  round(CAST(max(rev) AS DOUBLE) / CAST(sum(rev) AS DOUBLE), 4)
         |    AS top_share
         |FROM w GROUP BY n_name""".stripMargin,
    // median/MAD are SELECTED rows (low-median rank over a total
    // order) — the q_median_order construction, never interpolated
    "events_value_outliers" ->
      """WITH e AS (SELECT event_type, event_id, value FROM events
        |  WHERE value IS NOT NULL),
        |m AS (
        |  SELECT event_type, value AS median_value FROM (
        |    SELECT event_type, value,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY value, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM e) WHERE rn = (n + 1) // 2),
        |dv AS (
        |  SELECT e.event_type, e.event_id,
        |    abs(e.value - m.median_value) AS dev, m.median_value
        |  FROM e JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type, dev AS mad FROM (
        |    SELECT event_type, dev,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY dev, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM dv) WHERE rn = (n + 1) // 2)
        |SELECT dv.event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(dv.median_value, 4) AS median_value,
        |  round(md.mad, 4) AS mad,
        |  CAST(sum(CASE WHEN dv.dev > 3.0 * 1.4826 * md.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(CAST(sum(CASE WHEN dv.dev > 3.0 * 1.4826 * md.mad
        |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
        |    AS outlier_share
        |FROM dv JOIN md USING (event_type)
        |GROUP BY dv.event_type, dv.median_value, md.mad""".stripMargin,
    // gaps-and-islands: island key = day - row_number(), constant
    // within a consecutive run; all integer arithmetic
    "events_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |st AS (
        |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len FROM (
        |    SELECT user_id, day,
        |      day - row_number() OVER (PARTITION BY user_id
        |        ORDER BY day) AS grp
        |    FROM days) GROUP BY 1, 2),
        |best AS (
        |  SELECT len AS streak_days, CAST(count(*) AS BIGINT)
        |      AS n_users_best
        |  FROM (SELECT user_id, max(len) AS len FROM st GROUP BY 1)
        |  GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM st),
        |h AS (SELECT len AS streak_days, CAST(count(*) AS BIGINT)
        |    AS n_streaks
        |  FROM st GROUP BY 1)
        |SELECT h.streak_days, h.n_streaks,
        |  coalesce(b.n_users_best, 0) AS n_users_best,
        |  round(CAST(h.n_streaks AS DOUBLE) / CAST(n_total AS DOUBLE), 4)
        |    AS share
        |FROM h LEFT JOIN best b ON h.streak_days = b.streak_days,
        |  tot""".stripMargin,
    // per-type hourly correlation with TOTAL load over active hours;
    // absent cells are (0, load) observations; exact integer moments
    "events_error_load_corr" ->
      """WITH th AS (
        |  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT h, CAST(sum(n) AS BIGINT) AS nt
        |  FROM th GROUP BY 1),
        |ty AS (SELECT DISTINCT event_type FROM th),
        |cells AS (
        |  SELECT ty.event_type, tot.nt AS y, coalesce(th.n, 0) AS x
        |  FROM tot CROSS JOIN ty
        |  LEFT JOIN th ON th.event_type = ty.event_type
        |    AND th.h = tot.h),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM cells GROUP BY 1),
        |v AS (
        |  SELECT event_type, nh, sx, sy,
        |    CAST(nh * sxy - sx * sy AS DOUBLE) AS cov,
        |    CAST(nh * sxx - sx * sx AS DOUBLE) AS varx,
        |    CAST(nh * syy - sy * sy AS DOUBLE) AS vary
        |  FROM m)
        |SELECT event_type, nh AS n_hours, sx AS n_events,
        |  round(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE), 4)
        |    AS load_share,
        |  CASE WHEN varx * vary = 0 THEN NULL
        |       ELSE round(cov / sqrt(varx * vary), 4)
        |  END AS corr_with_load,
        |  CASE WHEN vary = 0 THEN NULL
        |       ELSE round(cov / vary, 4) END AS events_per_load_unit
        |FROM v""".stripMargin,
    // fixed acctbal bands (not quantiles) so the table is comparable
    // across runs; no-order customers stay in their band via LEFT join
    "q_balance_activity" ->
      """WITH cust AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_acctbal < 0 THEN '1_negative'
        |         WHEN c_acctbal < 2500 THEN '2_low'
        |         WHEN c_acctbal < 5000 THEN '3_mid'
        |         WHEN c_acctbal < 7500 THEN '4_high'
        |         ELSE '5_top' END AS band
        |  FROM customer),
        |pc AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT band, CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS n_orders,
        |    sum(coalesce(rev, CAST(0 AS DECIMAL(18,2)))) AS rev
        |  FROM cust LEFT JOIN pc ON c_custkey = o_custkey GROUP BY 1),
        |tot AS (SELECT CAST(sum(rev) AS DOUBLE) AS tr FROM j)
        |SELECT band, n_customers, n_orders,
        |  round(CAST(n_orders AS DOUBLE) / CAST(n_customers AS DOUBLE), 4)
        |    AS orders_per_customer,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  round(CAST(rev AS DOUBLE) / tr, 4) AS revenue_share,
        |  round(CAST(rev AS DOUBLE)
        |    / CAST(greatest(n_orders, 1) AS DOUBLE), 4)
        |    AS avg_order_value
        |FROM j, tot""".stripMargin,
    // min-based windowFunnel: each step within INTERVAL 1 HOUR of the
    // previous step's earliest qualifying time
    "events_window_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, ts FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(ts) AS t2
        |  FROM ev JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts > t1
        |    AND ts <= t1 + INTERVAL 1 HOUR GROUP BY 1),
        |s3 AS (SELECT ev.user_id, min(ts) AS t3
        |  FROM ev JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t2
        |    AND ts <= t2 + INTERVAL 1 HOUR GROUP BY 1),
        |c AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n3)
        |SELECT 1 AS step, 'view' AS step_type, n1 AS n_users,
        |  1.0 AS conv_from_prev, 1.0 AS conv_from_first FROM c
        |UNION ALL
        |SELECT 2, 'click', n2,
        |  round(CAST(n2 AS DOUBLE) / CAST(greatest(n1, 1) AS DOUBLE), 4),
        |  round(CAST(n2 AS DOUBLE) / CAST(greatest(n1, 1) AS DOUBLE), 4)
        |FROM c
        |UNION ALL
        |SELECT 3, 'purchase', n3,
        |  round(CAST(n3 AS DOUBLE) / CAST(greatest(n2, 1) AS DOUBLE), 4),
        |  round(CAST(n3 AS DOUBLE) / CAST(greatest(n1, 1) AS DOUBLE), 4)
        |FROM c""".stripMargin,
    // log2-ms inter-arrival buckets; boundaries are exact powers of two
    // where IEEE log2 is exact on both engines
    "events_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS gap_ms
        |  FROM events),
        |b AS (
        |  SELECT event_type,
        |    CAST(floor(log2(CAST(gap_ms + 1 AS DOUBLE))) AS BIGINT)
        |      AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_gaps
        |  FROM g WHERE gap_ms IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, bucket,
        |  pow(2.0, CAST(bucket AS DOUBLE)) / 1000.0 AS gap_s_lo,
        |  n_gaps,
        |  round(CAST(n_gaps AS DOUBLE)
        |    / CAST(sum(n_gaps) OVER (PARTITION BY event_type) AS DOUBLE),
        |    4) AS share
        |FROM b""".stripMargin,
    // dense-span provisioning profile; p95 is a SELECTED row with zero
    // cells handled by rank arithmetic (rank <= span - active -> 0)
    "events_load_profile" ->
      """WITH th AS (
        |  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT max(h) - min(h) + 1 AS span_hours FROM th),
        |rk AS (
        |  SELECT event_type, n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY n, h) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS active,
        |    sp.span_hours
        |  FROM th, sp),
        |p95 AS (
        |  SELECT event_type,
        |    CASE WHEN CAST(ceil(0.95 * span_hours) AS BIGINT)
        |        <= span_hours - active THEN 0 ELSE n END AS p95_per_hour
        |  FROM rk
        |  WHERE (CAST(ceil(0.95 * span_hours) AS BIGINT)
        |        <= span_hours - active AND rn = 1)
        |    OR rn = CAST(ceil(0.95 * span_hours) AS BIGINT)
        |      - (span_hours - active)),
        |agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS active_hours,
        |    CAST(sum(n) AS BIGINT) AS n_events,
        |    CAST(max(n) AS BIGINT) AS peak_per_hour
        |  FROM th GROUP BY 1)
        |SELECT a.event_type, CAST(sp.span_hours AS BIGINT) AS span_hours,
        |  a.active_hours, a.n_events,
        |  round(CAST(a.n_events AS DOUBLE)
        |    / CAST(sp.span_hours AS DOUBLE), 4) AS mean_per_hour,
        |  CAST(p.p95_per_hour AS BIGINT) AS p95_per_hour,
        |  a.peak_per_hour,
        |  round(CAST(a.peak_per_hour * sp.span_hours AS DOUBLE)
        |    / CAST(a.n_events AS DOUBLE), 4) AS peak_to_mean
        |FROM agg a JOIN p95 p ON a.event_type = p.event_type, sp"""
        .stripMargin,
    // log-linear OLS on exact day-t retention shares, t in 1..14;
    // zero-retention days drop out of the log identically
    "q_retention_halflife" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS d0 FROM days GROUP BY 1),
        |nu AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM f),
        |rt AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS n_active, nu.n_users,
        |    ln(CAST(count(*) AS DOUBLE) / CAST(nu.n_users AS DOUBLE))
        |      AS y
        |  FROM (SELECT d.day - f.d0 AS t
        |        FROM days d JOIN f USING (user_id)
        |        WHERE d.day - f.d0 BETWEEN 1 AND 14), nu
        |  GROUP BY t, nu.n_users),
        |fit AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    sum(CAST(t AS DOUBLE)) AS st, sum(y) AS sy,
        |    sum(CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) AS stt,
        |    sum(CAST(t AS DOUBLE) * y) AS sty,
        |    max(n_users) AS n_users,
        |    max(CASE WHEN t = 1 THEN round(CAST(n_active AS DOUBLE)
        |      / CAST(n_users AS DOUBLE), 4) END) AS r1
        |  FROM rt),
        |s AS (
        |  SELECT n_users, k, r1,
        |    CAST(k AS DOUBLE) * stt - st * st AS denom,
        |    (CAST(k AS DOUBLE) * sty - st * sy)
        |      / (CAST(k AS DOUBLE) * stt - st * st) AS slope
        |  FROM fit)
        |SELECT n_users, k AS n_days_fit, r1,
        |  CASE WHEN denom = 0 THEN NULL
        |       ELSE round(-slope, 4) END AS lambda_per_day,
        |  CASE WHEN denom = 0 OR abs(slope) < 1e-12 THEN NULL
        |       ELSE round(ln(2.0) / -slope, 4) END AS half_life_days
        |FROM s""".stripMargin,
    // exact selected-row percentiles at ranks ceil(q·n) — the values
    // are actual input doubles, identical bits on both engines
    "events_value_percentiles" ->
      """WITH e AS (SELECT event_type, value FROM events
        |           WHERE value IS NOT NULL),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1),
        |r AS (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY value) AS rn
        |      FROM e),
        |q AS (SELECT n.event_type, n.n, qq.q,
        |        CAST(ceil(qq.q * CAST(n.n AS DOUBLE)) AS BIGINT) AS rk
        |      FROM n, (VALUES (0.25), (0.5), (0.75), (0.9), (0.99))
        |        AS qq(q)),
        |s AS (SELECT q.event_type, q.n, q.q, r.value
        |      FROM q JOIN r ON r.event_type = q.event_type
        |        AND r.rn = q.rk)
        |SELECT event_type, n,
        |  max(CASE WHEN q = 0.25 THEN value END) AS p25,
        |  max(CASE WHEN q = 0.5 THEN value END) AS p50,
        |  max(CASE WHEN q = 0.75 THEN value END) AS p75,
        |  max(CASE WHEN q = 0.9 THEN value END) AS p90,
        |  max(CASE WHEN q = 0.99 THEN value END) AS p99
        |FROM s GROUP BY 1, 2""".stripMargin,
    // exact rank-trimmed mean: boundary values at ranks l and n−l+1,
    // DECIMAL accumulation, tie corrections trim exactly l per side
    "events_value_trimmed" ->
      """WITH e AS (SELECT event_type, value FROM events
        |           WHERE value IS NOT NULL),
        |p AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(floor(0.05 * CAST(count(*) AS DOUBLE)) AS BIGINT)
        |          AS l
        |      FROM e GROUP BY 1),
        |r AS (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY value) AS rn
        |      FROM e),
        |b AS (SELECT p.event_type, p.n, p.l,
        |        max(CASE WHEN r.rn = p.l THEN r.value END) AS vlo,
        |        max(CASE WHEN r.rn = p.n - p.l + 1 THEN r.value END)
        |          AS vhi
        |      FROM p JOIN r ON p.event_type = r.event_type
        |      GROUP BY 1, 2, 3),
        |a AS (SELECT e.event_type,
        |        sum(CAST(e.value AS DECIMAL(12,2))) AS s_all,
        |        sum(CASE WHEN e.value < b.vlo
        |              THEN CAST(e.value AS DECIMAL(12,2))
        |              ELSE CAST(0 AS DECIMAL(12,2)) END) AS s_lo,
        |        CAST(count(CASE WHEN e.value < b.vlo THEN 1 END)
        |          AS BIGINT) AS c_lo,
        |        sum(CASE WHEN e.value > b.vhi
        |              THEN CAST(e.value AS DECIMAL(12,2))
        |              ELSE CAST(0 AS DECIMAL(12,2)) END) AS s_hi,
        |        CAST(count(CASE WHEN e.value > b.vhi THEN 1 END)
        |          AS BIGINT) AS c_hi
        |      FROM e JOIN b ON e.event_type = b.event_type
        |      GROUP BY 1)
        |SELECT b.event_type, b.n, b.n - 2 * b.l AS n_trimmed,
        |  round(CAST(s_all AS DOUBLE) / CAST(b.n AS DOUBLE), 4)
        |    AS mean_value,
        |  round(CAST(s_all - s_lo
        |      - (CASE WHEN b.l = 0 THEN CAST(0 AS DECIMAL(12,2))
        |           ELSE CAST(b.vlo AS DECIMAL(12,2)) * (b.l - c_lo) END)
        |      - s_hi
        |      - (CASE WHEN b.l = 0 THEN CAST(0 AS DECIMAL(12,2))
        |           ELSE CAST(b.vhi AS DECIMAL(12,2)) * (b.l - c_hi) END)
        |    AS DOUBLE) / CAST(b.n - 2 * b.l AS DOUBLE), 4)
        |    AS trimmed_mean
        |FROM b JOIN a ON b.event_type = a.event_type""".stripMargin,
    // weighted median = lower median of the weight-expanded multiset:
    // min v whose RANGE-framed cumulative weight reaches (W+1)//2 —
    // ties share the frame total, so the min picks exactly the
    // expanded rank value
    "q_price_weighted_median" ->
      """WITH li AS (SELECT l_returnflag, l_extendedprice AS v,
        |              CAST(l_quantity AS BIGINT) AS w FROM lineitem),
        |t AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
        |        CAST(sum(w) AS BIGINT) AS total_qty FROM li GROUP BY 1),
        |c AS (SELECT l_returnflag, v,
        |        sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS cw,
        |        row_number() OVER (PARTITION BY l_returnflag
        |          ORDER BY v) AS rn
        |      FROM li),
        |wm AS (SELECT c.l_returnflag, min(v) AS wmedian_price
        |       FROM c JOIN t USING (l_returnflag)
        |       WHERE cw >= (total_qty + 1) // 2 GROUP BY 1),
        |um AS (SELECT c.l_returnflag,
        |         max(CASE WHEN rn = (n_lines + 1) // 2 THEN v END)
        |           AS median_price
        |       FROM c JOIN t USING (l_returnflag) GROUP BY 1)
        |SELECT t.l_returnflag, t.n_lines, t.total_qty,
        |  um.median_price, wm.wmedian_price
        |FROM t JOIN um USING (l_returnflag)
        |  JOIN wm USING (l_returnflag)""".stripMargin,
    // winsorized mean: clamp into the SELECTED [p10, p90] boundary
    // values (ceil-rank convention), closed-form clamped sum in
    // DECIMAL off one grouped pass
    "events_value_winsorized" ->
      """WITH e AS (SELECT event_type, value FROM events
        |           WHERE value IS NOT NULL),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1),
        |r AS (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY value) AS rn
        |      FROM e),
        |b AS (SELECT n.event_type, n.n,
        |        max(CASE WHEN r.rn =
        |          CAST(ceil(0.1 * CAST(n.n AS DOUBLE)) AS BIGINT)
        |          THEN r.value END) AS vlo,
        |        max(CASE WHEN r.rn =
        |          CAST(ceil(0.9 * CAST(n.n AS DOUBLE)) AS BIGINT)
        |          THEN r.value END) AS vhi
        |      FROM n JOIN r ON n.event_type = r.event_type
        |      GROUP BY 1, 2),
        |a AS (SELECT e.event_type,
        |        sum(CAST(e.value AS DECIMAL(12,2))) AS s_all,
        |        sum(CASE WHEN e.value < b.vlo
        |              THEN CAST(e.value AS DECIMAL(12,2))
        |              ELSE CAST(0 AS DECIMAL(12,2)) END) AS s_lo,
        |        CAST(count(CASE WHEN e.value < b.vlo THEN 1 END)
        |          AS BIGINT) AS c_lo,
        |        sum(CASE WHEN e.value > b.vhi
        |              THEN CAST(e.value AS DECIMAL(12,2))
        |              ELSE CAST(0 AS DECIMAL(12,2)) END) AS s_hi,
        |        CAST(count(CASE WHEN e.value > b.vhi THEN 1 END)
        |          AS BIGINT) AS c_hi
        |      FROM e JOIN b ON e.event_type = b.event_type
        |      GROUP BY 1)
        |SELECT b.event_type, b.n, b.vlo, b.vhi,
        |  round(CAST(s_all AS DOUBLE) / CAST(b.n AS DOUBLE), 4)
        |    AS mean_value,
        |  round(CAST(s_all - s_lo
        |      + CAST(b.vlo AS DECIMAL(12,2)) * c_lo
        |      - s_hi + CAST(b.vhi AS DECIMAL(12,2)) * c_hi
        |    AS DOUBLE) / CAST(b.n AS DOUBLE), 4) AS winsorized_mean
        |FROM b JOIN a ON b.event_type = a.event_type""".stripMargin,
    // α=½ 20-day EWMA: dyadic weights, bounded significand spread →
    // every partial sum exact, order-independent, engine-identical
    "events_ewma_baseline" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_ms(ts) // 86400000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, max(day) AS maxd FROM daily
        |      GROUP BY 1),
        |h AS (SELECT d.event_type, CAST(count(*) AS BIGINT)
        |        AS days_used,
        |        sum(CAST(d.c AS DOUBLE)
        |          * pow(2.0, CAST(d.day - m.maxd AS DOUBLE))) AS ewma
        |      FROM daily d JOIN m ON d.event_type = m.event_type
        |      WHERE d.day >= m.maxd - 20 AND d.day < m.maxd
        |      GROUP BY 1),
        |l AS (SELECT d.event_type, d.c AS actual_last
        |      FROM daily d JOIN m ON d.event_type = m.event_type
        |        AND d.day = m.maxd)
        |SELECT h.event_type, h.days_used, h.ewma, l.actual_last,
        |  round(CAST(l.actual_last AS DOUBLE) / h.ewma, 4)
        |    AS surge_ratio
        |FROM h JOIN l ON h.event_type = l.event_type""".stripMargin,
    // value-decile bands: nine selected boundary values, band = 1 + #
    // boundaries strictly below (ties land together, unlike ntile)
    "q_order_value_deciles" ->
      """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |             AS cents FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn
        |      FROM o),
        |b AS (SELECT r.cents AS bv
        |      FROM r, n, (VALUES (1), (2), (3), (4), (5), (6), (7),
        |        (8), (9)) AS d(dcl)
        |      WHERE r.rn = CAST(ceil(d.dcl * CAST(n.n AS DOUBLE)
        |        / 10.0) AS BIGINT)),
        |band AS (SELECT o.cents,
        |    1 + (SELECT count(*) FROM b WHERE b.bv < o.cents) AS band
        |  FROM o),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nt,
        |    sum(CAST(cents AS DECIMAL(38,0))) AS rt FROM o)
        |SELECT band, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
        |    / 100, 2) AS revenue,
        |  round(CAST(count(*) AS DOUBLE) / CAST(t.nt AS DOUBLE), 4)
        |    AS order_share,
        |  round(CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
        |    / CAST(t.rt AS DOUBLE), 4) AS revenue_share
        |FROM band, t GROUP BY band, t.nt, t.rt""".stripMargin,
    // session-shape percentiles: the events_sessions CTE + global
    // ceil-rank selection on integer durations and counts
    "events_session_profile" ->
      """WITH w AS (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_ms
        |  FROM events),
        |g AS (
        |  SELECT user_id, ms,
        |    sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms) AS sid
        |  FROM w),
        |s AS (SELECT max(ms) - min(ms) AS dur_ms,
        |        CAST(count(*) AS BIGINT) AS n_events
        |      FROM g GROUP BY user_id, sid),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM s),
        |rd AS (SELECT dur_ms, row_number() OVER (ORDER BY dur_ms) AS rn
        |       FROM s),
        |re AS (SELECT n_events, row_number() OVER (ORDER BY n_events)
        |         AS rn
        |       FROM s),
        |q AS (SELECT qq.q, CAST(ceil(qq.q * CAST(n.n_sessions AS DOUBLE))
        |        AS BIGINT) AS rk
        |      FROM n, (VALUES (0.5), (0.9), (0.99)) AS qq(q))
        |SELECT n.n_sessions,
        |  max(CASE WHEN q.q = 0.5 THEN rd.dur_ms END) AS p50_dur_ms,
        |  max(CASE WHEN q.q = 0.9 THEN rd.dur_ms END) AS p90_dur_ms,
        |  max(CASE WHEN q.q = 0.99 THEN rd.dur_ms END) AS p99_dur_ms,
        |  max(CASE WHEN q.q = 0.5 THEN re.n_events END) AS p50_events,
        |  max(CASE WHEN q.q = 0.9 THEN re.n_events END) AS p90_events,
        |  max(CASE WHEN q.q = 0.99 THEN re.n_events END) AS p99_events
        |FROM n, q
        |JOIN rd ON rd.rn = q.rk
        |JOIN re ON re.rn = q.rk
        |GROUP BY n.n_sessions""".stripMargin,
    // ABC / Pareto: minimal part count covering 80% of brand revenue —
    // integer crossing (5·cum ≥ 4·T in DECIMAL), canonical desc order
    "q_revenue_pareto" ->
      """WITH pr AS (SELECT p.p_brand, l.l_partkey,
        |    CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |r AS (SELECT p_brand, rev,
        |    sum(CAST(rev AS DECIMAL(38,0))) OVER (PARTITION BY p_brand
        |      ORDER BY rev DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY rev DESC, l_partkey) AS rn
        |  FROM pr),
        |t AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
        |    sum(CAST(rev AS DECIMAL(38,0))) AS tt
        |  FROM pr GROUP BY 1),
        |k AS (SELECT r.p_brand, CAST(min(rn) AS BIGINT) AS k
        |  FROM r JOIN t USING (p_brand)
        |  WHERE 5 * cum >= 4 * tt GROUP BY 1)
        |SELECT t.p_brand, t.n_parts,
        |  round(CAST(tt AS DOUBLE) / 100, 2) AS total_revenue,
        |  k.k AS parts_for_80pct,
        |  round(CAST(k.k AS DOUBLE) / CAST(t.n_parts AS DOUBLE), 4)
        |    AS share_of_parts
        |FROM t JOIN k USING (p_brand)""".stripMargin,
    // ship-delay SLA percentiles: datediff over the orderkey fact
    // join, ceil-rank selection on integer days
    "q_ship_delay_profile" ->
      """WITH d AS (SELECT o_orderpriority,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS delay_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |n AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT)
        |        AS n_lines FROM d GROUP BY 1),
        |r AS (SELECT o_orderpriority, delay_days,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY delay_days) AS rn
        |      FROM d),
        |q AS (SELECT n.o_orderpriority, n.n_lines, qq.q,
        |        CAST(ceil(qq.q * CAST(n.n_lines AS DOUBLE)) AS BIGINT)
        |          AS rk
        |      FROM n, (VALUES (0.5), (0.9), (0.99)) AS qq(q)),
        |s AS (SELECT q.o_orderpriority, q.n_lines, q.q, r.delay_days
        |      FROM q JOIN r ON r.o_orderpriority = q.o_orderpriority
        |        AND r.rn = q.rk)
        |SELECT o_orderpriority, n_lines,
        |  max(CASE WHEN q = 0.5 THEN delay_days END) AS p50_days,
        |  max(CASE WHEN q = 0.9 THEN delay_days END) AS p90_days,
        |  max(CASE WHEN q = 0.99 THEN delay_days END) AS p99_days
        |FROM s GROUP BY 1, 2""".stripMargin,
    // WoW top movers: epoch-day÷7 integer weeks (no calendar-week
    // dialect), lag + |Δ|-desc/week-asc row_number cut at 3
    "events_top_movers" ->
      """WITH w AS (SELECT event_type,
        |    (epoch_ms(ts) // 86400000) // 7 AS wk,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, wk, n,
        |        lag(n) OVER (PARTITION BY event_type ORDER BY wk)
        |          AS prev_n
        |      FROM w),
        |d AS (SELECT event_type, wk, n, prev_n, n - prev_n AS delta
        |      FROM p WHERE prev_n IS NOT NULL),
        |r AS (SELECT event_type, wk, n, prev_n, delta,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY abs(delta) DESC, wk) AS rk
        |      FROM d)
        |SELECT event_type, rk, wk, n, prev_n, delta
        |FROM r WHERE rk <= 3""".stripMargin,
    // exact Gini via rank sums: row_number rank-sum ≡ the engine's
    // tie-class closed form (tied rows share the value), DOUBLED so
    // no integer ever divides; DECIMAL(38,0) accumulation both sides
    "q_acctbal_gini" ->
      """WITH c AS (SELECT c_mktsegment,
        |             CAST(round(c_acctbal * 100) AS BIGINT) AS bal
        |           FROM customer WHERE c_acctbal > 0),
        |r AS (SELECT c_mktsegment, bal,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |          ORDER BY bal) AS rn
        |      FROM c),
        |t AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(bal AS DECIMAL(38,0))) AS tot,
        |        sum(CAST(2 * rn AS DECIMAL(38,0))
        |          * CAST(bal AS DECIMAL(38,0))) AS rs2
        |      FROM r GROUP BY 1)
        |SELECT c_mktsegment, n AS n_customers,
        |  round(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE) / 100, 4)
        |    AS mean_bal,
        |  round(CAST(rs2 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
        |    - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE), 4) AS gini
        |FROM t""".stripMargin,
    // activity-concentration Gini over per-user counts — same algebra
    "events_user_gini" ->
      """WITH u AS (SELECT event_type, user_id,
        |             CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, n_events,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY n_events) AS rn
        |      FROM u),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(n_events AS DECIMAL(38,0))) AS tot,
        |        sum(CAST(2 * rn AS DECIMAL(38,0))
        |          * CAST(n_events AS DECIMAL(38,0))) AS rs2
        |      FROM r GROUP BY 1)
        |SELECT event_type, n AS n_users,
        |  round(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE), 4)
        |    AS mean_events,
        |  round(CAST(rs2 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
        |    - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE), 4) AS gini
        |FROM t""".stripMargin,
    // Lorenz deciles: distinct-value prefix frame + tie partial at the
    // ceil-rank boundary — exact DECIMAL mass, DOUBLE only at the edge
    "q_acctbal_lorenz" ->
      """WITH c AS (SELECT c_mktsegment,
        |             CAST(round(c_acctbal * 100) AS BIGINT) AS bal
        |           FROM customer WHERE c_acctbal > 0),
        |v AS (SELECT c_mktsegment, bal, CAST(count(*) AS BIGINT) AS c,
        |        sum(CAST(bal AS DECIMAL(38,0))) AS s
        |      FROM c GROUP BY 1, 2),
        |p AS (SELECT c_mktsegment, bal, c,
        |        coalesce(sum(c) OVER w, 0) AS f,
        |        coalesce(sum(s) OVER w, CAST(0 AS DECIMAL(38,0))) AS sp
        |      FROM v WINDOW w AS (PARTITION BY c_mktsegment
        |        ORDER BY bal
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |t AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(bal AS DECIMAL(38,0))) AS tt
        |      FROM c GROUP BY 1),
        |d AS (SELECT t.c_mktsegment, t.n, t.tt, dd.decile,
        |        CAST(ceil(dd.decile * CAST(t.n AS DOUBLE) / 10.0)
        |          AS BIGINT) AS r
        |      FROM t, (VALUES (1), (2), (3), (4), (5), (6), (7), (8),
        |        (9), (10)) AS dd(decile))
        |SELECT d.c_mktsegment, d.decile,
        |  round(CAST(p.bal AS DOUBLE) / 100, 2) AS bal_at,
        |  round(CAST(p.sp + CAST(p.bal AS DECIMAL(38,0)) * (d.r - p.f)
        |      AS DOUBLE) / CAST(d.tt AS DOUBLE), 4) AS cum_share
        |FROM p JOIN d ON p.c_mktsegment = d.c_mktsegment
        |  AND p.f < d.r AND d.r <= p.f + p.c""".stripMargin,
    // 2-D skyline: per-price max size, kept iff no strictly cheaper
    // price reaches it (NOT EXISTS replay of the prefix-max filter)
    "q_part_skyline" ->
      """WITH pts AS (SELECT
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS price,
        |    p_size, CAST(count(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY 1, 2),
        |m AS (SELECT price, max(p_size) AS ms FROM pts GROUP BY 1),
        |sky AS (SELECT m.price, m.ms FROM m
        |        WHERE NOT EXISTS (SELECT 1 FROM m m2
        |          WHERE m2.price < m.price AND m2.ms >= m.ms))
        |SELECT round(CAST(p.price AS DOUBLE) / 100, 2) AS p_retailprice,
        |  p.p_size, p.n_parts
        |FROM pts p JOIN sky ON p.price = sky.price
        |  AND p.p_size = sky.ms""".stripMargin,
    // referential-integrity audit: one stanza per FK edge, NOT EXISTS
    // both ways, exact-integer shares rounded 4dp
    "q_integrity_audit" -> {
      def edge(nm: String, child: String, ck: String, parent: String,
               pk: String): String =
        s"""SELECT '$nm' AS edge, n_child, n_orphans,
           |  round(CAST(n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE),
           |    4) AS orphan_share,
           |  n_parent, n_childless,
           |  round(CAST(n_childless AS DOUBLE)
           |    / CAST(n_parent AS DOUBLE), 4) AS childless_share
           |FROM (SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child c
           |   WHERE NOT EXISTS (SELECT 1 FROM $parent p
           |                     WHERE p.$pk = c.$ck)) AS n_orphans,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $parent) AS n_parent,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $parent p
           |   WHERE NOT EXISTS (SELECT 1 FROM $child c
           |                     WHERE c.$ck = p.$pk)) AS n_childless)"""
          .stripMargin
      Seq(
        edge("lineitem_orderkey", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edge("orders_custkey", "orders", "o_custkey",
          "customer", "c_custkey"),
        edge("lineitem_partkey", "lineitem", "l_partkey",
          "part", "p_partkey")).mkString("\nUNION ALL\n")
    },
    // exact join-size prediction from the two (key, count) histograms;
    // DECIMAL(38,0) products (self-joins square per-key counts)
    "q_join_cardinality" ->
      """WITH ol_a AS (SELECT o_orderkey AS k,
        |    CAST(count(*) AS BIGINT) AS ca FROM orders GROUP BY 1),
        |ol_b AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cb
        |  FROM lineitem GROUP BY 1),
        |ol_p AS (SELECT k, CAST(ca AS DECIMAL(38,0))
        |    * CAST(cb AS DECIMAL(38,0)) AS pm
        |  FROM ol_a JOIN ol_b USING (k)),
        |ol_t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys_common,
        |  sum(pm) AS est, max(pm) AS mx FROM ol_p),
        |ol_s AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_left,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_right),
        |ol_k AS (SELECT min(k) AS top_key FROM ol_p, ol_t WHERE pm = mx),
        |ll_a AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS ca
        |  FROM lineitem GROUP BY 1),
        |ll_p AS (SELECT k, CAST(ca AS DECIMAL(38,0))
        |    * CAST(ca AS DECIMAL(38,0)) AS pm FROM ll_a),
        |ll_t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys_common,
        |  sum(pm) AS est, max(pm) AS mx FROM ll_p),
        |ll_s AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_left,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_right),
        |ll_k AS (SELECT min(k) AS top_key FROM ll_p, ll_t WHERE pm = mx),
        |ev_a AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS ca
        |  FROM events GROUP BY 1),
        |ev_p AS (SELECT k, CAST(ca AS DECIMAL(38,0))
        |    * CAST(ca AS DECIMAL(38,0)) AS pm FROM ev_a),
        |ev_t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys_common,
        |  sum(pm) AS est, max(pm) AS mx FROM ev_p),
        |ev_s AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_left,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_right),
        |ev_k AS (SELECT min(k) AS top_key FROM ev_p, ev_t WHERE pm = mx)
        |SELECT 'orders_x_lineitem_orderkey' AS join_name, n_left,
        |  n_right, n_keys_common, CAST(est AS DOUBLE) AS est_rows,
        |  round(CAST(est AS DOUBLE)
        |    / CAST(greatest(n_left, n_right) AS DOUBLE), 4)
        |    AS amplification,
        |  top_key,
        |  round(CAST(mx AS DOUBLE) / CAST(est AS DOUBLE), 4)
        |    AS top_key_share
        |FROM ol_t, ol_s, ol_k
        |UNION ALL
        |SELECT 'lineitem_x_lineitem_partkey', n_left, n_right,
        |  n_keys_common, CAST(est AS DOUBLE),
        |  round(CAST(est AS DOUBLE)
        |    / CAST(greatest(n_left, n_right) AS DOUBLE), 4),
        |  top_key,
        |  round(CAST(mx AS DOUBLE) / CAST(est AS DOUBLE), 4)
        |FROM ll_t, ll_s, ll_k
        |UNION ALL
        |SELECT 'events_x_events_user', n_left, n_right, n_keys_common,
        |  CAST(est AS DOUBLE),
        |  round(CAST(est AS DOUBLE)
        |    / CAST(greatest(n_left, n_right) AS DOUBLE), 4),
        |  top_key,
        |  round(CAST(mx AS DOUBLE) / CAST(est AS DOUBLE), 4)
        |FROM ev_t, ev_s, ev_k""".stripMargin,
    // lines-per-order width histogram; DECIMAL revenue
    "q_order_width_profile" ->
      s"""WITH po AS (
         |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS w,
         |    sum($discPriceSql) AS rev
         |  FROM lineitem GROUP BY 1),
         |h AS (SELECT w AS lines_per_order,
         |    CAST(count(*) AS BIGINT) AS n_orders, sum(rev) AS rev
         |  FROM po GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS tn,
         |  CAST(sum(rev) AS DOUBLE) AS tr FROM h)
         |SELECT lines_per_order, n_orders,
         |  round(CAST(n_orders AS DOUBLE) / CAST(tn AS DOUBLE), 4)
         |    AS share,
         |  CAST(rev AS DOUBLE) AS revenue,
         |  round(CAST(rev AS DOUBLE) / tr, 4) AS revenue_share,
         |  round(CAST(rev AS DOUBLE) / CAST(n_orders AS DOUBLE), 4)
         |    AS avg_order_revenue
         |FROM h, tot""".stripMargin,
    // LSH occupancy: expected_pairs = sum b(b-1)/2 per band is the
    // exact candidate-verify cost; DECIMAL(38,0) pair mass
    "lsh_bucket_profile" ->
      s"""WITH $lshCteSql,
         |occ AS (
         |  SELECT tbl, bucket, CAST(count(*) AS BIGINT) AS b
         |  FROM buckets GROUP BY 1, 2)
         |SELECT tbl, CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(sum(b) AS BIGINT) AS n_vecs,
         |  CAST(max(b) AS BIGINT) AS max_size,
         |  CAST(sum(CAST(b AS DECIMAL(38,0))
         |      * CAST(b - 1 AS DECIMAL(38,0))) AS DOUBLE) / 2.0
         |    AS expected_pairs,
         |  round(CAST(max(b) AS DOUBLE) / CAST(sum(b) AS DOUBLE), 4)
         |    AS top_share,
         |  round(CAST(sum(b) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
         |    AS avg_size
         |FROM occ GROUP BY tbl""".stripMargin,
    // panel cosine histogram in 0.1 bands, clamped to [-10, 9]
    "embed_distance_profile" ->
      """WITH pv AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 50),
        |pn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
        |  FROM pv),
        |pb AS (
        |  SELECT greatest(least(CAST(floor(list_dot_product(a.v, b.v)
        |      / (a.nrm * b.nrm) * 10.0) AS BIGINT), 9), -10) AS band
        |  FROM pn a JOIN pn b ON a.vec_id < b.vec_id),
        |h AS (SELECT band, CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM pb GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS tn FROM h),
        |c AS (SELECT *, sum(n_pairs) OVER (ORDER BY band) AS cum FROM h)
        |SELECT band, round(CAST(band AS DOUBLE) / 10.0, 1) AS cos_lo,
        |  n_pairs,
        |  round(CAST(n_pairs AS DOUBLE) / CAST(tn AS DOUBLE), 4)
        |    AS share,
        |  round(CAST(cum AS DOUBLE) / CAST(tn AS DOUBLE), 4) AS cum_share
        |FROM c, tot""".stripMargin,
    // min-label propagation to connected components on the MUTUAL kNN
    // graph (self-loop augmented); FIXED 25-iteration schedule,
    // MATERIALIZED adjacency (knn_kcore rule)
    "knn_components" ->
      s"""WITH RECURSIVE $knnNnSql,
        |$componentsBodySql""".stripMargin,
    // the SAME components body over the LSH-substrate edge frame
    "knn_components_lsh" ->
      s"""WITH RECURSIVE $lshNnSql,
        |$componentsBodySql""".stripMargin,
    // pointer-doubled fixpoint ≡ the converged linear schedule, so the
    // scale variant value-checks against the SAME linear replay
    "knn_components_fast" ->
      s"""WITH RECURSIVE $knnNnSql,
        |$componentsBodySql""".stripMargin,
    // sparse-exact daily mix drift: absent types contribute 0 to KL
    // and q_t to L1, so no dense spine; shared IEEE tree, 4dp
    "events_mix_drift" ->
      """WITH dt AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nt
        |  FROM dt GROUP BY 1),
        |q AS (SELECT event_type,
        |    CAST(nt AS DOUBLE) / CAST((SELECT sum(nt) FROM tt) AS DOUBLE)
        |      AS q
        |  FROM tt),
        |dd AS (SELECT dt.day, dt.event_type, dt.n,
        |    CAST(sum(dt.n) OVER (PARTITION BY dt.day) AS BIGINT) AS nd,
        |    q.q
        |  FROM dt JOIN q ON dt.event_type = q.event_type)
        |SELECT day, CAST(max(nd) AS BIGINT) AS n_events,
        |  round(sum((CAST(n AS DOUBLE) / CAST(nd AS DOUBLE))
        |    * ln((CAST(n AS DOUBLE) / CAST(nd AS DOUBLE)) / q)), 4)
        |    AS kl_nats,
        |  round((sum(abs(CAST(n AS DOUBLE) / CAST(nd AS DOUBLE) - q))
        |    + 1.0 - sum(q)) / 2.0, 4) AS tv_dist,
        |  CAST(count(*) AS BIGINT) AS n_types
        |FROM dd GROUP BY 1""".stripMargin,
    // the sessions CTE exploded to covered hours — interval-stabbing
    // concurrency via generate_series, exact integers only
    "events_concurrency" ->
      """WITH w AS (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ms
        |  FROM events),
        |g AS (
        |  SELECT user_id, ms,
        |    sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms) AS sid
        |  FROM w),
        |s AS (
        |  SELECT min(ms) // 3600000 AS sh, max(ms) // 3600000 AS eh
        |  FROM g GROUP BY user_id, sid),
        |hrs AS (
        |  SELECT sh, eh, t.h FROM s,
        |    unnest(generate_series(sh, eh)) AS t(h))
        |SELECT h * 3600 AS hour_epoch_s,
        |  CAST(count(*) AS BIGINT) AS n_active,
        |  CAST(sum(CASE WHEN h = sh THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_started,
        |  CAST(sum(CASE WHEN h = eh THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ended
        |FROM hrs GROUP BY 1""".stripMargin,
    // top-20 heavy keys with exact counts; share/x_mean are ratios of
    // exact longs rounded 4dp; ceil() is DOUBLE in DuckDB, BIGINT in Spark
    "skew_profile" ->
      """WITH c AS (SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1),
        |st AS (SELECT CAST(sum(n) AS BIGINT) AS tot, count(*) AS nk FROM c),
        |top AS (SELECT k, n FROM c ORDER BY n DESC, k ASC LIMIT 20)
        |SELECT top.k AS user_id, top.n AS n_rows,
        |  round(top.n / st.tot, 4) AS share,
        |  round(top.n * st.nk / st.tot, 4) AS x_mean,
        |  CAST(ceil(top.n * st.nk / st.tot) AS BIGINT) AS salt_buckets
        |FROM top, st""".stripMargin,
    // as-of join: purchases pick the latest STRICTLY earlier click per
    // user. The window mirrors graft.operators.AsofJoin exactly: union
    // both sides, clicks sort AFTER purchases at equal ts (side 2 vs 1 =
    // strict), 1-PRECEDING window reads the last click before this row;
    // event_id in the ordering matches the operator's rightTieCol, so
    // equal-ts clicks resolve identically on both engines.
    // ids/ts as BIGINT with -1 sentinels — NULLs render asymmetrically.
    "events_asof" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'click' THEN 2 ELSE 1 END AS side,
        |    CASE WHEN event_type = 'click' THEN event_id END AS click_id,
        |    value
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), w AS (
        |  SELECT *, last_value(click_id IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, side, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click
        |  FROM tagged
        |)
        |SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, value,
        |  CAST(coalesce(prior_click, -1) AS BIGINT) AS click_event_id
        |FROM w WHERE side = 1""".stripMargin,
    "text_tokens" ->
      s"""SELECT doc_id,
         |  len($tokSql) AS ws_tokens,
         |  len(regexp_extract_all(text, '${TextOps.BpePattern}')) AS bpe_tokens
         |FROM documents""".stripMargin,
    "text_quality" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST(len(text) AS DOUBLE) AS nc,
         |    CAST(len($tokSql) AS DOUBLE) AS nt,
         |    CAST(len(regexp_extract_all(text, '$punctClass')) AS DOUBLE) AS np,
         |    CAST(len(list_filter($tokSql,
         |      t -> t IN ($stopwordsSql))) AS DOUBLE) AS ns
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(nc AS BIGINT) AS n_chars_m,
         |  CAST(nt AS BIGINT) AS n_tokens,
         |  np / nc AS punct_ratio,
         |  ns / nt AS stopword_ratio,
         |  nc / nt AS mean_token_len,
         |  least(nt / 64.0, 1.0) * (1.0 - np / nc) AS quality_score
         |FROM m""".stripMargin,
    // minWords=8 / maxWords=100000 / n_stop >= 1 mirror textGopherQ's args
    "text_gopher" -> gopherOracleSql,
    // gate agreement matrix over the three model-free gates; all flags
    // int-derived, ratios exact integer ratios rounded 4dp; pair rows in
    // the operator's i<j order
    "filter_agreement" -> {
      val blockSet = TextOps.DemoBlocklist.map(t => s"'$t'").mkString(", ")
      def pairRow(a: String, b: String, ka: String, kb: String, kab: String) =
        s"""SELECT '$a' AS gate_a, '$b' AS gate_b, n AS n_docs,
           |  $ka AS n_a, $kb AS n_b, $kab AS n_both,
           |  round(CAST(n + 2 * $kab - $ka - $kb AS DOUBLE) / n, 4)
           |    AS agreement,
           |  CASE WHEN $ka + $kb - $kab = 0 THEN 0.0
           |       ELSE round(CAST($kab AS DOUBLE) / ($ka + $kb - $kab), 4)
           |  END AS jaccard
           |FROM t""".stripMargin
      s"""WITH gp AS (SELECT doc_id, gopher_pass FROM ($gopherOracleSql) g),
         |q AS (
         |  SELECT doc_id,
         |    least(CAST(len($tokSql) AS DOUBLE) / 64.0, 1.0) *
         |      (1.0 - CAST(len(regexp_extract_all(text, '$punctClass'))
         |        AS DOUBLE) / CAST(len(text) AS DOUBLE)) >= 0.5 AS f
         |  FROM documents),
         |b AS (
         |  SELECT doc_id,
         |    len(list_filter($tokSql, t -> t IN ($blockSet))) = 0 AS f
         |  FROM documents),
         |t AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN gp.gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS kg,
         |    CAST(sum(CASE WHEN q.f THEN 1 ELSE 0 END) AS BIGINT) AS kq,
         |    CAST(sum(CASE WHEN b.f THEN 1 ELSE 0 END) AS BIGINT) AS kb,
         |    CAST(sum(CASE WHEN gp.gopher_pass AND q.f THEN 1 ELSE 0 END) AS BIGINT) AS kgq,
         |    CAST(sum(CASE WHEN gp.gopher_pass AND b.f THEN 1 ELSE 0 END) AS BIGINT) AS kgb,
         |    CAST(sum(CASE WHEN q.f AND b.f THEN 1 ELSE 0 END) AS BIGINT) AS kqb
         |  FROM gp JOIN q USING (doc_id) JOIN b USING (doc_id))
         |${pairRow("gopher", "quality", "kg", "kq", "kgq")}
         |UNION ALL
         |${pairRow("gopher", "clean", "kg", "kb", "kgb")}
         |UNION ALL
         |${pairRow("quality", "clean", "kq", "kb", "kqb")}""".stripMargin
    },
    "text_blocklist" -> {
      val set = TextOps.DemoBlocklist.map(t => s"'$t'").mkString(", ")
      s"""SELECT doc_id,
         |  len(list_filter($tokSql, t -> t IN ($set))) AS n_blocked,
         |  len(list_filter($tokSql, t -> t IN ($set))) > 0 AS blocked
         |FROM documents""".stripMargin
    },
    // the monitor's batch form: the SAME gopher gate (embedded as a
    // subquery — DuckDB allows WITH inside parens) rolled up per
    // (hour window, source) over the deterministic synthetic ingest_ts
    // the Q wrapper derives from doc_id; epoch-aligned tumbling windows
    // == date_trunc('hour')
    "corpus_quality_monitor" ->
      s"""SELECT
         |  date_trunc('hour',
         |    make_timestamp((1704067200 + d.doc_id % 21600) * 1000000))
         |    AS window_start,
         |  d.source,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN g.gopher_pass THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pass,
         |  CAST(sum(CASE WHEN g.gopher_pass THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS pass_rate
         |FROM documents d JOIN ($gopherOracleSql) g ON d.doc_id = g.doc_id
         |GROUP BY 1, 2""".stripMargin,
    "text_langid" -> {
      // coalesce mirrors langidWith's null-text guard (size(null) = -1
      // on the Spark side vs NULL CASE fallthrough here)
      val tok = tokSqlOf("coalesce(text, '')")
      val scores = TextOps.LangMarkers.map { case (lang, markers) =>
        val set = markers.map(m => s"'$m'").mkString(", ")
        s"    len(list_filter($tok, t -> t IN ($set))) AS score_$lang"
      }.mkString(",\n")
      val langs = TextOps.LangMarkers.map(_._1)
      val caseChain = langs.init.map { lang =>
        val ge = langs.filter(_ != lang).map(o => s"score_$lang >= score_$o").mkString(" AND ")
        s"WHEN $ge THEN '$lang'"
      }.mkString(" ")
      val greatestSql = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
      s"""WITH s AS (
         |  SELECT doc_id,
         |$scores
         |  FROM documents)
         |SELECT doc_id,
         |  CASE $caseChain ELSE '${langs.last}' END AS pred_lang,
         |  $greatestSql AS score
         |FROM s""".stripMargin
    },
    // same generated vote chain with the declared lang carried through,
    // filtered to disagreements — mirrors TextOps.textLangConfusion's
    // single-scan shape
    "text_lang_confusion" -> {
      val tok = tokSqlOf("coalesce(text, '')")
      val scores = TextOps.LangMarkers.map { case (lang, markers) =>
        val set = markers.map(m => s"'$m'").mkString(", ")
        s"    len(list_filter($tok, t -> t IN ($set))) AS score_$lang"
      }.mkString(",\n")
      val langs = TextOps.LangMarkers.map(_._1)
      val caseChain = langs.init.map { lang =>
        val ge = langs.filter(_ != lang).map(o => s"score_$lang >= score_$o").mkString(" AND ")
        s"WHEN $ge THEN '$lang'"
      }.mkString(" ")
      val greatestSql = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |$scores
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, lang AS declared_lang,
         |    CASE $caseChain ELSE '${langs.last}' END AS pred_lang,
         |    $greatestSql AS score
         |  FROM s)
         |SELECT doc_id, declared_lang, pred_lang, score
         |FROM p WHERE pred_lang <> declared_lang""".stripMargin
    },
    "text_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct($tokSql)), ' ')) AS set_fingerprint,
         |  md5(array_to_string($tokSql[1:16], ' ')) AS prefix_fingerprint
         |FROM documents""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    // fuzzy-exact: keep-first over C4-style normalized text; docs whose
    // normalization is empty (no ASCII alphanumerics) fall back to a
    // prefixed raw-text hash instead of collapsing into one class
    "dedup_fuzzy" ->
      """SELECT CASE
        |    WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
        |    THEN md5('raw:' || text)
        |    ELSE md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
        |  END AS norm_hash,
        |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    // PII scrub: DuckDB regexp_replace needs the 'g' flag to match
    // Spark's replace-all semantics
    "text_scrub" ->
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
         |    '${TextOps.Ipv4Pattern}', '<IP>', 'g'),
         |    '${TextOps.PhonePattern}', '<PHONE>', 'g') AS clean_text,
         |  len(regexp_extract_all(text, '${TextOps.EmailPattern}')) AS n_emails,
         |  len(regexp_extract_all(text, '${TextOps.Ipv4Pattern}')) AS n_ips
         |FROM documents""".stripMargin,
    // HTML strip: the IDENTICAL pass chain (comments, script, style,
    // tags, entity decode with &amp; last, whitespace collapse) — every
    // pattern lives in the Java-regex ∩ RE2 common dialect
    "text_html_strip" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(text, '(?s)<!--.*?-->', ' ', 'g'),
        |            '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |    '[ \t\r\n\f]+', ' ', 'g')) AS clean_text,
        |  CAST(len(regexp_extract_all(text, '<[^>]*>')) AS BIGINT)
        |    AS n_tags,
        |  len(regexp_extract_all(text, '<[^>]*>')) > 0 AS had_html
        |FROM documents""".stripMargin,
    "text_repetition" ->
      s"""WITH tokrows AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
         |tokfreq AS (SELECT doc_id, tok, count(*) AS c FROM tokrows GROUP BY 1, 2),
         |tokstats AS (SELECT doc_id, sum(c) AS n_tok, count(*) AS nd_tok,
         |               max(c) AS max_c FROM tokfreq GROUP BY 1),
         |t3 AS (SELECT doc_id, $tokSql AS t FROM documents),
         |shall AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |          FROM t3, unnest(generate_series(1, len(t)-2)) AS g(i)
         |          WHERE len(t) >= 3),
         |shstats AS (SELECT doc_id, count(*) AS n_3g,
         |              count(DISTINCT s) AS nd_3g FROM shall GROUP BY 1)
         |SELECT ts.doc_id,
         |  1.0 - CAST(nd_tok AS DOUBLE) / n_tok AS tok_rep,
         |  CAST(max_c AS DOUBLE) / n_tok AS max_tok_frac,
         |  coalesce(1.0 - CAST(nd_3g AS DOUBLE) / n_3g, 0.0) AS dup_3gram_frac
         |FROM tokstats ts LEFT JOIN shstats ss ON ts.doc_id = ss.doc_id""".stripMargin,
    "text_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3)
         |SELECT tr.doc_id, count(*) AS n_contaminated_ngrams
         |FROM sh tr
         |JOIN (SELECT DISTINCT s FROM sh WHERE doc_id < 20) b ON tr.s = b.s
         |WHERE tr.doc_id >= 20
         |GROUP BY 1""".stripMargin,
    // the decontaminate overlap counts swept over the k-grid; docs with
    // zero overlap ride the LEFT join as nc = 0
    "decontaminate_sweep" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |ov AS (
         |  SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS nc
         |  FROM sh tr
         |  JOIN (SELECT DISTINCT s FROM sh WHERE doc_id < 20) b
         |    ON tr.s = b.s
         |  WHERE tr.doc_id >= 20 GROUP BY 1),
         |per AS (
         |  SELECT CAST(len($tokSql) AS BIGINT) AS nt,
         |    coalesce(ov.nc, 0) AS nc
         |  FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
         |  WHERE d.doc_id >= 20),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens FROM per),
         |ks(k) AS (VALUES (1), (2), (4), (8), (16))
         |SELECT k,
         |  CAST(sum(CASE WHEN nc >= k THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flagged,
         |  round(CAST(sum(CASE WHEN nc >= k THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(n_docs AS DOUBLE), 4) AS doc_share,
         |  CAST(sum(CASE WHEN nc >= k THEN nt ELSE 0 END) AS BIGINT)
         |    AS tokens_flagged,
         |  round(CAST(sum(CASE WHEN nc >= k THEN nt ELSE 0 END) AS DOUBLE)
         |    / CAST(n_tokens AS DOUBLE), 4) AS token_share
         |FROM per, ks, tot GROUP BY k, n_docs, n_tokens""".stripMargin,
    // consistent-hash stratified sampling — identical integer arithmetic
    // on both engines (id reduced mod a prime keeps the product < 2^63;
    // bucket bits taken ABOVE SampleShift so they mix all id bits)
    "corpus_sample" -> {
      val cases = TextOps.SampleRatesPermille
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE (((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.SampleMultiplier})
         |       >> ${TextOps.SampleShift}) % 1000 <
         |  CASE lang $cases ELSE ${TextOps.SampleDefaultPermille} END""".stripMargin
    },
    // mixture rebalancing toward the smallest stratum: integer-only rate
    // derivation + the same Knuth bucket hash — no float boundary anywhere
    "corpus_rebalance" ->
      s"""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |rates AS (SELECT lang,
         |  least(1000, (1000 * (SELECT min(n) FROM counts)) // n) AS permille
         |  FROM counts)
         |SELECT doc_id, d.lang, source
         |FROM documents d JOIN rates r ON d.lang = r.lang
         |WHERE (((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.SampleMultiplier})
         |       >> ${TextOps.SampleShift}) % 1000 < permille""".stripMargin,
    // unicode hygiene: \x{...} escapes read identically by Java regex
    // and RE2, so the same pattern strings drive both engines
    "text_unicode_audit" ->
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '${TextOps.ReplacementPattern}'))
         |    AS n_replacement,
         |  len(regexp_extract_all(text, '${TextOps.ZeroWidthPattern}'))
         |    AS n_zero_width,
         |  len(regexp_extract_all(text, '${TextOps.ControlPattern}'))
         |    AS n_control,
         |  len(regexp_extract_all(text, '${TextOps.ReplacementPattern}')) +
         |  len(regexp_extract_all(text, '${TextOps.ZeroWidthPattern}')) +
         |  len(regexp_extract_all(text, '${TextOps.ControlPattern}')) = 0
         |    AS is_clean
         |FROM documents""".stripMargin,
    // script-mix profile: the same \x{...} cross-engine pattern rule;
    // share = exact-int ratio 4dp, zero-letter docs at 0.0/flagged
    "text_script_profile" -> {
      def c(p: String) = s"len(regexp_extract_all(text, '$p'))"
      val (l, k, y, a) = (c(TextOps.LatinPattern), c(TextOps.CjkPattern),
        c(TextOps.CyrillicPattern), c(TextOps.ArabicPattern))
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST($l AS BIGINT) AS n_latin, CAST($k AS BIGINT) AS n_cjk,
         |    CAST($y AS BIGINT) AS n_cyrillic, CAST($a AS BIGINT) AS n_arabic
         |  FROM documents)
         |SELECT doc_id, n_latin, n_cjk, n_cyrillic, n_arabic,
         |  CASE WHEN n_latin + n_cjk + n_cyrillic + n_arabic = 0 THEN 0.0
         |       ELSE round(CAST(greatest(n_latin, n_cjk, n_cyrillic,
         |         n_arabic) AS DOUBLE) /
         |         (n_latin + n_cjk + n_cyrillic + n_arabic), 4)
         |  END AS dom_share,
         |  CASE WHEN n_latin + n_cjk + n_cyrillic + n_arabic = 0 THEN 0.0
         |       ELSE round(CAST(greatest(n_latin, n_cjk, n_cyrillic,
         |         n_arabic) AS DOUBLE) /
         |         (n_latin + n_cjk + n_cyrillic + n_arabic), 4)
         |  END < 0.9 AS mixed_script
         |FROM m""".stripMargin
    },
    // one-row corpus health summary: exact ints + exact-int ratios 4dp
    "corpus_report" ->
      s"""WITH g AS (SELECT doc_id, gopher_pass FROM ($gopherOracleSql) x),
         |m AS (
         |  SELECT d.doc_id, md5(d.text) AS h, d.lang, d.source,
         |    len($tokSql) AS n_toks, g.gopher_pass
         |  FROM documents d JOIN g USING (doc_id))
         |SELECT count(*) AS n_docs,
         |  count(DISTINCT h) AS n_distinct_texts,
         |  round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 4)
         |    AS dup_ratio,
         |  count(DISTINCT lang) AS n_langs,
         |  count(DISTINCT source) AS n_sources,
         |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
         |  round(CAST(sum(n_toks) AS DOUBLE) / count(*), 4) AS mean_tokens,
         |  round(CAST(sum(CASE WHEN gopher_pass THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 4) AS gopher_pass_rate
         |FROM m""".stripMargin,
    // bottom-k fixed sample: smallest (1e6 Knuth key, doc_id) pairs,
    // exactly 100 rows, integer arithmetic identical on both engines
    "corpus_sample_fixed" ->
      s"""SELECT doc_id, lang, source,
         |  (((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.FixedMultiplier})
         |    >> ${TextOps.SampleShift}) % 1000000 AS sample_key
         |FROM documents
         |ORDER BY sample_key, doc_id LIMIT 100""".stripMargin,
    // per-lang top-20 of the same integer priority order
    "corpus_weighted_sample_stratified" ->
      s"""SELECT doc_id, lang, source, n_chars, priority FROM (
         |  SELECT doc_id, lang, source, n_chars,
         |    n_chars * 1000000000000 //
         |      ((((doc_id % ${TextOps.SampleIdPrime})
         |          * ${TextOps.WeightedMultiplier})
         |        >> ${TextOps.SampleShift}) % 1000000 + 1) AS priority,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY n_chars * 1000000000000 //
         |        ((((doc_id % ${TextOps.SampleIdPrime})
         |            * ${TextOps.WeightedMultiplier})
         |          >> ${TextOps.SampleShift}) % 1000000 + 1) DESC,
         |        doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= 20""".stripMargin,
    // priority sampling: integer floor(w·10^12/(u+1)) priorities over
    // the Knuth-mix uniform — integer-exact ordering, top-100 cut
    "corpus_weighted_sample" ->
      s"""SELECT doc_id, lang, source, n_chars,
         |  n_chars * 1000000000000 //
         |    ((((doc_id % ${TextOps.SampleIdPrime})
         |        * ${TextOps.WeightedMultiplier})
         |      >> ${TextOps.SampleShift}) % 1000000 + 1) AS priority
         |FROM documents
         |ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin,
    // stratified fixed sample: bottom-50 of the hash order per lang
    "corpus_sample_stratified" ->
      s"""SELECT doc_id, lang, source, sample_key FROM (
         |  SELECT doc_id, lang, source,
         |    (((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.FixedMultiplier})
         |      >> ${TextOps.SampleShift}) % 1000000 AS sample_key,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY (((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.FixedMultiplier})
         |        >> ${TextOps.SampleShift}) % 1000000, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= 50""".stripMargin,
    // temperature upsampling: rate_bp = round(1e4·sqrt(n_max/n_l))
    // capped at 3 epochs — division and sqrt are correctly-rounded IEEE
    // ops, so both engines land the identical integer basis points;
    // whole copies + fractional copy via the decorrelated 1e4 bucket
    "corpus_temperature_sample" ->
      s"""WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
         |m AS (SELECT max(n_l) AS n_max FROM c),
         |r AS (SELECT lang,
         |  CAST(least(round(10000.0 *
         |    sqrt(CAST(n_max AS DOUBLE) / CAST(n_l AS DOUBLE))), 30000.0)
         |    AS BIGINT) AS rate_bp
         |  FROM c, m),
         |d AS (SELECT doc_id, d.lang, rate_bp,
         |  (((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.TempMultiplier})
         |    >> ${TextOps.SampleShift}) % 10000 AS b
         |  FROM documents d JOIN r USING (lang))
         |SELECT doc_id, lang, g.copy
         |FROM d, unnest(generate_series(0,
         |  rate_bp // 10000 - 1 +
         |    CASE WHEN b < rate_bp % 10000 THEN 1 ELSE 0 END)) AS g(copy)""".stripMargin,
    // shard manifest: consistent-hash shard assignment (same Knuth mix
    // as corpus_sample, then mod nShards) + per-shard doc/token totals
    "corpus_shards" -> {
      val bucket = s"(((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.SampleMultiplier}) >> ${TextOps.SampleShift}) % 1000"
      s"""SELECT ($bucket) % 8 AS shard, count(*) AS n_docs,
         |  CAST(sum(len($tokSql)) AS BIGINT) AS n_tokens
         |FROM documents GROUP BY 1""".stripMargin
    },
    // split-aware shard manifest: split CASE under SplitMultiplier,
    // shard hash under SampleMultiplier, integer totals
    "corpus_split_shards" -> {
      val sb = s"(((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.SplitMultiplier}) >> ${TextOps.SampleShift}) % 1000"
      val shard = s"((((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.SampleMultiplier}) >> ${TextOps.SampleShift}) % 1000) % 8"
      s"""SELECT
         |  CASE WHEN ($sb) < ${TextOps.SplitTrainPermille} THEN 'train'
         |       WHEN ($sb) < ${TextOps.SplitValPermille} THEN 'val'
         |       ELSE 'test' END AS split,
         |  ($shard) AS shard, count(*) AS n_docs,
         |  CAST(sum(len($tokSql)) AS BIGINT) AS n_tokens
         |FROM documents GROUP BY 1, 2""".stripMargin
    },
    // rarity profile: integer counts and int/int divisions only — a float
    // log-prob mean would be partial-sum-order-dependent across engines
    "text_rarity" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS t FROM documents),
         |freq AS (SELECT t, count(*) AS c FROM tok GROUP BY 1)
         |SELECT doc_id,
         |  count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
         |  CAST(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         |    AS rarity_ratio,
         |  CAST(sum(c) AS DOUBLE) / count(*) AS mean_tok_freq
         |FROM tok JOIN freq USING (t)
         |GROUP BY doc_id""".stripMargin,
    // closed-vocabulary OOV rates: top-V cut ordered (count DESC, token
    // ASC) — binary UTF-8 compare on both engines; rate = exact ratio 4dp
    "vocab_coverage" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS t FROM documents),
         |v AS (SELECT t FROM (SELECT t, count(*) AS c FROM tok GROUP BY 1)
         |      ORDER BY c DESC, t ASC LIMIT 256)
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  round(CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 4) AS oov_rate
         |FROM tok LEFT JOIN v ON tok.t = v.t
         |GROUP BY doc_id""".stripMargin,
    // unigram cross-entropy: the one float-math oracle — both sides
    // ROUND to 4 decimals, absorbing summation-order / libm log2 ulps
    "text_perplexity" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS t FROM documents),
         |freq AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok)
         |SELECT doc_id, count(*) AS n_tokens,
         |  round(log2((SELECT n FROM tot)) - avg(log2(c)), 4)
         |    AS bits_per_token
         |FROM tok JOIN freq USING (t)
         |GROUP BY doc_id""".stripMargin,
    // difficulty curriculum: per-doc 4dp bits/token → centibit bins →
    // token-mass quartile stages by histogram algebra (integer div,
    // straddling bins assigned by their start)
    "corpus_curriculum" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS t FROM documents),
         |freq AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
         |per AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(round(round(log2((SELECT n FROM tot)) - avg(log2(c)),
         |        4) * 100) AS BIGINT) AS bin
         |  FROM tok JOIN freq USING (t)
         |  GROUP BY doc_id),
         |b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS n_toks
         |  FROM per GROUP BY 1),
         |s AS (SELECT *,
         |    coalesce(CAST(sum(n_toks) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS cum_before,
         |    CAST(sum(n_toks) OVER () AS BIGINT) AS total
         |  FROM b),
         |st AS (SELECT *,
         |    least(4, 1 + (cum_before * 4) // total) AS stage FROM s)
         |SELECT stage, CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  round(CAST(min(bin) AS DOUBLE) / 100, 4) AS min_bits,
         |  round(CAST(max(bin) AS DOUBLE) / 100, 4) AS max_bits,
         |  round(CAST(sum(n_toks) AS DOUBLE) / CAST(max(total) AS DOUBLE),
         |    4) AS token_share
         |FROM st GROUP BY 1""".stripMargin,
    // the curriculum's per-doc executable twin: same bins, same
    // histogram boundaries, per-doc rows instead of stage books
    "corpus_curriculum_assign" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS t FROM documents),
         |freq AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
         |per AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    round(log2((SELECT n FROM tot)) - avg(log2(c)), 4)
         |      AS bits_per_token,
         |    CAST(round(round(log2((SELECT n FROM tot)) - avg(log2(c)),
         |        4) * 100) AS BIGINT) AS bin
         |  FROM tok JOIN freq USING (t)
         |  GROUP BY doc_id),
         |b AS (SELECT bin, CAST(sum(n_tokens) AS BIGINT) AS n_toks
         |  FROM per GROUP BY 1),
         |s AS (SELECT bin,
         |    coalesce(CAST(sum(n_toks) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS cum_before,
         |    CAST(sum(n_toks) OVER () AS BIGINT) AS total
         |  FROM b),
         |st AS (SELECT bin,
         |    least(4, 1 + (cum_before * 4) // total) AS stage FROM s)
         |SELECT per.doc_id, per.n_tokens, per.bits_per_token, per.bin,
         |  st.stage
         |FROM per JOIN st USING (bin)""".stripMargin,
    // benchmark-side transpose of decontaminate: clean items appear at 0
    // via the LEFT JOIN (count DISTINCT over NULL is 0 on both engines)
    "decontaminate_report" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |hits AS (
         |  SELECT b.doc_id AS bench_id, tr.doc_id AS hit_doc, tr.s
         |  FROM sh tr JOIN (SELECT doc_id, s FROM sh WHERE doc_id < 20) b
         |    ON tr.s = b.s
         |  WHERE tr.doc_id >= 20)
         |SELECT bb.bench_id,
         |  count(DISTINCT h.hit_doc) AS n_hit_docs,
         |  count(DISTINCT h.s) AS n_leaked_ngrams
         |FROM (SELECT doc_id AS bench_id FROM documents WHERE doc_id < 20) bb
         |LEFT JOIN hits h ON bb.bench_id = h.bench_id
         |GROUP BY 1""".stripMargin,
    // DSIR importance weights: add-α unigram LMs over a shared vocab on
    // both engines; token strings in the oracle where Spark hashes to
    // longs (collision odds ~|vocab|²/2⁶⁴ — the textRarity convention);
    // 4-decimal float rule
    "dsir_score" -> {
      val a = TextOps.DsirAlpha
      s"""WITH ctok AS (
         |  SELECT doc_id, unnest($tokSql) AS t FROM documents
         |  WHERE doc_id >= 20),
         |ttok AS (
         |  SELECT unnest($tokSql) AS t FROM documents WHERE doc_id < 20),
         |raw AS (SELECT t, count(*) AS cr FROM ctok GROUP BY 1),
         |tgt AS (SELECT t, count(*) AS ctn FROM ttok GROUP BY 1),
         |sc AS (SELECT
         |  (SELECT CAST(count(DISTINCT t) AS DOUBLE) FROM
         |    (SELECT t FROM ctok UNION ALL SELECT t FROM ttok)) AS v,
         |  (SELECT CAST(count(*) AS DOUBLE) FROM ctok) AS n_raw,
         |  (SELECT CAST(count(*) AS DOUBLE) FROM ttok) AS n_tgt)
         |SELECT doc_id, count(*) AS n_tokens,
         |  round(avg(
         |    log2((coalesce(tgt.ctn, 0) + $a) / (sc.n_tgt + $a * sc.v)) -
         |    log2((raw.cr + $a) / (sc.n_raw + $a * sc.v))), 4)
         |    AS dsir_score
         |FROM ctok JOIN raw USING (t) LEFT JOIN tgt USING (t)
         |  CROSS JOIN sc
         |GROUP BY doc_id""".stripMargin
    },
    // interpolated bigram cross-entropy: same 4-decimal float rule; the
    // oracle pairs adjacent positions by ordinality self-join where Spark
    // generates pairs map-side — identical (a, b) multisets either way
    "text_perplexity_bigram" ->
      s"""WITH dt AS (SELECT doc_id, $tokSql AS ts FROM documents),
         |tok AS (
         |  SELECT doc_id, g.i AS pos, ts[g.i] AS t
         |  FROM dt, unnest(generate_series(1, len(ts))) AS g(i)),
         |big AS (
         |  SELECT p.doc_id, p.t AS a, c.t AS b
         |  FROM tok p JOIN tok c
         |    ON c.doc_id = p.doc_id AND c.pos = p.pos + 1),
         |uni AS (SELECT t, count(*) AS cu FROM tok GROUP BY 1),
         |ctx AS (SELECT a, count(*) AS ca FROM big GROUP BY 1),
         |bgc AS (SELECT a, b, count(*) AS cab FROM big GROUP BY 1, 2),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(-avg(log2(
         |    ${TextOps.BigramLambda} * cab / ca +
         |    ${1.0 - TextOps.BigramLambda} * cu / (SELECT n FROM tot))), 4)
         |    AS bits_per_transition
         |FROM big JOIN bgc USING (a, b) JOIN ctx USING (a)
         |  JOIN uni ON big.b = uni.t
         |GROUP BY doc_id""".stripMargin,
    // interpolated Kneser-Ney: continuation counts replace unigram
    // backoff; same string-token replay (hash-collision-free at this
    // vocab), one shared IEEE association order
    "text_perplexity_kn" ->
      s"""WITH dt AS (SELECT doc_id, $tokSql AS ts FROM documents),
         |tok AS (
         |  SELECT doc_id, g.i AS pos, ts[g.i] AS t
         |  FROM dt, unnest(generate_series(1, len(ts))) AS g(i)),
         |big AS (
         |  SELECT p.doc_id, p.t AS a, c.t AS b
         |  FROM tok p JOIN tok c
         |    ON c.doc_id = p.doc_id AND c.pos = p.pos + 1),
         |bgc AS (SELECT a, b, count(*) AS cab FROM big GROUP BY 1, 2),
         |ctx AS (SELECT a, count(*) AS ca FROM big GROUP BY 1),
         |na AS (SELECT a, count(*) AS n1a FROM bgc GROUP BY 1),
         |nb AS (SELECT b, count(*) AS n1b FROM bgc GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bgc)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(-avg(log2(
         |    (cab - ${TextOps.KnDiscount}) / ca +
         |    ${TextOps.KnDiscount} * n1a / ca *
         |      (n1b / (SELECT n FROM tot)))), 4)
         |    AS bits_per_transition
         |FROM big JOIN bgc USING (a, b) JOIN ctx USING (a)
         |  JOIN na USING (a) JOIN nb USING (b)
         |GROUP BY doc_id""".stripMargin,
    // disjoint train/val/test split: same integer Knuth-mix arithmetic,
    // under the split's own decorrelated multiplier
    "corpus_split" -> {
      val bkt = s"(((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.SplitMultiplier}) >> ${TextOps.SampleShift}) % 1000"
      s"""SELECT doc_id, lang, source,
         |  CASE WHEN ($bkt) < ${TextOps.SplitTrainPermille} THEN 'train'
         |       WHEN ($bkt) < ${TextOps.SplitValPermille} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },
    // mixture report: integer totals + shares of integer totals
    "corpus_mix_report" ->
      s"""WITH g AS (
         |  SELECT lang, source, count(*) AS n_docs,
         |    CAST(sum(len($tokSql)) AS BIGINT) AS n_tokens,
         |    CAST(sum(len(text)) AS BIGINT) AS n_chars
         |  FROM documents GROUP BY 1, 2)
         |SELECT lang, source, n_docs, n_tokens, n_chars,
         |  CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS doc_share,
         |  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share
         |FROM g""".stripMargin,
    // mixture drift as KL vs uniform: exact-int shares, ln the one
    // transcendental, every float 4dp; total rides each row (tiny frame)
    "corpus_mix_kl" ->
      s"""WITH g AS (
         |  SELECT lang, count(*) AS n_docs,
         |    CAST(sum(len($tokSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |s AS (
         |  SELECT lang, n_docs, n_tokens,
         |    CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS p,
         |    CAST(count(*) OVER () AS DOUBLE) AS nl
         |  FROM g),
         |t AS (SELECT *, CASE WHEN p > 0 THEN p * ln(p * nl)
         |                     ELSE 0.0 END AS term FROM s)
         |SELECT lang, n_docs, n_tokens,
         |  round(p, 4) AS token_share,
         |  round(1.0 / nl, 4) AS target_share,
         |  round(term, 4) AS kl_term,
         |  round(sum(term) OVER (), 4) AS kl_total
         |FROM t""".stripMargin,
    // top-k n-grams: deterministic (count desc, shingle asc) cutoff
    "text_ngram_topk" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS sh
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3)
         |SELECT sh, count(*) AS n_occurrences
         |FROM sh GROUP BY 1
         |ORDER BY n_occurrences DESC, sh ASC
         |LIMIT 100""".stripMargin,
    // Zipf fit: ranks/counts exact integers under the total
    // (tf DESC, term ASC) order; ln of exact integers + the shared
    // closed-form slope/intercept/r² expression tree, 4dp
    "text_zipf" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |tf AS (SELECT u.tok AS w, count(*) AS tf
         |       FROM toks, unnest(t) AS u(tok)
         |       WHERE len(u.tok) > 0 GROUP BY 1
         |       ORDER BY tf DESC, w ASC LIMIT 500),
         |pts AS (SELECT ln(CAST(row_number() OVER
         |            (ORDER BY tf DESC, w ASC) AS DOUBLE)) AS x,
         |          ln(CAST(tf AS DOUBLE)) AS y
         |        FROM tf),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |        sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |        sum(x * x) AS sxx, sum(y * y) AS syy
         |      FROM pts)
         |SELECT CAST(n AS BIGINT) AS n_terms,
         |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
         |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
         |    / n, 4) AS intercept,
         |  round(pow(n * sxy - sx * sy, 2) /
         |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
         |FROM s""".stripMargin,
    // corpus information rate: H(w₂|w₁) = Σ c_ab·(ln c_a − ln c_ab)/N₂
    // over exact integer counts, string tokens replaying the hash path
    "text_predictability" ->
      s"""WITH dt AS (SELECT doc_id, $tokSql AS ts FROM documents),
         |tok AS (
         |  SELECT doc_id, g.i AS pos, ts[g.i] AS t
         |  FROM dt, unnest(generate_series(1, len(ts))) AS g(i)),
         |big AS (
         |  SELECT p.t AS a, c.t AS b
         |  FROM tok p JOIN tok c
         |    ON c.doc_id = p.doc_id AND c.pos = p.pos + 1),
         |uni AS (SELECT t, count(*) AS cu FROM tok GROUP BY 1),
         |ua AS (SELECT CAST(sum(cu) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS vocab,
         |    sum(CAST(cu AS DOUBLE) * ln(CAST(cu AS DOUBLE))) AS culn
         |  FROM uni),
         |bgc AS (SELECT a, b, count(*) AS cab FROM big GROUP BY 1, 2),
         |ctx AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca
         |  FROM bgc GROUP BY 1),
         |ba AS (SELECT CAST(sum(cab) AS BIGINT) AS n_bigrams,
         |    sum(CAST(cab AS DOUBLE) * (ln(CAST(ca AS DOUBLE))
         |      - ln(CAST(cab AS DOUBLE)))) AS h2num
         |  FROM bgc JOIN ctx USING (a)),
         |h AS (SELECT n_tokens, vocab, n_bigrams,
         |    ln(CAST(n_tokens AS DOUBLE))
         |      - culn / CAST(n_tokens AS DOUBLE) AS h1,
         |    h2num / CAST(n_bigrams AS DOUBLE) AS h2
         |  FROM ua, ba)
         |SELECT n_tokens, vocab, n_bigrams,
         |  round(h1, 4) AS h_unigram,
         |  round(h2, 4) AS h_bigram_cond,
         |  round(1.0 - h2 / h1, 4) AS redundancy
         |FROM h""".stripMargin,
    "text_lexical_diversity" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |cells AS (SELECT doc_id, u.tok AS w, count(*) AS c
         |          FROM toks, unnest(t) AS u(tok)
         |          WHERE len(u.tok) > 0 GROUP BY 1, 2),
         |d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_types,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_hapax,
         |    CAST(sum(c * c) AS BIGINT) AS sc2
         |  FROM cells GROUP BY 1)
         |SELECT doc_id, n_tokens, n_types,
         |  round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
         |    AS ttr,
         |  round(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 4)
         |    AS hapax_ratio,
         |  round(10000.0 * CAST(sc2 - n_tokens AS DOUBLE)
         |    / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 4)
         |    AS yule_k
         |FROM d""".stripMargin,
    // ⌊log₂ n⌋ as binary-digit-count − 1: exact integers where
    // floor(log2(64)) can land in bucket 5 under one libm's rounding
    "corpus_length_profile" ->
      s"""WITH base AS (SELECT source,
         |    CAST(len(list_filter($tokSql, x -> len(x) > 0)) AS BIGINT)
         |      AS n
         |  FROM documents),
         |cells AS (SELECT source,
         |    CASE WHEN n = 0 THEN CAST(-1 AS BIGINT)
         |      ELSE CAST(length(bin(n)) - 1 AS BIGINT) END AS bucket,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n) AS BIGINT) AS n_tokens
         |  FROM base GROUP BY 1, 2)
         |SELECT source, bucket,
         |  CASE WHEN bucket >= 0 THEN CAST(1 AS BIGINT) << bucket
         |    ELSE CAST(0 AS BIGINT) END AS bucket_lo,
         |  n_docs, n_tokens,
         |  round(CAST(n_tokens AS DOUBLE)
         |    / CAST(sum(n_tokens) OVER () AS DOUBLE), 4) AS token_share
         |FROM cells""".stripMargin,
    "text_keyword_rake" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS t FROM documents),
         |toks AS (SELECT doc_id, g.i AS pos, t[g.i] AS w
         |  FROM tk, unnest(generate_series(1, len(t))) AS g(i)
         |  WHERE len(t[g.i]) > 0),
         |st AS (SELECT *, w IN ('a','an','the','of','to','and','in',
         |    'is','it','on','for','with','as','at','by','or','be')
         |    AS is_stop FROM toks),
         |ph AS (SELECT doc_id, pos, w, is_stop,
         |    sum(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
         |  FROM st),
         |phr AS (SELECT doc_id, pid,
         |    string_agg(w, ' ' ORDER BY pos) AS phrase,
         |    CAST(count(*) AS BIGINT) AS n_words
         |  FROM ph WHERE NOT is_stop GROUP BY 1, 2),
         |ws AS (SELECT u.ww AS w, CAST(sum(n_words) AS BIGINT) AS deg,
         |    CAST(count(*) AS BIGINT) AS freq
         |  FROM phr, unnest(string_split(phrase, ' ')) AS u(ww)
         |  GROUP BY 1),
         |dp AS (SELECT phrase, CAST(count(*) AS BIGINT)
         |      AS n_occurrences,
         |    max(n_words) AS n_words
         |  FROM phr GROUP BY 1),
         |sc AS (SELECT dp.phrase, dp.n_occurrences, dp.n_words,
         |    round(sum(CAST(ws.deg AS DOUBLE) / CAST(ws.freq AS DOUBLE)),
         |      4) AS score
         |  FROM dp, unnest(string_split(dp.phrase, ' ')) AS u(ww)
         |  JOIN ws ON ws.w = u.ww
         |  GROUP BY 1, 2, 3)
         |SELECT phrase, n_occurrences, n_words, score FROM sc
         |ORDER BY score DESC, phrase ASC LIMIT 25""".stripMargin,
    "corpus_epoch_plan" ->
      s"""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(list_filter($tokSql, x -> len(x) > 0)))
         |      AS BIGINT) AS avail_tokens
         |  FROM documents GROUP BY 1),
         |t AS (SELECT *,
         |    400000 // (SELECT count(*) FROM s) AS target_tokens FROM s),
         |p AS (SELECT *,
         |    least(target_tokens, 4 * avail_tokens) AS achieved_tokens
         |  FROM t)
         |SELECT source, n_docs, avail_tokens,
         |  CAST(target_tokens AS BIGINT) AS target_tokens,
         |  CAST(achieved_tokens AS BIGINT) AS achieved_tokens,
         |  CAST(target_tokens - achieved_tokens AS BIGINT) AS shortfall,
         |  round(CAST(achieved_tokens AS DOUBLE)
         |    / CAST(avail_tokens AS DOUBLE), 4) AS epochs,
         |  round(CAST(achieved_tokens AS DOUBLE)
         |    / CAST(target_tokens AS DOUBLE), 4) AS fill_rate
         |FROM p""".stripMargin,
    // Church–Gale burstiness from SPARSE per-doc counts (zero cells
    // contribute nothing to Σx/Σx²): exact-integer sums, shared tree 4dp
    "text_burstiness" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |cells AS (SELECT doc_id, u.tok AS w, count(*) AS x
         |          FROM toks, unnest(t) AS u(tok)
         |          WHERE len(u.tok) > 0 GROUP BY 1, 2),
         |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |      FROM documents)
         |SELECT w AS term,
         |  CAST(sum(x) AS BIGINT) AS total_tf,
         |  CAST(count(*) AS BIGINT) AS doc_freq,
         |  round(CAST(sum(x * x) AS DOUBLE) / sum(x)
         |    - CAST(sum(x) AS DOUBLE) / (SELECT n_docs FROM n), 4)
         |    AS burstiness
         |FROM cells GROUP BY 1
         |ORDER BY total_tf DESC, term ASC LIMIT 100""".stripMargin,
    // BPE pair stats: pairs explode from the VOCAB CTE, mirroring the
    // Spark plan; sum(freq) casts back to BIGINT (DuckDB sums to HUGEINT,
    // which pandas would render as float and break the hash compare)
    "corpus_bpe_pairs" ->
      s"""WITH vocab AS (
         |  SELECT tok AS w, count(*) AS freq
         |  FROM (SELECT unnest($tokSql) AS tok FROM documents)
         |  GROUP BY 1),
         |pairs AS (
         |  SELECT p.pair, CAST(sum(freq) AS BIGINT) AS n_occurrences
         |  FROM vocab, unnest(list_transform(range(1, len(w)),
         |    i -> substr(w, i, 2))) AS p(pair)
         |  WHERE len(w) >= 2
         |  GROUP BY 1)
         |SELECT pair, n_occurrences FROM pairs
         |ORDER BY n_occurrences DESC, pair ASC
         |LIMIT 100""".stripMargin,
    // windowed co-occurrence pairs via correlated lateral unnest (1-based
    // j <= i+window mirrors Spark's 0-based bound exactly); PMI rounded
    // 4dp BEFORE the (pmi desc, a, b) rank so the kept top-k agrees
    "text_collocations" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |pairs AS (
         |  SELECT t[gi.i] AS a, t[gj.j] AS b
         |  FROM toks,
         |    unnest(generate_series(1, len(t) - 1)) AS gi(i),
         |    unnest(generate_series(gi.i + 1, least(gi.i + 3, len(t)))) AS gj(j)
         |  WHERE len(t) >= 2),
         |pc AS (SELECT a, b, count(*) AS c_ab FROM pairs
         |       GROUP BY 1, 2 HAVING count(*) >= 5),
         |uni AS (SELECT tok AS w, count(*) AS c
         |        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
         |n AS (SELECT count(*) AS nt
         |      FROM (SELECT unnest(t) AS tok FROM toks))
         |SELECT a, b, c_ab,
         |  round(ln(CAST(c_ab AS DOUBLE) * n.nt / (ca.c * cb.c)), 4) AS pmi
         |FROM pc JOIN uni ca ON pc.a = ca.w JOIN uni cb ON pc.b = cb.w, n
         |ORDER BY pmi DESC, a, b LIMIT 100""".stripMargin,
    // char-distribution entropy in the 2-aggregate algebraic form
    // ln(T) - sum(n ln n)/T, rounded 4dp before the flag on both engines
    "text_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, g.c AS c
        |  FROM documents, unnest(regexp_extract_all(text, '[\s\S]')) AS g(c)),
        |k AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars,
        |  round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 4) AS entropy,
        |  round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 4) < 2.0
        |    AS is_low_entropy
        |FROM k GROUP BY doc_id""".stripMargin,
    // Flesch / FK readability: words = whitespace tokens, sentences =
    // [.!?]+ runs floor 1, syllables = per-word [aeiouy]+ vowel groups
    // floor 1; one fixed association order, 4dp
    "text_readability" ->
      s"""WITH w AS (
         |  SELECT doc_id, $tokSql AS ws,
         |    greatest(1, length(regexp_extract_all(text, '[.!?]+')))
         |      AS n_sent
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, CAST(length(ws) AS BIGINT) AS n_words,
         |    CAST(n_sent AS BIGINT) AS n_sentences,
         |    CAST(list_sum(list_transform(ws, t ->
         |      greatest(1, length(regexp_extract_all(t, '[aeiouy]+')))))
         |      AS BIGINT) AS n_syllables
         |  FROM w WHERE length(ws) > 0)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
         |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
         |    AS flesch,
         |  round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
         |    + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 4)
         |    AS fk_grade
         |FROM s""".stripMargin,
    // smooth-idf TF-IDF; scores rounded to 4 decimals BEFORE ranking on
    // both engines (ln may differ in the last ulp), term as tiebreak
    "text_tfidf" ->
      s"""WITH t AS (
         |  SELECT doc_id, tok AS term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest($tokSql) AS tok FROM documents)
         |  GROUP BY 1, 2),
         |d AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |s AS (
         |  SELECT t.doc_id, t.term,
         |    round(t.tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1.0), 4) AS tfidf
         |  FROM t JOIN d ON t.term = d.term, n)
         |SELECT doc_id, rank, term, tfidf FROM (
         |  SELECT doc_id, term, tfidf,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tfidf DESC, term) AS rank
         |  FROM s)
         |WHERE rank <= 5""".stripMargin,
    // sliding windows: DuckDB's 1-based inclusive list slice ws[a:b]
    // clamps past the end exactly like Spark's slice(ws, a, n)
    "corpus_chunk" ->
      s"""WITH w AS (SELECT doc_id, $tokSql AS ws FROM documents),
         |c AS (SELECT doc_id, CAST(g.st // 24 AS INTEGER) AS chunk_id,
         |        ws[g.st + 1 : g.st + 32] AS chunk
         |      FROM w, unnest(generate_series(0, greatest(len(ws) - 1, 0), 24))
         |        AS g(st))
         |SELECT doc_id, chunk_id, CAST(len(chunk) AS INTEGER) AS n_words,
         |  array_to_string(chunk, ' ') AS chunk_text
         |FROM c""".stripMargin,
    // sequence packing: the oracle computes the SAME concatenated-stream
    // layout with one global window cumsum (fine at sf0.01; the Spark side
    // is the distributed prefix-sum that scales)
    "corpus_pack" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($tokSql) AS BIGINT) AS n_tok
         |           FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |        sum(n_tok) OVER (ORDER BY doc_id
         |          ROWS UNBOUNDED PRECEDING) - n_tok AS tok_start
         |      FROM t)
         |SELECT doc_id, n_tok,
         |  CAST(tok_start // 512 AS BIGINT) AS pack_id,
         |  CAST(tok_start % 512 AS BIGINT) AS pack_offset
         |FROM c""".stripMargin,
    // budget selection: the oracle's single global window reproduces the
    // Spark side's bucket-offset + within-bucket cumsum exactly (both
    // order by (quality ten-thousandths DESC, doc_id)); the score grid
    // is the text_quality expression, int-derived and bit-identical
    "corpus_budget_select" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST(len(text) AS DOUBLE) AS nc,
         |    CAST(len($tokSql) AS DOUBLE) AS nt,
         |    CAST(len(regexp_extract_all(text, '$punctClass')) AS DOUBLE) AS np
         |  FROM documents),
         |q AS (SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
         |    CAST(round(least(nt / 64.0, 1.0) * (1.0 - np / nc) * 10000)
         |      AS BIGINT) AS qk
         |  FROM m),
         |c AS (SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY qk DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM q)
         |SELECT doc_id, n_tokens, cum_tokens,
         |  cum_tokens <= 8000 AS selected
         |FROM c""".stripMargin,
    // the budget curve behind the single point: same qk grid + cumsum,
    // decile thresholds = integer floor k*T/10 on both engines
    "corpus_quality_pareto" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST(len(text) AS DOUBLE) AS nc,
         |    CAST(len($tokSql) AS DOUBLE) AS nt,
         |    CAST(len(regexp_extract_all(text, '$punctClass')) AS DOUBLE) AS np
         |  FROM documents),
         |q AS (SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
         |    CAST(round(least(nt / 64.0, 1.0) * (1.0 - np / nc) * 10000)
         |      AS BIGINT) AS qk
         |  FROM m),
         |c AS (SELECT doc_id, n_tokens, qk,
         |    CAST(sum(n_tokens) OVER (ORDER BY qk DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM q),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM q),
         |g AS (SELECT CAST(gs.k AS INTEGER) AS decile,
         |        CAST(gs.k * t.tot // 10 AS BIGINT) AS budget_tokens
         |      FROM unnest(generate_series(1, 10)) AS gs(k), t),
         |sel AS (SELECT g.decile, CAST(count(*) AS BIGINT) AS n_docs,
         |          max(c.cum_tokens) AS n_tokens,
         |          round(avg(CAST(c.qk AS DOUBLE) / 10000.0), 4)
         |            AS mean_quality
         |        FROM c, g WHERE c.cum_tokens <= g.budget_tokens
         |        GROUP BY 1)
         |SELECT g.decile, g.budget_tokens,
         |  coalesce(s.n_docs, 0) AS n_docs,
         |  coalesce(s.n_tokens, 0) AS n_tokens,
         |  coalesce(s.mean_quality, 0.0) AS mean_quality
         |FROM g LEFT JOIN sel s ON g.decile = s.decile""".stripMargin,
    // per-doc first-occurrence share over the distinct 3-gram frame
    "text_novelty" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
         |        FROM sh GROUP BY 1),
         |fst AS (SELECT s, min(doc_id) AS doc_id FROM sh GROUP BY 1),
         |nov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel
         |        FROM fst GROUP BY 1)
         |SELECT d.doc_id, coalesce(t.n_grams, 0) AS n_grams,
         |  coalesce(v.n_novel, 0) AS n_novel,
         |  CASE WHEN coalesce(t.n_grams, 0) = 0 THEN 1.0
         |       ELSE round(CAST(coalesce(v.n_novel, 0) AS DOUBLE)
         |                    / t.n_grams, 4) END AS novelty
         |FROM documents d LEFT JOIN tot t ON d.doc_id = t.doc_id
         |LEFT JOIN nov v ON d.doc_id = v.doc_id""".stripMargin,
    // top-k occurrence-mass coverage; deterministic (count desc, sh asc)
    // cutoff, the text_ngram_topk rule
    "text_ngram_coverage" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |shall AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS sh
         |          FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |          WHERE len(t) >= 3),
         |counts AS (SELECT sh, CAST(count(*) AS BIGINT) AS c
         |           FROM shall GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM counts),
         |top AS (SELECT c,
         |          row_number() OVER (ORDER BY c DESC, sh ASC) AS r
         |        FROM counts QUALIFY r <= 1000),
         |g AS (SELECT k FROM unnest([10, 100, 1000]) AS t(k)),
         |cov AS (SELECT g.k, CAST(sum(top.c) AS BIGINT) AS covered
         |        FROM top, g WHERE top.r <= g.k GROUP BY 1)
         |SELECT CAST(g.k AS INTEGER) AS k,
         |  coalesce(cov.covered, 0) AS covered_occurrences,
         |  t.total AS total_occurrences,
         |  CASE WHEN t.total > 0
         |       THEN round(CAST(coalesce(cov.covered, 0) AS DOUBLE)
         |                    / t.total, 4)
         |       ELSE 0.0 END AS coverage
         |FROM g LEFT JOIN cov ON g.k = cov.k, tot t""".stripMargin,
    // stratified budget: the same quality grid, cumsum per LANGUAGE
    "corpus_budget_mix" ->
      s"""WITH m AS (
         |  SELECT doc_id, lang,
         |    CAST(len(text) AS DOUBLE) AS nc,
         |    CAST(len($tokSql) AS DOUBLE) AS nt,
         |    CAST(len(regexp_extract_all(text, '$punctClass')) AS DOUBLE) AS np
         |  FROM documents),
         |q AS (SELECT doc_id, lang, CAST(nt AS BIGINT) AS n_tokens,
         |    CAST(round(least(nt / 64.0, 1.0) * (1.0 - np / nc) * 10000)
         |      AS BIGINT) AS qk
         |  FROM m),
         |c AS (SELECT doc_id, lang, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY qk DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM q)
         |SELECT doc_id, lang, n_tokens, cum_tokens,
         |  cum_tokens <= 4000 AS selected
         |FROM c""".stripMargin,
    // proportional interleave: both engines compute the stride key with
    // identical IEEE ops on identical integers, so the two plain windows
    // here replay Spark's bucketed prefix-sum order exactly
    "corpus_interleave" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS src_rank,
        |    count(*) OVER (PARTITION BY source) AS n_s
        |  FROM documents)
        |SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank,
        |  CAST(row_number() OVER (
        |    ORDER BY (src_rank - 0.5) / n_s, source, doc_id)
        |    AS BIGINT) AS train_order
        |FROM r""".stripMargin,
    // whole-doc histogram packing: the CASE ladder interpolates the SAME
    // power-of-two classes the Spark side folds over; one row_number per
    // class reproduces the (bucket, doc_id) window order
    "corpus_pack_bins" -> {
      val ladder = graft.llm.TextOps.packClasses(512)
      val caseChain = ladder.init
        .map(c => s"WHEN n_tok <= $c THEN $c").mkString(" ")
      s"""WITH t AS (SELECT doc_id,
         |        least(CAST(len($tokSql) AS BIGINT), 512) AS n_tok
         |      FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |        CASE $caseChain ELSE ${ladder.last} END AS len_class
         |      FROM t),
         |r AS (SELECT doc_id, n_tok, len_class,
         |        row_number() OVER (PARTITION BY len_class
         |          ORDER BY doc_id) - 1 AS idx
         |      FROM c)
         |SELECT doc_id, n_tok, len_class,
         |  CAST(idx // (512 // len_class) AS BIGINT) AS pack_id,
         |  CAST(idx % (512 // len_class) AS BIGINT) AS slot
         |FROM r""".stripMargin
    },
    // jaccard = inter/(|A|+|B|-inter) over distinct word 3-grams: pure
    // integer arithmetic into one double division — engine-stable.
    // edit verification (r11): the jaccard candidates at tau 0.5
    // re-scored by exact character Levenshtein
    "dedup_edit_verify" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |            count(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |jac AS (
         |  SELECT doc_a, doc_b,
         |    CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS j
         |  FROM pairs
         |  JOIN counts ca ON doc_a = ca.doc_id
         |  JOIN counts cb ON doc_b = cb.doc_id
         |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter)
         |    >= 0.5)
         |SELECT doc_a, doc_b, round(j, 4) AS jaccard,
         |  CAST(levenshtein(ta.text, tb.text) AS INT) AS edit_distance,
         |  CASE WHEN greatest(len(ta.text), len(tb.text)) = 0 THEN 1.0
         |    ELSE round(1.0 - CAST(levenshtein(ta.text, tb.text) AS DOUBLE)
         |      / greatest(len(ta.text), len(tb.text)), 4) END AS edit_sim
         |FROM jac
         |JOIN documents ta ON doc_a = ta.doc_id
         |JOIN documents tb ON doc_b = tb.doc_id""".stripMargin,
    // threshold sweep (r11): the jaccard pair frame at the grid MIN,
    // rolled up per tau; zero-pair taus still report
    "dedup_threshold_sweep" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |            count(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |jac AS (
         |  SELECT doc_a, doc_b,
         |    CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS j
         |  FROM pairs
         |  JOIN counts ca ON doc_a = ca.doc_id
         |  JOIN counts cb ON doc_b = cb.doc_id),
         |taus(tau) AS (VALUES (0.3), (0.5), (0.7), (0.9)),
         |tagged AS (
         |  SELECT taus.tau, doc_a, doc_b FROM jac, taus WHERE j >= tau),
         |np AS (SELECT tau, CAST(count(*) AS BIGINT) AS n_pairs
         |       FROM tagged GROUP BY 1),
         |nd AS (
         |  SELECT tau, CAST(count(DISTINCT d) AS BIGINT) AS n_docs FROM (
         |    SELECT tau, doc_a AS d FROM tagged
         |    UNION ALL SELECT tau, doc_b FROM tagged)
         |  GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
         |SELECT taus.tau,
         |  coalesce(np.n_pairs, 0) AS n_pairs,
         |  coalesce(nd.n_docs, 0) AS n_docs,
         |  round(CAST(coalesce(nd.n_docs, 0) AS DOUBLE) / tot.n, 4)
         |    AS doc_share
         |FROM taus LEFT JOIN np ON taus.tau = np.tau
         |LEFT JOIN nd ON taus.tau = nd.tau, tot""".stripMargin,
    // Heaps-law curve (r11): id-range checkpoints, conditional sums
    // pairwise source-vocab overlap: distinct (source, token) once,
    // pair counts via the token self-join (bounded by |vocab|·S²),
    // marginals joined back; empty-split '' token filtered identically
    "vocab_overlap" ->
      s"""WITH st AS (
         |  SELECT DISTINCT source, t.tok
         |  FROM documents, unnest($tokSql) AS t(tok)
         |  WHERE length(t.tok) > 0),
         |marg AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab
         |  FROM st GROUP BY 1),
         |c AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(count(*) AS BIGINT) AS shared
         |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT ma.source AS source_a, mb.source AS source_b,
         |  ma.vocab AS vocab_a, mb.vocab AS vocab_b,
         |  coalesce(c.shared, 0) AS shared,
         |  round(CAST(coalesce(c.shared, 0) AS DOUBLE)
         |    / CAST(ma.vocab + mb.vocab - coalesce(c.shared, 0) AS DOUBLE),
         |    4) AS jaccard,
         |  round(CAST(coalesce(c.shared, 0) AS DOUBLE)
         |    / CAST(ma.vocab AS DOUBLE), 4) AS containment_a,
         |  round(CAST(coalesce(c.shared, 0) AS DOUBLE)
         |    / CAST(mb.vocab AS DOUBLE), 4) AS containment_b
         |FROM marg ma JOIN marg mb ON ma.source < mb.source
         |LEFT JOIN c
         |  ON c.source_a = ma.source AND c.source_b = mb.source""".stripMargin,
    // per-source lexical health: string-token twin of the hashed
    // Spark path (xxhash collisions = the standard vanishing trade)
    "corpus_vocab_profile" ->
      s"""WITH tok AS (SELECT source, unnest($tokSql) AS t FROM documents),
         |counts AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY 1, 2),
         |v AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS vocab,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS hapax
         |  FROM counts GROUP BY 1),
         |d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1)
         |SELECT v.source, n_docs, n_tokens, vocab, hapax,
         |  round(CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
         |    AS ttr,
         |  round(CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE), 4)
         |    AS hapax_share,
         |  round(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)
         |    AS mean_doc_tokens
         |FROM v JOIN d ON v.source = d.source""".stripMargin,
    // numeric-content density: full-token numeric regex on the nonempty
    // token array, global-flag char strips, greatest() guards on both
    // engines
    "text_numeric_density" ->
      s"""SELECT doc_id,
         |  len(list_filter($tokSql, x -> length(x) > 0)) AS n_tokens,
         |  len(list_filter($tokSql,
         |    x -> regexp_matches(x, '^[0-9]+([.,][0-9]+)*%?$$')))
         |    AS numeric_tokens,
         |  length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_chars,
         |  round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
         |      AS DOUBLE)
         |    / CAST(greatest(length(text), 1) AS DOUBLE), 4)
         |    AS digit_char_ratio,
         |  round(CAST(len(list_filter($tokSql,
         |      x -> regexp_matches(x, '^[0-9]+([.,][0-9]+)*%?$$')))
         |      AS DOUBLE)
         |    / CAST(greatest(len(list_filter($tokSql,
         |      x -> length(x) > 0)), 1) AS DOUBLE), 4)
         |    AS numeric_token_share,
         |  regexp_matches(text, '[0-9]{8}') AS has_long_number
         |FROM documents""".stripMargin,
    // Good-Turing unseen mass p0 = V1/N and singleton discount 2*V2/V1;
    // exact counts, one IEEE tree 4dp
    "vocab_goodturing" ->
      s"""WITH c AS (
         |  SELECT source, t.tok, CAST(count(*) AS BIGINT) AS c
         |  FROM documents, unnest($tokSql) AS t(tok)
         |  WHERE length(t.tok) > 0 GROUP BY 1, 2)
         |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
         |  CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(c) AS DOUBLE), 4) AS p_unseen,
         |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 4) AS singleton_share,
         |  round(2.0 * CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
         |      AS DOUBLE)
         |    / CAST(greatest(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END), 1)
         |      AS DOUBLE), 4) AS gt_singleton_discount
         |FROM c GROUP BY source""".stripMargin,
    // per-source word-length histogram, lengths capped into a 20+ tail
    // bucket; shares/cumulative on the <=20-cell frame
    "text_word_length_profile" ->
      s"""WITH cells AS (
         |  SELECT source, least(length(t.tok), 20) AS word_len,
         |    CAST(count(*) AS BIGINT) AS n_tokens
         |  FROM documents, unnest($tokSql) AS t(tok)
         |  WHERE length(t.tok) > 0 GROUP BY 1, 2)
         |SELECT source, word_len, n_tokens,
         |  round(CAST(n_tokens AS DOUBLE)
         |    / CAST(sum(n_tokens) OVER (PARTITION BY source) AS DOUBLE), 4)
         |    AS share,
         |  round(CAST(sum(n_tokens)
         |      OVER (PARTITION BY source ORDER BY word_len) AS DOUBLE)
         |    / CAST(sum(n_tokens) OVER (PARTITION BY source) AS DOUBLE), 4)
         |    AS cum_share
         |FROM cells""".stripMargin,
    // casing audit on the ORIGINAL-case text (raw whitespace split, not
    // the lower-casing tokenizer)
    "text_case_profile" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> length(x) > 0) AS toks,
        |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
        |    length(regexp_replace(text, '[^A-Z]', '', 'g')) AS caps
        |  FROM documents)
        |SELECT doc_id, len(toks) AS n_tokens,
        |  len(list_filter(toks, x -> regexp_matches(x, '^[A-Z]{2,}$')))
        |    AS upper_tokens,
        |  round(CAST(len(list_filter(toks,
        |      x -> regexp_matches(x, '^[A-Z]{2,}$'))) AS DOUBLE)
        |    / CAST(greatest(len(toks), 1) AS DOUBLE), 4) AS upper_share,
        |  round(CAST(len(list_filter(toks,
        |      x -> regexp_matches(x, '^[A-Z][a-z]+$'))) AS DOUBLE)
        |    / CAST(greatest(len(toks), 1) AS DOUBLE), 4) AS title_share,
        |  round(CAST(caps AS DOUBLE)
        |    / CAST(greatest(alpha, 1) AS DOUBLE), 4) AS caps_char_ratio,
        |  CAST(caps AS DOUBLE) / CAST(greatest(alpha, 1) AS DOUBLE) > 0.3
        |    AS is_shouting
        |FROM t""".stripMargin,
    // normalized 32-char prefix families (n >= 2 only): lower, collapse
    // whitespace, take the head; min doc_id is the exemplar
    "corpus_prefix_clusters" ->
      """WITH p AS (
        |  SELECT substring(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), 1, 32) AS prefix,
        |    doc_id, source
        |  FROM documents),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_total
        |  FROM documents),
        |g AS (
        |  SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |    min(doc_id) AS exemplar_doc_id
        |  FROM p GROUP BY 1)
        |SELECT prefix, n_docs, n_sources, exemplar_doc_id,
        |  round(CAST(n_docs AS DOUBLE) / CAST(n_docs_total AS DOUBLE), 4)
        |    AS corpus_share
        |FROM g, t WHERE n_docs >= 2""".stripMargin,
    // sentence units = [.!?]+ runs, trimmed, empties dropped (both
    // engines); dup fraction and repeat counts on exact (doc, sentence)
    // counts
    "text_sentence_stats" ->
      """WITH s0 AS (
        |  SELECT doc_id, trim(s.sent) AS sent
        |  FROM documents,
        |    unnest(string_split_regex(text, '[.!?]+')) AS s(sent)),
        |s1 AS (SELECT doc_id, sent,
        |    len(list_filter(regexp_split_to_array(sent, '\s+'),
        |      x -> length(x) > 0)) AS words
        |  FROM s0 WHERE length(sent) > 0),
        |g AS (
        |  SELECT doc_id, sent, words, CAST(count(*) AS BIGINT) AS c
        |  FROM s1 GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_sentences,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(max(c) AS BIGINT) AS max_repeat,
        |  round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4)
        |    AS dup_sentence_frac,
        |  round(CAST(sum(c * words) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4)
        |    AS avg_sentence_words
        |FROM g GROUP BY doc_id""".stripMargin,
    // source-mix diversity: the entropy identity of events_user_entropy
    // plus EXACT Σc² (DECIMAL) for Simpson / effective sources
    "corpus_source_diversity" ->
      """WITH ls AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |            FROM documents GROUP BY 1, 2),
        |a AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs,
        |        CAST(count(*) AS BIGINT) AS n_sources,
        |        sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
        |          AS clogc,
        |        sum(CAST(c AS DECIMAL(38,0)) * c) AS c2
        |      FROM ls GROUP BY 1)
        |SELECT lang, n_docs, n_sources,
        |  round(greatest(0.0, ln(CAST(n_docs AS DOUBLE))
        |    - clogc / CAST(n_docs AS DOUBLE)), 4) AS entropy,
        |  round(CAST(c2 AS DOUBLE)
        |    / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)), 4)
        |    AS simpson,
        |  round(CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)
        |    / CAST(c2 AS DOUBLE), 4) AS effective_sources
        |FROM a""".stripMargin,
    // quality budget curve: the text_quality score tree, floor-binned
    // to 20 bars, descending prefix sums over the ≤20-row bucket frame
    "corpus_quality_budget_curve" ->
      s"""WITH m AS (SELECT
         |    least(CAST(floor(20.0 *
         |      (least(CAST(len($tokSql) AS DOUBLE) / 64.0, 1.0)
         |        * (1.0 - CAST(len(regexp_extract_all(text,
         |            '$punctClass')) AS DOUBLE)
         |          / CAST(len(text) AS DOUBLE)))) AS BIGINT), 19)
         |      AS bucket,
         |    CAST(len($tokSql) AS BIGINT) AS nt
         |  FROM documents),
         |b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS nd,
         |        CAST(sum(nt) AS BIGINT) AS ntk
         |      FROM m GROUP BY 1),
         |c AS (SELECT bucket,
         |        CAST(sum(nd) OVER w AS BIGINT) AS n_docs_ge,
         |        CAST(sum(ntk) OVER w AS BIGINT) AS n_tokens_ge,
         |        CAST(sum(nd) OVER () AS BIGINT) AS td,
         |        CAST(sum(ntk) OVER () AS BIGINT) AS tt
         |      FROM b WINDOW w AS (ORDER BY bucket DESC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT round(CAST(bucket AS DOUBLE) / 20.0, 2) AS threshold,
         |  n_docs_ge, n_tokens_ge,
         |  round(CAST(n_docs_ge AS DOUBLE) / CAST(td AS DOUBLE), 4)
         |    AS doc_share,
         |  round(CAST(n_tokens_ge AS DOUBLE) / CAST(tt AS DOUBLE), 4)
         |    AS token_share
         |FROM c""".stripMargin,
    // vocabulary-concentration Gini: doubled rank-sum algebra of
    // q_acctbal_gini over per-(lang, term) frequencies
    "text_vocab_gini" ->
      s"""WITH tok AS (SELECT lang, unnest($tokSql) AS t
         |             FROM documents),
         |tf AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS freq
         |       FROM tok WHERE len(t) > 0 GROUP BY 1, 2),
         |r AS (SELECT lang, freq, row_number() OVER (PARTITION BY lang
         |        ORDER BY freq) AS rn
         |      FROM tf),
         |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |        sum(CAST(freq AS DECIMAL(38,0))) AS tot,
         |        sum(CAST(2 * rn AS DECIMAL(38,0))
         |          * CAST(freq AS DECIMAL(38,0))) AS rs2
         |      FROM r GROUP BY 1)
         |SELECT lang, n AS n_terms,
         |  round(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE), 4)
         |    AS mean_freq,
         |  round(CAST(rs2 AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
         |    - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE), 4) AS gini
         |FROM a""".stripMargin,
    // foreign-syntax audit: exact char-class extraction counts — the
    // corpus is clean prose, so the all-zero row set IS the assertion
    "text_markup_audit" ->
      """WITH m AS (SELECT source,
        |    CAST(len(regexp_extract_all(text, '[{}()\[\];]'))
        |      AS BIGINT) AS braces,
        |    CAST(len(regexp_extract_all(text, '<[a-zA-Z/]'))
        |      AS BIGINT) AS tags,
        |    CAST(len(regexp_extract_all(text, 'http|www\.'))
        |      AS BIGINT) AS links,
        |    CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]@[a-zA-Z0-9]'))
        |      AS BIGINT) AS emails
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(braces) AS BIGINT) AS brace_chars,
        |  CAST(sum(tags) AS BIGINT) AS tag_hits,
        |  CAST(sum(links) AS BIGINT) AS link_hits,
        |  CAST(sum(emails) AS BIGINT) AS email_hits,
        |  CAST(sum(CASE WHEN braces + tags + links + emails > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS foreign_docs,
        |  round(CAST(sum(CASE WHEN braces + tags + links + emails > 0
        |      THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 4) AS foreign_share
        |FROM m GROUP BY 1""".stripMargin,
    "vocab_growth" ->
      s"""WITH b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
         |           FROM documents),
         |ks(k) AS (VALUES (1), (2), (4), (8)),
         |cuts AS (SELECT k, lo + (hi - lo) * k // 8 AS c FROM ks, b),
         |toks AS (SELECT doc_id, unnest($tokSql) AS t FROM documents),
         |occ AS (
         |  SELECT k, CAST(sum(CASE WHEN doc_id <= c THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_tokens
         |  FROM toks, cuts GROUP BY k, c),
         |fd AS (SELECT t, min(doc_id) AS fd FROM toks GROUP BY t),
         |voc AS (
         |  SELECT k, CAST(sum(CASE WHEN fd <= c THEN 1 ELSE 0 END)
         |    AS BIGINT) AS vocab
         |  FROM fd, cuts GROUP BY k, c),
         |nd AS (
         |  SELECT k, CAST(sum(CASE WHEN doc_id <= c THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_docs
         |  FROM documents, cuts GROUP BY k, c),
         |pts AS (
         |  SELECT ln(CAST(n_tokens AS DOUBLE)) AS x,
         |    ln(CAST(vocab AS DOUBLE)) AS y
         |  FROM occ JOIN voc USING (k)
         |  WHERE n_tokens > 0 AND vocab > 0),
         |beta AS (
         |  SELECT CASE
         |    WHEN count(*) < 2 THEN 0.0
         |    WHEN CAST(count(*) AS DOUBLE) * sum(x * x) - sum(x) * sum(x)
         |      = 0.0 THEN 0.0
         |    ELSE round(
         |      (CAST(count(*) AS DOUBLE) * sum(x * y) - sum(x) * sum(y))
         |      / (CAST(count(*) AS DOUBLE) * sum(x * x) - sum(x) * sum(x)),
         |      4) + 0.0 END AS hb
         |  FROM pts)
         |SELECT CAST(k AS INT) AS eighths, n_docs, n_tokens, vocab,
         |  beta.hb AS heaps_beta
         |FROM nd JOIN occ USING (k) JOIN voc USING (k), beta""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |            count(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
         |FROM pairs
         |JOIN counts ca ON doc_a = ca.doc_id
         |JOIN counts cb ON doc_b = cb.doc_id
         |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8""".stripMargin,
    // r13: the xxhash64 replay ([[xxhashCtes]]) makes the MinHash
    // signature VALUES oracle-checkable — banding, agreement estimate
    // and the ≥0.5 gate all replayed downstream of the same hashes
    "dedup_minhash" ->
      s"""WITH RECURSIVE $mhSigBaseCtes,
         |$mhPairsCtes
         |SELECT doc_a, doc_b, est_sim FROM mhpairs""".stripMargin,
    // the incremental probe is spec-proven equal to the batch pair set
    // restricted to pairs touching the doc_id%10>=6 split (store holds
    // the <6 split; banding is per-pair, so restriction commutes)
    "dedup_incremental_minhash" ->
      s"""WITH RECURSIVE $mhSigBaseCtes,
         |$mhPairsCtes
         |SELECT doc_a, doc_b, est_sim FROM mhpairs
         |WHERE doc_a % 10 >= 6 OR doc_b % 10 >= 6""".stripMargin,
    // minhash candidates vs exact jaccard@0.5 truth — both sides replayed
    // over the SAME shingle CTEs, so the metric row is fully value-gated
    "dedup_eval" ->
      s"""WITH RECURSIVE $mhSigBaseCtes,
         |$mhPairsCtes,
         |jcounts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |jinter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |jpairs AS (SELECT doc_a, doc_b FROM jinter
         |  JOIN jcounts ca ON doc_a = ca.doc_id
         |  JOIN jcounts cb ON doc_b = cb.doc_id
         |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5),
         |j AS (SELECT (c.doc_a IS NOT NULL)::INT AS in_c,
         |    (t.doc_a IS NOT NULL)::INT AS in_t
         |  FROM (SELECT DISTINCT doc_a, doc_b FROM mhpairs) c
         |  FULL OUTER JOIN jpairs t
         |    ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b),
         |agg AS (SELECT CAST(sum(in_c) AS BIGINT) AS n_candidates,
         |    CAST(sum(in_t) AS BIGINT) AS n_truth,
         |    CAST(sum(in_c * in_t) AS BIGINT) AS n_hit FROM j)
         |SELECT n_candidates, n_truth, n_hit,
         |  CASE WHEN n_candidates > 0
         |    THEN round(CAST(n_hit AS DOUBLE) / n_candidates, 4)
         |    ELSE 0.0 END AS precision,
         |  CASE WHEN n_truth > 0
         |    THEN round(CAST(n_hit AS DOUBLE) / n_truth, 4)
         |    ELSE 0.0 END AS recall,
         |  CASE WHEN n_candidates + n_truth > 0
         |    THEN round(CAST(n_hit * 2 AS DOUBLE) / (n_candidates + n_truth),
         |      4)
         |    ELSE 0.0 END AS f1
         |FROM agg""".stripMargin,
    // per-banding occupancy pair mass measured over the replayed
    // signatures; analytic recalls are the SAME driver-computed literals
    // the engine emits (shared Scala expression, not a re-derivation)
    "minhash_tuning_report" -> {
      val arms = Seq(8, 16, 32).map { b =>
        val r = graft.llm.Dedup.NumHashes / b
        val recs = Seq(0.5, 0.7, 0.9).map { s =>
          val rec = 1.0 - math.pow(1.0 - math.pow(s, r), b)
          val lit = BigDecimal(rec).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble
          s"CAST($lit AS DOUBLE) AS recall_s${(s * 100).round}"
        }.mkString(", ")
        s"""(SELECT $b AS num_bands, $r AS rows_per_band, $recs,
           |   (SELECT CAST(sum(c * (c - 1)) // 2 AS BIGINT) FROM
           |     (SELECT count(*) AS c FROM
           |       (SELECT doc_id, j, sig[$r*j+1:$r*j+$r] AS bk
           |        FROM sigs, unnest(generate_series(0, ${b - 1})) AS bj(j))
           |        bnd
           |      GROUP BY j, bk) occ) AS est_candidate_pairs)""".stripMargin
      }
      s"""WITH RECURSIVE $mhSigBaseCtes
         |SELECT * FROM (${arms.mkString(" UNION ALL ")})""".stripMargin
    },
    "dedup_simhash" ->
      s"""WITH RECURSIVE $mhSigBaseCtes,
         |$shPairsCtes
         |SELECT doc_a, doc_b, hamming FROM spairs""".stripMargin,
    "dedup_incremental_simhash" ->
      s"""WITH RECURSIVE $mhSigBaseCtes,
         |$shPairsCtes
         |SELECT doc_a, doc_b, hamming FROM spairs
         |WHERE doc_a % 10 >= 6 OR doc_b % 10 >= 6""".stripMargin,
    // df histogram over STRING shingles (the hash is a transport detail
    // — xxhash64 collisions are the standard vanishing trade); bit-length
    // buckets, exact pair products, share guards the zero-pair corpus
    "dedup_pair_budget" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |df AS (SELECT s, CAST(count(*) AS BIGINT) AS df
         |       FROM sh GROUP BY 1),
         |b AS (SELECT CAST(length(bin(df)) - 1 AS INTEGER) AS df_bucket,
         |        CAST(count(*) AS BIGINT) AS n_shingles,
         |        CAST(sum(df) AS BIGINT) AS doc_slots,
         |        sum((df * (df - 1)) // 2) AS pm
         |      FROM df GROUP BY 1),
         |t AS (SELECT CAST(sum(pm) AS DOUBLE) AS tp FROM b)
         |SELECT df_bucket,
         |  CAST(pow(2.0, CAST(df_bucket AS DOUBLE)) AS BIGINT) AS lo_df,
         |  n_shingles, doc_slots, CAST(pm AS BIGINT) AS pair_mass,
         |  CASE WHEN tp > 0.0
         |    THEN round(CAST(pm AS DOUBLE) / tp, 4) ELSE 0.0 END
         |    AS pair_share,
         |  CASE WHEN tp > 0.0
         |    THEN round(CAST(sum(pm) OVER (ORDER BY df_bucket)
         |      AS DOUBLE) / tp, 4) ELSE 0.0 END AS cum_pair_share
         |FROM b, t""".stripMargin,
    // the jaccard pair CTE labeled by both ends' sources; each pair
    // explodes to its two ends so n_pairs = rows // 2 exactly and the
    // distinct-doc count rides the same group
    "dedup_cross_source" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |            count(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |jp AS (SELECT doc_a, doc_b FROM pairs
         |       JOIN counts ca ON doc_a = ca.doc_id
         |       JOIN counts cb ON doc_b = cb.doc_id
         |       WHERE CAST(inter AS DOUBLE)
         |         / (ca.n_sh + cb.n_sh - inter) >= 0.8),
         |lab AS (SELECT least(da.source, db.source) AS source_a,
         |          greatest(da.source, db.source) AS source_b,
         |          jp.doc_a, jp.doc_b
         |        FROM jp
         |        JOIN documents da ON jp.doc_a = da.doc_id
         |        JOIN documents db ON jp.doc_b = db.doc_id),
         |ex AS (SELECT source_a, source_b, doc_a AS d FROM lab
         |       UNION ALL SELECT source_a, source_b, doc_b FROM lab),
         |a AS (SELECT source_a, source_b,
         |        CAST(count(*) // 2 AS BIGINT) AS n_pairs,
         |        CAST(count(DISTINCT d) AS BIGINT) AS n_docs
         |      FROM ex GROUP BY 1, 2),
         |t AS (SELECT CAST(sum(n_pairs) AS DOUBLE) AS tp FROM a)
         |SELECT source_a, source_b, source_a <> source_b AS is_cross,
         |  n_pairs, n_docs,
         |  round(CAST(n_pairs AS DOUBLE) / tp, 4) AS pair_share
         |FROM a, t""".stripMargin,
    // the jaccard CC chain's family labels + textQuality's composite
    // in one corpus pass; keep-first = min doc_id per family
    "dedup_quality_impact" ->
      s"""WITH RECURSIVE $jaccardCcSql,
         |minr AS (SELECT a, min(b) AS mb FROM reach GROUP BY a),
         |d AS (SELECT dd.doc_id,
         |    CASE WHEN dd.doc_id =
         |        least(coalesce(m.mb, dd.doc_id), dd.doc_id)
         |      THEN 'kept' ELSE 'dropped' END AS disposition,
         |    CAST(len($tokSql) AS BIGINT) AS n_toks,
         |    CAST(len(text) AS BIGINT) AS n_chars,
         |    least(CAST(len($tokSql) AS DOUBLE) / 64.0, 1.0) *
         |      (1.0 - CAST(len(regexp_extract_all(text, '$punctClass'))
         |        AS DOUBLE) / CAST(len(text) AS DOUBLE)) AS qs
         |  FROM documents dd LEFT JOIN minr m ON dd.doc_id = m.a),
         |a AS (SELECT disposition,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |    round(avg(qs), 4) AS mean_quality,
         |    round(CAST(sum(n_chars) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE), 4) AS mean_chars
         |  FROM d GROUP BY 1),
         |t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tt FROM a)
         |SELECT disposition, n_docs, n_tokens, mean_quality, mean_chars,
         |  round(CAST(n_tokens AS DOUBLE) / tt, 4) AS token_share
         |FROM a, t""".stripMargin,
    // per-doc top-5 jaccard neighbors: the jaccard oracle directed
    // (both orientations), 4dp-rounded BEFORE the row_number rank so
    // boundary ties resolve identically on both engines
    "text_similar_topk" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS doc_id, b.doc_id AS nbr_id,
         |            count(*) AS inter
         |          FROM sh a JOIN sh b
         |            ON a.s = b.s AND a.doc_id <> b.doc_id
         |          GROUP BY 1, 2),
         |j AS (SELECT p.doc_id, nbr_id,
         |        round(CAST(inter AS DOUBLE) /
         |              (ca.n_sh + cb.n_sh - inter), 4) AS jaccard
         |      FROM pairs p
         |      JOIN counts ca ON p.doc_id = ca.doc_id
         |      JOIN counts cb ON nbr_id = cb.doc_id),
         |r AS (SELECT doc_id, nbr_id, jaccard,
         |        row_number() OVER (PARTITION BY doc_id
         |                           ORDER BY jaccard DESC, nbr_id) AS rn
         |      FROM j)
         |SELECT doc_id, nbr_id, jaccard FROM r WHERE rn <= 5""".stripMargin,
    // cross-modal consistency: the jaccard pair CTE joined to per-pair
    // embedding cosines (norms/dots via the knn-oracle unnest pattern,
    // restricted to the duplicate-bounded pair set), cos 4dp
    "dedup_embed_consistency" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |        count(*) AS inter
         |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |j AS (SELECT doc_a, doc_b,
         |        CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter)
         |          AS jaccard
         |      FROM p
         |      JOIN counts ca ON doc_a = ca.doc_id
         |      JOIN counts cb ON doc_b = cb.doc_id
         |      WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter)
         |            >= 0.8),
         |norms AS (
         |  SELECT vec_id,
         |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) *
         |             CAST(embedding[g.i] AS DOUBLE))) AS nrm
         |  FROM embeddings, unnest(generate_series(1, len(embedding)))
         |    AS g(i)
         |  GROUP BY vec_id),
         |d AS (
         |  SELECT j.doc_a, j.doc_b, j.jaccard,
         |    sum(CAST(a.embedding[g.i] AS DOUBLE) *
         |        CAST(b.embedding[g.i] AS DOUBLE)) AS dt
         |  FROM j
         |  JOIN embeddings a ON j.doc_a = a.vec_id
         |  JOIN embeddings b ON j.doc_b = b.vec_id,
         |    unnest(generate_series(1, len(a.embedding))) AS g(i)
         |  GROUP BY 1, 2, 3)
         |SELECT d.doc_a, d.doc_b, d.jaccard,
         |  round(dt / (na.nrm * nb.nrm), 4) AS cos,
         |  round(dt / (na.nrm * nb.nrm), 4) >= 0.9 AS consistent
         |FROM d
         |JOIN norms na ON d.doc_a = na.vec_id
         |JOIN norms nb ON d.doc_b = nb.vec_id""".stripMargin,
    // cross-table linkage: the jaccard oracle split into even/odd
    // parity sides, (left, right) orientation instead of a < b
    "link_jaccard" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS left_id, b.doc_id AS right_id,
         |            count(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s
         |          WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
         |          GROUP BY 1, 2)
         |SELECT left_id, right_id,
         |  CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
         |FROM pairs
         |JOIN counts ca ON left_id = ca.doc_id
         |JOIN counts cb ON right_id = cb.doc_id
         |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5""".stripMargin,
    // containment = inter / min(|A|,|B|): exact ints into one double
    // division, the jaccard oracle with a different denominator
    "dedup_containment" ->
      s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
         |       WHERE len(t) >= 3),
         |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |            count(*) AS inter
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(inter AS DOUBLE) / least(ca.n_sh, cb.n_sh) AS containment
         |FROM pairs
         |JOIN counts ca ON doc_a = ca.doc_id
         |JOIN counts cb ON doc_b = cb.doc_id
         |WHERE CAST(inter AS DOUBLE) / least(ca.n_sh, cb.n_sh) >= 0.9""".stripMargin,
    // connected-component dedup: keep the smallest doc_id per near-dup
    // component (recursive CTE computes the transitive closure)
    "dedup_corpus" ->
      s"""WITH RECURSIVE $jaccardCcSql,
         |drops AS (SELECT DISTINCT a FROM reach WHERE b < a)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT a FROM drops)""".stripMargin,
    // the same jaccard CC chain aggregated per component: family = min
    // doc_id (the kept representative), sizes + chars removed — all ints
    "corpus_families" ->
      s"""WITH RECURSIVE $jaccardCcSql,
         |minr AS (SELECT a, min(b) AS mb FROM reach GROUP BY a),
         |fam AS (SELECT d.doc_id,
         |          least(coalesce(m.mb, d.doc_id), d.doc_id) AS family,
         |          d.n_chars
         |        FROM documents d LEFT JOIN minr m ON d.doc_id = m.a)
         |SELECT family, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) - 1 AS BIGINT) AS n_dropped,
         |  CAST(sum(CASE WHEN doc_id <> family THEN n_chars ELSE 0 END)
         |    AS BIGINT) AS chars_dropped
         |FROM fam GROUP BY family
         |HAVING count(*) >= 2""".stripMargin,
    // the same CC chain with lang attached: per family, language count
    // and deterministic majority (count desc, lang asc)
    "corpus_family_purity" ->
      s"""WITH RECURSIVE $jaccardCcSql,
         |minr AS (SELECT a, min(b) AS mb FROM reach GROUP BY a),
         |fam AS (SELECT d.doc_id, d.lang,
         |          least(coalesce(m.mb, d.doc_id), d.doc_id) AS family
         |        FROM documents d LEFT JOIN minr m ON d.doc_id = m.a),
         |fl AS (SELECT family, lang, CAST(count(*) AS BIGINT) AS n
         |       FROM fam GROUP BY 1, 2),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY family
         |         ORDER BY n DESC, lang ASC) AS r FROM fl),
         |agg AS (SELECT family, CAST(sum(n) AS BIGINT) AS n_docs,
         |          CAST(count(*) AS BIGINT) AS n_langs,
         |          max(CASE WHEN r = 1 THEN lang END) AS majority_lang,
         |          max(CASE WHEN r = 1 THEN n END) AS majority_n
         |        FROM rk GROUP BY 1)
         |SELECT family, n_docs, n_langs, majority_lang,
         |  round(CAST(majority_n AS DOUBLE) / n_docs, 4) AS purity
         |FROM agg WHERE n_docs >= 2""".stripMargin,
    // composed refinery: scrub → quality gate on clean text → exact
    // content dedup keep-first → consistent-hash stratified sample. All
    // float terms are single divisions/multiplies of exact integers —
    // bit-identical on both engines (same arithmetic text_quality uses).
    "corpus_refine" -> {
      val cases = TextOps.SampleRatesPermille
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
      s"""WITH s AS (
         |  SELECT doc_id, lang, source, $scrubSql AS ct FROM documents),
         |m AS (
         |  SELECT doc_id, lang, source, ct,
         |    CAST(len(${tokSqlOf("ct")}) AS DOUBLE) AS nt,
         |    CAST(len(ct) AS DOUBLE) AS nc,
         |    CAST(len(regexp_extract_all(ct, '$punctClass')) AS DOUBLE) AS np
         |  FROM s),
         |g AS (
         |  SELECT *, least(nt / 64.0, 1.0) * (1.0 - np / nc) AS qs FROM m
         |  WHERE CAST(nt AS BIGINT) >= 8
         |    AND least(nt / 64.0, 1.0) * (1.0 - np / nc) >= 0.25),
         |d AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(ct)) AS keeper
         |      FROM g)
         |SELECT doc_id, lang, source, CAST(nt AS BIGINT) AS n_tokens,
         |  qs AS quality_score
         |FROM d
         |WHERE doc_id = keeper
         |  AND (((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.SampleMultiplier})
         |       >> ${TextOps.SampleShift}) % 1000 <
         |    CASE lang $cases ELSE ${TextOps.SampleDefaultPermille} END""".stripMargin
    },
    // incremental dedup: the 60% split is the fingerprinted corpus, the
    // rest is the "new" batch; dup_of = corpus keeper, else earlier batch
    // twin, else -1 (kept). md5 hex strings match across engines.
    "dedup_incremental" ->
      """WITH c AS (SELECT md5(text) AS h, min(doc_id) AS keeper
        |           FROM documents WHERE doc_id % 10 < 6 GROUP BY 1),
        |b AS (SELECT doc_id, md5(text) AS h
        |      FROM documents WHERE doc_id % 10 >= 6),
        |wb AS (SELECT doc_id, h,
        |         min(doc_id) OVER (PARTITION BY h) AS first_b FROM b)
        |SELECT wb.doc_id,
        |  CAST(coalesce(c.keeper,
        |    CASE WHEN wb.first_b < wb.doc_id THEN wb.first_b END,
        |    -1) AS BIGINT) AS dup_of
        |FROM wb LEFT JOIN c ON wb.h = c.h""".stripMargin,
    // the Bloom-pruned probe must give the IDENTICAL answer — same
    // oracle as dedup_incremental (the sidecar changes I/O, not output)
    "dedup_incremental_bloom" ->
      """WITH c AS (SELECT md5(text) AS h, min(doc_id) AS keeper
        |           FROM documents WHERE doc_id % 10 < 6 GROUP BY 1),
        |b AS (SELECT doc_id, md5(text) AS h
        |      FROM documents WHERE doc_id % 10 >= 6),
        |wb AS (SELECT doc_id, h,
        |         min(doc_id) OVER (PARTITION BY h) AS first_b FROM b)
        |SELECT wb.doc_id,
        |  CAST(coalesce(c.keeper,
        |    CASE WHEN wb.first_b < wb.doc_id THEN wb.first_b END,
        |    -1) AS BIGINT) AS dup_of
        |FROM wb LEFT JOIN c ON wb.h = c.h""".stripMargin,
    // ranks (not raw float sims) are compared: adjacent-rank cosine margins
    // in this corpus are >=2e-5, far above cross-engine double noise, so
    // row_number ordering agrees. Tie-break on vec_id keeps it total.
    // PQ family (r11): per-subspace Lloyd chains (pqTrainCtes) + the
    // literal ADC fold, exact re-rank on the bounded survivor set
    "ann_pq_topk" ->
      s"""WITH $unitCteSql,
         |${pqTrainCtes("u")},
         |enc AS (SELECT vec_id, codes FROM e3),
         |$pqLutCte,
         |cand AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.query_id, enc.vec_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY $pqAdcSql DESC, enc.vec_id) AS arn
         |    FROM luts q, enc WHERE enc.vec_id <> q.query_id)
         |  WHERE arn <= 80)
         |SELECT query_id, rank, vec_id FROM (
         |  SELECT c.query_id, c.vec_id,
         |    row_number() OVER (PARTITION BY c.query_id
         |      ORDER BY list_dot_product(q.qv, u.v) DESC, c.vec_id)
         |      AS rank
         |  FROM cand c JOIN u ON c.vec_id = u.vec_id
         |  JOIN luts q ON q.query_id = c.query_id)
         |WHERE rank <= 10""".stripMargin,
    // IVF-PQ recall audit: the composed chain verbatim as approx,
    // the raw-cosine truth chain, recall left-join
    "ann_ivfpq_recall" ->
      s"""WITH $unitCteSql,
         |${lloydCte("u", 16, 2, "q")},
         |${ivfPqResidCte},
         |${pqTrainCtes("resid")},
         |enc0 AS (
         |  SELECT r.vec_id, r.cid, e.codes
         |  FROM resid r JOIN e3 e ON r.vec_id = e.vec_id),
         |$ivfPqProbesCte,
         |$pqLutCte,
         |cand AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT p.query_id, enc.vec_id,
         |      row_number() OVER (PARTITION BY p.query_id
         |        ORDER BY p.qdotc + $pqAdcSql DESC, enc.vec_id) AS arn
         |    FROM probes p
         |    JOIN enc0 enc ON enc.cid = p.cid
         |    JOIN luts q ON q.query_id = p.query_id
         |    WHERE enc.vec_id <> p.query_id)
         |  WHERE arn <= 80),
         |approx AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT c.query_id, c.vec_id,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY list_dot_product(q.qv, u.v) DESC, c.vec_id)
         |        AS rank
         |    FROM cand c JOIN u ON c.vec_id = u.vec_id
         |    JOIN luts q ON q.query_id = c.query_id)
         |  WHERE rank <= 10),
         |rnorms AS (
         |  SELECT vec_id,
         |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))) AS nrm
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
         |  GROUP BY vec_id),
         |rdots AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         |    sum(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)) AS dt
         |  FROM embeddings q, embeddings c,
         |    unnest(generate_series(1, len(q.embedding))) AS g(i)
         |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id GROUP BY 1, 2),
         |truth AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT d.query_id, d.vec_id,
         |      row_number() OVER (PARTITION BY d.query_id
         |        ORDER BY dt / (nq.nrm * nc.nrm) DESC, d.vec_id) AS rank
         |    FROM rdots d
         |    JOIN rnorms nq ON d.query_id = nq.vec_id
         |    JOIN rnorms nc ON d.vec_id = nc.vec_id)
         |  WHERE rank <= 10)
         |SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / count(*), 4) AS recall_at_k
         |FROM truth t LEFT JOIN approx a
         |  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
         |GROUP BY 1""".stripMargin,
    // IVF recall audit: the ann_ivf_topk chain verbatim as the approx
    // side, the raw-cosine truth chain, recall left-join
    "ann_ivf_recall" ->
      s"""WITH
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |${lloydCte("v", 16, 1, "i")},
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
         |      FROM v),
         |${assignCte("v", "ic1", "ax")},
         |assigned AS (
         |  SELECT n.vec_id, n.v, n.nrm, ax.cid
         |  FROM n JOIN ax ON n.vec_id = ax.vec_id),
         |probes AS (
         |  SELECT query_id, j AS cid, qnrm FROM (
         |    SELECT q.vec_id AS query_id, cc.j, q.nrm AS qnrm,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.v, cc.c)
         |          - list_dot_product(cc.c, cc.c) / 2.0 DESC, cc.j ASC)
         |        AS rn
         |    FROM n q, ic1 cc WHERE q.vec_id < 10) WHERE rn <= 4),
         |cand AS (
         |  SELECT p.query_id, a.vec_id,
         |    list_dot_product(q.v, a.v) / (p.qnrm * a.nrm) AS sim
         |  FROM assigned a JOIN probes p ON a.cid = p.cid
         |  JOIN n q ON q.vec_id = p.query_id
         |  WHERE a.vec_id <> p.query_id),
         |approx AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, vec_id) AS rank
         |    FROM cand) WHERE rank <= 10),
         |rnorms AS (
         |  SELECT vec_id,
         |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))) AS nrm
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
         |  GROUP BY vec_id),
         |rdots AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         |    sum(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)) AS dt
         |  FROM embeddings q, embeddings c,
         |    unnest(generate_series(1, len(q.embedding))) AS g(i)
         |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id GROUP BY 1, 2),
         |truth AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT d.query_id, d.vec_id,
         |      row_number() OVER (PARTITION BY d.query_id
         |        ORDER BY dt / (nq.nrm * nc.nrm) DESC, d.vec_id) AS rank
         |    FROM rdots d
         |    JOIN rnorms nq ON d.query_id = nq.vec_id
         |    JOIN rnorms nc ON d.vec_id = nc.vec_id)
         |  WHERE rank <= 10)
         |SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / count(*), 4) AS recall_at_k
         |FROM truth t LEFT JOIN approx a
         |  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
         |GROUP BY 1""".stripMargin,
    // PQ recall audit: the ann_pq_topk chain verbatim as the approx
    // side, the raw-cosine ann_topk chain as truth, recall left-join
    "ann_pq_recall" ->
      s"""WITH $unitCteSql,
         |${pqTrainCtes("u")},
         |enc AS (SELECT vec_id, codes FROM e3),
         |$pqLutCte,
         |cand AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.query_id, enc.vec_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY $pqAdcSql DESC, enc.vec_id) AS arn
         |    FROM luts q, enc WHERE enc.vec_id <> q.query_id)
         |  WHERE arn <= 80),
         |approx AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT c.query_id, c.vec_id,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY list_dot_product(q.qv, u.v) DESC, c.vec_id)
         |        AS rank
         |    FROM cand c JOIN u ON c.vec_id = u.vec_id
         |    JOIN luts q ON q.query_id = c.query_id)
         |  WHERE rank <= 10),
         |rnorms AS (
         |  SELECT vec_id,
         |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))) AS nrm
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
         |  GROUP BY vec_id),
         |rdots AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         |    sum(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)) AS dt
         |  FROM embeddings q, embeddings c,
         |    unnest(generate_series(1, len(q.embedding))) AS g(i)
         |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id GROUP BY 1, 2),
         |truth AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT d.query_id, d.vec_id,
         |      row_number() OVER (PARTITION BY d.query_id
         |        ORDER BY dt / (nq.nrm * nc.nrm) DESC, d.vec_id) AS rank
         |    FROM rdots d
         |    JOIN rnorms nq ON d.query_id = nq.vec_id
         |    JOIN rnorms nc ON d.vec_id = nc.vec_id)
         |  WHERE rank <= 10)
         |SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / count(*), 4) AS recall_at_k
         |FROM truth t LEFT JOIN approx a
         |  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
         |GROUP BY 1""".stripMargin,
    // IVF-PQ: coarse Lloyd on unit vectors, residual sub-codebooks,
    // ascore = q·c_cell + ADC; the serve-path index entry ranks by
    // ascore directly (no refine)
    "ann_ivfpq_topk" ->
      s"""WITH $unitCteSql,
         |${lloydCte("u", 16, 2, "q")},
         |${ivfPqResidCte},
         |${pqTrainCtes("resid")},
         |enc0 AS (
         |  SELECT r.vec_id, r.cid, e.codes
         |  FROM resid r JOIN e3 e ON r.vec_id = e.vec_id),
         |$ivfPqProbesCte,
         |$pqLutCte,
         |cand AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT p.query_id, enc.vec_id,
         |      row_number() OVER (PARTITION BY p.query_id
         |        ORDER BY p.qdotc + $pqAdcSql DESC, enc.vec_id) AS arn
         |    FROM probes p
         |    JOIN enc0 enc ON enc.cid = p.cid
         |    JOIN luts q ON q.query_id = p.query_id
         |    WHERE enc.vec_id <> p.query_id)
         |  WHERE arn <= 80)
         |SELECT query_id, rank, vec_id FROM (
         |  SELECT c.query_id, c.vec_id,
         |    row_number() OVER (PARTITION BY c.query_id
         |      ORDER BY list_dot_product(q.qv, u.v) DESC, c.vec_id)
         |      AS rank
         |  FROM cand c JOIN u ON c.vec_id = u.vec_id
         |  JOIN luts q ON q.query_id = c.query_id)
         |WHERE rank <= 10""".stripMargin,
    // served-index drift audit (r13): the ann_ivfpq_index serve chain
    // verbatim as the approx side (the persisted index is a
    // deterministic function of the corpus, so the oracle retrains the
    // same quantizers the store froze), brute truth, recall left-join
    "ann_index_recall" ->
      s"""WITH $unitCteSql,
         |${lloydCte("u", 16, 2, "q")},
         |${ivfPqResidCte},
         |${pqTrainCtes("resid")},
         |enc0 AS (
         |  SELECT r.vec_id, r.cid, e.codes
         |  FROM resid r JOIN e3 e ON r.vec_id = e.vec_id),
         |$ivfPqProbesCte,
         |$pqLutCte,
         |approx AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT p.query_id, enc.vec_id,
         |      row_number() OVER (PARTITION BY p.query_id
         |        ORDER BY p.qdotc + $pqAdcSql DESC, enc.vec_id) AS rank
         |    FROM probes p
         |    JOIN enc0 enc ON enc.cid = p.cid
         |    JOIN luts q ON q.query_id = p.query_id
         |    WHERE enc.vec_id <> p.query_id)
         |  WHERE rank <= 10),
         |rnorms AS (
         |  SELECT vec_id,
         |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))) AS nrm
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
         |  GROUP BY vec_id),
         |rdots AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         |    sum(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)) AS dt
         |  FROM embeddings q, embeddings c,
         |    unnest(generate_series(1, len(q.embedding))) AS g(i)
         |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id GROUP BY 1, 2),
         |truth AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT d.query_id, d.vec_id,
         |      row_number() OVER (PARTITION BY d.query_id
         |        ORDER BY dt / (nq.nrm * nc.nrm) DESC, d.vec_id) AS rank
         |    FROM rdots d
         |    JOIN rnorms nq ON d.query_id = nq.vec_id
         |    JOIN rnorms nc ON d.vec_id = nc.vec_id)
         |  WHERE rank <= 10)
         |SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / count(*), 4) AS recall_at_k
         |FROM truth t LEFT JOIN approx a
         |  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
         |GROUP BY 1""".stripMargin,
    "ann_ivfpq_index" ->
      s"""WITH $unitCteSql,
         |${lloydCte("u", 16, 2, "q")},
         |${ivfPqResidCte},
         |${pqTrainCtes("resid")},
         |enc0 AS (
         |  SELECT r.vec_id, r.cid, e.codes
         |  FROM resid r JOIN e3 e ON r.vec_id = e.vec_id),
         |$ivfPqProbesCte,
         |$pqLutCte
         |SELECT query_id, rank, vec_id FROM (
         |  SELECT p.query_id, enc.vec_id,
         |    row_number() OVER (PARTITION BY p.query_id
         |      ORDER BY p.qdotc + $pqAdcSql DESC, enc.vec_id) AS rank
         |  FROM probes p
         |  JOIN enc0 enc ON enc.cid = p.cid
         |  JOIN luts q ON q.query_id = p.query_id
         |  WHERE enc.vec_id <> p.query_id)
         |WHERE rank <= 10""".stripMargin,
    // HLL pair (r11): at the driver SF every stratum's cardinality sits
    // far inside HLL's sparse EXACT mode (lgK=12), where the estimate
    // is the true distinct count and merge order cannot matter — so the
    // oracle is plain COUNT(DISTINCT).
    "sketch_distinct" ->
      """SELECT lang,
        |  CAST(count(DISTINCT text) AS BIGINT) AS est_distinct,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY lang""".stripMargin,
    "sketch_events_users" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS est_users,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    // r14 FLIP from rows-only (r13 verdict task 3): the quantile
    // dashboard now rides the deterministic DDSketch-style log-bucket
    // table — bucket = ceil(8·log2 n_tok), merge = count addition,
    // estimate = geometric mid 2^((b−0.5)/8) — all replayable as one
    // shared IEEE tree (log2/pow/ceil match bit-for-bit across engines)
    "sketch_quantiles" ->
      s"""WITH tok AS (
         |  SELECT lang, CAST(len($tokSql) AS BIGINT) AS n_tok
         |  FROM documents),
         |tbl AS (
         |  SELECT lang,
         |    CASE WHEN n_tok <= 0 THEN -1
         |         ELSE CAST(ceil(log2(CAST(n_tok AS DOUBLE)) * 8.0)
         |           AS BIGINT) END AS bkt,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM tok GROUP BY 1, 2),
         |cum AS (
         |  SELECT lang, bkt, n,
         |    sum(n) OVER (PARTITION BY lang ORDER BY bkt) AS cum
         |  FROM tbl),
         |ranks AS (
         |  SELECT lang, n_docs, q,
         |    CAST(ceil(q * CAST(n_docs AS DOUBLE)) AS BIGINT) AS r
         |  FROM (SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs
         |        FROM tbl GROUP BY 1),
         |    (VALUES (0.5), (0.9), (0.99)) AS qv(q)),
         |sel AS (
         |  SELECT c.lang, r.n_docs, r.q,
         |    CASE WHEN c.bkt = -1 THEN 0.0
         |         ELSE round(pow(2.0, (CAST(c.bkt AS DOUBLE) - 0.5)
         |           / 8.0), 4) END AS est
         |  FROM cum c JOIN ranks r ON c.lang = r.lang
         |  WHERE c.cum >= r.r AND c.cum - c.n < r.r)
         |SELECT lang, n_docs,
         |  max(CASE WHEN q = 0.5 THEN est END) AS p50,
         |  max(CASE WHEN q = 0.9 THEN est END) AS p90,
         |  max(CASE WHEN q = 0.99 THEN est END) AS p99
         |FROM sel GROUP BY 1, 2""".stripMargin,
    // r14 FLIP from rows-only: the heavy-hitter dashboard now rides the
    // deterministic truncated-counter table (top-16 exact counts per
    // stratum + the (17th)-count threshold, boundary ties broken by
    // token — 16 keeps truncation LIVE at driver vocabs of 16-31); the
    // rollup's lower/upper bounds are plain sums, and the k boundary
    // uses the (est_count DESC, token) total order
    "sketch_topk" ->
      s"""WITH counts AS (
         |  SELECT lang, source, t.tok AS tok,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM documents, unnest($tokSql) AS t(tok)
         |  GROUP BY 1, 2, 3),
         |ranked AS (
         |  SELECT lang, source, tok, cnt,
         |    row_number() OVER (PARTITION BY lang, source
         |      ORDER BY cnt DESC, tok) AS rnk
         |  FROM counts),
         |thr AS (
         |  SELECT lang, source,
         |    coalesce(max(CASE WHEN rnk = 17 THEN cnt END), 0)
         |      AS threshold
         |  FROM ranked GROUP BY 1, 2),
         |tots AS (SELECT lang, source, CAST(sum(cnt) AS BIGINT)
         |    AS n_tokens
         |  FROM counts GROUP BY 1, 2),
         |tbl AS (
         |  SELECT r.lang, r.source, r.tok, r.cnt, t.threshold,
         |    n.n_tokens
         |  FROM ranked r
         |  JOIN thr t ON r.lang = t.lang AND r.source = t.source
         |  JOIN tots n ON r.lang = n.lang AND r.source = n.source
         |  WHERE r.rnk <= 16),
         |sums AS (
         |  SELECT lang, CAST(sum(threshold) AS BIGINT) AS thr_all,
         |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |  FROM (SELECT DISTINCT lang, source, threshold, n_tokens
         |        FROM tbl) GROUP BY 1),
         |cand AS (
         |  SELECT lang, tok, CAST(sum(cnt) AS BIGINT) AS est_count,
         |    CAST(sum(threshold) AS BIGINT) AS thr_present
         |  FROM tbl GROUP BY 1, 2),
         |fin AS (
         |  SELECT c.lang, c.tok AS token, c.est_count,
         |    c.est_count + s.thr_all - c.thr_present AS est_upper,
         |    s.n_tokens,
         |    row_number() OVER (PARTITION BY c.lang
         |      ORDER BY c.est_count DESC, c.tok) AS rnk
         |  FROM cand c JOIN sums s ON c.lang = s.lang)
         |SELECT lang, token, est_count, est_upper, n_tokens
         |FROM fin WHERE rnk <= 20""".stripMargin,
    // k-means family (r11): Lloyd unrolled as chained CTEs (lloydCte)
    "ann_ivf_topk" ->
      s"""WITH
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |${lloydCte("v", 16, 1, "i")},
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
         |      FROM v),
         |${assignCte("v", "ic1", "ax")},
         |assigned AS (
         |  SELECT n.vec_id, n.v, n.nrm, ax.cid
         |  FROM n JOIN ax ON n.vec_id = ax.vec_id),
         |probes AS (
         |  SELECT query_id, j AS cid, qnrm FROM (
         |    SELECT q.vec_id AS query_id, cc.j, q.nrm AS qnrm,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.v, cc.c)
         |          - list_dot_product(cc.c, cc.c) / 2.0 DESC, cc.j ASC)
         |        AS rn
         |    FROM n q, ic1 cc WHERE q.vec_id < 10) WHERE rn <= 4),
         |cand AS (
         |  SELECT p.query_id, a.vec_id,
         |    list_dot_product(q.v, a.v) / (p.qnrm * a.nrm) AS sim
         |  FROM assigned a JOIN probes p ON a.cid = p.cid
         |  JOIN n q ON q.vec_id = p.query_id
         |  WHERE a.vec_id <> p.query_id)
         |SELECT query_id, rank, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id) AS rank
         |  FROM cand) WHERE rank <= 10""".stripMargin,
    // centroid-form silhouette over the SAME Lloyd chain as the
    // dedup_semantic quantizer: per vec, own-centroid distance vs the
    // nearest other centroid, rolled per cell with an empty-cell spine
    "embed_silhouette" ->
      s"""WITH $unitCteSql,
         |${lloydCte("u", 16, 2, "sil")},
         |${assignCte("u", "silc2", "sila")},
         |sd AS (SELECT a.vec_id, a.cid, cc.j,
         |    sqrt(greatest(1.0 - 2.0 * list_dot_product(a.v, cc.c)
         |      + list_dot_product(cc.c, cc.c), 0.0)) AS d
         |  FROM sila a, silc2 cc),
         |ab AS (SELECT vec_id, cid,
         |    max(CASE WHEN j = cid THEN d END) AS a,
         |    min(CASE WHEN j <> cid THEN d END) AS b
         |  FROM sd GROUP BY 1, 2),
         |sv AS (SELECT cid, a, b,
         |    CASE WHEN coalesce(greatest(a, b), 0.0) > 0.0
         |         THEN (b - a) / greatest(a, b) ELSE 0.0 END AS s
         |  FROM ab),
         |r AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |        round(avg(a), 4) AS mean_dist_own,
         |        round(avg(b), 4) AS mean_dist_next,
         |        round(avg(s), 4) AS mean_silhouette
         |      FROM sv GROUP BY 1)
         |SELECT CAST(cc.j AS INTEGER) AS cid,
         |  coalesce(r.n_members, 0) AS n_members,
         |  coalesce(r.mean_dist_own, 0.0) AS mean_dist_own,
         |  coalesce(r.mean_dist_next, 0.0) AS mean_dist_next,
         |  coalesce(r.mean_silhouette, 0.0) AS mean_silhouette
         |FROM silc2 cc LEFT JOIN r ON cc.j = r.cid""".stripMargin,
    // three Lloyd chains over the shared unit frame; inertia = mean
    // clamped own-centroid d^2; gains lag over the UNROUNDED values
    "ivf_elbow_report" ->
      s"""WITH $unitCteSql,
         |${lloydCte("u", 4, 2, "e4")},
         |${assignCte("u", "e4c2", "e4a")},
         |${lloydCte("u", 8, 2, "e8")},
         |${assignCte("u", "e8c2", "e8a")},
         |${lloydCte("u", 16, 2, "e16")},
         |${assignCte("u", "e16c2", "e16a")},
         |rows AS (
         |  SELECT 4 AS nlist, (SELECT avg(greatest(1.0 - 2.0 * list_dot_product(a.v, cc.c) + list_dot_product(cc.c, cc.c), 0.0)) FROM e4a a JOIN e4c2 cc ON a.cid = cc.j) AS inertia
         |  UNION ALL SELECT 8, (SELECT avg(greatest(1.0 - 2.0 * list_dot_product(a.v, cc.c) + list_dot_product(cc.c, cc.c), 0.0)) FROM e8a a JOIN e8c2 cc ON a.cid = cc.j)
         |  UNION ALL SELECT 16, (SELECT avg(greatest(1.0 - 2.0 * list_dot_product(a.v, cc.c) + list_dot_product(cc.c, cc.c), 0.0)) FROM e16a a JOIN e16c2 cc ON a.cid = cc.j)),
         |lagged AS (SELECT nlist, inertia,
         |             lag(inertia) OVER (ORDER BY nlist) AS pin FROM rows)
         |SELECT CAST(nlist AS INTEGER) AS nlist,
         |  round(inertia, 4) AS inertia,
         |  round(coalesce(pin - inertia, 0.0), 4) AS elbow_gain
         |FROM lagged""".stripMargin,
    // same sub-codebook chains + encode tie rule as the serving path;
    // per-(vec, subspace) clamped squared error, rolled per subspace
    "embed_pq_distortion" ->
      s"""WITH $unitCteSql,
         |${pqTrainCtes("u")},
         |d AS (
         |  SELECT cb.j AS subspace,
         |    greatest(
         |      list_dot_product(e.v[cb.j * $PqDsub + 1 : (cb.j + 1) * $PqDsub],
         |                       e.v[cb.j * $PqDsub + 1 : (cb.j + 1) * $PqDsub])
         |      - 2.0 * list_dot_product(
         |          e.v[cb.j * $PqDsub + 1 : (cb.j + 1) * $PqDsub], cb.cv)
         |      + list_dot_product(cb.cv, cb.cv), 0.0) AS d2
         |  FROM e3 e JOIN cb2 cb
         |    ON cb.c = e.codes[cb.j + 1])
         |SELECT CAST(subspace AS INTEGER) AS subspace,
         |  CAST(count(*) AS BIGINT) AS n_vectors,
         |  round(avg(d2), 4) AS mean_distortion
         |FROM d GROUP BY 1""".stripMargin,
    "dedup_semantic" ->
      s"""WITH $unitCteSql,
         |${lloydCte("u", 16, 2, "s")},
         |${assignCte("u", "sc2", "cells")}
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  list_dot_product(a.v, b.v) AS cos
         |FROM cells a JOIN cells b
         |  ON a.cid = b.cid AND a.vec_id < b.vec_id
         |WHERE list_dot_product(a.v, b.v) >= 0.4""".stripMargin,
    // frozen quantizer trained on the 60% store split; probe == full
    // fixed-quantizer pairs touching the new 40% (the spec's equality)
    "dedup_semantic_incremental" ->
      s"""WITH $unitCteSql,
         |uold AS (SELECT * FROM u WHERE vec_id % 10 < 6),
         |${lloydCte("uold", 16, 2, "s")},
         |${assignCte("u", "sc2", "cells")}
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  list_dot_product(a.v, b.v) AS cos
         |FROM cells a JOIN cells b
         |  ON a.cid = b.cid AND a.vec_id < b.vec_id
         |WHERE (a.vec_id % 10 >= 6 OR b.vec_id % 10 >= 6)
         |  AND list_dot_product(a.v, b.v) >= 0.4""".stripMargin,
    "ann_ivf_balance" ->
      s"""WITH $unitCteSql,
         |${lloydCte("u", 16, 2, "s")},
         |${assignCte("u", "sc2", "cells")},
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
         |cnt AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs
         |        FROM cells GROUP BY 1)
         |SELECT CAST(ac.j AS INT) AS cid,
         |  coalesce(cnt.n_vecs, 0) AS n_vecs,
         |  round(CAST(coalesce(cnt.n_vecs, 0) AS DOUBLE) / tot.n, 4)
         |    AS share,
         |  round(CAST(coalesce(cnt.n_vecs, 0) AS DOUBLE) / (tot.n / 16.0),
         |    4) AS balance
         |FROM (SELECT j FROM sc2) ac LEFT JOIN cnt ON ac.j = cnt.cid,
         |  tot""".stripMargin,
    "corpus_topic_terms" ->
      s"""WITH $unitCteSql,
         |${lloydCte("u", 16, 2, "s")},
         |${assignCte("u", "sc2", "cells")},
         |nc AS (SELECT CAST(count(DISTINCT cid) AS BIGINT) AS n
         |       FROM cells),
         |tf AS (
         |  SELECT cid, t, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT d.doc_id, c.cid, unnest($tokSql) AS t
         |        FROM documents d JOIN cells c ON d.doc_id = c.vec_id)
         |  GROUP BY 1, 2),
         |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf
         |       GROUP BY 1),
         |scored AS (
         |  SELECT cid, tf.t, tf.tf, df.df,
         |    round(tf.tf * ln((nc.n + 1.0) / (df.df + 1.0)), 6) AS score
         |  FROM tf JOIN df ON tf.t = df.t, nc)
         |SELECT CAST(cid AS INT) AS cid, t AS term, tf, df, score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cid
         |    ORDER BY score DESC, t ASC) AS rn FROM scored)
         |WHERE rn <= 5""".stripMargin,
    "ivf_tuning_report" ->
      s"""WITH
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |${lloydCte("v", 16, 1, "i")},
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
         |      FROM v),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS cn FROM v),
         |${assignCte("v", "ic1", "ax")},
         |assigned AS (
         |  SELECT n.vec_id, n.v, n.nrm, ax.cid
         |  FROM n JOIN ax ON n.vec_id = ax.vec_id),
         |cellsize AS (SELECT cid, CAST(count(*) AS BIGINT) AS cs
         |             FROM assigned GROUP BY 1),
         |ranked AS (
         |  SELECT q.vec_id AS query_id, cc.j AS cid, q.nrm AS qnrm,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY list_dot_product(q.v, cc.c)
         |        - list_dot_product(cc.c, cc.c) / 2.0 DESC, cc.j ASC)
         |      AS crank
         |  FROM n q, ic1 cc WHERE q.vec_id < 10),
         |owncell AS (SELECT vec_id AS query_id, cid AS owncid
         |            FROM assigned WHERE vec_id < 10),
         |np(np) AS (VALUES (1), (2), (4), (8), (16)),
         |truth AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
         |          DESC, b.vec_id) AS rank
         |    FROM n a JOIN n b ON b.vec_id <> a.vec_id
         |    WHERE a.vec_id < 10)
         |  WHERE rank <= 10),
         |approx AS (
         |  SELECT np, query_id, vec_id FROM (
         |    SELECT np.np AS np, r.query_id, a.vec_id,
         |      row_number() OVER (PARTITION BY np.np, r.query_id
         |        ORDER BY list_dot_product(q.v, a.v) / (r.qnrm * a.nrm)
         |          DESC, a.vec_id) AS rank
         |    FROM np, ranked r
         |    JOIN assigned a ON a.cid = r.cid
         |    JOIN n q ON q.vec_id = r.query_id
         |    WHERE r.crank <= np.np AND a.vec_id <> r.query_id)
         |  WHERE rank <= 10),
         |rec AS (
         |  SELECT t2.np AS np, t2.query_id,
         |    round(CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1
         |                        ELSE 0 END) AS DOUBLE) / count(*), 4)
         |      AS recall_at_k
         |  FROM (SELECT np.np AS np, t.query_id, t.vec_id
         |        FROM np, truth t) t2
         |  LEFT JOIN approx ap ON ap.np = t2.np
         |    AND ap.query_id = t2.query_id AND ap.vec_id = t2.vec_id
         |  GROUP BY t2.np, t2.query_id),
         |cand AS (
         |  SELECT np.np AS np, r.query_id,
         |    CAST(sum(cs.cs) AS BIGINT)
         |      - CAST(max(CASE WHEN r.cid = o.owncid THEN 1 ELSE 0 END)
         |        AS BIGINT) AS nc
         |  FROM np, ranked r
         |  JOIN cellsize cs ON cs.cid = r.cid
         |  JOIN owncell o ON o.query_id = r.query_id
         |  WHERE r.crank <= np.np
         |  GROUP BY np.np, r.query_id)
         |SELECT CAST(r.np AS INT) AS nprobe,
         |  round(avg(r.recall_at_k), 4) AS mean_recall,
         |  min(r.recall_at_k) AS min_recall,
         |  round(avg(c.nc), 4) AS mean_candidates,
         |  round(avg(c.nc) / max(tot.cn), 4) AS cand_frac
         |FROM rec r JOIN cand c ON r.np = c.np
         |  AND r.query_id = c.query_id, tot
         |GROUP BY r.np""".stripMargin,
    // trained-classifier family (r11): the logistic GD replayed as a
    // recursive CTE (clsCoreSql), scores identical to 4dp
    "quality_classifier" ->
      s"""WITH RECURSIVE
         |$clsCoreSql
         |SELECT gm.doc_id, round(${clsScoreSql("gm")}, 4) AS quality_score,
         |  round(${clsScoreSql("gm")}, 4) >= 0.5 AS keep
         |FROM gm, musd, model""".stripMargin,
    "corpus_sample_quality" ->
      s"""WITH RECURSIVE
         |$clsCoreSql,
         |scored AS (
         |  SELECT gm.doc_id, round(${clsScoreSql("gm")}, 4) AS quality_score
         |  FROM gm, musd, model)
         |SELECT doc_id, quality_score FROM scored
         |WHERE ((doc_id % ${TextOps.SampleIdPrime})
         |    * ${TextOps.SampleMultiplier}
         |    >> ${TextOps.SampleShift}) % 1000
         |  < CAST(round(quality_score * 1000) AS BIGINT)""".stripMargin,
    // deciles over the 4dp score grid; mean/rate round half-to-even like
    // the driver's math.rint
    "quality_calibration" ->
      s"""WITH RECURSIVE
         |$clsCoreSql,
         |byscore AS (
         |  SELECT round(${clsScoreSql("gm")}, 4) AS score,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN gm.gopher_pass THEN 1 ELSE 0 END)
         |      AS BIGINT) AS np
         |  FROM gm, musd, model GROUP BY 1),
         |cumc AS (
         |  SELECT *,
         |    coalesce(CAST(sum(n) OVER (ORDER BY score DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS cum,
         |    CAST(sum(n) OVER () AS BIGINT) AS total
         |  FROM byscore)
         |SELECT least(9, 10 * cum // total) AS decile,
         |  CAST(sum(n) AS BIGINT) AS n_docs,
         |  round_even(sum(score * n) / sum(n), 4) AS mean_score,
         |  round_even(CAST(sum(np) AS DOUBLE) / sum(n), 4)
         |    AS gopher_pass_rate,
         |  min(score) AS min_score, max(score) AS max_score
         |FROM cumc GROUP BY 1""".stripMargin,
    // train on RAW docs (clsCoreSql), gate the SCRUBBED corpus — the
    // corpus_refine pipeline with the learned gate in the rule's seat
    "corpus_refine_learned" ->
      s"""WITH RECURSIVE
         |$clsCoreSql,
         |sc AS (
         |  SELECT doc_id, lang, source, $scrubSql AS ct FROM documents),
         |sg AS (
         |${gopherOracleSqlOver("(SELECT doc_id, ct AS text FROM sc)")
             .linesIterator.map("  " + _).mkString("\n")}
         |),
         |gated AS (
         |  SELECT sg.doc_id, sc.lang, sc.source, sc.ct,
         |    sg.n_words AS n_tokens,
         |    round(${clsScoreSql("sg")}, 4) AS quality_score
         |  FROM sg JOIN sc USING (doc_id), musd, model
         |  WHERE sg.n_words >= 8),
         |k AS (
         |  SELECT *, min(doc_id) OVER (PARTITION BY ct) AS keeper
         |  FROM gated WHERE quality_score >= 0.5)
         |SELECT doc_id, lang, source, n_tokens, quality_score FROM k
         |WHERE doc_id = keeper
         |  AND (((doc_id % ${TextOps.SampleIdPrime})
         |       * ${TextOps.SampleMultiplier})
         |       >> ${TextOps.SampleShift}) % 1000 <
         |    CASE lang ${TextOps.SampleRatesPermille
               .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")}
         |    ELSE ${TextOps.SampleDefaultPermille} END""".stripMargin,
    // BPE tokenizer round trip (r11): training replayed as a recursive
    // CTE over the (iteration, vocab word) state — see bpeCoreSql
    "bpe_train" ->
      s"""WITH RECURSIVE
         |$bpeCoreSql
         |SELECT CAST(it AS INT) AS merge_rank, ml AS "left",
         |  mr AS "right", mc AS n_occurrences
         |FROM (SELECT DISTINCT it, ml, mr, mc FROM state WHERE it > 0)""".stripMargin,
    "bpe_encode" ->
      s"""WITH RECURSIVE
         |$bpeCoreSql
         |SELECT doc_id, n_words, n_bpe_tokens FROM enc""".stripMargin,
    "bpe_fertility" ->
      s"""WITH RECURSIVE
         |$bpeCoreSql
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
         |  round(CAST(sum(n_bpe_tokens) AS DOUBLE) / sum(n_words), 4)
         |    AS fertility
         |FROM enc JOIN documents USING (doc_id) GROUP BY lang""".stripMargin,
    // LSH family (r11): candidates replayed from the literal hyperplane
    // matrix (lshCteSql); cosines are raw doubles, bit-identical by the
    // shared left-to-right fold order
    "dedup_embed" ->
      s"""WITH $lshCteSql,
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM buckets x JOIN buckets y
         |    ON x.tbl = y.tbl AND x.bucket = y.bucket
         |      AND x.vec_id < y.vec_id)
         |SELECT * FROM (
         |  SELECT vec_a, vec_b,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM cand
         |  JOIN n a ON cand.vec_a = a.vec_id
         |  JOIN n b ON cand.vec_b = b.vec_id)
         |WHERE cos >= 0.4""".stripMargin,
    // cosine-τ sweep over the SAME LSH pair frame as dedup_embed at the
    // grid minimum; zero-pair τs still report
    "embed_threshold_sweep" ->
      s"""WITH $lshCteSql,
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM buckets x JOIN buckets y
         |    ON x.tbl = y.tbl AND x.bucket = y.bucket
         |      AND x.vec_id < y.vec_id),
         |pairs AS (
         |  SELECT * FROM (
         |    SELECT vec_a, vec_b,
         |      list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |    FROM cand
         |    JOIN n a ON cand.vec_a = a.vec_id
         |    JOIN n b ON cand.vec_b = b.vec_id)
         |  WHERE cos >= 0.4),
         |taus AS (SELECT unnest([0.4, 0.6, 0.8, 0.9]) AS tau),
         |tagged AS (
         |  SELECT t.tau, p.vec_a, p.vec_b
         |  FROM pairs p JOIN taus t ON p.cos >= t.tau),
         |np AS (SELECT tau, count(*) AS n_pairs FROM tagged GROUP BY 1),
         |nd AS (SELECT tau, count(DISTINCT d) AS n_vecs FROM (
         |  SELECT tau, unnest([vec_a, vec_b]) AS d FROM tagged)
         |  GROUP BY 1),
         |tot AS (SELECT count(*) AS n FROM embeddings)
         |SELECT t.tau, coalesce(np.n_pairs, 0) AS n_pairs,
         |  coalesce(nd.n_vecs, 0) AS n_vecs,
         |  round(CAST(coalesce(nd.n_vecs, 0) AS DOUBLE)
         |    / (SELECT n FROM tot), 4) AS vec_share
         |FROM taus t LEFT JOIN np ON t.tau = np.tau
         |LEFT JOIN nd ON t.tau = nd.tau""".stripMargin,
    // incremental probe == full LSH pairs restricted to pairs touching
    // the new 40% split (the store arm is old×new, the within arm
    // new×new; old×old never forms) — the equality the spec proves,
    // here replayed directly
    "dedup_embed_incremental" ->
      s"""WITH $lshCteSql,
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM buckets x JOIN buckets y
         |    ON x.tbl = y.tbl AND x.bucket = y.bucket
         |      AND x.vec_id < y.vec_id
         |  WHERE x.vec_id % 10 >= 6 OR y.vec_id % 10 >= 6)
         |SELECT * FROM (
         |  SELECT vec_a, vec_b,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM cand
         |  JOIN n a ON cand.vec_a = a.vec_id
         |  JOIN n b ON cand.vec_b = b.vec_id)
         |WHERE cos >= 0.4""".stripMargin,
    "ann_lsh_topk" ->
      s"""WITH $lshCteSql,
         |$lshTopkSql
         |SELECT query_id, rank, vec_id FROM lsh_topk""".stripMargin,
    // approximate kNN graph at the 16-band × 3-bit banding: DIRECTED
    // candidates (each node ranks its own neighbors), top-5 per node,
    // ties to the smaller nbr_id (the TopKPairs rule)
    "knn_graph_lsh" ->
      s"""WITH ${lshCte(16, 3)},
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst
         |  FROM buckets x JOIN buckets y
         |    ON x.tbl = y.tbl AND x.bucket = y.bucket
         |      AND x.vec_id <> y.vec_id),
         |sims AS (
         |  SELECT src, dst,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
         |  FROM cand JOIN n a ON src = a.vec_id JOIN n b ON dst = b.vec_id)
         |SELECT vec_id, CAST(rank AS INT) AS rank, nbr_id FROM (
         |  SELECT src AS vec_id, dst AS nbr_id,
         |    row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst)
         |      AS rank
         |  FROM sims)
         |WHERE rank <= 5""".stripMargin,
    "ann_recall_report" ->
      s"""WITH $lshCteSql,
         |$lshTopkSql,
         |sims AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
         |  FROM n a JOIN n b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 10),
         |truth AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (
         |        PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         |    FROM sims)
         |  WHERE rank <= 10)
         |SELECT t.query_id,
         |  CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 4) AS recall_at_k
         |FROM truth t
         |LEFT JOIN lsh_topk a
         |  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
         |GROUP BY t.query_id""".stripMargin,
    // greedy MMR replayed as a RECURSIVE CTE (r11): one row per (query,
    // step) carrying the selected-id list; each iteration scores the
    // unselected pool (λ·sim − (1−λ)·max-cos-to-selected, the float
    // constants interpolated from the SAME Scala arithmetic so
    // 1−0.7 = 0.30000000000000004 on both engines) and keeps the
    // argmax under the operator's (score, sim, id) tie order
    "ann_mmr_topk" -> {
      val lam = "0.7"
      val oneMinus = (1 - 0.7).toString
      s"""WITH RECURSIVE
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
         |      FROM v),
         |pool AS (
         |  SELECT * FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
         |      list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim,
         |      b.v AS bv, b.nrm AS bn,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
         |          DESC, b.vec_id) AS pr
         |    FROM n a JOIN n b ON b.vec_id <> a.vec_id
         |    WHERE a.vec_id < 10)
         |  WHERE pr <= 30),
         |pc AS (
         |  SELECT x.query_id, x.vec_id AS i, y.vec_id AS j,
         |    list_dot_product(x.bv, y.bv) / (x.bn * y.bn) AS cos
         |  FROM pool x JOIN pool y
         |    ON x.query_id = y.query_id AND x.vec_id <> y.vec_id),
         |sel(query_id, step, selected, vec_id, score) AS (
         |  SELECT query_id, 1, [vec_id], vec_id,
         |    $lam * sim - $oneMinus * 0.0
         |  FROM (
         |    SELECT query_id, vec_id, sim, row_number() OVER (
         |      PARTITION BY query_id
         |      ORDER BY $lam * sim - $oneMinus * 0.0 DESC, sim DESC,
         |        vec_id) AS rn
         |    FROM pool) WHERE rn = 1
         |  UNION ALL
         |  SELECT query_id, step, selected, vec_id, score FROM (
         |    SELECT s.query_id, s.step + 1 AS step,
         |      list_append(s.selected, p.vec_id) AS selected, p.vec_id,
         |      $lam * p.sim - $oneMinus * coalesce(mx.m, 0.0) AS score,
         |      row_number() OVER (PARTITION BY s.query_id
         |        ORDER BY $lam * p.sim - $oneMinus * coalesce(mx.m, 0.0)
         |          DESC, p.sim DESC, p.vec_id) AS rn
         |    FROM sel s
         |    JOIN pool p ON p.query_id = s.query_id
         |      AND NOT list_contains(s.selected, p.vec_id)
         |    LEFT JOIN (
         |      SELECT pc.query_id, pc.i, s2.step, max(pc.cos) AS m
         |      FROM pc JOIN sel s2 ON pc.query_id = s2.query_id
         |        AND list_contains(s2.selected, pc.j)
         |      GROUP BY 1, 2, 3) mx
         |      ON mx.query_id = s.query_id AND mx.i = p.vec_id
         |        AND mx.step = s.step
         |    WHERE s.step < 10)
         |  WHERE rn = 1)
         |SELECT query_id, CAST(step AS INT) AS rank, vec_id,
         |  round(score, 4) AS mmr_score FROM sel""".stripMargin
    },
    // nearest-centroid classify: per-label unit-vector centroids off the
    // 10% seed split, argmax of v·c − |c|²/2 with the native
    // expression's last-max tie rule (higher label wins)
    "embed_centroid_classify" ->
      """WITH v0 AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v0 FROM embeddings),
        |u AS (
        |  SELECT vec_id, label,
        |    list_transform(v0,
        |      x -> x / sqrt(list_dot_product(v0, v0))) AS v
        |  FROM v0),
        |cdim AS (
        |  SELECT label AS clabel, g.i AS i, avg(v[g.i]) AS c
        |  FROM u, unnest(generate_series(1, len(v))) AS g(i)
        |  WHERE vec_id % 10 = 0
        |  GROUP BY 1, 2),
        |cents AS (
        |  SELECT clabel, list(c ORDER BY i) AS cv FROM cdim GROUP BY 1),
        |scored AS (
        |  SELECT h.vec_id, h.label AS label_true, c.clabel,
        |    list_dot_product(h.v, c.cv)
        |      - list_dot_product(c.cv, c.cv) / 2.0 AS s
        |  FROM u h, cents c
        |  WHERE h.vec_id % 10 <> 0),
        |pred AS (
        |  SELECT label_true, clabel AS label_pred FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY s DESC, clabel DESC) AS rn
        |    FROM scored)
        |  WHERE rn = 1),
        |conf AS (
        |  SELECT label_true, label_pred, count(*) AS n
        |  FROM pred GROUP BY 1, 2)
        |SELECT label_true, label_pred, n,
        |  round(CAST(sum(CASE WHEN label_true = label_pred THEN n
        |                      ELSE 0 END) OVER () AS DOUBLE)
        |    / sum(n) OVER (), 4) AS accuracy
        |FROM conf""".stripMargin,
    "ann_topk" ->
      """WITH norms AS (
        |  SELECT vec_id,
        |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))) AS nrm
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
        |  GROUP BY vec_id),
        |dots AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    sum(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)) AS dt
        |  FROM embeddings q, embeddings c,
        |    unnest(generate_series(1, len(q.embedding))) AS g(i)
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id GROUP BY 1, 2),
        |s AS (
        |  SELECT query_id, d.vec_id, dt / (nq.nrm * nc.nrm) AS sim
        |  FROM dots d
        |  JOIN norms nq ON d.query_id = nq.vec_id
        |  JOIN norms nc ON d.vec_id = nc.vec_id)
        |SELECT query_id, rank, vec_id FROM (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
        |  FROM s)
        |WHERE rank <= 10""".stripMargin,
    // SQ retrieval audit: the embed_quantize CTE rebuilds dequantized
    // vectors, both top-10 sides run the ann_topk pipeline, recall is
    // a left join over n_queries·k rows
    "embed_sq_recall" ->
      """WITH d AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |sc AS (SELECT i, max(abs(x)) / 127 AS s FROM d GROUP BY 1),
        |dq AS (SELECT d.vec_id, d.i, d.x,
        |        (CASE WHEN sc.s = 0 THEN 0
        |          ELSE round(d.x / sc.s, 0) END) * sc.s AS y
        |      FROM d JOIN sc ON d.i = sc.i),
        |tn AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM d GROUP BY 1),
        |qn AS (SELECT vec_id, sqrt(sum(y * y)) AS nrm FROM dq GROUP BY 1),
        |tdots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
        |    sum(a.x * b.x) AS dt
        |  FROM d a JOIN d b ON a.i = b.i AND b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 10 GROUP BY 1, 2),
        |qdots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
        |    sum(a.y * b.y) AS dt
        |  FROM dq a JOIN dq b ON a.i = b.i AND b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 10 GROUP BY 1, 2),
        |truth AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT t.query_id, t.vec_id,
        |      row_number() OVER (PARTITION BY t.query_id
        |        ORDER BY t.dt / (na.nrm * nb.nrm) DESC, t.vec_id) AS r
        |    FROM tdots t
        |    JOIN tn na ON t.query_id = na.vec_id
        |    JOIN tn nb ON t.vec_id = nb.vec_id)
        |  WHERE r <= 10),
        |approx AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT t.query_id, t.vec_id,
        |      row_number() OVER (PARTITION BY t.query_id
        |        ORDER BY t.dt / (na.nrm * nb.nrm) DESC, t.vec_id) AS r
        |    FROM qdots t
        |    JOIN qn na ON t.query_id = na.vec_id
        |    JOIN qn nb ON t.vec_id = nb.vec_id)
        |  WHERE r <= 10)
        |SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_true,
        |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) / count(*), 4) AS recall_at_k
        |FROM truth t LEFT JOIN approx a
        |  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
        |GROUP BY 1""".stripMargin,
    // filtered retrieval: the same brute-force pipeline with the label
    // equality applied BEFORE scoring (pre-filter semantics) — ranks are
    // dense within the filtered candidate set on both engines
    "ann_filtered_topk" ->
      """WITH norms AS (
        |  SELECT vec_id,
        |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))) AS nrm
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
        |  GROUP BY vec_id),
        |dots AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    sum(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)) AS dt
        |  FROM embeddings q, embeddings c,
        |    unnest(generate_series(1, len(q.embedding))) AS g(i)
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
        |    AND c.label = q.label
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT query_id, d.vec_id, dt / (nq.nrm * nc.nrm) AS sim
        |  FROM dots d
        |  JOIN norms nq ON d.query_id = nq.vec_id
        |  JOIN norms nc ON d.vec_id = nc.vec_id)
        |SELECT query_id, rank, vec_id FROM (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
        |  FROM s)
        |WHERE rank <= 10""".stripMargin,
    // the full-graph twin of ann_topk: every node is a query. Margin
    // audit over ALL nodes at sf0.01: min adjacent-rank cosine margin
    // through rank 6 is 1.4e-6 — ~9 orders above cross-engine double
    // noise, so rank ordering (tie-break nbr_id) agrees.
    "knn_graph" ->
      s"""WITH $knnNnSql
        |SELECT vec_id, rank, nbr_id FROM nn""".stripMargin,
    // h-index fixed point to coreness on the MUTUAL kNN edges: FIXED
    // 10-iteration schedule replayed in a recursive CTE (the iteration
    // count is part of the operator contract so both engines run the
    // identical monotone sequence; KcoreSpec pins convergence). adj is
    // MATERIALIZED — without it DuckDB re-derives the O(n²) dot chain
    // on every recursive step (measured 5 min vs seconds at sf0.01)
    "knn_kcore" ->
      s"""WITH RECURSIVE $knnNnSql,
        |$kcoreBodySql""".stripMargin,
    // SNN edge-strength histogram: wedge join for common mutual
    // neighbors, open-neighborhood Jaccard, floor(10J) buckets — the
    // same body over both substrates
    "knn_edge_jaccard" ->
      s"""WITH $knnNnSql,
        |$edgeJaccardBodySql""".stripMargin,
    "knn_edge_jaccard_lsh" ->
      s"""WITH $lshNnSql,
        |$edgeJaccardBodySql""".stripMargin,
    // Jarvis–Patrick: integer-threshold SNN cut + the components
    // propagation over survivors (self-loops keep losers as singletons)
    "knn_snn_cluster" ->
      s"""WITH RECURSIVE $knnNnSql,
        |$snnClusterBodySql""".stripMargin,
    // the SAME SNN cut with the survivor components folded by
    // pointer-doubling: its fixpoint ≡ the converged linear schedule,
    // so the scale variant value-checks against the SAME linear replay
    // (the knn_components_fast pattern; r14 verdict task 1)
    "knn_snn_cluster_fast" ->
      s"""WITH RECURSIVE $knnNnSql,
        |$snnClusterBodySql""".stripMargin,
    // r15 (verdict task 5): the media dHash pipeline replayed in SQL
    // ([[mediaSigCtes]]) flips three rows-only entries to full value
    // oracles — per-doc 64-bit dHash, banded near-dup degree, and the
    // store/probe incremental pair view (banding complete at hamming
    // ≤ 3, so the pair set IS the hamming predicate)
    // r16 (verdict task 1): the multimodal feature stage itself joins
    // the value-oracled set — integer BT.601 accumulators replayed over
    // the full raster, see [[multimodalOracle]]
    "multimodal" -> multimodalOracle,
    "media_phash" ->
      s"""WITH $mediaSigCtes,
        |deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT doc_a AS doc_id FROM mpairs
        |        UNION ALL SELECT doc_b FROM mpairs) GROUP BY 1)
        |SELECT s.doc_id, s.sig AS phash, coalesce(deg.n, 0) AS n_near_dups
        |FROM msig s LEFT JOIN deg USING (doc_id)""".stripMargin,
    "media_phash_incremental" ->
      s"""WITH $mediaSigCtes
        |SELECT doc_a, doc_b, hamming FROM mpairs
        |WHERE doc_a % 10 >= 6 OR doc_b % 10 >= 6""".stripMargin,
    // media health rollup: payload lengths are closed-form in the
    // synthesis parameters — no codec needed on the oracle side
    "media_report" -> mediaReportOracle,
    // the three payload-fingerprint entries: the transformed payloads
    // reconstruct byte-for-byte in SQL and hash via the XXH64 replay
    "media_resize" -> mediaResizeOracle,
    "media_resample" -> mediaResampleOracle,
    "media_frames" -> mediaFramesOracle,
    // the two feature entries whose moments are order-independent
    // EXACT (dyadic audio samples; integer video lumas) — the feature
    // loops replay as plain SQL aggregates
    "media_audio" -> mediaAudioOracle,
    "media_video" -> mediaVideoOracle,
    // the SAME coreness body over the LSH-substrate edge frame — the
    // 100 TB graph path behind the gate (r13 verdict task 2)
    "knn_kcore_lsh" ->
      s"""WITH RECURSIVE $lshNnSql,
        |$kcoreBodySql""".stripMargin,
    // JL ratio r = ||P(a-b)||^2 / (m * ||a-b||^2) on the fixed
    // 50-vector panel (planes are RAW N(0,1) rows: E[(g.z)^2] = ||z||^2,
    // so the m-row projection is unbiased after the 1/m); plane dots are
    // bit-identical (lshCte discipline), the <=32-term p2 sum and the
    // 1225-pair moments round 4dp
    "embed_jl_distortion" ->
      s"""WITH $jlCteSql,
        |jpairs AS (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb,
        |    list_dot_product(a.v, a.v)
        |      - 2.0 * list_dot_product(a.v, b.v)
        |      + list_dot_product(b.v, b.v) AS d2
        |  FROM jv a JOIN jv b ON a.vec_id < b.vec_id),
        |jp2 AS (
        |  SELECT ya.vec_id AS ida, yb.vec_id AS idb, m.m,
        |    sum((ya.y - yb.y) * (ya.y - yb.y)) AS p2
        |  FROM jy ya
        |  JOIN jy yb ON ya.pid = yb.pid AND ya.vec_id < yb.vec_id
        |  CROSS JOIN (VALUES (8), (32)) m(m)
        |  WHERE ya.pid < m.m
        |  GROUP BY 1, 2, 3),
        |jr AS (
        |  SELECT m, p2 / (CAST(m AS DOUBLE) * d2) AS r
        |  FROM jp2 JOIN jpairs USING (ida, idb))
        |SELECT m, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(avg(r), 4) AS mean_ratio,
        |  round(min(r), 4) AS min_ratio,
        |  round(max(r), 4) AS max_ratio,
        |  round(sqrt(avg((r - 1.0) * (r - 1.0))), 4) AS rmse
        |FROM jr GROUP BY m""".stripMargin,
    "table_profile" -> tableProfileOracle,
    // label-partition modularity: mutual edges labeled twice, per-label
    // rollups, e/m − (d/2m)² in one shared association order
    "knn_modularity" ->
      s"""WITH $knnNnSql,
        |mutual AS (
        |  SELECT a.vec_id AS a, a.nbr_id AS b FROM nn a
        |  JOIN nn b ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id
        |  WHERE a.vec_id < a.nbr_id),
        |m AS (SELECT count(*) AS m FROM mutual),
        |le AS (
        |  SELECT mu.a, mu.b, ea.label AS la, eb.label AS lb
        |  FROM mutual mu
        |  JOIN embeddings ea ON mu.a = ea.vec_id
        |  JOIN embeddings eb ON mu.b = eb.vec_id),
        |nodes AS (SELECT label, count(*) AS n_nodes
        |  FROM embeddings GROUP BY 1),
        |internal AS (SELECT la AS label, count(*) AS ie
        |  FROM le WHERE la = lb GROUP BY 1),
        |degs AS (SELECT label, count(*) AS ds FROM (
        |  SELECT la AS label FROM le UNION ALL SELECT lb AS label FROM le)
        |  GROUP BY 1)
        |SELECT n.label, n.n_nodes,
        |  coalesce(i.ie, 0) AS internal_edges,
        |  coalesce(d.ds, 0) AS degree_sum,
        |  CASE WHEN (SELECT m FROM m) > 0 THEN
        |    round(CAST(coalesce(i.ie, 0) AS DOUBLE) / (SELECT m FROM m)
        |      - (CAST(coalesce(d.ds, 0) AS DOUBLE)
        |         / (2 * (SELECT m FROM m)))
        |        * (CAST(coalesce(d.ds, 0) AS DOUBLE)
        |         / (2 * (SELECT m FROM m))), 4)
        |  ELSE 0.0 END AS q_term
        |FROM nodes n
        |LEFT JOIN internal i ON n.label = i.label
        |LEFT JOIN degs d ON n.label = d.label""".stripMargin,
    // mutual edges a<b, wedge join at the middle node, closure probe
    // back to the edge list — triangles as ordered triples credited to
    // all three corners; coefficient 2T/(d(d-1)) in one shared IEEE
    // association order, 4dp
    "knn_triangles" ->
      s"""WITH $knnNnSql,
        |mutual AS (
        |  SELECT a.vec_id AS a, a.nbr_id AS b FROM nn a
        |  JOIN nn b ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id
        |  WHERE a.vec_id < a.nbr_id),
        |tri AS (
        |  SELECT x.a AS a, x.b AS b, y.b AS c
        |  FROM mutual x JOIN mutual y ON x.b = y.a
        |  JOIN mutual z ON x.a = z.a AND y.b = z.b),
        |pern AS (
        |  SELECT v AS vec_id, count(*) AS t
        |  FROM (SELECT a AS v FROM tri UNION ALL
        |        SELECT b AS v FROM tri UNION ALL
        |        SELECT c AS v FROM tri)
        |  GROUP BY 1),
        |deg AS (
        |  SELECT v AS vec_id, count(*) AS d
        |  FROM (SELECT a AS v FROM mutual UNION ALL
        |        SELECT b AS v FROM mutual)
        |  GROUP BY 1)
        |SELECT e.vec_id, coalesce(d.d, 0) AS degree,
        |  coalesce(t.t, 0) AS triangles,
        |  CASE WHEN coalesce(d.d, 0) >= 2
        |    THEN round(2.0 * coalesce(t.t, 0)
        |      / CAST(d.d * (d.d - 1) AS DOUBLE), 4)
        |    ELSE 0.0 END AS coefficient
        |FROM embeddings e
        |LEFT JOIN deg d ON e.vec_id = d.vec_id
        |LEFT JOIN pern t ON e.vec_id = t.vec_id""".stripMargin,
    // Newman degree assortativity: directed orientations of the mutual
    // edge list, six exact-integer sums, one shared closed-form tree 4dp
    "knn_assortativity" ->
      s"""WITH $knnNnSql,
        |mutual AS (
        |  SELECT a.vec_id AS a, a.nbr_id AS b FROM nn a
        |  JOIN nn b ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id
        |  WHERE a.vec_id < a.nbr_id),
        |deg AS (
        |  SELECT v, count(*) AS d
        |  FROM (SELECT a AS v FROM mutual UNION ALL
        |        SELECT b AS v FROM mutual)
        |  GROUP BY 1),
        |dir AS (SELECT a, b FROM mutual
        |        UNION ALL SELECT b, a FROM mutual),
        |gsum AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(da.d) AS BIGINT) AS sx,
        |    CAST(sum(db.d) AS BIGINT) AS sy,
        |    CAST(sum(da.d * db.d) AS BIGINT) AS sxy,
        |    CAST(sum(da.d * da.d) AS BIGINT) AS sxx,
        |    CAST(sum(db.d * db.d) AS BIGINT) AS syy
        |  FROM dir JOIN deg da ON dir.a = da.v
        |           JOIN deg db ON dir.b = db.v),
        |gnodes AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |         CAST(sum(d) AS BIGINT) AS dsum FROM deg)
        |SELECT n_nodes, n // 2 AS n_edges,
        |  round(CAST(dsum AS DOUBLE) / n_nodes, 4) AS mean_degree,
        |  CASE WHEN sqrt((CAST(n AS DOUBLE) * sxx
        |                  - CAST(sx AS DOUBLE) * sx)
        |               * (CAST(n AS DOUBLE) * syy
        |                  - CAST(sy AS DOUBLE) * sy)) > 0.0
        |    THEN round((CAST(n AS DOUBLE) * sxy
        |                - CAST(sx AS DOUBLE) * sy)
        |      / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |           * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
        |      4)
        |    ELSE 0.0 END AS assortativity
        |FROM gsum, gnodes""".stripMargin,
    // mutual edges + recursive-CTE reachability (the dedup_corpus
    // pattern): cluster = min id reachable over mutual-kNN edges
    "knn_cluster" ->
      s"""WITH RECURSIVE $knnNnSql,
        |mutual AS (
        |  SELECT a.vec_id AS a, a.nbr_id AS b FROM nn a
        |  JOIN nn b ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id),
        |reach(a, b) AS (SELECT a, b FROM mutual
        |                UNION
        |                SELECT r.a, m.b FROM reach r
        |                JOIN mutual m ON r.b = m.a WHERE m.b <> r.a),
        |minr AS (SELECT a, min(b) AS mb FROM reach GROUP BY a)
        |SELECT e.vec_id,
        |  least(coalesce(m.mb, e.vec_id), e.vec_id) AS cluster
        |FROM embeddings e LEFT JOIN minr m ON e.vec_id = m.a""".stripMargin,
    // coreset: the cluster + pagerank oracles composed, top-1 per
    // cluster by (pr DESC, vec_id)
    "knn_coreset" -> {
      val prIterCtes = (1 to 3).map { r =>
        s"""p$r AS (
           |  SELECT e.vec_id,
           |    c.base_u + (85 * coalesce(m.mass, 0)) // 100 AS pr_nano
           |  FROM embeddings e
           |  LEFT JOIN (
           |    SELECT mu.b AS vec_id, sum(p.pr_nano // d.deg) AS mass
           |    FROM mutual2 mu
           |    JOIN p${r - 1} p ON mu.a = p.vec_id
           |    JOIN deg d ON mu.a = d.vec_id
           |    GROUP BY 1) m USING (vec_id), c)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE $knnNnSql,
         |mutual2 AS (
         |  SELECT a.vec_id AS a, a.nbr_id AS b FROM nn a
         |  JOIN nn b ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id),
         |reach(a, b) AS (SELECT a, b FROM mutual2
         |                UNION
         |                SELECT r.a, m.b FROM reach r
         |                JOIN mutual2 m ON r.b = m.a WHERE m.b <> r.a),
         |minr AS (SELECT a, min(b) AS mb FROM reach GROUP BY a),
         |cl AS (
         |  SELECT e.vec_id,
         |    least(coalesce(m.mb, e.vec_id), e.vec_id) AS cluster
         |  FROM embeddings e LEFT JOIN minr m ON e.vec_id = m.a),
         |deg AS (SELECT a AS vec_id, count(*) AS deg FROM mutual2 GROUP BY 1),
         |c AS (SELECT count(*) AS n, 1000000000 // count(*) AS init_u,
         |        (15 * (1000000000 // count(*))) // 100 AS base_u
         |      FROM embeddings),
         |p0 AS (SELECT vec_id, c.init_u AS pr_nano FROM embeddings, c),
         |$prIterCtes,
         |j AS (
         |  SELECT cl.cluster, cl.vec_id, CAST(p3.pr_nano AS BIGINT) AS pr_nano,
         |    row_number() OVER (PARTITION BY cl.cluster
         |      ORDER BY p3.pr_nano DESC, cl.vec_id) AS rn,
         |    count(*) OVER (PARTITION BY cl.cluster) AS cluster_size
         |  FROM cl JOIN p3 ON cl.vec_id = p3.vec_id)
         |SELECT cluster, vec_id AS representative, pr_nano, cluster_size
         |FROM j WHERE rn = 1""".stripMargin
    },
    // reverse-degree over the same graph; hub flag at in_degree >= 2k
    "knn_reciprocity" ->
      s"""WITH $knnNnSql,
        |e AS (SELECT vec_id, nbr_id FROM nn),
        |m AS (SELECT e1.vec_id, e1.nbr_id FROM e e1
        |  JOIN e e2 ON e1.vec_id = e2.nbr_id AND e1.nbr_id = e2.vec_id),
        |es AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |    CAST(count(DISTINCT vec_id) AS BIGINT) AS n_nodes FROM e),
        |ms AS (SELECT CAST(count(*) AS BIGINT) AS n_mutual_edges,
        |    CAST(count(DISTINCT vec_id) AS BIGINT) AS n_mutual_nodes
        |  FROM m)
        |SELECT n_nodes, n_edges, n_mutual_edges,
        |  round(CAST(n_mutual_edges AS DOUBLE)
        |    / CAST(n_edges AS DOUBLE), 4) AS reciprocity,
        |  n_nodes - n_mutual_nodes AS n_one_way_nodes
        |FROM es, ms""".stripMargin,
    // one-way MANOVA from moment sums: (label, dim) moments → per-dim
    // → global; SS identities avoid any centering join; η²/F guarded
    "embed_anova" ->
      """WITH ld AS (
        |  SELECT label, g.i AS d, CAST(count(*) AS BIGINT) AS nc,
        |    sum(CAST(embedding[g.i] AS DOUBLE)) AS s,
        |    sum(CAST(embedding[g.i] AS DOUBLE)
        |      * CAST(embedding[g.i] AS DOUBLE)) AS ss
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
        |  GROUP BY 1, 2),
        |pd AS (
        |  SELECT d, sum(ss) AS sss, sum(s) AS sd,
        |    CAST(sum(nc) AS BIGINT) AS n,
        |    sum(s * s / CAST(nc AS DOUBLE)) AS bt
        |  FROM ld GROUP BY 1),
        |g AS (
        |  SELECT sum(sss - sd * sd / CAST(n AS DOUBLE)) AS sst,
        |    sum(bt - sd * sd / CAST(n AS DOUBLE)) AS ssb,
        |    max(n) AS n, CAST(count(*) AS BIGINT) AS dim
        |  FROM pd),
        |k AS (SELECT CAST(count(DISTINCT label) AS BIGINT) AS n_classes
        |  FROM embeddings)
        |SELECT n AS n_vecs, n_classes, dim,
        |  round(sst, 4) AS ss_total, round(ssb, 4) AS ss_between,
        |  round(sst - ssb, 4) AS ss_within,
        |  CASE WHEN sst > 0.0 THEN round(ssb / sst, 4) ELSE 0.0 END
        |    AS eta2,
        |  CASE WHEN sst - ssb > 0.0 AND n_classes > 1 AND n > n_classes
        |    THEN round((ssb / CAST(n_classes - 1 AS DOUBLE))
        |      / ((sst - ssb) / CAST(n - n_classes AS DOUBLE)), 4)
        |    ELSE 0.0 END AS f_stat
        |FROM g, k""".stripMargin,
    // Levina–Bickel intrinsic dimension: the exact-NN CTE re-derived
    // WITH the similarity kept (knnNnSql drops it), chordal distance
    // √(2−2·cos), per-(point, k) log-ratio sums, duplicate points
    // (1-NN distance exactly 0) excluded and counted on both engines
    "embed_intrinsic_dim" ->
      """WITH norms AS (
        |  SELECT vec_id,
        |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))) AS nrm
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
        |  GROUP BY vec_id),
        |dots AS (
        |  SELECT q.vec_id AS vec_id, c.vec_id AS nbr_id,
        |    sum(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)) AS dt
        |  FROM embeddings q, embeddings c,
        |    unnest(generate_series(1, len(q.embedding))) AS g(i)
        |  WHERE c.vec_id <> q.vec_id GROUP BY 1, 2),
        |s AS (
        |  SELECT d.vec_id, d.nbr_id, dt / (nq.nrm * nc.nrm) AS sim
        |  FROM dots d
        |  JOIN norms nq ON d.vec_id = nq.vec_id
        |  JOIN norms nc ON d.nbr_id = nc.vec_id),
        |nn AS (
        |  SELECT vec_id, rank,
        |    sqrt(greatest(0.0, 2.0 - 2.0 * sim)) AS d
        |  FROM (
        |    SELECT vec_id, nbr_id, sim,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id) AS rank
        |    FROM s)
        |  WHERE rank <= 5),
        |ks AS (SELECT * FROM (VALUES (3), (4), (5)) AS t(k)),
        |pp AS (
        |  SELECT vec_id, k, min(d) AS dmin,
        |    sum(CASE WHEN rank < k THEN ln(d) END) AS slog,
        |    max(CASE WHEN rank = k THEN ln(d) END) AS ltk
        |  FROM nn, ks WHERE rank <= k GROUP BY 1, 2),
        |pd AS (
        |  SELECT vec_id, k, dmin > 0 AND ltk IS NOT NULL AS live,
        |    CAST(k - 1 AS DOUBLE) * ltk - slog AS denom
        |  FROM pp)
        |SELECT k,
        |  CAST(sum(CASE WHEN live THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pts,
        |  CAST(sum(CASE WHEN live THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_degenerate,
        |  round(avg(CASE WHEN live
        |    THEN CAST(k - 1 AS DOUBLE) / denom END), 4) AS mlid_mean,
        |  round(min(CASE WHEN live
        |    THEN CAST(k - 1 AS DOUBLE) / denom END), 4) AS mlid_min,
        |  round(max(CASE WHEN live
        |    THEN CAST(k - 1 AS DOUBLE) / denom END), 4) AS mlid_max,
        |  round(CAST(k - 1 AS DOUBLE)
        |    * CAST(sum(CASE WHEN live THEN 1 ELSE 0 END) AS DOUBLE)
        |    / sum(CASE WHEN live THEN denom END), 4) AS mlid_global
        |FROM pd GROUP BY k""".stripMargin,
    // LOO majority vote over the exact graph; ties to the smallest
    // label via (c DESC, lbl ASC) — mirrors Spark's max_by (c, −lbl)
    "knn_confusion" ->
      s"""WITH $knnNnSql,
        |votes AS (
        |  SELECT nn.vec_id, e.label AS lbl, count(*) AS c
        |  FROM nn JOIN embeddings e ON nn.nbr_id = e.vec_id
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT vec_id, lbl AS label_pred FROM (
        |    SELECT vec_id, lbl, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY c DESC, lbl ASC) AS r
        |    FROM votes) WHERE r = 1),
        |m AS (
        |  SELECT t.label AS label_true, p.label_pred,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM pred p JOIN embeddings t ON p.vec_id = t.vec_id
        |  GROUP BY 1, 2),
        |tt AS (SELECT label_true, sum(n) AS tn FROM m GROUP BY 1)
        |SELECT m.label_true, m.label_pred,
        |  m.label_true = m.label_pred AS is_correct, n,
        |  round(CAST(n AS DOUBLE) / CAST(tn AS DOUBLE), 4) AS row_share
        |FROM m JOIN tt USING (label_true)""".stripMargin,
    "knn_hubness" ->
      s"""WITH $knnNnSql,
        |deg AS (SELECT nbr_id, count(*) AS d FROM nn GROUP BY nbr_id)
        |SELECT e.vec_id, coalesce(d.d, 0) AS in_degree,
        |  coalesce(d.d, 0) >= 10 AS is_hub
        |FROM embeddings e LEFT JOIN deg d ON e.vec_id = d.nbr_id""".stripMargin,
    // kNN quality scoring: neighborhood-mean quality over the exact
    // graph; means round 4dp (k-double summation order), the gap
    // subtracts two rounded values and re-rounds
    "knn_quality_score" ->
      s"""WITH $knnNnSql,
         |q AS (
         |  SELECT doc_id,
         |    least(CAST(len($tokSql) AS DOUBLE) / 64.0, 1.0) *
         |      (1.0 - CAST(len(regexp_extract_all(text, '$punctClass'))
         |        AS DOUBLE) / CAST(len(text) AS DOUBLE)) AS qs
         |  FROM documents),
         |a AS (
         |  SELECT nn.vec_id, count(*) AS n_nbrs,
         |    round(avg(q.qs), 4) AS knn_quality
         |  FROM nn JOIN q ON nn.nbr_id = q.doc_id GROUP BY 1)
         |SELECT a.vec_id, a.n_nbrs, round(q.qs, 4) AS own_quality,
         |  a.knn_quality,
         |  round(round(q.qs, 4) - a.knn_quality, 4) AS quality_gap
         |FROM a JOIN q ON a.vec_id = q.doc_id""".stripMargin,
    // label propagation: the same mutual graph, three UNROLLED
    // synchronous iterations (vote = majority label among labeled mutual
    // neighbors, ties to the smallest label, seeds immutable); -1 = never
    // reached, on both engines
    "knn_label_prop" -> {
      val iterCtes = (1 to 3).map { r =>
        s"""v$r AS (
           |  SELECT e.a AS vec_id, l.label, count(*) AS c
           |  FROM mutual e JOIN l${r - 1} l ON e.b = l.vec_id
           |  WHERE e.a NOT IN (SELECT vec_id FROM l${r - 1})
           |  GROUP BY 1, 2),
           |n$r AS (
           |  SELECT vec_id, label FROM (
           |    SELECT vec_id, label, row_number() OVER (
           |      PARTITION BY vec_id ORDER BY c DESC, label) AS rn
           |    FROM v$r) WHERE rn = 1),
           |l$r AS (SELECT * FROM l${r - 1} UNION ALL SELECT * FROM n$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH $knnNnSql,
         |mutual AS (
         |  SELECT a.vec_id AS a, a.nbr_id AS b FROM nn a
         |  JOIN nn b ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id),
         |l0 AS (SELECT vec_id, label FROM embeddings WHERE vec_id % 10 = 0),
         |$iterCtes
         |SELECT e.vec_id, coalesce(l.label, -1) AS label,
         |  e.vec_id % 10 = 0 AS is_seed
         |FROM embeddings e LEFT JOIN l3 l USING (vec_id)""".stripMargin
    },
    // PageRank over the mutual graph: three unrolled synchronous
    // rounds in exact integer NANO-units (1e9 = mass 1, damping as the
    // 85/100 rational, every division integer) — bit-identical replay
    // by construction; isolated vectors settle at the base floor
    "knn_pagerank" -> {
      val iterCtes = (1 to 3).map { r =>
        s"""p$r AS (
           |  SELECT e.vec_id,
           |    c.base_u + (85 * coalesce(m.mass, 0)) // 100 AS pr_nano
           |  FROM embeddings e
           |  LEFT JOIN (
           |    SELECT mu.b AS vec_id, sum(p.pr_nano // d.deg) AS mass
           |    FROM mutual mu
           |    JOIN p${r - 1} p ON mu.a = p.vec_id
           |    JOIN deg d ON mu.a = d.vec_id
           |    GROUP BY 1) m USING (vec_id), c)""".stripMargin
      }.mkString(",\n")
      s"""WITH $knnNnSql,
         |mutual AS (
         |  SELECT a.vec_id AS a, a.nbr_id AS b FROM nn a
         |  JOIN nn b ON a.vec_id = b.nbr_id AND a.nbr_id = b.vec_id),
         |deg AS (SELECT a AS vec_id, count(*) AS deg FROM mutual GROUP BY 1),
         |c AS (SELECT count(*) AS n, 1000000000 // count(*) AS init_u,
         |        (15 * (1000000000 // count(*))) // 100 AS base_u
         |      FROM embeddings),
         |p0 AS (SELECT vec_id, c.init_u AS pr_nano FROM embeddings, c),
         |$iterCtes
         |SELECT vec_id, CAST(pr_nano AS BIGINT) AS pr_nano FROM p3""".stripMargin
    },
    // radius search: same cosine pipeline, threshold instead of top-k.
    // Closest sim to the 0.3 cut measured at EVERY test scale: 4.5e-4
    // (sf0.001), 1.2e-3 (sf0.01), 5.0e-4 (sf0.1) — all ≥11 orders of
    // magnitude above cross-engine double-summation noise, so the
    // boundary is stable at any SF the harness runs.
    "ann_range" ->
      """WITH norms AS (
        |  SELECT vec_id,
        |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))) AS nrm
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
        |  GROUP BY vec_id),
        |dots AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    sum(CAST(q.embedding[g.i] AS DOUBLE) * CAST(c.embedding[g.i] AS DOUBLE)) AS dt
        |  FROM embeddings q, embeddings c,
        |    unnest(generate_series(1, len(q.embedding))) AS g(i)
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id GROUP BY 1, 2)
        |SELECT query_id, d.vec_id
        |FROM dots d
        |JOIN norms nq ON d.query_id = nq.vec_id
        |JOIN norms nc ON d.vec_id = nc.vec_id
        |WHERE dt / (nq.nrm * nc.nrm) >= 0.3""".stripMargin,
    // same norms/dots frame as ann_range with the sides recast as
    // bench (< 10) vs corpus (>= 10); integer outputs only, so the τ
    // comparison's doubles never reach the hash compare
    "embed_decontaminate" ->
      """WITH norms AS (
        |  SELECT vec_id,
        |    sqrt(sum(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))) AS nrm
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
        |  GROUP BY vec_id),
        |dots AS (
        |  SELECT c.vec_id AS vec_id, b.vec_id AS bench_id,
        |    sum(CAST(c.embedding[g.i] AS DOUBLE) * CAST(b.embedding[g.i] AS DOUBLE)) AS dt
        |  FROM embeddings c, embeddings b,
        |    unnest(generate_series(1, len(c.embedding))) AS g(i)
        |  WHERE c.vec_id >= 10 AND b.vec_id < 10 GROUP BY 1, 2),
        |h AS (
        |  SELECT d.vec_id, count(*) AS n_hits
        |  FROM dots d
        |  JOIN norms nc ON d.vec_id = nc.vec_id
        |  JOIN norms nb ON d.bench_id = nb.vec_id
        |  WHERE dt / (nb.nrm * nc.nrm) >= 0.3
        |  GROUP BY 1)
        |SELECT c.vec_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 10) c
        |LEFT JOIN h ON c.vec_id = h.vec_id""".stripMargin,
    // the projection's ±1 sign constants come from the SAME Scala function
    // the Spark plan uses (Ann.projectSign), and each output coordinate is
    // an EXPLICIT left-associated 64-term chain in ascending i — identical
    // summation order on both engines, so the doubles are bit-equal and
    // need no rounding
    "embed_project" -> {
      val dim = 64; val outDim = 16
      val scale = 1.0 / math.sqrt(outDim.toDouble)
      val cols = (0 until outDim).map { j =>
        val chain = (0 until dim).map { i =>
          val s = if (Ann.projectSign(j * dim + i) > 0) "+" else "-"
          s"$s CAST(embedding[${i + 1}] AS DOUBLE)"
        }.mkString(" ").stripPrefix("+ ")
        s"  ($chain) * $scale AS p$j"
      }.mkString(",\n")
      s"SELECT vec_id,\n$cols\nFROM embeddings"
    },
    // eigensolve replay (r12, the last convertible rows-only pair):
    // gap-amplified deflated power iteration — see eigenPowerCtes.
    // Projections p_j = v·e_j − μ·e_j rounded 4dp; cross-solver vector
    // agreement ~1e-12 ≪ the 1e-4 rounding grid
    "embed_pca" -> {
      val projCols = (0 until 8).map { k =>
        s"""  round((SELECT sum(e$k.x * emb.v[e$k.i + 1]) FROM e$k)
           |    - (SELECT sum(e$k.x * mu.m)
           |       FROM e$k JOIN mu ON mu.i = e$k.i), 4) AS p$k""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE
         |${eigenPowerCtes(8, 320)}
         |SELECT vec_id,
         |$projCols
         |FROM emb""".stripMargin
    },
    // all 64 eigenvalues via the same deflated chains; variances are
    // Rayleigh quotients back on the ORIGINAL covariance (second-order
    // insensitive to eigenvector error: θ ~1e-6 worst case → λ error
    // ~θ²·gap ≪ the 1e-6 grid), share/cum_share/participation ride the
    // trace identities
    "embed_spectrum" -> {
      val evs = (0 until 64).map { k =>
        s"""SELECT $k AS component,
           |  (SELECT sum(cv.x * a.x * b.x)
           |   FROM cv JOIN e$k a ON a.i = cv.i
           |     JOIN e$k b ON b.i = cv.j) AS lam""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH RECURSIVE
         |${eigenPowerCtes(64, 160)},
         |evs AS ($evs),
         |tot AS (SELECT (SELECT sum(x) FROM cv WHERE i = j) AS tr,
         |               (SELECT sum(x * x) FROM cv) AS tr2)
         |SELECT CAST(component AS INTEGER) AS component,
         |  round(lam, 6) AS variance,
         |  round(lam / tr, 4) AS share,
         |  round(sum(lam) OVER (ORDER BY component) / tr, 4) AS cum_share,
         |  round(tr * tr / tr2, 2) AS participation_ratio
         |FROM evs, tot""".stripMargin
    },
    // whitened coordinates rounded to 4 decimals on both engines (mean /
    // stddev sums are summation-order-dependent in the last ulps); the
    // oracle only needs stats for the 8 projected dims — w_i depends on
    // dim i alone
    "embed_whiten" -> {
      val cols = (0 until 8).map { i =>
        s"""  round((CAST(embedding[${i + 1}] AS DOUBLE)
           |    - (SELECT mu FROM st WHERE i = ${i + 1}))
           |    / (SELECT sd FROM st WHERE i = ${i + 1}), 4) AS w$i""".stripMargin
      }.mkString(",\n")
      s"""WITH st AS (
         |  SELECT g.i AS i,
         |    avg(CAST(embedding[g.i] AS DOUBLE)) AS mu,
         |    stddev_pop(CAST(embedding[g.i] AS DOUBLE)) AS sd
         |  FROM embeddings, unnest(generate_series(1, 8)) AS g(i)
         |  GROUP BY 1)
         |SELECT vec_id,
         |$cols
         |FROM embeddings""".stripMargin
    },
    // one-row space health profile: finite filter, norm spread, mean
    // cosine to the finite-vector centroid; floats 4dp (last-ulp
    // summation-order wobble only)
    "embed_dim_stats" ->
      """WITH x AS (
        |  SELECT CAST(g.i - 1 AS INTEGER) AS dim,
        |    CAST(e.embedding[g.i] AS DOUBLE) AS x
        |  FROM embeddings e,
        |    unnest(generate_series(1, len(e.embedding))) AS g(i))
        |SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(x), 4) AS mean,
        |  round(sqrt(greatest(0.0, avg(x * x) - avg(x) * avg(x))), 4)
        |    AS std,
        |  round(min(x), 4) AS vmin,
        |  round(max(x), 4) AS vmax,
        |  min(x) = max(x) AS is_dead,
        |  CAST(sum(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero
        |FROM x GROUP BY 1""".stripMargin,
    "embed_class_margin" ->
      """WITH pd AS (
        |  SELECT label, g.i AS i,
        |    avg(CAST(e.embedding[g.i] AS DOUBLE)) AS m
        |  FROM embeddings e,
        |    unnest(generate_series(1, len(e.embedding))) AS g(i)
        |  GROUP BY 1, 2),
        |v2 AS (
        |  SELECT label, vec_id,
        |    sum(CAST(e.embedding[g.i] AS DOUBLE)
        |      * CAST(e.embedding[g.i] AS DOUBLE)) AS ss
        |  FROM embeddings e,
        |    unnest(generate_series(1, len(e.embedding))) AS g(i)
        |  GROUP BY 1, 2),
        |e2 AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |    avg(ss) AS e2 FROM v2 GROUP BY 1),
        |mu2 AS (SELECT label, sum(m * m) AS mu2 FROM pd GROUP BY 1),
        |lab AS (SELECT e2.label, e2.n_vecs,
        |    sqrt(greatest(0.0, e2.e2 - mu2.mu2)) AS intra
        |  FROM e2 JOIN mu2 USING (label)),
        |cd AS (SELECT a.label AS label, b.label AS label_b,
        |    sqrt(sum((a.m - b.m) * (a.m - b.m))) AS cdist
        |  FROM pd a JOIN pd b ON a.i = b.i AND a.label <> b.label
        |  GROUP BY 1, 2),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY label
        |    ORDER BY cdist, label_b) AS rn FROM cd)
        |SELECT lab.label, lab.n_vecs,
        |  round(lab.intra, 4) AS intra_rms,
        |  rk.label_b AS nearest_label,
        |  round(rk.cdist, 4) AS margin,
        |  CASE WHEN lab.intra > 0.0
        |    THEN round(rk.cdist / lab.intra, 4) ELSE 0.0 END
        |    AS fisher_ratio
        |FROM lab JOIN rk ON rk.label = lab.label AND rk.rn = 1""".stripMargin,
    "embed_norm_profile" ->
      """WITH base AS (
        |  SELECT vec_id, embedding,
        |    len(list_filter(embedding, x ->
        |      isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE)))) = 0
        |      AS fin
        |  FROM embeddings),
        |norms AS (
        |  SELECT b.vec_id,
        |    sqrt(sum(CAST(b.embedding[g.i] AS DOUBLE) *
        |             CAST(b.embedding[g.i] AS DOUBLE))) AS nrm
        |  FROM base b, unnest(generate_series(1, len(b.embedding))) AS g(i)
        |  WHERE b.fin GROUP BY 1),
        |mu AS (
        |  SELECT g.i AS i, avg(CAST(b.embedding[g.i] AS DOUBLE)) AS m
        |  FROM base b, unnest(generate_series(1, len(b.embedding))) AS g(i)
        |  WHERE b.fin GROUP BY 1),
        |nmu AS (SELECT sqrt(sum(m * m)) AS v FROM mu),
        |dots AS (
        |  SELECT b.vec_id, sum(CAST(b.embedding[mu.i] AS DOUBLE) * mu.m)
        |    AS dmu
        |  FROM base b, mu WHERE b.fin GROUP BY 1),
        |cosv AS (
        |  SELECT n.vec_id,
        |    CASE WHEN n.nrm > 0 AND (SELECT v FROM nmu) > 0
        |         THEN d.dmu / (n.nrm * (SELECT v FROM nmu))
        |         WHEN n.nrm > 0 THEN 0.0 END AS c
        |  FROM norms n JOIN dots d ON n.vec_id = d.vec_id)
        |SELECT
        |  (SELECT count(*) FROM base) AS n_vecs,
        |  (SELECT count(*) FROM base WHERE NOT fin) AS n_nonfinite,
        |  (SELECT count(*) FROM norms WHERE nrm = 0) AS n_zero_norm,
        |  round((SELECT min(nrm) FROM norms), 4) AS norm_min,
        |  round((SELECT avg(nrm) FROM norms), 4) AS norm_mean,
        |  round((SELECT max(nrm) FROM norms), 4) AS norm_max,
        |  round((SELECT avg(c) FROM cosv WHERE c IS NOT NULL), 4)
        |    AS mean_cos_centroid""".stripMargin,
    // int8 codes are exact integers (round is half-away on both engines
    // and float ties are measure-zero); the one float output is the
    // relative reconstruction error, rounded 6dp — the summands are
    // identical IEEE terms, only summation order can wobble (last-ulp)
    // binary-embedding retrieval: hamming = count of sign-bit
    // mismatches per dim — exact integers end to end, ties on vec_id
    "embed_binary_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |p AS (
        |  SELECT q.query_id, e.vec_id,
        |    CAST(len(list_filter(range(1, 65), i ->
        |      (e.embedding[i] > 0) <> (q.qe[i] > 0))) AS BIGINT)
        |      AS hamming
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, rank, vec_id, hamming FROM (
        |  SELECT query_id, vec_id, hamming,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY hamming, vec_id) AS rank
        |  FROM p)
        |WHERE rank <= 10""".stripMargin,
    "embed_quantize" -> {
      val qCols = (0 until 8).map { i =>
        s"  CAST(max(CASE WHEN i = ${i + 1} THEN qv END) AS BIGINT) AS q$i"
      }.mkString(",\n")
      s"""WITH d AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |sc AS (SELECT i, max(abs(x)) / 127 AS s FROM d GROUP BY 1),
         |q AS (SELECT d.vec_id, d.i, d.x, sc.s,
         |        CASE WHEN sc.s = 0 THEN 0 ELSE round(d.x / sc.s, 0) END AS qv
         |      FROM d JOIN sc ON d.i = sc.i)
         |SELECT vec_id,
         |$qCols,
         |  CAST(sum(CASE WHEN abs(qv) = 127 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sat,
         |  round(CASE WHEN sum(x * x) = 0 THEN 0
         |        ELSE sqrt(sum((x - qv * s) * (x - qv * s)) / sum(x * x))
         |        END, 6) AS recon_err
         |FROM q GROUP BY vec_id""".stripMargin
    },
    // centroid drift between the even/odd snapshot split: per-dim avgs
    // via the embed_outliers unnest pattern, shift rounded 4dp; only
    // labels present on BOTH sides (inner join on both engines)
    "embed_centroid_shift" ->
      """WITH d AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |ca AS (SELECT label, i, avg(x) AS cx FROM d
        |       WHERE vec_id % 2 = 0 GROUP BY 1, 2),
        |cb AS (SELECT label, i, avg(x) AS cx FROM d
        |       WHERE vec_id % 2 = 1 GROUP BY 1, 2),
        |na AS (SELECT label, count(*) AS n_a FROM embeddings
        |       WHERE vec_id % 2 = 0 GROUP BY 1),
        |nb AS (SELECT label, count(*) AS n_b FROM embeddings
        |       WHERE vec_id % 2 = 1 GROUP BY 1),
        |sh AS (
        |  SELECT ca.label,
        |    round(sqrt(sum((ca.cx - cb.cx) * (ca.cx - cb.cx))), 4) AS s
        |  FROM ca JOIN cb ON ca.label = cb.label AND ca.i = cb.i
        |  GROUP BY 1)
        |SELECT sh.label, na.n_a, nb.n_b, sh.s AS centroid_shift
        |FROM sh JOIN na ON sh.label = na.label
        |JOIN nb ON sh.label = nb.label""".stripMargin,
    // distances and z-scores rounded to 4 decimals on BOTH engines before
    // any comparison/threshold (the textPerplexity float rule); the flag
    // thresholds the rounded z at 2.0 like Ann.embedOutliers
    "embed_outliers" ->
      """WITH d AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |c AS (SELECT label, i, avg(x) AS cx FROM d GROUP BY 1, 2),
        |dist AS (
        |  SELECT d.vec_id, d.label,
        |    round(sqrt(sum((d.x - c.cx) * (d.x - c.cx))), 4) AS dist
        |  FROM d JOIN c ON d.label = c.label AND d.i = c.i
        |  GROUP BY 1, 2),
        |st AS (SELECT label, avg(dist) AS mu, stddev_pop(dist) AS sd
        |  FROM dist GROUP BY 1)
        |SELECT dist.vec_id, dist.label, dist.dist,
        |  CASE WHEN st.sd = 0 THEN 0.0
        |       ELSE round((dist.dist - st.mu) / st.sd, 4) END AS z,
        |  CASE WHEN st.sd = 0 THEN 0.0
        |       ELSE round((dist.dist - st.mu) / st.sd, 4) END >= 2.0
        |    AS is_outlier
        |FROM dist JOIN st ON dist.label = st.label""".stripMargin
  )

  /** Shared CTE chain of the `dedup_corpus` / `corpus_families` oracles:
    * word-3-gram shingles → inverted-index jaccard ≥ 0.8 pairs →
    * undirected edges → RECURSIVE reachability (reach). Interpolate
    * after a `WITH RECURSIVE`. */
  private lazy val jaccardCcSql: String =
    s"""toks AS (SELECT doc_id, $tokSql AS t FROM documents),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
       |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
       |       WHERE len(t) >= 3),
       |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |jpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |             count(*) AS inter
       |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |fpairs AS (SELECT doc_a, doc_b FROM jpairs
       |           JOIN counts ca ON doc_a = ca.doc_id
       |           JOIN counts cb ON doc_b = cb.doc_id
       |           WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM fpairs
       |          UNION SELECT doc_b, doc_a FROM fpairs),
       |reach(a, b) AS (SELECT a, b FROM edges
       |                UNION
       |                SELECT r.a, e.b FROM reach r
       |                JOIN edges e ON r.b = e.a WHERE e.b <> r.a)""".stripMargin

  // --- XXH64 replayed in DuckDB SQL (r13): Spark's `xxhash64` (XXH64 with
  // seed 42) over a string's UTF-8 bytes, re-derived arithmetically so the
  // signature-bound entries (minhash / simhash + incrementals, the tuning
  // report, dedup_eval) gain real value-level oracles instead of rows-only
  // checks. UBIGINT carries the 64-bit running state; every multiply
  // detours through UHUGEINT and reduces mod 2^64 because DuckDB RAISES on
  // 64-bit overflow instead of wrapping (a sub-2^64 product of sub-2^64
  // factors always fits the 128-bit unsigned lane); a rotation is the
  // wrapped multiply OR'd with the complementary logical right shift; the
  // final state wraps back to Spark's signed long. Validated bit-for-bit
  // against xxhash64 on empty / short / exactly-one-stripe / multi-stripe
  // strings and the full sf0.01 shingle set. The algorithm is public
  // domain (github.com/Cyan4973/xxHash spec); Spark's byte-stream variant
  // is sql/catalyst XXH64.hashUnsafeBytesBlock.
  private val xxM64 = "18446744073709551616::UHUGEINT"
  private val xxP1 = "11400714785074694791::UBIGINT"
  private val xxP2 = "14029467366897019727::UBIGINT"
  private val xxP3 = "1609587929392839161::UBIGINT"
  private val xxP4 = "9650029242287828579::UBIGINT"
  private val xxP5 = "2870177450012600261::UBIGINT"
  private def xxMul(a: String, b: String): String =
    s"(((($a)::UHUGEINT * ($b)::UHUGEINT) % $xxM64)::UBIGINT)"
  private def xxAdd(a: String, b: String): String =
    s"(((($a)::UHUGEINT + ($b)::UHUGEINT) % $xxM64)::UBIGINT)"
  private def xxSub(a: String, b: String): String =
    s"(((($a)::UHUGEINT + $xxM64 - ($b)::UHUGEINT) % $xxM64)::UBIGINT)"
  private def xxRotl(x: String, r: Int): String =
    s"(${xxMul(x, (BigInt(1) << r).toString)} | (($x) >> ${64 - r}))"
  private def xxXor(a: String, b: String): String =
    s"xor(($a)::UBIGINT, ($b)::UBIGINT)"
  private def xxFmix(h: String): String = {
    val e1 = xxMul(xxXor(h, s"(($h) >> 33)"), xxP2)
    val e2 = xxMul(xxXor(e1, s"(($e1) >> 29)"), xxP3)
    xxXor(e2, s"(($e2) >> 32)")
  }
  /** One tail-word round: h' = rotl27(h ⊕ rotl31(w·P2)·P1)·P1 + P4. */
  private def xxStep8(h: String, w: String): String = {
    val k1 = xxMul(xxRotl(xxMul(w, xxP2), 31), xxP1)
    xxAdd(xxMul(xxRotl(xxXor(h, k1), 27), xxP1), xxP4)
  }
  /** One stripe-lane round: v' = rotl31(v + w·P2)·P1. */
  private def xxLane(v: String, w: String): String =
    xxMul(xxRotl(xxAdd(v, xxMul(w, xxP2)), 31), xxP1)
  private def xxMergeLane(h: String, v: String): String =
    xxAdd(xxMul(xxXor(h, xxMul(xxRotl(xxMul(v, xxP2), 31), xxP1)), xxP1), xxP4)
  /** Byte `i` (0-based) of hex-encoded column `hx` (hex() is uppercase). */
  private def xxByte(hx: String, i: String): String =
    s"((strpos('0123456789ABCDEF', substr($hx, 2*($i)+1, 1))-1)*16" +
      s" + strpos('0123456789ABCDEF', substr($hx, 2*($i)+2, 1))-1)::UBIGINT"
  /** Little-endian word at byte offset `off`: Σ byte(off+k)·256^k. */
  private def xxWord(hx: String, off: String, nBytes: Int): String = {
    val terms = (0 until nBytes).map(k =>
      s"${xxByte(hx, s"($off)+$k")}::UHUGEINT * ${BigInt(1) << (8 * k)}::UHUGEINT")
      .mkString(" + ")
    s"((($terms) % $xxM64)::UBIGINT)"
  }
  private def xxToSigned(x: String): String =
    s"((($x)::HUGEINT - CASE WHEN ($x) >= 9223372036854775808::UBIGINT" +
      s" THEN $xxM64::HUGEINT ELSE 0::HUGEINT END)::BIGINT)"
  private def xxBStep(h: String, b: String): String =
    xxMul(xxRotl(xxXor(h, xxMul(b, xxP5)), 11), xxP1)
  /** CTE chain hashing every row of `src`(key, s): emits `<pfx>xxh`(key, h)
    * with h = Spark xxhash64(s) as a signed BIGINT. Recursive over 32-byte
    * stripes and 8-byte tail words (depth = longest string / 8); the ≤3
    * single-byte steps unroll as chained CTEs. Interpolate after a
    * `WITH RECURSIVE`. */
  private def xxhashCtes(src: String, pfx: String): String =
    s"""${pfx}hx0 AS (SELECT key, hex(encode(s)) AS hx,
       |  CAST(octet_length(encode(s)) AS INT) AS n FROM $src),
       |${xxhashHexCtes(s"${pfx}hx0", pfx)}""".stripMargin

  /** [[xxhashCtes]] over PRE-HEXED bytes (r15): `hexSrc` provides
    * (key, hx, n) with hx the UPPERCASE hex of the exact byte string to
    * hash and n its byte count — the media payload oracles construct
    * raw binary (not valid UTF-8) byte-by-byte, so they hex it
    * themselves instead of riding encode(). */
  private def xxhashHexCtes(hexSrc: String, pfx: String): String = {
    val sd = "42::UBIGINT"
    val v1i = xxAdd(xxAdd(sd, xxP1), xxP2)
    val v2i = xxAdd(sd, xxP2)
    val v4i = xxSub(sd, xxP1)
    val hMerge = Seq("v1", "v2", "v3", "v4").foldLeft(
      xxAdd(xxAdd(xxAdd(xxRotl("v1", 1), xxRotl("v2", 7)),
        xxRotl("v3", 12)), xxRotl("v4", 18)))(xxMergeLane)
    val hAfter4 = xxAdd(xxMul(xxRotl(
      xxXor("h", xxMul(xxWord("hx", "p", 4), xxP1)), 23), xxP2), xxP3)
    s"""${pfx}stripe(key, hx, n, i, v1, v2, v3, v4) AS (
       |  SELECT key, hx, n, 0, $v1i, $v2i, $sd, $v4i FROM $hexSrc
       |  WHERE n >= 32
       |  UNION ALL
       |  SELECT key, hx, n, i+1,
       |    ${xxLane("v1", xxWord("hx", "i*32", 8))},
       |    ${xxLane("v2", xxWord("hx", "i*32+8", 8))},
       |    ${xxLane("v3", xxWord("hx", "i*32+16", 8))},
       |    ${xxLane("v4", xxWord("hx", "i*32+24", 8))}
       |  FROM ${pfx}stripe WHERE i < n // 32),
       |${pfx}base AS (
       |  SELECT key, hx, n, (n // 32) * 32 AS p,
       |    ${xxAdd(hMerge, "n::UBIGINT")} AS h
       |  FROM ${pfx}stripe WHERE i = n // 32
       |  UNION ALL
       |  SELECT key, hx, n, 0 AS p,
       |    ${xxAdd(xxAdd(sd, xxP5), "n::UBIGINT")} AS h
       |  FROM $hexSrc WHERE n < 32),
       |${pfx}w8(key, hx, n, p, h) AS (
       |  SELECT key, hx, n, p, h FROM ${pfx}base
       |  UNION ALL
       |  SELECT key, hx, n, p+8, ${xxStep8("h", xxWord("hx", "p", 8))}
       |  FROM ${pfx}w8 WHERE p + 8 <= n),
       |${pfx}w4 AS (
       |  SELECT key, hx, n,
       |    CASE WHEN p + 4 <= n THEN p + 4 ELSE p END AS p,
       |    CASE WHEN p + 4 <= n THEN $hAfter4 ELSE h END AS h
       |  FROM ${pfx}w8 WHERE p + 8 > n),
       |${pfx}b1 AS (SELECT key, hx, n, p + 1 AS p,
       |    CASE WHEN p < n THEN ${xxBStep("h", xxByte("hx", "p"))}
       |         ELSE h END AS h
       |  FROM ${pfx}w4),
       |${pfx}b2 AS (SELECT key, hx, n, p + 1 AS p,
       |    CASE WHEN p < n THEN ${xxBStep("h", xxByte("hx", "p"))}
       |         ELSE h END AS h
       |  FROM ${pfx}b1),
       |${pfx}b3 AS (SELECT key, hx, n,
       |    CASE WHEN p < n THEN ${xxBStep("h", xxByte("hx", "p"))}
       |         ELSE h END AS h
       |  FROM ${pfx}b2),
       |${pfx}xxh AS (SELECT key, ${xxToSigned(xxFmix("h"))} AS h
       |  FROM ${pfx}b3)""".stripMargin
  }

  /** Shared signature base of the six converted entries: distinct
    * (doc, 3-gram shingle) rows, ONE xxhash64 per distinct shingle string
    * (the [[xxhashCtes]] replay), pmod onto [[graft.llm.Dedup.MinhashPrime]],
    * and the 64 affine-min MinHash rows assembled as a LIST — Spark's
    * [[graft.llm.Dedup.minhashSigs]] seed pairs interpolate as literals
    * (data-independent: Random(42), exactly what the engine uses). Emits
    * `shh`(doc_id, h) for the simhash arm and `sigs`(doc_id, sig). */
  private lazy val mhSigBaseCtes: String = {
    val p = graft.llm.Dedup.MinhashPrime
    val mins = graft.llm.Dedup.MinhashSeeds
      .map { case (a, b) => s"min((hp * $a + $b) % $p)" }.mkString(", ")
    s"""toks AS (SELECT doc_id, $tokSql AS t FROM documents),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
       |       FROM toks, unnest(generate_series(1, len(t)-2)) AS g(i)
       |       WHERE len(t) >= 3),
       |ds AS (SELECT DISTINCT s AS key, s FROM sh),
       |${xxhashCtes("ds", "x")},
       |shh AS (SELECT DISTINCT sh.doc_id, x.h
       |        FROM sh JOIN xxxh x ON sh.s = x.key),
       |hs AS (SELECT doc_id, ((h % $p) + $p) % $p AS hp FROM shh),
       |sigs AS (SELECT doc_id, [$mins] AS sig FROM hs GROUP BY doc_id)""".stripMargin
  }

  /** Banded MinHash pairs over `sigs`: bucket key = the band's signature
    * SLICE itself (bucket identity — Spark's band hash only partitions
    * buckets, so the slice is the same key up to xxhash64 collisions, the
    * operator's own declared vanishing trade); est_sim = exact
    * position-agreement count / 64, every k/64 binary-exact in DOUBLE.
    * Emits `mhpairs`(doc_a, doc_b, est_sim ≥ 0.5). */
  private lazy val mhPairsCtes: String =
    s"""bands AS (SELECT doc_id, j, sig[4*j+1:4*j+4] AS bk, sig
       |          FROM sigs, unnest(generate_series(0, 15)) AS bj(j)),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y
       |           ON x.j = y.j AND x.bk = y.bk AND x.doc_id < y.doc_id),
       |mhpairs AS (SELECT * FROM (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_filter(range(1, 65),
       |      i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 64 AS est_sim
       |  FROM cand JOIN sigs sa ON cand.doc_a = sa.doc_id
       |            JOIN sigs sb ON cand.doc_b = sb.doc_id)
       |  WHERE est_sim >= 0.5)""".stripMargin

  /** SimHash over the same `shh` hash rows: per-bit ±1 votes on the
    * UNSIGNED 64-bit pattern (HUGEINT carries it; bit i = (u / 2^i) mod 2),
    * sign bit folded back for Spark's signed long, 4×16-bit pigeonhole
    * blocks, exact hamming ≤ 3. Emits `spairs`(doc_a, doc_b, hamming). */
  private lazy val shPairsCtes: String = {
    val m = BigInt(1) << 64
    val votes = (0 until 64).map(i =>
      s"sum(CASE WHEN (u // ${BigInt(1) << i}) % 2 = 1 THEN 1 ELSE -1 END)" +
        s" AS v$i").mkString(", ")
    val bits = (0 until 64).map(i =>
      s"(CASE WHEN v$i > 0 THEN ${BigInt(1) << i}::HUGEINT" +
        " ELSE 0::HUGEINT END)").mkString(" + ")
    val blocks = (0 until 4).map(j =>
      s"SELECT doc_id, sig, $j AS blk, CAST((su // ${BigInt(1) << (16 * j)})" +
        " % 65536 AS BIGINT) AS v FROM ssigs").mkString(" UNION ALL ")
    s"""shu AS (SELECT doc_id, ((h::HUGEINT % $m) + $m) % $m AS u FROM shh),
       |svot AS (SELECT doc_id, $votes FROM shu GROUP BY doc_id),
       |ssigs AS (SELECT doc_id, ($bits) AS su,
       |    CAST(($bits) - CASE WHEN v63 > 0 THEN $m::HUGEINT
       |      ELSE 0::HUGEINT END AS BIGINT) AS sig
       |  FROM svot),
       |sblk AS ($blocks),
       |spairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    bit_count(xor(x.sig, y.sig)) AS hamming
       |  FROM sblk x JOIN sblk y
       |    ON x.blk = y.blk AND x.v = y.v AND x.doc_id < y.doc_id
       |  WHERE bit_count(xor(x.sig, y.sig)) <= 3)""".stripMargin
  }

  /** DuckDB equivalent of TextOps.tokens. Backslashes stay literal: this is
    * a plain (non-interpolated concatenation of) string so the SQL carries
    * a single backslash-s. */
  /** BPE train state as a RECURSIVE CTE (r11): one row per (iteration,
    * vocab word) carrying the current segmentation as a space-joined
    * string. Each iteration counts adjacent symbol pairs weighted by
    * word frequency, keeps the (count desc, left, right) argmax if it
    * occurs ≥ 2 times, and re-folds every word under that one merge via
    * `list_reduce` — the fold (merge when the accumulator's last symbol
    * is `l` and the next is `r`) is equivalent to the trainer's
    * skip-two scan because a merged symbol `l||r` can never equal `l`
    * again within the pass. Shared by the bpe_train / bpe_encode /
    * bpe_fertility oracles; the encode side reads the FINAL iteration's
    * segmentation lengths directly, which equals BpeApply under the
    * trained table because training itself applies merges in rank
    * order, one pass each. */
  private lazy val bpeCoreSql: String =
    s"""vocab AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($tokSql) AS w FROM documents)
       |  GROUP BY w ORDER BY freq DESC, w ASC LIMIT 50000),
       |state(it, w, freq, seg, ml, mr, mc) AS (
       |  SELECT 0, w, freq,
       |    array_to_string(string_split_regex(w, ''), ' '),
       |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       |    CAST(NULL AS BIGINT)
       |  FROM vocab
       |  UNION ALL
       |  SELECT s.it + 1, s.w, s.freq,
       |    list_reduce(
       |      list_prepend('', string_split(s.seg, ' ')),
       |      (acc, x) -> CASE
       |        WHEN regexp_extract(acc, '[^ ]*$$') = b.l AND x = b.r
       |          THEN substr(acc, 1, len(acc) - len(b.l)) || b.l || b.r
       |        WHEN acc = '' THEN x
       |        ELSE acc || ' ' || x END),
       |    b.l, b.r, b.c
       |  FROM state s CROSS JOIN (
       |    SELECT l, r, c FROM (
       |      SELECT l, r, CAST(sum(freq) AS BIGINT) AS c,
       |        row_number() OVER (ORDER BY sum(freq) DESC, l ASC, r ASC)
       |          AS rn
       |      FROM (
       |        SELECT syms[g.i] AS l, syms[g.i + 1] AS r, freq
       |        FROM (SELECT string_split(seg, ' ') AS syms, freq
       |              FROM state),
       |          unnest(generate_series(1, len(syms) - 1)) AS g(i))
       |      GROUP BY l, r)
       |    WHERE rn = 1 AND c >= 2) b
       |  WHERE s.it < 20),
       |final AS (
       |  SELECT w, CASE WHEN w = '' THEN 0
       |    ELSE len(string_split(seg, ' ')) END AS n_sym
       |  FROM state WHERE it = (SELECT max(it) FROM state)),
       |docwords AS (
       |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT doc_id, unnest($tokSql) AS w FROM documents)
       |  GROUP BY 1, 2),
       |enc AS (
       |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
       |    CAST(sum(n * n_sym) AS BIGINT) AS n_bpe_tokens
       |  FROM docwords JOIN final USING (w) GROUP BY doc_id)""".stripMargin

  /** Trained-classifier replay (r11): the 300-iteration full-batch
    * logistic GD of Classifier.train as a RECURSIVE CTE. State is ONE
    * row (iteration, weight list, bias); each step aggregates the
    * gradient over the standardized training sample and applies the
    * lr/n update with the trainer's own expression shapes (z folds
    * left-to-right from the bias exactly like the Scala loop). The
    * only cross-engine wobble left is unordered float summation and
    * libm exp's last ulp — orders below the 4dp grain the scores round
    * to. Verified: the replayed scores hash-matched all 500 docs at
    * sf0.01 before wiring in. */
  private lazy val clsCoreSql: String = {
    val z = "((((((((s.b + s.w[1] * sx.x[1]) + s.w[2] * sx.x[2])" +
      " + s.w[3] * sx.x[3]) + s.w[4] * sx.x[4]) + s.w[5] * sx.x[5])" +
      " + s.w[6] * sx.x[6]) + s.w[7] * sx.x[7]))"
    val grad = (1 to 7).map(j =>
      s"sum((1.0 / (1.0 + exp(-$z)) - sx.y) * sx.x[$j])").mkString(",\n      ")
    s"""gm AS (
       |${gopherOracleSql.linesIterator.map("  " + _).mkString("\n")}
       |),
       |feat AS (
       |  SELECT doc_id,
       |    [CAST(n_words AS DOUBLE), mean_word_len, symbol_ratio,
       |     bullet_ratio, ellipsis_ratio, alpha_word_ratio,
       |     CAST(n_stop_present AS DOUBLE)] AS x,
       |    CASE WHEN gopher_pass THEN 1.0 ELSE 0.0 END AS y,
       |    ((doc_id % ${TextOps.SampleIdPrime}) * ${TextOps.SampleMultiplier}
       |      >> ${TextOps.SampleShift}) % 1000 AS bkt
       |  FROM gm),
       |samp AS (SELECT x, y FROM feat ORDER BY bkt, doc_id LIMIT 10000),
       |nr AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM samp),
       |mus AS (
       |  SELECT gs.j AS j, sum(x[gs.j]) / max(nr.n) AS mu, max(nr.n) AS nn
       |  FROM samp, nr, unnest(generate_series(1, 7)) AS gs(j)
       |  GROUP BY gs.j),
       |sds AS (
       |  SELECT mm.j AS j, mm.mu AS mu,
       |    sqrt(sum((sp.x[mm.j] - mm.mu) * (sp.x[mm.j] - mm.mu))
       |      / max(mm.nn)) AS s0
       |  FROM samp sp, mus mm GROUP BY mm.j, mm.mu),
       |musd AS (
       |  SELECT list(mu ORDER BY j) AS mu,
       |    list(CASE WHEN s0 = 0.0 THEN 1.0 ELSE s0 END ORDER BY j) AS sd
       |  FROM sds),
       |sx AS (
       |  SELECT list_transform(generate_series(1, 7),
       |      j -> (x[j] - musd.mu[j]) / musd.sd[j]) AS x, y
       |  FROM samp, musd),
       |state(it, w, b) AS (
       |  SELECT 0, [0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
       |             0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE], 0.0::DOUBLE
       |  UNION ALL
       |  SELECT it + 1,
       |    list_transform(generate_series(1, 7),
       |      j -> wv[j] - 0.5 * gw[j] / nn),
       |    bv - 0.5 * gb / nn
       |  FROM (
       |    SELECT s.it AS it, max(s.w) AS wv, max(s.b) AS bv,
       |      max(nr.n) AS nn,
       |      list_value(
       |      $grad) AS gw,
       |      sum(1.0 / (1.0 + exp(-$z)) - sx.y) AS gb
       |    FROM state s, sx, nr
       |    WHERE s.it < 300
       |    GROUP BY s.it, s.w, s.b)),
       |model AS (SELECT w, b FROM state WHERE it = 300)""".stripMargin
  }

  /** σ(w·x̂ + b) over a gopher-metrics relation `rel`, with the trained
    * `model`/`musd` CTEs in scope — the exact term order of
    * Classifier.score. Callers wrap in round(·, 4). */
  private def clsScoreSql(rel: String): String =
    s"""1.0 / (1.0 + exp(-(
       |    ((CAST($rel.n_words AS DOUBLE) - musd.mu[1]) / musd.sd[1]
       |        * model.w[1]
       |     + ($rel.mean_word_len - musd.mu[2]) / musd.sd[2] * model.w[2]
       |     + ($rel.symbol_ratio - musd.mu[3]) / musd.sd[3] * model.w[3]
       |     + ($rel.bullet_ratio - musd.mu[4]) / musd.sd[4] * model.w[4]
       |     + ($rel.ellipsis_ratio - musd.mu[5]) / musd.sd[5] * model.w[5]
       |     + ($rel.alpha_word_ratio - musd.mu[6]) / musd.sd[6]
       |        * model.w[6]
       |     + (CAST($rel.n_stop_present AS DOUBLE) - musd.mu[7])
       |        / musd.sd[7] * model.w[7])
       |    + model.b)))""".stripMargin

  // --- k-means (Lloyd) oracle machinery (r11) -------------------------
  // trainCoarse is fully deterministic given the data: init = the first
  // nlist vectors by vec_id, then `iters` Lloyd steps of (assign via
  // argmax v·c − |c|²/2 with the CentroidArgmax last-max tie → HIGHER
  // j; per-(cell, dim) mean; empty cells keep their old centroid). The
  // oracle unrolls the iterations as chained CTEs. At the driver SF the
  // train cap (nlist·256) exceeds the corpus, so training sees every
  // vector and no xxhash sampling fires — the one regime where the
  // quantizer IS SQL-expressible. Verified exact on all six entries at
  // sf0.01 before wiring in.
  private def lloydCte(src: String, nlist: Int, iters: Int,
                       p: String): String = {
    val parts = Seq.newBuilder[String]
    parts += s"""${p}c0 AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS c
      |  FROM (SELECT * FROM $src ORDER BY vec_id LIMIT $nlist))""".stripMargin
    for (t <- 1 to iters) {
      parts += s"""${p}a$t AS (
        |  SELECT vec_id, v, j AS cid FROM (
        |    SELECT vv.vec_id, vv.v, cc.j,
        |      row_number() OVER (PARTITION BY vv.vec_id
        |        ORDER BY list_dot_product(vv.v, cc.c)
        |          - list_dot_product(cc.c, cc.c) / 2.0 DESC, cc.j DESC)
        |        AS rn
        |    FROM $src vv, ${p}c${t - 1} cc) WHERE rn = 1)""".stripMargin
      parts += s"""${p}m$t AS (
        |  SELECT cid, g.i AS pos, avg(v[g.i]) AS m
        |  FROM ${p}a$t, unnest(generate_series(1, len(v))) AS g(i)
        |  GROUP BY 1, 2)""".stripMargin
      parts += s"""${p}c$t AS (
        |  SELECT cc.j, coalesce(mv.c, cc.c) AS c
        |  FROM ${p}c${t - 1} cc LEFT JOIN (
        |    SELECT cid AS j, list(m ORDER BY pos) AS c FROM ${p}m$t
        |    GROUP BY cid) mv
        |    ON cc.j = mv.j)""".stripMargin
    }
    parts.result().mkString(",\n")
  }

  /** Map-side nearest-centroid assignment of `src`(vec_id, v) under the
    * centroid CTE `cents`(j, c) — ties to the HIGHER j, the
    * CentroidArgmax rule. */
  private def assignCte(src: String, cents: String, out: String): String =
    s"""$out AS (
       |  SELECT vec_id, v, j AS cid FROM (
       |    SELECT s.vec_id, s.v, cc.j,
       |      row_number() OVER (PARTITION BY s.vec_id
       |        ORDER BY list_dot_product(s.v, cc.c)
       |          - list_dot_product(cc.c, cc.c) / 2.0 DESC, cc.j DESC)
       |        AS rn
       |    FROM $src s, $cents cc) WHERE rn = 1)""".stripMargin

  /** Unit-normalized embeddings — Ann.unitVecs verbatim. */
  private val unitCteSql: String =
    """u AS (
      |  SELECT vec_id,
      |    list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0
      |        FROM embeddings))""".stripMargin

  // --- PQ oracle machinery (r11) --------------------------------------
  // Sub-codebooks are per-subspace Lloyd chains with the same seeded
  // determinism as lloydCte (init = slices of the first ksub training
  // vectors, assign ties to the higher code, per-(subspace, code, dim)
  // mean, empty codes keep old centroids); the ADC score is a literal
  // 16-term left-associated sum matching pqAdcScore's fold. Verified
  // exact on all three PQ entries at sf0.01 before wiring in. The
  // partition-local candidate cut (per-pid top k·rf) equals the global
  // cut here because the driver-SF corpus reads as one input split.
  private val PqDsub = 4
  private val PqM = 16
  private val PqKsub = 16

  private def pqCodesCte(src: String, cb: String, out: String): String =
    s"""$out AS (
       |  SELECT vec_id, v, list(code ORDER BY j) AS codes FROM (
       |    SELECT vec_id, v, j, c AS code FROM (
       |      SELECT s.vec_id, s.v, cb.j, cb.c,
       |        row_number() OVER (PARTITION BY s.vec_id, cb.j
       |          ORDER BY list_dot_product(
       |              s.v[cb.j * $PqDsub + 1 : (cb.j + 1) * $PqDsub], cb.cv)
       |            - list_dot_product(cb.cv, cb.cv) / 2.0 DESC, cb.c DESC)
       |          AS rn
       |      FROM $src s, $cb cb) WHERE rn = 1)
       |  GROUP BY vec_id, v)""".stripMargin

  private def pqUpdateCte(codes: String, cbOld: String,
                          cbNew: String): String =
    s"""$cbNew AS (
       |  SELECT o.j, o.c, coalesce(mv.cv, o.cv) AS cv
       |  FROM $cbOld o LEFT JOIN (
       |    SELECT j, code AS c, list(mu ORDER BY p) AS cv FROM (
       |      SELECT gs.j, codes[gs.j + 1] AS code, gp.p,
       |        avg(v[gs.j * $PqDsub + gp.p]) AS mu
       |      FROM $codes, unnest(generate_series(0, ${PqM - 1})) AS gs(j),
       |        unnest(generate_series(1, $PqDsub)) AS gp(p)
       |      GROUP BY 1, 2, 3)
       |    GROUP BY 1, 2) mv ON o.j = mv.j AND o.c = mv.c)""".stripMargin

  /** Two-iteration sub-codebook training over `src`(vec_id, v) ending
    * in codebook `cb2` and encode CTE `e3`(vec_id, v, codes). */
  private def pqTrainCtes(src: String): String =
    s"""cb0 AS (
       |  SELECT gs.j,
       |    row_number() OVER (PARTITION BY gs.j ORDER BY vec_id) - 1 AS c,
       |    v[gs.j * $PqDsub + 1 : (gs.j + 1) * $PqDsub] AS cv
       |  FROM (SELECT * FROM $src ORDER BY vec_id LIMIT $PqKsub),
       |    unnest(generate_series(0, ${PqM - 1})) AS gs(j)),
       |${pqCodesCte(src, "cb0", "e1")},
       |${pqUpdateCte("e1", "cb0", "cb1")},
       |${pqCodesCte(src, "cb1", "e2")},
       |${pqUpdateCte("e2", "cb1", "cb2")},
       |${pqCodesCte(src, "cb2", "e3")}""".stripMargin

  // --- Eigensolve oracle machinery (r12) ------------------------------
  // embed_pca / embed_spectrum replay. The oracle cannot replay Jacobi
  // (dim² state × ~16k rotations is outside a recursive CTE's budget)
  // — but it doesn't have to: eigenpairs of a symmetric matrix are
  // UNIQUE given the operator's conventions (eigenvalues DESC, sign
  // fixed on the largest-|coordinate| entry), so any solver converged
  // to machine precision reproduces the rounded outputs. The replay
  // uses gap amplification: M = C^16 via four max-normalized squarings
  // turns the corpus's worst consecutive eigen-ratio (0.9947 measured
  // at sf0.01 — the spectrum is near-isotropic, participation ratio
  // 56.6/64) into 0.9947^16 = 0.918, so deflated power iteration
  // converges each component to ~1e-15 in a few hundred 64-row
  // recursive steps. Power 16 is the sweet spot: large enough to
  // converge fast, small enough that trailing eigenvalues stay far
  // above the matmul noise floor (λ63/λ0 = 0.236 → 0.236^16 = 1e-10 ≫
  // 1e-15; at power 512 everything below λ0·0.93 drowns in rounding
  // noise and deflation retrieves garbage). Deflation is matrix-side
  // (d_k = d_{k-1} − λ_{k-1}·e·eᵀ with λ the Rayleigh quotient in
  // M-space, so each component's recursion is a bare matvec + one
  // window normalize), eigenvalues are Rayleigh quotients back on the
  // ORIGINAL covariance, and Σλ / Σλ² come from trace identities
  // (trace(C), ‖C‖²_F) with no eigensolve at all. MATERIALIZED hints
  // are load-bearing: DuckDB inlines plain CTEs per reference, which
  // would re-run the corpus gram once per component. Validated
  // value-exact against the Spark dumps at sf0.01 before wiring in.
  private def eigenPowerCtes(nComp: Int, iters: Int): String = {
    val dim = 64
    val parts = Seq.newBuilder[String]
    parts += s"""emb AS MATERIALIZED (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |nn AS (SELECT count(*)::DOUBLE AS n FROM emb),
      |mu AS MATERIALIZED (
      |  SELECT g.i - 1 AS i, sum(v[g.i]) / (SELECT n FROM nn) AS m
      |  FROM emb, unnest(generate_series(1, $dim)) AS g(i) GROUP BY 1),
      |gr AS MATERIALIZED (
      |  SELECT gi.i - 1 AS i, gj.i - 1 AS j,
      |    sum(v[gi.i] * v[gj.i]) AS g
      |  FROM emb, unnest(generate_series(1, $dim)) AS gi(i),
      |       unnest(generate_series(1, $dim)) AS gj(i)
      |  GROUP BY 1, 2),
      |cv AS MATERIALIZED (
      |  SELECT gr.i, gr.j, gr.g / (SELECT n FROM nn) - mi.m * mj.m AS x
      |  FROM gr JOIN mu mi ON mi.i = gr.i JOIN mu mj ON mj.i = gr.j),
      |m0 AS MATERIALIZED (
      |  SELECT i, j, x / (SELECT max(abs(x)) FROM cv) AS x FROM cv)""".stripMargin
    for (s <- 1 to 4)
      parts += s"""m$s AS MATERIALIZED (
        |  SELECT p.i, p.j, p.x / max(abs(p.x)) OVER () AS x
        |  FROM (SELECT a.i, b.j, sum(a.x * b.x) AS x
        |        FROM m${s - 1} a JOIN m${s - 1} b ON a.j = b.i
        |        GROUP BY 1, 2) p)""".stripMargin
    for (k <- 0 until nComp) {
      if (k == 0)
        parts += "d0 AS MATERIALIZED (SELECT i, j, x FROM m4)"
      else
        parts += s"""lam${k - 1} AS MATERIALIZED (
          |  SELECT sum(d${k - 1}.x * a.x * b.x) AS l
          |  FROM d${k - 1} JOIN e${k - 1} a ON a.i = d${k - 1}.i
          |    JOIN e${k - 1} b ON b.i = d${k - 1}.j),
          |d$k AS MATERIALIZED (
          |  SELECT d${k - 1}.i, d${k - 1}.j,
          |    d${k - 1}.x - (SELECT l FROM lam${k - 1}) * a.x * b.x AS x
          |  FROM d${k - 1} JOIN e${k - 1} a ON a.i = d${k - 1}.i
          |    JOIN e${k - 1} b ON b.i = d${k - 1}.j)""".stripMargin
      parts += s"""p$k AS (
        |  SELECT 0 AS t, g.i - 1 AS i,
        |    sin((g.i - 1) * 1.7 + 0.3) + 1.1 AS x
        |  FROM unnest(generate_series(1, $dim)) AS g(i)
        |  UNION ALL
        |  SELECT y.t + 1, y.i, y.x / sqrt(sum(y.x * y.x) OVER ()) AS x
        |  FROM (SELECT p.t, a.i, sum(a.x * p.x) AS x
        |        FROM p$k p JOIN d$k a ON a.j = p.i GROUP BY 1, 2) y
        |  WHERE y.t < $iters),
        |e$k AS MATERIALIZED (
        |  SELECT f.i, CASE WHEN sgn.x < 0 THEN -f.x ELSE f.x END AS x
        |  FROM (SELECT i, x FROM p$k WHERE t = $iters) f,
        |       (SELECT x FROM p$k WHERE t = $iters
        |        ORDER BY abs(x) DESC, i ASC LIMIT 1) sgn(x))""".stripMargin
    }
    parts.result().mkString(",\n")
  }

  /** ADC Σ_j lut[j·ksub + code_j] as a literal left-associated sum over
    * `q.lut` and `enc.codes`. */
  private val pqAdcSql: String =
    (0 until PqM).map(j =>
      s"q.lut[$j * $PqKsub + enc.codes[${j + 1}] + 1]").mkString(" + ")

  /** Residuals v − c_cid under the final coarse quantizer `qc2`. */
  private val ivfPqResidCte: String =
    """resid AS (
      |  SELECT a.vec_id, a.cid,
      |    list_transform(generate_series(1, len(a.v)),
      |      i -> a.v[i] - cc.c[i]) AS v
      |  FROM (
      |    SELECT vec_id, v, j AS cid FROM (
      |      SELECT s.vec_id, s.v, cc.j,
      |        row_number() OVER (PARTITION BY s.vec_id
      |          ORDER BY list_dot_product(s.v, cc.c)
      |            - list_dot_product(cc.c, cc.c) / 2.0 DESC, cc.j DESC)
      |          AS rn
      |      FROM u s, qc2 cc) WHERE rn = 1) a
      |  JOIN qc2 cc ON a.cid = cc.j)""".stripMargin

  /** Per-query probe rows under `qc2`: top-4 cells by q·c − |c|²/2
    * (ties to the LOWER j, the driver-side sortBy rule), q·c riding. */
  private val ivfPqProbesCte: String =
    """probes AS (
      |  SELECT query_id, j AS cid, qdotc FROM (
      |    SELECT q.vec_id AS query_id, cc.j,
      |      list_dot_product(q.v, cc.c) AS qdotc,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_dot_product(q.v, cc.c)
      |          - list_dot_product(cc.c, cc.c) / 2.0 DESC, cc.j ASC)
      |        AS rn
      |    FROM u q, qc2 cc WHERE q.vec_id < 10) WHERE rn <= 4)""".stripMargin

  /** Per-query LUT rows over codebook `cb2` (queries = vec_id < 10). */
  private val pqLutCte: String =
    s"""luts AS (
       |  SELECT q.vec_id AS query_id, q.v AS qv,
       |    list(list_dot_product(
       |        q.v[cb.j * $PqDsub + 1 : (cb.j + 1) * $PqDsub], cb.cv)
       |      ORDER BY cb.j, cb.c) AS lut
       |  FROM u q, cb2 cb WHERE q.vec_id < 10
       |  GROUP BY q.vec_id, q.v)""".stripMargin

  private def tokSqlOf(c: String): String =
    "regexp_split_to_array(trim(lower(" + c + ")), '" + """\s""" + "+')"
  private val tokSql: String = tokSqlOf("text")
  private val punctClass: String = """[^a-zA-Z0-9\s]"""
  /** DuckDB twin of TextOps.textGopher at the driver's minWords=8 /
    * maxWords=100000 / minStop=1 — shared by the `text_gopher` oracle and
    * (as a parenthesized subquery) the `corpus_quality_monitor` rollup. */
  private def gopherOracleSql: String = gopherOracleSqlOver("documents")

  /** The gopher metric query over an arbitrary (doc_id, text) relation —
    * `documents` for the raw corpus, a scrub subquery for
    * corpus_refine_learned's gate (r11). */
  private def gopherOracleSqlOver(src: String): String = {
    val stops = TextOps.GopherStopwords
      .map(s => s"(CASE WHEN list_contains(toks, '$s') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH m AS (
       |  SELECT doc_id, $tokSql AS toks,
       |    list_filter(str_split(text, chr(10)),
       |      l -> len(trim(l)) > 0) AS ls,
       |    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS DOUBLE)
       |      AS n_sym
       |  FROM $src),
       |m2 AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)
       |      AS sum_len,
       |    greatest(CAST(len(ls) AS DOUBLE), 1.0) AS n_lines,
       |    CAST(len(list_filter(ls,
       |      l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE) AS n_bullet,
       |    CAST(len(list_filter(ls,
       |      l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) AS DOUBLE)
       |      AS n_ell,
       |    n_sym,
       |    CAST(len(list_filter(toks,
       |      t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) AS n_alpha,
       |    CAST($stops AS BIGINT) AS n_stop
       |  FROM m)
       |SELECT doc_id, n_words,
       |  sum_len / n_words AS mean_word_len,
       |  n_sym / n_words AS symbol_ratio,
       |  n_bullet / n_lines AS bullet_ratio,
       |  n_ell / n_lines AS ellipsis_ratio,
       |  n_alpha / n_words AS alpha_word_ratio,
       |  n_stop AS n_stop_present,
       |  (n_words BETWEEN 8 AND 100000
       |   AND sum_len / n_words BETWEEN 3.0 AND 10.0
       |   AND n_sym / n_words < 0.1
       |   AND n_bullet / n_lines < 0.9
       |   AND n_ell / n_lines < 0.3
       |   AND n_alpha / n_words > 0.8
       |   AND n_stop >= 1) AS gopher_pass
       |FROM m2""".stripMargin
  }
  private def stopwordsSql: String =
    TextOps.Stopwords.map(s => s"'$s'").mkString(", ")
  /** DuckDB equivalent of TextOps.scrubPii (the 'g' flag matches Spark's
    * replace-all semantics). */
  private def scrubSql: String =
    s"""regexp_replace(regexp_replace(regexp_replace(text,
       |    '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
       |    '${TextOps.Ipv4Pattern}', '<IP>', 'g'),
       |    '${TextOps.PhonePattern}', '<PHONE>', 'g')""".stripMargin
}
