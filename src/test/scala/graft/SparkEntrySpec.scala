package graft

import org.scalatest.funsuite.AnyFunSuite

class SparkEntrySpec extends AnyFunSuite with SparkFixture {

  test("entry (the driver's smoke check) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract is internally consistent") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle SQL without a query entry: ${o -- q}")
    // every oracle-checked op exists; rows-only entries are the known set
    val rowsOnly = q -- o
    // r11 moved the LSH family (dedup_embed, dedup_embed_incremental,
    // ann_lsh_topk, ann_recall_report, knn_graph_lsh) and
    // embed_centroid_classify to full DuckDB oracles — the hyperplanes are seeded literals, so the
    // bucket structure replays in SQL
    assert(rowsOnly === Set(
      "embed_pca", "embed_spectrum",
      "ann_ivf_topk", "ann_ivf_balance", "ivf_tuning_report", "ann_pq_topk",
      "ann_ivfpq_topk", "ann_ivfpq_index", "dedup_minhash", "dedup_eval",
      "minhash_tuning_report",
      "dedup_simhash", "dedup_semantic", "corpus_topic_terms",
      "dedup_semantic_incremental",
      "text_compressibility",
      "multimodal", "media_audio", "media_video", "media_resize",
      "media_phash", "media_phash_incremental",
      "media_resample", "media_frames", "media_report",
      "dedup_incremental_minhash",
      "dedup_incremental_simhash", "sketch_distinct", "sketch_quantiles",
      "sketch_events_users",
      "sketch_topk"),
      s"unexpected rows-only entries: $rowsOnly")
  }
}
