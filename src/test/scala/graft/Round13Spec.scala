package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann

/** r13 additions: the session-shared brute-truth frame and the
  * served-index recall audit (VERDICT r12 task 3). */
class Round13Spec extends AnyFunSuite with SparkFixture {

  test("sessionBruteTruth equals a fresh brute-force top-k exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val cached = Ann.sessionBruteTruth(spark, sfDir)
    val fresh = Ann.annTopK(emb)
    assert(cached.exceptAll(fresh).isEmpty && fresh.exceptAll(cached).isEmpty)
    // second read serves the same store (no rebuild): still identical
    val again = Ann.sessionBruteTruth(spark, sfDir)
    assert(again.exceptAll(fresh).isEmpty)
  }

  test("ann_index_recall audits the PERSISTED serve path against truth") {
    import spark.implicits._
    val out = Ann.annIndexRecallQ(spark, sfDir)
      .select("query_id", "n_true", "n_hit", "recall_at_k")
    val rows = out.collect()
    // one row per query, full truth sets, recall well-formed
    assert(rows.length === 10)
    assert(rows.forall(_.getLong(1) === 10L))
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // the audit must EQUAL a hand-composed recall of the same serve
    // path vs the same truth (the entry adds caching, not semantics)
    val emb = Tables.embeddings(spark, sfDir)
    val sink = graft.state.SessionStores.warehouse("ivfpqindex", sfDir)(s =>
      Ann.buildIvfPqIndex(emb, s))
    val served = Ann.annIvfPqIndexTopK(
      emb.filter(col("vec_id") < 10), spark, sink)
    val hand = Ann.annRecallReport(Ann.annTopK(emb), served)
    assert(out.exceptAll(hand).isEmpty && hand.exceptAll(out).isEmpty)
    // the ADC-only serve path keeps a useful share of the true top-k
    // (the LlmOpsSpec IVF-PQ convention)
    val overall = rows.map(_.getDouble(3)).sum / rows.length
    assert(overall >= 0.4, s"served-index recall $overall")
  }

  test("recall family Q entries are unchanged by the shared truth frame") {
    val emb = Tables.embeddings(spark, sfDir)
    // fresh-truth composition vs the session-truth driver entry
    val fresh = Ann.annPqRecall(emb)
    val entry = Ann.annPqRecallQ(spark, sfDir)
    assert(fresh.exceptAll(entry).isEmpty && entry.exceptAll(fresh).isEmpty)
    val freshIvf = Ann.annIvfRecall(emb)
    val entryIvf = Ann.annIvfRecallQ(spark, sfDir)
    assert(freshIvf.exceptAll(entryIvf).isEmpty &&
      entryIvf.exceptAll(freshIvf).isEmpty)
    // r17: ivf_tuning_report joined the family — its Q entry passes the
    // session truth; the in-query-truth composition must be identical
    val freshTune = Ann.ivfTuningReport(emb)
    val entryTune = Ann.ivfTuningReportQ(spark, sfDir)
    assert(freshTune.exceptAll(entryTune).isEmpty &&
      entryTune.exceptAll(freshTune).isEmpty)
  }
}
