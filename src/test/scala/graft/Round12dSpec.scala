package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Ann, TextOps}

/** Fixtures and invariants for the round-12 session-D wave:
  * ann_pq_recall (PQ ranking audit) and decontaminate_sweep
  * (contamination-threshold cost table). */
class Round12dSpec extends AnyFunSuite with SparkFixture {

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("decontaminate_sweep: hand-computed flag/token books across the " +
    "k-grid; zero-overlap docs ride the left join") {
    import spark.implicits._
    val docs = Seq(
      (10L, "a b c d"),      // benchmark
      (20L, "a b c d e"),    // shares trigrams "a b c","b c d" → nc 2
      (21L, "a b c x y"),    // shares "a b c" only → nc 1
      (22L, "z z1 z2 z3"))   // nc 0
      .toDF("doc_id", "text")
    val out = TextOps.decontaminateSweep(
        docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
        ks = Seq(1, 2, 3))
      .collect().map(r => r.getAs[Int]("k") -> r).toMap
    assert(out.keySet === Set(1, 2, 3))
    assert(out(1).getAs[Long]("n_flagged") === 2L)
    assert(out(1).getAs[Long]("tokens_flagged") === 10L)
    assert(out(1).getAs[Double]("doc_share") === r4(2.0 / 3.0))
    assert(out(1).getAs[Double]("token_share") === r4(10.0 / 14.0))
    assert(out(2).getAs[Long]("n_flagged") === 1L)
    assert(out(2).getAs[Long]("tokens_flagged") === 5L)
    assert(out(3).getAs[Long]("n_flagged") === 0L)
    assert(out(3).getAs[Double]("token_share") === 0.0)
  }

  test("ann_pq_recall: recall of the exact pipeline against itself is " +
    "1.0 (the report), PQ recall on the warehouse is well-formed") {
    val emb = Tables.embeddings(spark, sfDir)
    val self = Ann.annRecallReport(Ann.annTopK(emb), Ann.annTopK(emb))
      .collect()
    assert(self.length === 10)
    self.foreach(r => assert(r.getAs[Double]("recall_at_k") === 1.0))
    val pq = Ann.annPqRecallQ(spark, sfDir).collect()
    assert(pq.length === 10)
    pq.foreach { r =>
      assert(r.getAs[Long]("n_true") === 10L)
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hit") <= 10L)
    }
  }

  test("session-D ops run on the warehouse and return rows") {
    assert(TextOps.decontaminateSweepQ(spark, sfDir).count() === 5L)
  }
}
