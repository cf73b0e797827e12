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

  test("q_customer_migration: hand-computed band transitions — " +
    "upgrade, churn-to-absent, and new-in-h2 cells") {
    import spark.implicits._
    val rows = Seq(
      (1L, "1998-01-01"),                                  // c1 h1: 1
      (1L, "1999-01-01"), (1L, "1999-02-01"), (1L, "1999-03-01"), // h2: 3
      (2L, "1997-01-01"), (2L, "1998-02-01"),              // c2 h1: 2
      (3L, "2000-01-01"))                                  // c3 h2: 1
    val orders = rows.zipWithIndex.map { case ((c, d), i) =>
      (i.toLong, c, d) }.toDF("o_orderkey", "o_custkey", "d")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("timestamp").as("o_orderdate"))
    val out = Analytics4OnFixture.migration(orders)
    assert(out.keySet === Set((1, 2), (2, 0), (0, 1)))
    assert(out((1, 2)).getAs[Boolean]("upgraded"))
    assert(!out((1, 2)).getAs[Boolean]("churned"))
    assert(out((2, 0)).getAs[Boolean]("churned"))
    assert(!out((2, 0)).getAs[Boolean]("upgraded"))
    assert(out((0, 1)).getAs[Boolean]("upgraded"))
    out.values.foreach(r => assert(r.getAs[Double]("share") ===
      r4(1.0 / 3.0)))
  }

  test("cdc_lifecycle_audit: planted grammar violations flagged — " +
    "d→u and c→c illegal, the rest legal") {
    import spark.implicits._
    val rows = Seq(
      // user 1: signup → click → error → click (c→u, u→d, d→u!)
      (1L, 1L, "signup", 0L), (2L, 1L, "click", 10L),
      (3L, 1L, "error", 20L), (4L, 1L, "click", 30L),
      // user 2: signup → signup (c→c!)
      (5L, 2L, "signup", 0L), (6L, 2L, "signup", 10L))
    val events = rows.toDF("event_id", "user_id", "event_type", "tsec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"),
        timestamp_seconds(col("tsec")).as("ts"))
    val out = graft.cdc.Cdc.lifecycleAudit(events).collect()
      .map(r => (r.getAs[String]("op_from"),
        r.getAs[String]("op_to")) -> r).toMap
    assert(out.keySet === Set(("c", "u"), ("u", "d"), ("d", "u"),
      ("c", "c")))
    assert(!out(("c", "u")).getAs[Boolean]("is_illegal"))
    assert(!out(("u", "d")).getAs[Boolean]("is_illegal"))
    assert(out(("d", "u")).getAs[Boolean]("is_illegal"))
    assert(out(("c", "c")).getAs[Boolean]("is_illegal"))
    assert(out.values.map(_.getAs[Long]("n")).sum === 4L)
    out.values.foreach(r => assert(r.getAs[Double]("share") === 0.25))
  }

  test("ann_ivf_recall: well-formed per-query audit; probing ALL cells " +
    "reduces IVF to brute force — recall exactly 1.0") {
    val emb = Tables.embeddings(spark, sfDir)
    val full = Ann.annRecallReport(Ann.annTopK(emb),
      Ann.annIvfTopK(emb, nprobe = 16)).collect()
    assert(full.length === 10)
    full.foreach(r => assert(r.getAs[Double]("recall_at_k") === 1.0))
    val pruned = Ann.annIvfRecallQ(spark, sfDir).collect()
    assert(pruned.length === 10)
    pruned.foreach { r =>
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_true") === 10L)
    }
  }

  test("ann_ivfpq_recall: well-formed audit of the composed pipeline, " +
    "bounded above by neither single-index audit by construction") {
    val rows = Ann.annIvfPqRecallQ(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_true") === 10L)
      assert(r.getAs[Long]("n_hit") <= 10L)
    }
  }

  test("session-D ops run on the warehouse and return rows") {
    assert(TextOps.decontaminateSweepQ(spark, sfDir).count() === 5L)
    assert(graft.queries.Analytics4.qCustomerMigration(spark, sfDir)
      .count() > 0L)
    assert(graft.cdc.Cdc.lifecycleAuditQ(spark, sfDir).count() > 0L)
  }
}

/** Tiny collector helper kept out of the test bodies. */
private object Analytics4OnFixture {
  def migration(orders: org.apache.spark.sql.DataFrame) =
    graft.queries.Analytics4.qCustomerMigrationOn(orders).collect()
      .map(r => (r.getAs[Int]("band_h1"), r.getAs[Int]("band_h2")) -> r)
      .toMap
}
