package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** 10× scale smoke for the final round-12 session-C wave. Same
  * protocol as R12c/R12d. `knn_confusion` is deliberately NOT timed:
  * it consumes the exact block-wise kNN graph whose quadratic build
  * this round already re-adjudicated twice (knn_reciprocity 124×,
  * embed_intrinsic_dim 96× — the LSH graph is the scale substrate);
  * its post-graph rollup is ≤ n·k votes + a |labels|² matrix. */
object ScaleSmokeR12e {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r12e_10x_").toString

    def times10(df: DataFrame, shifts: Map[String, Long],
                extra: (DataFrame, Int) => DataFrame = (d, _) => d)
        : DataFrame =
      (0 until 10).map { i =>
        extra(shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s))
        }, i)
      }.reduce(_ unionByName _)

    def perturb(d: DataFrame, i: Int): DataFrame =
      d.withColumn("embedding",
        transform(col("embedding"), (x: Column, j: Column) =>
          (x + lit(0.002f * i) *
            (pmod(col("vec_id") + j * lit(31L), lit(7L)) - lit(3L))
              .cast("float")).cast("float")))

    t("write 10x warehouses") {
      times10(Tables.events(spark, dir),
        Map("event_id" -> 10000000L, "user_id" -> 100000L))
        .write.parquet(s"$dir10/events.parquet")
      times10(Tables.documents(spark, dir), Map("doc_id" -> 1000000L))
        .write.parquet(s"$dir10/documents.parquet")
      times10(Tables.embeddings(spark, dir), Map("vec_id" -> 1000000L),
          perturb)
        .write.parquet(s"$dir10/embeddings.parquet")
      // orders shifted on the key only; dates replicate intact so the
      // seasonal cells grow 10× in MASS, not in dimension
      times10(Tables.orders(spark, dir)
          .select("o_orderkey", "o_orderdate", "o_totalprice"),
        Map("o_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/orders.parquet")
    }

    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("events_mix_drift", graft.queries.Analytics4.eventsMixDrift _),
      ("events_dispersion", graft.queries.Analytics4.eventsDispersion _),
      ("events_concurrency",
        graft.queries.Analytics4.eventsConcurrency _),
      ("q_seasonal_index", graft.queries.Analytics4.qSeasonalIndex _),
      ("cdc_backfill_scope", graft.cdc.Cdc.backfillScopeQ _),
      ("corpus_curriculum_assign",
        graft.llm.TextOps.corpusCurriculumAssignQ _),
      ("corpus_vocab_profile",
        graft.llm.TextOps.corpusVocabProfileQ _),
      ("embed_anova", graft.llm.Ann.embedAnovaQ _),
      ("embed_sq_recall", graft.llm.Ann.embedSqRecallQ _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))
    spark.stop()
  }
}
