package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** 10× scale smoke for the operators ADDED in round 12 (the
  * ScaleSmokeR12 harness predates them). Same protocol: shifted-id 10×
  * replicas, untimed 1× warmup, then 1× vs 10× timings. Perturbed
  * embedding replicas as in ScaleSmokeR12 (pure copies would be
  * degenerate for the quantizer ops). Expected shapes:
  * ~linear everywhere except corpus_family_purity, whose pair frame is
  * duplicate-bounded and the replica multiplies duplicate families
  * (the embed_threshold_sweep argument from the r12 BENCH_README
  * entry applies to the jaccard side too, milder because doc texts
  * replicate EXACTLY and the adaptive exact-duplicate collapse absorbs
  * copy classes). */
object ScaleSmokeR12b {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r12b_10x_").toString

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
      // orders: shifted keys keep per-customer histories intact, so the
      // survival exit mix replicates rather than merging customers
      times10(Tables.orders(spark, dir),
        Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L))
        .write.parquet(s"$dir10/orders.parquet")
      times10(Tables.lineitem(spark, dir)
          .select("l_orderkey", "l_partkey", "l_suppkey"),
        Map("l_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/lineitem.parquet")
    }

    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("cdc_lateness_profile", graft.cdc.Cdc.latenessProfileQ _),
      ("cdc_snapshot_profile", graft.cdc.Cdc.snapshotProfileQ _),
      ("cdc_delete_debt", graft.cdc.Cdc.deleteDebtQ _),
      ("events_group_topk", graft.operators.GroupTopK.eventsGroupTopKQ _),
      ("events_stickiness",
        (s: SparkSession, d: String) =>
          graft.queries.Analytics3.eventsStickiness(s, d)),
      ("events_markov_stationary",
        (s: SparkSession, d: String) =>
          graft.queries.Analytics3.eventsMarkovStationary(s, d)),
      ("text_novelty", graft.llm.TextOps.textNoveltyQ _),
      ("corpus_quality_pareto", graft.llm.TextOps.corpusQualityParetoQ _),
      ("text_ngram_coverage", graft.llm.TextOps.textNgramCoverageQ _),
      ("corpus_family_purity", graft.llm.Dedup.corpusFamilyPurityQ _),
      ("embed_silhouette", graft.llm.Ann.embedSilhouetteQ _),
      ("ivf_elbow_report", graft.llm.Ann.ivfElbowReportQ _),
      // second r12 wave
      ("q_customer_survival",
        (s: SparkSession, d: String) =>
          graft.queries.Analytics3.qCustomerSurvival(s, d)),
      ("q_basket_rules",
        (s: SparkSession, d: String) =>
          graft.queries.Analytics2.qBasketRules(s, d)),
      ("text_zipf", graft.llm.TextOps.textZipfQ _),
      ("text_burstiness", graft.llm.TextOps.textBurstinessQ _),
      ("knn_assortativity", graft.llm.Ann.knnAssortativityQ _),
      ("embed_pq_distortion", graft.llm.Ann.embedPqDistortionQ _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))
    spark.stop()
  }
}
