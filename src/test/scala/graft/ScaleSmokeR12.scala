package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** 10× scale smoke for the 11 operators that landed after round 11's
  * books commit (VERDICT r11 #5) — the existing ScaleSmokeS4 predates
  * them. Same protocol: replicate the base tables 10× with shifted ids
  * into a temp warehouse dir, warm each plan untimed at 1×, then time
  * 1× vs 10× so the ratio reads off directly.
  *
  * Two base scales, matched to each family's cost model:
  * - events/documents ops run sf0.1 → 10×: all are one-exchange or
  *   map-side designs, ~linear expected (per-user/doc volume is held
  *   constant by shifting user_id/doc_id, so window state per key
  *   does not grow).
  * - the embedding-graph family runs sf0.01 → 10× (≈ sf0.1 size):
  *   knn_triangles/knn_modularity sit on the EXACT kNN graph, whose
  *   block-wise build is quadratic BY DESIGN — the bound under test is
  *   that everything past the graph (mutual edges ≤ n·k, wedges ≤
  *   n·k², closure equi-join) stays ~linear, so knnGraph is timed
  *   separately and the triangle/modularity overhead above it is the
  *   number to watch. Replica embeddings get a deterministic per-copy
  *   DIRECTION perturbation (pure scaling would leave cosines — and
  *   LSH buckets — exactly degenerate: 10 identical copies of every
  *   vector would make the duplicate-bounded pair frame grow 100×, a
  *   property of that synthetic data, not of the operators).
  */
object ScaleSmokeR12 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dirE = "/root/testdata/sf0.01"
    val dir10 = java.nio.file.Files.createTempDirectory("r12_10x_").toString
    val dirE10 = java.nio.file.Files.createTempDirectory("r12e_10x_").toString

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
      times10(Tables.embeddings(spark, dirE), Map("vec_id" -> 1000000L),
          perturb)
        .write.parquet(s"$dirE10/embeddings.parquet")
      // the graph-family 10x dir still needs documents for nothing —
      // embeddings only
    }
    println("=== events 10x: " + Tables.events(spark, dir10).count() +
      " docs 10x: " + Tables.documents(spark, dir10).count() +
      " emb 10x: " + Tables.embeddings(spark, dir10).count() +
      " embE 10x: " + Tables.embeddings(spark, dirE10).count())

    import graft.cdc.Cdc
    import graft.llm.{Ann, TextOps}
    import graft.queries.Analytics3

    val linearOps: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("cdc_gap_audit", Cdc.gapAuditQ _),
      ("cdc_scd2_incremental", Cdc.scd2IncrementalQ _),
      ("events_attribution", Analytics3.eventsAttribution _),
      ("events_forecast_baseline", Analytics3.eventsForecastBaseline _),
      ("events_lifecycle", Analytics3.eventsLifecycle _),
      ("text_perplexity_kn", TextOps.textPerplexityKnQ _),
      ("vocab_growth", TextOps.vocabGrowthQ _),
      ("embed_binary_topk", Ann.embedBinaryTopKQ _),
      ("embed_threshold_sweep", Ann.embedThresholdSweepQ _))

    // untimed 1x warmup: Janino codegen + reader init must not land in
    // the 1x column and flatter every ratio
    linearOps.foreach { case (_, fn) => noop(fn(spark, dir)) }

    // one-exchange confirmation for the gap-audit dual-window design,
    // on the 10x executed plan
    val gapPlan = Cdc.gapAuditQ(spark, dir10)
      .queryExecution.executedPlan.toString
    println("=== cdc_gap_audit user_id exchanges (10x plan): " +
      "hashpartitioning\\(user_id".r.findAllIn(gapPlan).length)

    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- linearOps)
      t(s"$name $label")(noop(fn(spark, d)))

    // graph family at sf0.01 -> 10x: time the exact graph build alone,
    // then the full operators — overhead above the shared build is the
    // n·k²-bound evidence
    def emb(d: String) = Tables.embeddings(spark, d)
    noop(Ann.knnGraph(emb(dirE)))
    noop(Ann.knnTriangles(emb(dirE)))
    noop(Ann.knnModularity(emb(dirE)))
    for ((label, d) <- Seq(("1x(sf0.01)", dirE), ("10x(sf0.01)", dirE10))) {
      t(s"knn_graph $label")(noop(Ann.knnGraph(emb(d))))
      t(s"knn_triangles $label")(noop(Ann.knnTriangles(emb(d))))
      t(s"knn_modularity $label")(noop(Ann.knnModularity(emb(d))))
    }
    spark.stop()
  }
}
