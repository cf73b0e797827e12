package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** 10× scale smoke for the session-C round-12 operators. Same protocol
  * as R12b/R12c: shifted-id 10× replicas, untimed 1× warmup, then 1×
  * vs 10× timings. Expected shapes: ~linear everywhere except
  * embed_intrinsic_dim, which consumes the exact block-wise kNN graph
  * (the adjudicated quadratic — LSH is the scale substrate);
  * events_conversion_lag and cdc_watermark_sweep scale in the events
  * scan + one window; the dedup family scales with duplicate mass
  * (doc replicas here are SHIFTED ids with identical text, so the
  * near-dup pair frame grows ~100× — deliberately the worst case for
  * cross_source/quality_impact, which must still be pair-bounded, not
  * corpus²). */
object ScaleSmokeR12d {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r12d_10x_").toString

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
    }

    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("events_conversion_lag",
        (s: SparkSession, d: String) =>
          graft.queries.Analytics4.eventsConversionLag(s, d)),
      ("cdc_watermark_sweep", graft.cdc.Cdc.watermarkSweepQ _),
      ("cdc_compaction_plan", graft.cdc.Cdc.compactionPlanQ _),
      ("vocab_overlap", graft.llm.TextOps.vocabOverlapQ _),
      ("corpus_curriculum", graft.llm.TextOps.corpusCurriculumQ _),
      ("dedup_pair_budget", graft.llm.Dedup.dedupPairBudgetQ _),
      ("dedup_cross_source", graft.llm.Dedup.dedupCrossSourceQ _),
      ("dedup_quality_impact", graft.llm.Dedup.dedupQualityImpactQ _),
      ("embed_intrinsic_dim", graft.llm.Ann.embedIntrinsicDimQ _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))
    spark.stop()
  }
}
