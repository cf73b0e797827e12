package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** 10× scale smoke for the session-B round-12 operators (the R12/R12b
  * harnesses predate them). Same protocol: shifted-id 10× replicas,
  * untimed 1× warmup, then 1× vs 10× timings. Expected shapes: ~linear
  * everywhere except knn_reciprocity, which shares the exact-graph
  * quadratic build already adjudicated for knn_assortativity (the LSH
  * graph is the scale substrate; the exact build is the small-corpus /
  * verification path). events_changepoint and events_power_users scale
  * in the corpus SCAN only — their windowed frames (dense hour grid,
  * activity histogram) don't grow with user-id-shifted replicas, which
  * is exactly the design claim. */
object ScaleSmokeR12c {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r12c_10x_").toString

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
      times10(Tables.orders(spark, dir)
          .select("o_orderkey", "o_custkey"),
        Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L))
        .write.parquet(s"$dir10/orders.parquet")
      // parts NOT shifted: buyer sets per part grow 10×, the worst
      // case for the per-(part, cust) reduction
      times10(Tables.lineitem(spark, dir)
          .select("l_orderkey", "l_partkey"),
        Map("l_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/lineitem.parquet")
    }

    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("cdc_column_volatility", graft.cdc.Cdc.columnVolatilityQ _),
      ("cdc_key_lifespan", graft.cdc.Cdc.keyLifespanQ _),
      ("events_power_users", graft.queries.Analytics4.eventsPowerUsers _),
      ("events_changepoint",
        (s: SparkSession, d: String) =>
          graft.queries.Analytics4.eventsChangepoint(s, d)),
      ("events_type_affinity",
        graft.queries.Analytics4.eventsTypeAffinity _),
      ("events_user_entropy",
        graft.queries.Analytics4.eventsUserEntropy _),
      ("events_session_sweep",
        (s: SparkSession, d: String) =>
          graft.queries.Analytics4.eventsSessionSweep(s, d)),
      ("q_reorder_rate", graft.queries.Analytics4.qReorderRate _),
      ("text_lexical_diversity",
        graft.llm.TextOps.textLexicalDiversityQ _),
      ("corpus_length_profile",
        graft.llm.TextOps.corpusLengthProfileQ _),
      ("text_keyword_rake", graft.llm.TextOps.textKeywordRakeQ _),
      ("corpus_epoch_plan", graft.llm.TextOps.corpusEpochPlanQ _),
      ("text_predictability", graft.llm.TextOps.textPredictabilityQ _),
      ("embed_dim_stats", graft.llm.Ann.embedDimStatsQ _),
      ("embed_class_margin", graft.llm.Ann.embedClassMarginQ _),
      ("knn_reciprocity", graft.llm.Ann.knnReciprocityQ _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))
    spark.stop()
  }
}
