package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** 10× scale smoke for the round-13 operator wave. Same protocol as
  * R12c–f: build shifted-id 10× replicas of the fact tables (dimension
  * tables — part/supplier/nation — stay 1×, as they would at 100 TB),
  * warm up untimed, then time each driver entry at 1× and 10×.
  *
  * `knn_kcore` is timed on BOTH substrates: the default exact kNN
  * build is the pre-adjudicated quadratic (the r11/r12 knn_* family
  * precedent), so its 10× reading is expected superlinear; the LSH
  * substrate row (`knn_kcore_lsh`) is the 100 TB path the
  * substrate-agnostic parameter exists for. `embed_jl_distortion`
  * reads a FIXED 50-vector panel, so its 10× reading should be flat —
  * included to demonstrate exactly that. */
object ScaleSmokeR13b {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r13b_10x_").toString

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
      times10(Tables.documents(spark, dir), Map("doc_id" -> 1000000L),
        (d, i) => d.withColumn("text",
          concat(col("text"), lit(s" replica$i"))))
        .write.parquet(s"$dir10/documents.parquet")
      times10(Tables.embeddings(spark, dir), Map("vec_id" -> 1000000L),
          perturb)
        .write.parquet(s"$dir10/embeddings.parquet")
      times10(Tables.orders(spark, dir), Map("o_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/orders.parquet")
      times10(Tables.lineitem(spark, dir),
        Map("l_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/lineitem.parquet")
      // dimensions replicate 1x (broadcast sides stay broadcast)
      Tables.part(spark, dir).write.parquet(s"$dir10/part.parquet")
      Tables.supplier(spark, dir).write.parquet(s"$dir10/supplier.parquet")
      Tables.nation(spark, dir).write.parquet(s"$dir10/nation.parquet")
    }

    import graft.llm.{Ann, TextProfile}
    import graft.queries.Analytics5
    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("events_periodicity", Analytics5.eventsPeriodicity _),
      ("events_transition_entropy",
        Analytics5.eventsTransitionEntropy _),
      ("q_benford_audit", Analytics5.qBenfordAudit _),
      ("q_price_elasticity", Analytics5.qPriceElasticity _),
      ("q_order_value_bands", Analytics5.qOrderValueBands _),
      ("q_supplier_hhi", Analytics5.qSupplierHhi _),
      ("events_value_outliers", Analytics5.eventsValueOutliers _),
      ("text_numeric_density", TextProfile.textNumericDensityQ _),
      ("vocab_goodturing", TextProfile.vocabGoodTuringQ _),
      ("text_word_length_profile",
        TextProfile.textWordLengthProfileQ _),
      ("text_case_profile", TextProfile.textCaseProfileQ _),
      ("corpus_prefix_clusters", TextProfile.corpusPrefixClustersQ _),
      ("text_sentence_stats", TextProfile.textSentenceStatsQ _),
      ("table_profile",
        graft.operators.TableProfile.tableProfileQ _),
      ("embed_jl_distortion", Ann.embedJlDistortionQ _),
      ("knn_kcore", Ann.knnKcoreQ _),
      ("knn_kcore_lsh", (s: SparkSession, d: String) => {
        graft.functions.VectorFunctions.register(s)
        val emb = Tables.embeddings(s, d)
        Ann.knnKcore(emb, graph = Some(
          Ann.knnGraphLsh(emb).select("vec_id", "nbr_id")))
      }))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))
    spark.stop()
  }
}
