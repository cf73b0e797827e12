package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** 10× scale smoke for the round-14 session-B waves (weighted
  * selection, ordered-prefix consumers, corpus dashboards, SNN
  * histogram, SLA percentiles) — same protocol as ScaleSmokeR14:
  * shifted-id 10× replicas, untimed warmup, then 1× vs 10× timings.
  *
  * knn_edge_jaccard is smoked on INJECTED edge frames (1× = a 50k-node
  * random mutual graph, 10× = 500k nodes) so the reading prices the
  * CONSUMER (wedge join + rollup), not the pre-adjudicated exact
  * substrate build the graph family already carries. */
object ScaleSmokeR14b {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r14b_10x_").toString

    def times10(df: DataFrame, shifts: Map[String, Long]): DataFrame =
      (0 until 10).map { i =>
        shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s))
        }
      }.reduce(_ unionByName _)

    t("write 10x warehouses") {
      times10(Tables.events(spark, dir),
        Map("event_id" -> 10000000L, "user_id" -> 100000L))
        .write.parquet(s"$dir10/events.parquet")
      times10(Tables.orders(spark, dir), Map("o_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/orders.parquet")
      times10(Tables.lineitem(spark, dir), Map("l_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/lineitem.parquet")
      times10(Tables.customer(spark, dir), Map("c_custkey" -> 10000000L))
        .write.parquet(s"$dir10/customer.parquet")
      times10(Tables.part(spark, dir), Map("p_partkey" -> 10000000L))
        .write.parquet(s"$dir10/part.parquet")
      times10(Tables.documents(spark, dir), Map("doc_id" -> 10000000L))
        .write.parquet(s"$dir10/documents.parquet")
    }

    import graft.queries.Analytics8
    import graft.llm.TextProfile2
    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("q_price_weighted_median", Analytics8.qPriceWeightedMedian _),
      ("events_value_winsorized", Analytics8.eventsValueWinsorized _),
      ("q_acctbal_gini", Analytics8.qAcctbalGini _),
      ("events_user_gini", Analytics8.eventsUserGini _),
      ("q_acctbal_lorenz", Analytics8.qAcctbalLorenz _),
      ("q_part_skyline", Analytics8.qPartSkyline _),
      ("q_ship_delay_profile", Analytics8.qShipDelayProfile _),
      ("events_top_movers", Analytics8.eventsTopMovers _),
      ("corpus_source_diversity", TextProfile2.corpusSourceDiversityQ _),
      ("corpus_quality_budget_curve",
        TextProfile2.corpusQualityBudgetCurveQ _),
      ("text_vocab_gini", TextProfile2.textVocabGiniQ _),
      ("text_markup_audit", TextProfile2.textMarkupAuditQ _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))

    // SNN histogram consumer on injected random mutual graphs
    def randGraph(nodes: Int, avgDeg: Int): DataFrame = {
      val edges = spark.range(nodes.toLong * avgDeg / 2)
        .select(
          pmod(hash(col("id"), lit(1)).cast("long"), lit(nodes.toLong))
            .as("a"),
          pmod(hash(col("id"), lit(2)).cast("long"), lit(nodes.toLong))
            .as("b"))
        .filter(col("a") =!= col("b"))
      edges.select(col("a").as("vec_id"), col("b").as("nbr_id"))
        .union(edges.select(col("b").as("vec_id"), col("a").as("nbr_id")))
        .distinct()
    }
    import spark.implicits._
    val emptyEmb = Seq.empty[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
    val g1 = graft.Exec.materialize(randGraph(50000, 10))
    val g10 = graft.Exec.materialize(randGraph(500000, 10))
    noop(graft.llm.Ann.knnEdgeJaccard(emptyEmb, graph = Some(g1))) // warmup
    t("knn_edge_jaccard consumer 1x (50k nodes)")(
      noop(graft.llm.Ann.knnEdgeJaccard(emptyEmb, graph = Some(g1))))
    t("knn_edge_jaccard consumer 10x (500k nodes)")(
      noop(graft.llm.Ann.knnEdgeJaccard(emptyEmb, graph = Some(g10))))

    spark.stop()
  }
}
