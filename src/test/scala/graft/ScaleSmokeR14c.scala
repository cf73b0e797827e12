package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** 10× scale smoke for the round-14 session-C wave (Pareto, session
  * profile, value deciles, EWMA, weighted sample, SNN clustering
  * consumer) — ScaleSmokeR14b protocol. */
object ScaleSmokeR14c {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r14c_10x_").toString

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
      times10(Tables.part(spark, dir), Map("p_partkey" -> 10000000L))
        .write.parquet(s"$dir10/part.parquet")
      times10(Tables.documents(spark, dir), Map("doc_id" -> 10000000L))
        .write.parquet(s"$dir10/documents.parquet")
    }

    import graft.queries.Analytics8
    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("q_revenue_pareto", Analytics8.qRevenuePareto _),
      ("events_session_profile", Analytics8.eventsSessionProfile _),
      ("q_order_value_deciles", Analytics8.qOrderValueDeciles _),
      ("events_ewma_baseline", Analytics8.eventsEwmaBaseline _),
      ("corpus_weighted_sample",
        graft.llm.TextOps.corpusWeightedSampleQ _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))

    // SNN clustering consumer on injected random mutual graphs — the
    // edge-jaccard smoke's protocol (substrate build kept out)
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
    // r15: the smoke reads the PRODUCTION fold (pointer-doubling
    // snnClusterFast) — the linear fold stays the oracle contract only
    val g1 = graft.Exec.materialize(randGraph(50000, 10))
    val g10 = graft.Exec.materialize(randGraph(500000, 10))
    noop(graft.llm.Ann.knnSnnClusterFast(emptyEmb, graph = Some(g1)))
    t("knn_snn_cluster_fast consumer 1x (50k nodes)")(
      noop(graft.llm.Ann.knnSnnClusterFast(emptyEmb, graph = Some(g1))))
    t("knn_snn_cluster_fast consumer 10x (500k nodes)")(
      noop(graft.llm.Ann.knnSnnClusterFast(emptyEmb, graph = Some(g10))))

    spark.stop()
  }
}
