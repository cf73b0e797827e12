package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** 10× scale smoke for the round-13 wave-3 operators (protocol of
  * R13b). `knn_components` rides the same substrate economics as
  * knn_kcore: the default exact build is the pre-adjudicated
  * quadratic, so the LSH-substrate row is the scale-relevant one.
  * `embed_distance_profile` reads the fixed panel — expected flat. */
object ScaleSmokeR13c {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r13c_10x_").toString

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
      times10(Tables.embeddings(spark, dir), Map("vec_id" -> 1000000L),
          perturb)
        .write.parquet(s"$dir10/embeddings.parquet")
      times10(Tables.orders(spark, dir), Map("o_orderkey" -> 100000000L,
        "o_custkey" -> 100000L))
        .write.parquet(s"$dir10/orders.parquet")
      times10(Tables.lineitem(spark, dir),
        Map("l_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/lineitem.parquet")
      times10(Tables.customer(spark, dir), Map("c_custkey" -> 100000L))
        .write.parquet(s"$dir10/customer.parquet")
    }

    import graft.llm.Ann
    import graft.queries.Analytics6
    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("events_streaks", Analytics6.eventsStreaks _),
      ("events_error_load_corr", Analytics6.eventsErrorLoadCorr _),
      ("q_balance_activity", Analytics6.qBalanceActivity _),
      ("events_window_funnel", Analytics6.eventsWindowFunnel _),
      ("q_order_width_profile", Analytics6.qOrderWidthProfile _),
      ("lsh_bucket_profile", Ann.lshBucketProfileQ _),
      ("embed_distance_profile", Ann.embedDistanceProfileQ _),
      ("knn_components_lsh", (s: SparkSession, d: String) => {
        graft.functions.VectorFunctions.register(s)
        val emb = Tables.embeddings(s, d)
        Ann.knnComponents(emb, graph = Some(
          Ann.knnGraphLsh(emb).select("vec_id", "nbr_id")))
      }))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))
    spark.stop()
  }
}
