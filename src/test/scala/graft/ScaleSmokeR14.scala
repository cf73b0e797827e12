package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** 10× scale smoke for the round-14 RankSelect rewrite (same protocol
  * as R12c–R13d: shifted-id 10× replicas of the fact tables, untimed
  * warmup, then each op timed at 1× and 10×).
  *
  * The r13 verdict's benchmark for task 1: events_value_outliers read
  * 1.25 → 3.79 s (3×) on the two single-task-per-type sorts; the
  * histogram selection should hold the 10× reading near ~1.5×. The
  * rfm and median rows ride the same operator. */
object ScaleSmokeR14 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r14_10x_").toString

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
    }

    import graft.queries.{Analytics2, Analytics5}
    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("events_value_outliers", Analytics5.eventsValueOutliers _),
      ("q_median_order", Analytics2.qMedianOrder _),
      ("events_rfm", Analytics2.eventsRfm _),
      ("q_revenue_concentration", Analytics2.qRevenueConcentration _),
      ("events_value_percentiles",
        graft.queries.Analytics7.eventsValuePercentiles _),
      ("events_value_trimmed",
        graft.queries.Analytics7.eventsValueTrimmed _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))

    // round-count collapse (verdict task 4): the SAME materialized LSH
    // edge frame through the fixed-25-round linear schedule vs the
    // pointer-doubling fixpoint, on the 1x corpus (the substrate build
    // is paid once, outside both timers)
    import graft.llm.Ann
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val g = t("lsh substrate build 1x")(Exec.materialize(
      Ann.knnGraphLsh(emb).select("vec_id", "nbr_id")))
    t("components linear-25 on substrate")(
      noop(Ann.knnComponents(emb, graph = Some(g))))
    t("components pointer-doubling on substrate")(
      noop(Ann.knnComponentsFast(emb, graph = Some(g))))

    // the collapse itself: a 100k-node chain (diameter 10⁵). The
    // linear schedule would need 10⁵ rounds for the right answer; its
    // 25-round run under-merges. Pointer doubling converges in
    // ~log₂(10⁵) ≈ 17 rounds.
    import spark.implicits._
    val chain = Exec.materialize(
      spark.range(0, 99999).toDF("vec_id")
        .select(col("vec_id"), (col("vec_id") + 1).as("nbr_id"))
        .unionByName(spark.range(0, 99999).toDF("nbr_id")
          .select((col("nbr_id") + 1).as("vec_id"), col("nbr_id"))))
    val lin = t("chain-100k linear-25 (WRONG answer)")(
      Ann.knnComponents(chain, graph = Some(chain)).collect())
    println(s"=== chain-100k linear-25 components: " +
      s"${lin.map(_.getLong(1)).sum} (should be 1)")
    val fst = t("chain-100k pointer-doubling (converged)")(
      Ann.knnComponentsFast(chain, graph = Some(chain)).collect())
    println(s"=== chain-100k pointer-doubling components: " +
      s"${fst.map(_.getLong(1)).sum}")
    spark.stop()
  }
}
