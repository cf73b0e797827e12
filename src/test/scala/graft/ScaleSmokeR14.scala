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
      ("events_rfm", Analytics2.eventsRfm _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))
    spark.stop()
  }
}
