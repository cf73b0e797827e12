package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** 10× scale smoke for the r16 per-group ADAPTIVE RankSelect fine-bin
  * count (verdict task 3) — the ScaleSmokeR14c protocol over the
  * selections the r15 fixed-buckets² binning taxed at sf scale:
  * q_price_weighted_median (price-cents ≈ the worst-case
  * near-continuous domain, the board's biggest r15 regression),
  * q_ship_delay_profile, events_value_percentiles / trimmed /
  * winsorized, events_rfm. The adaptive form must (a) claw back the
  * sf-scale cost — fineN ≈ buckets when n ≤ buckets² — and (b) keep
  * the 10× growth factor at-or-under the r15 readings, since fineN
  * grows with n until the buckets² cap. */
object ScaleSmokeR16 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r16_10x_").toString

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
      times10(Tables.lineitem(spark, dir), Map("l_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/lineitem.parquet")
      times10(Tables.orders(spark, dir), Map("o_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/orders.parquet")
    }

    import graft.queries.{Analytics5, Analytics7, Analytics8}
    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("q_price_weighted_median", Analytics8.qPriceWeightedMedian _),
      ("q_ship_delay_profile", Analytics8.qShipDelayProfile _),
      ("events_value_percentiles", Analytics7.eventsValuePercentiles _),
      ("events_value_trimmed", Analytics7.eventsValueTrimmed _),
      ("events_value_winsorized", Analytics8.eventsValueWinsorized _),
      ("events_value_outliers", Analytics5.eventsValueOutliers _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    try
      for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
           (name, fn) <- ops)
        t(s"$name $label")(noop(fn(spark, d)))
    finally { // the 10x warehouse is ~10x sf0.1 of parquet — reclaim it
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir10))
    }

    spark.stop()
  }
}
