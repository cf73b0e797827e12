package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** 10× scale smoke for the round-13 wave-4 operators (protocol of
  * R13b/c; events/orders/lineitem replicate on their keys). */
object ScaleSmokeR13d {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r13d_10x_").toString

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
      times10(Tables.lineitem(spark, dir),
        Map("l_orderkey" -> 100000000L))
        .write.parquet(s"$dir10/lineitem.parquet")
    }

    import graft.queries.Analytics7
    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("events_interarrival", Analytics7.eventsInterarrival _),
      ("events_load_profile", Analytics7.eventsLoadProfile _),
      ("q_retention_halflife", Analytics7.qRetentionHalflife _),
      ("q_join_cardinality", Analytics7.qJoinCardinality _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))
    spark.stop()
  }
}
