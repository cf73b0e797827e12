package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** 10× scale smoke for the round-12 session-D wave (same protocol as
  * R12c/d/e). ann_pq_recall's exact-truth side is linear (10 queries ×
  * corpus), its PQ side train-dominated; decontaminate_sweep is one
  * shingle pass against a broadcast benchmark; migration and the
  * lifecycle audit are one-exchange window/agg shapes. */
object ScaleSmokeR12f {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("r12f_10x_").toString

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
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L))
        .write.parquet(s"$dir10/orders.parquet")
    }

    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("decontaminate_sweep", graft.llm.TextOps.decontaminateSweepQ _),
      ("q_customer_migration",
        (s: SparkSession, d: String) =>
          graft.queries.Analytics4.qCustomerMigration(s, d)),
      ("cdc_lifecycle_audit", graft.cdc.Cdc.lifecycleAuditQ _),
      ("ann_pq_recall", graft.llm.Ann.annPqRecallQ _))

    ops.foreach { case (_, fn) => noop(fn(spark, dir)) } // untimed warmup
    for ((label, d) <- Seq(("1x", dir), ("10x", dir10));
         (name, fn) <- ops)
      t(s"$name $label")(noop(fn(spark, d)))
    spark.stop()
  }
}
