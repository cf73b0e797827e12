package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch piece-timer (r17) for q_revenue_concentration: times the
  * perCust base materialization, the boundary selection (construction
  * forces the selectRowsTied materializes), and the full entry, to see
  * where the ~2.5 s wall actually sits. FoldBenchScratch convention:
  * profiling tool, not a spec. */
object RevConcScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("revconc-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.RankSelect

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[revconc] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup
    graft.queries.Analytics2.qRevenueConcentration(spark, dir)
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      val perCust = t(s"perCust materialize #$i") {
        graft.Exec.materialize(
          Tables.orders(spark, dir)
            .groupBy(col("o_custkey"))
            .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
            .withColumn("nrev", -col("rev")))
      }
      val decileBounds: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        n => array((1 to 9).map { tt =>
          lit(tt.toLong) * (n / lit(10L)).cast("long") +
            least(lit(tt.toLong), n % lit(10L))
        }: _*)
      val bounds = t(s"selectRowsTied construct #$i") {
        RankSelect.selectRowsTied(perCust, Nil, "nrev", "o_custkey",
          decileBounds)
      }
      t(s"bounds noop #$i") {
        bounds.write.format("noop").mode("overwrite").save()
      }
      t(s"full entry #$i") {
        graft.queries.Analytics2.qRevenueConcentration(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
