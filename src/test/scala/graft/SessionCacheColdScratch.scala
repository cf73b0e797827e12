package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cold-vs-warm ledger for the per-JVM session caches (r18, verdict
  * task 5 — the session-cache freeze's bookkeeping). Run with
  * Test/runMain graft.SessionCacheColdScratch on a FRESH JVM.
  *
  * For one representative entry per cache class, times the FIRST
  * invocation (cold: pays the train/build through the identical code
  * path) and the steady-state min of 3 (warm: serve path) — the number
  * that keeps the build cost visible next to the steady-state board.
  * A generic warmup query runs first so JVM/codegen startup does not
  * land in the first class's cold number (it still contains that
  * class's plan-compilation, as it does in the driver bench). */
object SessionCacheColdScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("session-cache-cold-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // generic machinery warmup (the Bench.scala shape)
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$dir/nation.parquet")
        .withColumn("rn", row_number().over(
          Window.partitionBy("n_regionkey").orderBy("n_nationkey")))
        .groupBy("n_regionkey").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // (cache class, representative entry) — each class's rep runs FIRST
    // for its class so invocation 1 is genuinely cold
    val reps: Seq[(String, String)] = Seq(
      ("SessionStores exact kNN substrate", "knn_components"),
      ("SessionStores LSH kNN substrate", "knn_graph_lsh"),
      ("sessionBruteTruth", "ann_index_recall"),
      ("coarse quantizer cache (ivf)", "ann_ivf_topk"),
      ("pq codebook cache", "ann_pq_topk"),
      ("sessionSemanticCentroids", "dedup_semantic"),
      ("Classifier sessionModel", "quality_classifier"))
    println("[coldwarm] class | entry | cold_s | warm_min_s")
    reps.foreach { case (cls, entry) =>
      val fn = SparkEntry.queries(entry)
      val t0 = System.nanoTime()
      noop(fn(spark, dir))
      val cold = (System.nanoTime() - t0) / 1e9
      val warm = (1 to 3).map { _ =>
        val t = System.nanoTime(); noop(fn(spark, dir))
        (System.nanoTime() - t) / 1e9
      }.min
      println(f"[coldwarm] $cls%-36s $entry%-20s cold=$cold%.2f warm=$warm%.2f")
    }
    spark.stop()
  }
}
