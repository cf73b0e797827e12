package graft

import org.apache.spark.sql.SparkSession

/** Scratch (r17): bench-protocol timings (warmup + min of 3) of the
  * pair-join-pinned ANN entries, for the optimization ledger.
  * Test/runMain graft.AnnFamilyTimeScratch [name1,name2,...].
  * Profiling tool, not a spec. */
object AnnFamilyTimeScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("ann-family-time")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val defaults = Seq("ann_topk", "ann_filtered_topk", "ann_mmr_topk",
      "ann_range", "ann_lsh_topk", "ann_recall_report", "embed_decontaminate",
      "embed_sq_recall", "ann_pq_topk", "ann_pq_recall", "ann_ivfpq_topk",
      "ann_ivfpq_recall", "corpus_refine_learned", "events_session_profile",
      "q_ship_delay_profile", "knn_components", "knn_components_lsh",
      "knn_snn_cluster")
    val names = if (args.nonEmpty) args(0).split(",").toSeq else defaults
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$name FAILED ${e.getMessage}") }
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-26s min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
