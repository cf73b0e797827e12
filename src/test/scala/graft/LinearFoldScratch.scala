package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B harness (r17) for the knnComponents LINEAR-fold fixpoint
  * early-exit — run with Test/runMain graft.LinearFoldScratch. Times the
  * three linear-fold driver entries (knn_components, knn_components_lsh,
  * knn_snn_cluster) with earlyExit on/off, INTERLEAVED, bench protocol
  * (noop sink, warmup + min of 5), at the bench's local[32]/32-partition
  * shape. FoldBenchScratch convention: profiling tool, not a spec. */
object LinearFoldScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("linear-fold-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.llm.Ann
    val emb = Tables.embeddings(spark, dir)
    def components(ee: Boolean) = () =>
      Ann.knnComponents(emb, graph = Some(Ann.sessionExactGraph(spark, dir)),
        earlyExit = ee)
    def componentsLsh(ee: Boolean) = () =>
      Ann.knnComponents(emb, graph = Some(
        Ann.sessionLshGraph(spark, dir).select("vec_id", "nbr_id")),
        earlyExit = ee)
    def snn(ee: Boolean) = () =>
      Ann.knnSnnCluster(emb, graph = Some(Ann.sessionExactGraph(spark, dir)),
        earlyExit = ee)
    val cases = Seq(
      "components" -> (components _),
      "components_lsh" -> (componentsLsh _),
      "snn_cluster" -> (snn _))
    // interleaved: for each case alternate off/on within the same minute
    cases.foreach { case (name, mk) =>
      Seq(false, true).foreach { ee => // warm both paths
        mk(ee)().write.format("noop").mode("overwrite").save()
      }
      val times = scala.collection.mutable.Map(
        false -> List.empty[Double], true -> List.empty[Double])
      (1 to 5).foreach { _ =>
        Seq(false, true).foreach { ee =>
          val t0 = System.nanoTime()
          mk(ee)().write.format("noop").mode("overwrite").save()
          times(ee) = times(ee) :+ (System.nanoTime() - t0) / 1e9
        }
      }
      Seq(false, true).foreach { ee =>
        val ts = times(ee)
        val tag = if (ee) "earlyExit" else "fixed25  "
        println(f"$name%-16s $tag min=${ts.min}%.2f " +
          f"all=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
