package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch probe (r17): per-Spark-job wall timings inside the PQ/IVF
  * entries, to see whether the codebook-training jobs or the final
  * ADC/refine job dominate. Test/runMain graft.PqJobProbeScratch.
  * Profiling tool, not a spec. */
object PqJobProbeScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("pq-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val starts = scala.collection.concurrent.TrieMap[Int, Long]()
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val dur = (j.time - starts.getOrElse(j.jobId, j.time)) / 1e3
        lines += f"  job ${j.jobId}%3d ${dur}%7.2f s"
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) -
          si.submissionTime.getOrElse(0L)) / 1e3
        lines += f"    stage ${si.stageId}%3d ${dur}%6.2f s tasks=${si.numTasks}%3d ${si.name.take(70)}"
      }
    })
    def run(name: String, fn: () => org.apache.spark.sql.DataFrame): Unit = {
      fn().write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(500); lines.clear()
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"== $name total=$total%.2f s, ${lines.size} jobs")
      lines.foreach(println)
    }
    import graft.llm.Ann
    run("ann_pq_topk", () => Ann.annPqTopKQ(spark, dir))
    run("corpus_refine_learned",
      () => graft.llm.TextOps.corpusRefineLearnedQ(spark, dir))
    spark.stop()
  }
}
