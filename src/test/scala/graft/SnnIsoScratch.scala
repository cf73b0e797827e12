package graft

import org.apache.spark.sql.functions._

/** One-off isolation probe for the r17 board flag on knn_snn_cluster
  * (untouched code, +0.9 s vs the r16 quiet board on two consecutive
  * r17 boards): bench protocol in a fresh JVM, outside the board's
  * scheduling neighborhood. Scratch tool, FoldBenchScratch convention. */
object SnnIsoScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    def run(name: String, fn: () => org.apache.spark.sql.DataFrame): Unit = {
      fn().write.format("noop").mode("overwrite").save() // warmup
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    run("knn_snn_cluster", () => graft.llm.Ann.knnSnnClusterQ(spark, dir))
    run("knn_snn_cluster_fast", () => graft.llm.Ann.knnSnnClusterFastQ(spark, dir))
    spark.stop()
  }
}
