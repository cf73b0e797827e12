package graft

import org.apache.spark.sql.functions._

/** One-off isolation probe (r17): bench-protocol timings of the
  * distributed-fold consumers in a fresh JVM, outside the board's
  * scheduling neighborhood. First used to adjudicate the knn_snn_cluster
  * board flag (session drift, code byte-identical); re-used to measure
  * the partition-local union-find seed on the real corpus shapes.
  * Scratch tool, FoldBenchScratch convention. */
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
    run("knn_components_fast", () => graft.llm.Ann.knnComponentsFastQ(spark, dir))
    run("knn_snn_cluster", () => graft.llm.Ann.knnSnnClusterQ(spark, dir))
    run("knn_snn_cluster_fast", () => graft.llm.Ann.knnSnnClusterFastQ(spark, dir))
    if (args.contains("injected")) {
      // the ScaleSmokeR14c injected-graph protocol, post-seed re-run:
      // random mutual graphs, substrate build kept out of the timing
      import spark.implicits._
      def randGraph(nodes: Int, avgDeg: Int) = {
        val edges = spark.range(nodes.toLong * avgDeg / 2)
          .select(
            pmod(hash(col("id"), lit(1)).cast("long"), lit(nodes.toLong))
              .as("a"),
            pmod(hash(col("id"), lit(2)).cast("long"), lit(nodes.toLong))
              .as("b"))
          .filter(col("a") =!= col("b"))
        edges.select(col("a").as("vec_id"), col("b").as("nbr_id"))
          .union(edges.select(col("b").as("vec_id"), col("a").as("nbr_id")))
          .distinct()
      }
      val emptyEmb = Seq.empty[(Long, Array[Float])]
        .toDF("vec_id", "embedding")
      for ((n, label) <- Seq(50000 -> "50k", 500000 -> "500k")) {
        val g = graft.Exec.materialize(randGraph(n, 10))
        run(s"snn_fast injected $label",
          () => graft.llm.Ann.knnSnnClusterFast(emptyEmb, graph = Some(g)))
      }
    }
    spark.stop()
  }
}
