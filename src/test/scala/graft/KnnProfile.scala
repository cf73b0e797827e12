package graft
import org.apache.spark.sql.functions._

/** Measures the two candidate shapes for the exact k-NN graph at sf0.1
  * (5k vectors → 25M scored pairs): the bounded [[graft.functions
  * .TopKPairs]] aggregate vs the naive `row_number` window. The window
  * exchanges and sorts EVERY scored pair; the aggregate truncates
  * map-side to k per node. Numbers quoted in [[graft.llm.Ann.knnGraph]]'s
  * scaladoc come from this harness. */
object KnnProfile {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, dir)
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"=== $tag min=${ts.min}%.3f")
    }
    time("knn_graph (bounded topk_pairs aggregate)")(
      graft.llm.Ann.knnGraph(emb, k = 5)
        .write.format("noop").mode("overwrite").save())
    // comparison arm: identical scored-pair stream through a window
    import org.apache.spark.sql.expressions.Window
    val corpus = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.vecDot(col("v"), col("v"))))
    val nbrs = broadcast(corpus.select(col("vec_id").as("nbr_id"),
      col("v").as("w"), col("nrm").as("nw")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    time("rejected: row_number window over all pairs")(
      corpus.join(nbrs, col("vec_id") =!= col("nbr_id"))
        .select(col("vec_id"), col("nbr_id"),
          (graft.functions.VectorFunctions.vecDot(col("v"), col("w")) /
            (col("nrm") * col("nw"))).as("sim"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("vec_id"), col("rank"), col("nbr_id"))
        .write.format("noop").mode("overwrite").save())
    time("knn_graph_lsh (16 bands x 3 bits)")(
      graft.llm.Ann.knnGraphLsh(emb, k = 5)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
