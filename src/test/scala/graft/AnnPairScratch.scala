package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe (r17): does the corpus-side (cast + norm) projection
  * below annTopK's broadcast pair join re-evaluate per PAIR (the
  * PqPieceScratch finding on the PQ encode)? A/B: verbatim annTopK vs
  * the same with the corpus projection persisted.
  * Test/runMain graft.AnnPairScratch. Profiling tool, not a spec. */
object AnnPairScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("ann-pair")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, dir)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def nrm(a: org.apache.spark.sql.Column) = sqrt(dot(a, a))
    def topk(persistCorpus: Boolean): org.apache.spark.sql.DataFrame = {
      val nQueries = 10; val k = 10
      val corpus0 = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
        .withColumn("nv", nrm(col("v")))
      val corpus = if (persistCorpus) corpus0.persist() else corpus0
      val queries = broadcast(
        corpus.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("query_id"), col("v").as("q"),
            col("nv").as("nq")))
      val scored = corpus.join(queries, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (dot(col("q"), col("v")) / (col("nq") * col("nv"))).as("sim"),
          spark_partition_id().as("pid"))
      val localW = Window.partitionBy(col("query_id"), col("pid"))
        .orderBy(col("sim").desc, col("vec_id"))
      val globalW = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      scored
        .withColumn("lrn", row_number().over(localW)).filter(col("lrn") <= k)
        .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("vec_id"))
    }
    def time(name: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-20s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("plain (live shape)", () => topk(false))
    time("persist corpus", () => topk(true))
    spark.stop()
  }
}
