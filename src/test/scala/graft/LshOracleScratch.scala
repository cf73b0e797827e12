package graft

import org.apache.spark.sql.functions._

/** One-off scratch: dump LSH bucket ints + hyperplanes so the DuckDB
  * oracle replay can be validated bit-for-bit before the oracle SQL is
  * wired into SparkEntry. */
object LshOracleScratch {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    vecs.select(col("vec_id"),
      posexplode(graft.llm.Ann.lshBucketInts(col("v")))
        .as(Seq("tbl", "bucket")))
      .coalesce(1).write.mode("overwrite")
      .parquet("/tmp/lsh_buckets_spark")
    // cosines of the first few candidate pairs, full precision
    val w = vecs.withColumn("nrm", graft.llm.Ann.norm(col("v")))
    w.as("a").join(w.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.vec_id") < 20 && col("b.vec_id") < 20)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        (graft.llm.Ann.dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/lsh_cos_spark")
    // hyperplanes as JSON for the python side
    val planes = graft.llm.Ann.hyperplanes(32)
    val json = planes.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/planes.json"),
      json.getBytes)
    spark.stop()
  }
}
