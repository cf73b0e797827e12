package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Ann

/** Scratch piece-timer (r17): how much of ann_pq_topk / ann_ivfpq_topk
  * wall is the deterministic quantizer TRAINING (coarse Lloyd + m
  * sub-codebooks on the capped sample) vs the encode+ADC serve path —
  * decides whether a session centroid cache is worth wiring for the
  * index family. FoldBenchScratch convention: profiling tool, not a
  * spec. */
object PqTrainPieceScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("pqtrain-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqtrain] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup both entries once
    Ann.annPqTopKQ(spark, dir).write.format("noop").mode("overwrite").save()
    Ann.annIvfPqTopKQ(spark, dir).write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
        .withColumn("nrm",
          sqrt(aggregate(transform(col("v0"), x => x * x),
            lit(0.0), (a, x) => a + x)))
        .select(col("vec_id"),
          transform(col("v0"), x => x / col("nrm")).as("v"))
        .persist()
      val n = vecs.count()
      val train = if (n <= 4096L) vecs
        else vecs.filter(pmod(xxhash64(col("vec_id")),
          lit(math.max(1L, n / 4096L))) === 0)
      t(s"pq sub-codebook train #$i") {
        Ann.trainSubCodebooks(train, 16, 4, 16, 2)
      }
      t(s"ann_pq_topk full #$i") {
        Ann.annPqTopKQ(spark, dir).write.format("noop")
          .mode("overwrite").save()
      }
      t(s"ann_ivfpq_topk full #$i") {
        Ann.annIvfPqTopKQ(spark, dir).write.format("noop")
          .mode("overwrite").save()
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}
