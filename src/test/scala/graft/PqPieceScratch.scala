package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe (r17): piecewise timings INSIDE annPqTopK's dominant
  * stage — encode-only, join+ADC-only, +local window, +refine — to
  * find what costs 1.8 s in one task over 2000x10 rows.
  * Test/runMain graft.PqPieceScratch. Profiling tool, not a spec. */
object PqPieceScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("pq-piece")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.llm.Ann
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val raw = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v0"))
    val m = 16; val ksub = 16; val k = 10; val refineFactor = 8
    val dim = 64; val dsub = dim / m
    val vecs = raw
      .withColumn("nrm", sqrt(aggregate(transform(col("v0"), x => x * x), lit(0.0), (acc, x) => acc + x)))
      .select(col("vec_id"),
        transform(col("v0"), x => x / col("nrm")).as("v"))
      .persist()
    vecs.count()
    val cents = Ann.trainSubCodebooks(vecs, m, dsub, ksub, 2)
    val kEff = cents(0).length
    val encoded = vecs.select(col("vec_id"), Ann.pqCodesCol(cents, dsub).as("codes"))
    val queryVecs = vecs.filter(col("vec_id") < 10).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val luts = queryVecs.map { case (qid, qv) => (qid, Ann.pqLut(qv, cents, dsub)) }.toSeq
    import spark.implicits._
    val lutDf = broadcast(luts.toDF("query_id", "lut"))
    val qvDf = broadcast(queryVecs.toSeq.toDF("query_id", "q"))
    val ascore = Ann.pqAdcScore(m, kEff)
    def time(name: String, f: () => Unit): Unit = {
      f() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-28s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("encode only", () => noop(encoded))
    val joined = encoded.join(lutDf, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), ascore.as("ascore"),
        spark_partition_id().as("pid"))
    time("encode+join+adc", () => noop(joined))
    val localW = Window.partitionBy(col("query_id"), col("pid"))
      .orderBy(col("ascore").desc, col("vec_id"))
    val candidates = joined
      .withColumn("lrn", row_number().over(localW))
      .filter(col("lrn") <= k * refineFactor)
      .select(col("query_id"), col("vec_id"))
    time("+local window", () => noop(candidates))
    val globalW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val result = candidates
      .join(vecs, "vec_id")
      .join(qvDf, "query_id")
      .select(col("query_id"), col("vec_id"),
        graft.llm.Ann.dot(col("q"), col("v")).as("sim"))
      .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
    time("+refine (full)", () => noop(result))
    // variant: force the encode BELOW the join by materializing it
    val encM = encoded.persist(); encM.count()
    val joinedM = encM.join(lutDf, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), ascore.as("ascore"),
        spark_partition_id().as("pid"))
    time("persistEnc+join+adc", () => noop(joinedM))
    println("=== joined plan (unmaterialized encode) ===")
    println(joined.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
