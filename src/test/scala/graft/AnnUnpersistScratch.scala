package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Ann

/** Scratch A/B (r18, verdict What's-wrong #4): does the structural
  * materialize-output + unpersist-corpus-pin pattern cost measurable
  * time on the lazy-output ANN entries? Run with
  * Test/runMain graft.AnnUnpersistScratch.
  *
  * The r17 pair-join pins (annTopK family) persist the normalized
  * corpus with NO unpersist — reclaimed by the ContextCleaner
  * (RfmIsoScratch: 8 leaked RDDs across a full 332-entry session, not
  * a hazard). The structural alternative materializes the (tiny)
  * output and unpersists explicitly, at the price of ONE extra
  * construction-time action per call. This measures that price on
  * ann_topk and embed_decontaminate.
  *
  * LEDGER (r18): measured and REJECTED as a blanket pattern —
  *   ann_topk             lazy min=0.47  eager min=0.44  (free)
  *   embed_decontaminate  lazy min=0.33  eager min=0.39  (+18%)
  * (interleaved, min of 5, local[32], sf0.1, outputs identical). The
  * extra checkpoint job is only free where the entry already runs
  * multiple jobs; on the single-action entries it is pure overhead —
  * the OrderedPrefix output-persist rejection (r17) generalizes. The
  * pins stay ContextCleaner-reclaimed; the one provably-free explicit
  * unpersist (pairsOnUnit's `assigned`, whose output was ALREADY
  * materialized — no new action) ships in Ann.scala. */
object AnnUnpersistScratch {

  import Ann.{norm, dot}

  private def vecAsDouble(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("array<double>")

  /** annTopK with eager output + explicit unpersist. */
  def annTopKEager(embeddings: DataFrame, nQueries: Int = 10,
                   k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorFunctions.register(embeddings.sparkSession)
    val corpus = embeddings.select(col("vec_id"),
      vecAsDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
      .persist()
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
    val res = graft.Exec.materialize(scored
      .withColumn("lrn", row_number().over(localW)).filter(col("lrn") <= k)
      .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id")))
    corpus.unpersist(blocking = false)
    res
  }

  /** embedDecontaminate with eager output + explicit unpersist. */
  def embedDecontaminateEager(corpus: DataFrame, bench: DataFrame,
                              tau: Double = 0.3): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val c = corpus.select(col("vec_id"), vecAsDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
      .persist()
    val b = broadcast(bench
      .select(col("vec_id").as("bench_id"), vecAsDouble(col("embedding")).as("q"))
      .withColumn("nq", norm(col("q"))))
    val res = graft.Exec.materialize(
      c.join(b, dot(col("q"), col("v")) / (col("nq") * col("nv")) >= tau,
          "left_outer")
        .groupBy(col("vec_id")).agg(count(col("bench_id")).as("n_hits"))
        .select(col("vec_id"), col("n_hits"),
          (col("n_hits") > 0L).as("contaminated")))
    c.unpersist(blocking = false)
    res
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("ann-unpersist-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    def emb = Tables.embeddings(spark, dir)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("ann_topk",
        () => Ann.annTopK(emb),
        () => annTopKEager(emb)),
      ("embed_decontaminate",
        () => Ann.embedDecontaminateQ(spark, dir),
        () => embedDecontaminateEager(emb.filter(col("vec_id") >= 10),
          emb.filter(col("vec_id") < 10))))
    cases.foreach { case (name, mkOld, mkNew) =>
      val ref = mkOld().collect().map(_.toString).sorted
      val got = mkNew().collect().map(_.toString).sorted
      require(ref.sameElements(got), s"$name old/new outputs differ")
      println(s"[annup] $name old/new equal (${got.length} rows)")
      noop(mkOld()); noop(mkNew())
      var tO, tN = List.empty[Double]
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime()
        noop(mkOld())
        val t1 = System.nanoTime()
        noop(mkNew())
        val t2 = System.nanoTime()
        tO = tO :+ (t1 - t0) / 1e9
        tN = tN :+ (t2 - t1) / 1e9
      }
      println(f"[annup] $name%-20s lazy  min=${tO.min}%.2f all=${tO.map(t => f"$t%.2f").mkString(",")}")
      println(f"[annup] $name%-20s eager min=${tN.min}%.2f all=${tN.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
