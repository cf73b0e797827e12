package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Ann

/** Scratch A/B harness (r17) for a kcore h-index fixpoint early-exit —
  * Test/runMain graft.KcoreBenchScratch — measured and REJECTED:
  *
  *   knn_kcore      shipped min=1.98  early-exit min=2.52  (+0.54)
  *   knn_kcore_lsh  shipped min=1.69  early-exit min=1.69  (±0)
  *
  * (interleaved, bench protocol, local[32], sf0.1, min of 5). The
  * knnComponents fixpoint probe (90947e8) harvests 18+ of 25 rounds;
  * here the h-index descent on the sparse mutual graph converges late
  * in (or beyond) the 10-round schedule, so the one-scalar-agg-per-
  * round probe buys nothing and its ~10 extra driver actions cost
  * ~0.5 s. The `exitVariant` below is the exact rejected fold (the
  * knnComponents probe pattern applied to [[Ann.knnKcore]]'s body);
  * the shipped fold stays byte-identical to r16. FoldBenchScratch
  * convention: profiling tool + rejection ledger, not a spec. */
object KcoreBenchScratch {

  /** The REJECTED variant: knnKcore's fold with the DECIMAL(38,0)
    * fixpoint probe per round (valid — the h-index descent is per-node
    * monotone non-increasing from the degree init, so sum equality ⟺
    * per-node equality — just not profitable on this schedule). */
  def exitVariant(embeddings: DataFrame, k: Int = 5, iters: Int = 10,
                  graph: Option[DataFrame] = None): DataFrame = {
    val g = graft.Exec.materialize(
      graph.getOrElse(Ann.knnGraph(embeddings, k))
        .select(col("vec_id"), col("nbr_id")))
    val rev = g.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id"))
    val universe = g.select(col("vec_id")).distinct()
    val adj = graft.Exec.materialize(g.join(rev, Seq("vec_id", "nbr_id"),
      "left_semi"))
    var c = graft.Exec.materialize(
      adj.groupBy(col("vec_id")).agg(count(lit(1)).as("c")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("c").desc)
    var prevSum: java.math.BigDecimal = null
    var done = false
    for (_ <- 1 to iters if !done) {
      c = graft.Exec.materialize(adj
        .join(c.select(col("vec_id").as("nbr_id"), col("c")), Seq("nbr_id"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("vec_id"))
        .agg(max(when(col("c") >= col("rn"), col("rn").cast("bigint"))
          .otherwise(lit(0L))).as("c")))
      val s = c.agg(sum(col("c"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("s"))
        .head().getDecimal(0)
      if (s != null && prevSum != null && s.compareTo(prevSum) == 0)
        done = true
      prevSum = s
    }
    val full = universe.join(c, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("c"), lit(0L)).as("c"))
    val tot = broadcast(full.agg(count(lit(1)).as("n_total")))
    full.groupBy(col("c").as("coreness"))
      .agg(count(lit(1)).as("n_nodes"))
      .crossJoin(tot)
      .select(col("coreness"), col("n_nodes"),
        round(col("n_nodes").cast("double") /
          col("n_total").cast("double"), 4).as("share"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("kcore-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    def emb = Tables.embeddings(spark, dir)
    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("knn_kcore",
        () => Ann.knnKcoreQ(spark, dir),
        () => exitVariant(emb,
          graph = Some(Ann.sessionExactGraph(spark, dir)))),
      ("knn_kcore_lsh",
        () => Ann.knnKcoreLshQ(spark, dir),
        () => exitVariant(emb, graph = Some(
          Ann.sessionLshGraph(spark, dir).select("vec_id", "nbr_id")))))

    cases.foreach { case (name, mkShipped, mkExit) =>
      mkShipped().write.format("noop").mode("overwrite").save()
      mkExit().write.format("noop").mode("overwrite").save()
      var tS, tE = List.empty[Double]
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime()
        mkShipped().write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        mkExit().write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        tS = tS :+ (t1 - t0) / 1e9
        tE = tE :+ (t2 - t1) / 1e9
      }
      println(f"[kcoreab] $name%-16s shipped min=${tS.min}%.2f all=${tS.map(t => f"$t%.2f").mkString(",")}")
      println(f"[kcoreab] $name%-16s exit    min=${tE.min}%.2f all=${tE.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
