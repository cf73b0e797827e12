package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Scratch piece-timer + noise adjudicator (r18, verdict tasks 2–4) —
  * run with Test/runMain graft.DedupPieceScratch.
  *
  * (a) Piece-times dedup_cross_source and corpus_quality_budget_curve
  *     (the two entries the r17 driver board read at 4.4/4.3 s that the
  *     committed quiet board reads at 1.01/0.36 s) — decides whether
  *     there is a duplicate-subtree win or the driver numbers were the
  *     documented session noise.
  * (b) Piece-times dedup_eval (minhash arm / exact-jaccard arm / join)
  *     and dedup_threshold_sweep to size the shared-shingle-frame win
  *     (both arms derive from shingleHashes(docs)).
  * (c) Min-of-10 single-JVM adjudication lines for the two oversized
  *     "noise" regressions on UNTOUCHED code (corpus_families 0.46×,
  *     knn_pagerank 0.62× on the r17 driver board).
  * FoldBenchScratch convention: profiling tool + ledger, not a spec. */
object DedupPieceScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("dedup-piece-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    def docs = Tables.documents(spark, dir)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String, reps: Int = 3)(f: => DataFrame): Unit = {
      noop(f) // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[piece] $tag%-44s min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // ---- (a) dedup_cross_source decomposition ----
    time("cross_source: ngram pairs tau=0.8") {
      Dedup.dedupNgramJaccard(docs, tau = 0.8)
    }
    time("cross_source: full entry") {
      Dedup.dedupCrossSourceQ(spark, dir)
    }
    // ---- (a) corpus_quality_budget_curve ----
    time("budget_curve: full entry") {
      graft.llm.TextProfile2.corpusQualityBudgetCurveQ(spark, dir)
    }

    // ---- (b) dedup_eval decomposition ----
    time("eval: shingleHashes alone") {
      Dedup.shingleHashes(docs)
    }
    time("eval: minhash arm") {
      Dedup.dedupMinhash(docs)
    }
    time("eval: jaccard arm tau=0.5") {
      Dedup.dedupNgramJaccard(docs, tau = 0.5)
    }
    time("eval: full entry") {
      Dedup.dedupEvalQ(spark, dir)
    }
    // ---- (b) dedup_threshold_sweep ----
    time("sweep: pairs at tau=0.3") {
      Dedup.dedupNgramJaccard(docs, tau = 0.3)
    }
    time("sweep: full entry") {
      Dedup.dedupThresholdSweepQ(spark, dir)
    }

    // ---- (b2) interleaved A/B: r17 entry shapes vs shipped (r18) ----
    // r17 dedup_eval: both arms build their own shingle frame
    def evalOld(): DataFrame =
      Dedup.dedupEval(Dedup.dedupMinhash(docs),
        Dedup.dedupNgramJaccard(docs, tau = 0.5))
    // r17 dedup_threshold_sweep: persisted tagged frame, TWO aggs + two joins
    def sweepOld(taus: Seq[Double] = Seq(0.3, 0.5, 0.7, 0.9)): DataFrame = {
      import spark.implicits._
      val pairs = Dedup.dedupNgramJaccard(docs, tau = taus.min).persist()
      val total = docs.count()
      val tauDf = broadcast(taus.sorted.toDF("tau"))
      val tagged = pairs.crossJoin(tauDf)
        .filter(col("jaccard") >= col("tau")).persist()
      val nPairs = tagged.groupBy(col("tau"))
        .agg(count(lit(1)).as("n_pairs"))
      val nDocs = tagged
        .select(col("tau"),
          explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .groupBy(col("tau")).agg(countDistinct(col("d")).as("n_docs"))
      val result = graft.Exec.materialize(
        tauDf.join(nPairs, Seq("tau"), "left").join(nDocs, Seq("tau"), "left")
          .select(col("tau"),
            coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"),
            round(coalesce(col("n_docs"), lit(0L)).cast("double") / total, 4)
              .as("doc_share")))
      tagged.unpersist()
      pairs.unpersist()
      result
    }
    val abCases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("dedup_eval", () => evalOld(),
        () => Dedup.dedupEvalQ(spark, dir)),
      ("dedup_threshold_sweep", () => sweepOld(),
        () => Dedup.dedupThresholdSweepQ(spark, dir)))
    abCases.foreach { case (name, mkOld, mkNew) =>
      val ref = mkOld().collect().map(_.toString).sorted
      val got = mkNew().collect().map(_.toString).sorted
      require(ref.sameElements(got), s"$name old/new outputs differ")
      println(s"[ab] $name old/new equal (${got.length} rows)")
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
      println(f"[ab] $name%-24s old min=${tO.min}%.2f all=${tO.map(t => f"$t%.2f").mkString(",")}")
      println(f"[ab] $name%-24s new min=${tN.min}%.2f all=${tN.map(t => f"$t%.2f").mkString(",")}")
    }

    // ---- (c) min-of-10 adjudication on untouched code ----
    Seq(
      "corpus_families" -> (() => Dedup.corpusFamiliesQ(spark, dir)),
      "knn_pagerank" -> (() => graft.llm.Ann.knnPagerankQ(spark, dir))
    ).foreach { case (name, mk) =>
      noop(mk())
      val ts = (1 to 10).map { _ =>
        val t0 = System.nanoTime(); noop(mk()); (System.nanoTime() - t0) / 1e9
      }
      val sorted = ts.sorted
      println(f"[adjud] $name%-20s min=${ts.min}%.2f med=${sorted(ts.size / 2)}%.2f max=${ts.max}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
