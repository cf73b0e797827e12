package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Ann

/** Scratch A/B harness (r18, verdict task 1) for cutting the DRIVER
  * ACTION count of the fixed-iteration graph folds — run with
  * Test/runMain graft.GraphFoldScratch.
  *
  * The r17 verdict measured the kcore/label_prop/pagerank entries as
  * driver-scheduling-bound (8-core/32-core ratios 0.36–1.0): each
  * round pays a localCheckpoint JOB whose fixed submit/schedule cost
  * dominates the tiny sf0.1 stages. The r16 fused-fold rejection (c)
  * does NOT apply here: that fold's `viaNbr` is referenced TWICE per
  * round, so un-materialized chaining recomputed it; the kcore h-index
  * round references `c` exactly ONCE (linear), and label_prop/pagerank
  * rounds can share via persist() (no action) instead of checkpoint
  * (one action each).
  *
  * Variants measured here, INTERLEAVED with the shipped folds (bench
  * protocol: noop sink, warmup, min of 5, local[32], sf0.1):
  *   - kcoreVariant(ckptEvery): materialize only every `ckptEvery`
  *     rounds (ckptEvery=1 ≡ shipped; iters ⇒ single final action);
  *   - labelPropVariant: persist-per-round, ONE final materialize;
  *   - pagerankOnVariant: persist rounds + deg, count + final
  *     materialize only.
  * FoldBenchScratch convention: profiling tool + ledger, not a spec.
  */
object GraphFoldScratch {

  /** knnKcore with a configurable checkpoint cadence. Rounds between
    * checkpoints stay LAZY — safe because each round references the
    * previous `c` exactly once (no duplicate-subtree recompute) and the
    * final round is ALWAYS materialized (the tail references it twice:
    * the broadcast total and the rollup). */
  def kcoreVariant(embeddings: DataFrame, k: Int = 5, iters: Int = 10,
                   graph: Option[DataFrame] = None,
                   ckptEvery: Int = 10): DataFrame = {
    val g = graft.Exec.materialize(
      graph.getOrElse(Ann.knnGraph(embeddings, k))
        .select(col("vec_id"), col("nbr_id")))
    val rev = g.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id"))
    val universe = g.select(col("vec_id")).distinct()
    val adj = graft.Exec.materialize(g.join(rev, Seq("vec_id", "nbr_id"),
      "left_semi"))
    var c: DataFrame = adj.groupBy(col("vec_id")).agg(count(lit(1)).as("c"))
    if (ckptEvery <= 1) c = graft.Exec.materialize(c)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("c").desc)
    for (i <- 1 to iters) {
      val next = adj
        .join(c.select(col("vec_id").as("nbr_id"), col("c")), Seq("nbr_id"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("vec_id"))
        .agg(max(when(col("c") >= col("rn"), col("rn").cast("bigint"))
          .otherwise(lit(0L))).as("c"))
      c = if (i % ckptEvery == 0 || i == iters)
        graft.Exec.materialize(next)
      else next
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

  /** knnComponents with the kcore batch cadence: TWO linear rounds per
    * materialization (the round references the previous `c` exactly
    * once — linear, so the odd round executes once inside the even
    * round's job), with the DECIMAL(38,0) fixpoint probe at batch
    * boundaries (labels are per-node monotone non-increasing, so sum
    * equality across a boundary ⟺ both batched rounds were the
    * identity ⟺ fixpoint — the same invariant, coarser schedule; the
    * exit returns the byte-identical frame, and the no-fixpoint arm
    * still runs the full fixed schedule). */
  def componentsVariant(embeddings: DataFrame, k: Int = 5, iters: Int = 25,
                        graph: Option[DataFrame] = None,
                        earlyExit: Boolean = true,
                        batch: Int = 2): DataFrame = {
    val g = graft.Exec.materialize(
      graph.getOrElse(Ann.knnGraph(embeddings, k))
        .select(col("vec_id"), col("nbr_id")))
    val rev = g.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id"))
    val mutual = g.join(rev, Seq("vec_id", "nbr_id"), "left_semi")
    val universe = g.select(col("vec_id")).distinct()
    val adjS = graft.Exec.materialize(mutual.unionByName(
      universe.select(col("vec_id"), col("vec_id").as("nbr_id"))))
    var c: DataFrame = universe.select(col("vec_id"), col("vec_id").as("c"))
    var prevSum: java.math.BigDecimal = null
    var done = false
    var r = 0
    while (r < iters && !done) {
      val step = math.min(batch, iters - r)
      var next = c
      for (_ <- 1 to step) {
        next = adjS
          .join(next.select(col("vec_id").as("nbr_id"), col("c")),
            Seq("nbr_id"))
          .groupBy(col("vec_id"))
          .agg(min(col("c")).as("c"))
      }
      c = graft.Exec.materialize(next)
      r += step
      if (earlyExit) {
        val s = c.agg(sum(col("c"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("s"))
          .head().getDecimal(0)
        if (s != null && prevSum != null && s.compareTo(prevSum) == 0)
          done = true
        prevSum = s
      }
    }
    // componentSizeHistogram (private in Ann) replicated
    val d = (x: org.apache.spark.sql.Column) => x.cast("double")
    val sizes = c.groupBy(col("c")).agg(count(lit(1)).as("component_size"))
    val tot = broadcast(sizes.agg(sum(col("component_size")).as("n_total")))
    sizes.groupBy(col("component_size"))
      .agg(count(lit(1)).as("n_components"))
      .crossJoin(tot)
      .select(col("component_size"), col("n_components"),
        (col("component_size") * col("n_components")).as("n_nodes"),
        round(d(col("component_size") * col("n_components")) /
          d(col("n_total")), 4).as("node_share"))
  }

  /** knnLabelProp with persist-per-round instead of checkpoint-per-
    * round: each round's label frame is referenced three times by the
    * next (vote source, labeled-set anti-join, union), so it must be
    * SHARED — but sharing needs a cache, not an action. ONE final
    * materialize executes the whole fold; intermediates unpersist
    * after it (the checkpoint makes that provably safe). */
  def labelPropVariant(embeddings: DataFrame, k: Int = 5, iters: Int = 3,
                       seedMod: Int = 10,
                       graph: Option[DataFrame] = None): DataFrame = {
    val g = graph.getOrElse(Ann.knnGraph(embeddings, k))
      .select(col("vec_id"), col("nbr_id"))
      .persist()
    val edges = g.intersect(
      g.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id")))
      .persist()
    var rounds = List.empty[DataFrame]
    var labels = embeddings.filter(col("vec_id") % seedMod === 0)
      .select(col("vec_id"), col("label")).persist()
    rounds ::= labels
    for (i <- 1 to iters) {
      val asNbr = labels
        .select(col("vec_id").as("nbr_id"), col("label").as("nl"))
      val votes = edges
        .join(asNbr, "nbr_id")
        .join(labels.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .groupBy(col("vec_id"), col("nl"))
        .agg(count(lit(1)).as("c"))
      val newly = votes.groupBy("vec_id")
        .agg(max_by(col("nl"), struct(col("c"), -col("nl"))).as("label"))
      labels = labels.union(newly)
      if (i < iters) { labels = labels.persist(); rounds ::= labels }
    }
    val out = embeddings.select(col("vec_id"))
      .join(labels.withColumnRenamed("label", "l"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("l"), lit(-1)).as("label"),
        (col("vec_id") % seedMod === 0).as("is_seed"))
    val res = graft.Exec.materialize(out)
    rounds.foreach(_.unpersist(blocking = false))
    g.unpersist(); edges.unpersist()
    res
  }

  /** knnPagerankOn with persist-per-round: rounds reference the
    * previous `pr` twice (mass join + universe) and `deg` once each,
    * so both persist; only the count (needed as a plan literal) and
    * the final materialize remain driver actions. */
  def pagerankOnVariant(embeddings: DataFrame, g: DataFrame,
                        iters: Int = 3): DataFrame = {
    val edges = g.intersect(
      g.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id")))
      .persist()
    val deg = edges.groupBy(col("vec_id")).agg(count(lit(1)).as("deg"))
      .persist()
    val n = embeddings.count()
    val initU = 1000000000L / n
    val baseU = 15L * initU / 100L
    var rounds = List.empty[DataFrame]
    var pr: DataFrame =
      embeddings.select(col("vec_id"), lit(initU).as("pr_nano")).persist()
    rounds ::= pr
    for (i <- 1 to iters) {
      val mass = edges
        .join(pr, "vec_id").join(deg, "vec_id")
        .select(col("nbr_id").as("vec_id"),
          expr("pr_nano div deg").as("w"))
        .groupBy(col("vec_id")).agg(sum(col("w")).as("in_mass"))
      pr = pr.select(col("vec_id")).join(mass, Seq("vec_id"), "left")
        .select(col("vec_id"),
          (lit(baseU) +
            expr("(85 * coalesce(in_mass, 0)) div 100")).as("pr_nano"))
      if (i < iters) { pr = pr.persist(); rounds ::= pr }
    }
    val res = graft.Exec.materialize(pr)
    rounds.foreach(_.unpersist(blocking = false))
    deg.unpersist(); edges.unpersist()
    res
  }

  def pagerankVariant(embeddings: DataFrame, k: Int = 5, iters: Int = 3,
                      graph: Option[DataFrame] = None): DataFrame = {
    val g = graph.getOrElse(Ann.knnGraph(embeddings, k))
      .select(col("vec_id"), col("nbr_id"))
      .persist()
    val res = pagerankOnVariant(embeddings, g, iters)
    g.unpersist()
    res
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graph-fold-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    def emb = Tables.embeddings(spark, dir)
    def exactG = Ann.sessionExactGraph(spark, dir)
    def lshG = Ann.sessionLshGraph(spark, dir).select("vec_id", "nbr_id")
    // the knnSnnClusterQ wiring up to the components fold
    def snnSurvivors(spark: SparkSession, dir: String): DataFrame = {
      val g = graft.Exec.materialize(
        Ann.sessionExactGraph(spark, dir)
          .select(col("vec_id"), col("nbr_id")))
      Ann.snnSurvivorGraph(g, 1, 5)
    }

    // arms per case: name -> (shipped, variants...).
    //
    // LEDGER (r18, interleaved, min of 5, local[32], sf0.1):
    //
    // Round 1 (box load ~1.4, interleaved so arms comparable): the
    // PERSIST variants LOSE — label_prop shipped 1.85 vs persist 2.54,
    // pagerank 2.05 vs 2.24, kcore lazy-all 2.66 vs 2.94, kcore_lsh
    // lazy-all 2.03 vs 2.28. One mega-action over InMemoryRelation
    // caches forfeits per-round AQE re-optimization and flat lineage;
    // per-round localCheckpoint is near-optimal for the folds whose
    // state is referenced 2–3x per round. REJECTED for
    // knnLabelProp/knnPagerankOn — the shipped per-round materialize
    // stays.
    //
    // Round 2 (load ~0.3→1.4): checkpoint CADENCE on the linear kcore
    // fold — every-1 (r16 shape) kcore 2.62 / kcore_lsh 2.03; every-2
    // 2.18 / 1.77 (every paired rep faster); every-5 2.68 / 2.01
    // (neutral-worse: deeper lazy chains lose per-segment AQE).
    // ACCEPTED: knnKcore ships ckptEvery=2 (its round references `c`
    // exactly once — linear — so the odd round is executed once inside
    // the even round's job, never recomputed; the r16 fused-fold
    // rejection (c) adjudicated a DOUBLE-referenced round state and
    // does not transfer).
    //
    // Round 3 (same lever on the knnComponents linear fold, probe at
    // batch boundaries): knn_components shipped 2.61 vs batch2 2.07
    // (−21%), knn_components_lsh 2.33 vs 1.79 (−23%) — ACCEPTED
    // (knnComponents roundsPerCkpt=2 default); knn_snn_cluster 1.19 vs
    // 1.40 (+18%) — the sparse SNN survivor graph reaches fixpoint in
    // ~1-2 rounds and batching overshoots identity rounds, so
    // knnSnnCluster pins roundsPerCkpt=1 (its fold is byte-identical
    // to r17).
    val all: Seq[(String, Seq[(String, () => DataFrame)])] = Seq(
      ("knn_kcore", Seq(
        "shipped" -> (() => Ann.knnKcoreQ(spark, dir)),
        "ckpt1_r16" -> (() => kcoreVariant(emb, graph = Some(exactG), ckptEvery = 1)),
        "ckpt5" -> (() => kcoreVariant(emb, graph = Some(exactG), ckptEvery = 5)))),
      ("knn_kcore_lsh", Seq(
        "shipped" -> (() => Ann.knnKcoreLshQ(spark, dir)),
        "ckpt1_r16" -> (() => kcoreVariant(emb, graph = Some(lshG), ckptEvery = 1)),
        "ckpt5" -> (() => kcoreVariant(emb, graph = Some(lshG), ckptEvery = 5)))),
      ("knn_components", Seq(
        "shipped" -> (() => Ann.knnComponentsQ(spark, dir)),
        "batch2" -> (() => componentsVariant(emb, graph = Some(exactG))))),
      ("knn_components_lsh", Seq(
        "shipped" -> (() => Ann.knnComponentsLshQ(spark, dir)),
        "batch2" -> (() => componentsVariant(emb, graph = Some(lshG))))),
      ("knn_snn_cluster", Seq(
        "shipped" -> (() => Ann.knnSnnClusterQ(spark, dir)),
        "batch2" -> (() => componentsVariant(emb, graph = Some(
          snnSurvivors(spark, dir)))))))
    val only: Option[Set[String]] =
      args.headOption.map(_.split(",").map(_.trim).toSet)
    val cases = all.filter { case (n, _) => only.forall(_.contains(n)) }

    cases.foreach { case (name, arms) =>
      // result-identity guard: every variant must equal shipped exactly
      val ref = arms.head._2().collect().map(_.toString).sorted
      arms.tail.foreach { case (an, mk) =>
        val got = mk().collect().map(_.toString).sorted
        val eq = ref.sameElements(got)
        println(s"[foldab] $name $an equal=$eq (${got.length} rows)")
        require(eq, s"$name $an output differs from shipped")
      }
      // warmup every arm once
      arms.foreach(_._2().write.format("noop").mode("overwrite").save())
      val times = scala.collection.mutable.Map[String, List[Double]]()
        .withDefaultValue(Nil)
      (1 to 5).foreach { _ =>
        arms.foreach { case (an, mk) =>
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          times(an) = times(an) :+ (System.nanoTime() - t0) / 1e9
        }
      }
      arms.foreach { case (an, _) =>
        val ts = times(an)
        println(f"[foldab] $name%-16s $an%-8s min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
