package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B harness for the r16 fused-convergence fold — run with
  * Test/runMain graft.FoldBenchScratch. Not a spec; deleted or kept as
  * a profiling tool only. */
object FoldBenchScratch {

  // verbatim copy of the r15 fold for comparison
  def oldFold(edges: DataFrame, maxIters: Int = 20,
              checkpointEvery: Int = 3): DataFrame = {
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val incoming = sym.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val viaNbr = labels.unionByName(incoming)
        .groupBy("id").agg(min(col("label")).as("label"))
        .persist()
      val jumped = viaNbr.as("a")
        .join(viaNbr.select(col("id").as("lid"), col("label").as("llabel")).as("b"),
          col("a.label") === col("b.lid"))
        .select(col("a.id").as("id"),
          least(col("a.label"), col("llabel")).as("label"))
      val next =
        if ((iter + 1) % checkpointEvery == 0) graft.Exec.materialize(jumped)
        else jumped.persist()
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.label") =!= col("o.label"))
        .count()
      viaNbr.unpersist()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    require(converged, "no converge")
    labels
  }

  // copy of the r16 sum-invariant fold with per-round timing
  def newFoldTimed(edges: DataFrame, maxIters: Int = 20,
                   checkpointEvery: Int = 3): DataFrame = {
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .persist()
    var prevSum: Option[java.math.BigDecimal] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val t0 = System.nanoTime()
      val incoming = sym.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val viaNbr = labels.unionByName(incoming)
        .groupBy("id").agg(min(col("label")).as("label"))
        .persist()
      val jumped = viaNbr.as("a")
        .join(viaNbr.select(col("id").as("lid"), col("label").as("llabel")).as("b"),
          col("a.label") === col("b.lid"))
        .select(col("a.id").as("id"),
          least(col("a.label"), col("llabel")).as("label"))
        .persist()
      val t1 = System.nanoTime()
      val sumNow = jumped
        .agg(sum(col("label").cast("decimal(38,0)")).as("s"))
        .collect()(0).getDecimal(0)
      val t2 = System.nanoTime()
      val next =
        if ((iter + 1) % checkpointEvery == 0
            && !prevSum.exists(_.compareTo(sumNow) == 0)) {
          val cut = graft.Exec.materialize(jumped)
          jumped.unpersist()
          cut
        } else jumped
      val t3 = System.nanoTime()
      viaNbr.unpersist()
      labels.unpersist()
      labels = next
      converged = prevSum.exists(_.compareTo(sumNow) == 0)
      prevSum = Some(sumNow)
      iter += 1
      println(f"  new round $iter plan=${(t1-t0)/1e6}%.0f act=${(t2-t1)/1e6}%.0f ckpt=${(t3-t2)/1e6}%.0f ms")
    }
    sym.unpersist()
    require(converged, "no converge")
    labels
  }

  def oldFoldTimed(edges: DataFrame, maxIters: Int = 20,
                   checkpointEvery: Int = 3): DataFrame = {
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val t0 = System.nanoTime()
      val incoming = sym.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val viaNbr = labels.unionByName(incoming)
        .groupBy("id").agg(min(col("label")).as("label"))
        .persist()
      val jumped = viaNbr.as("a")
        .join(viaNbr.select(col("id").as("lid"), col("label").as("llabel")).as("b"),
          col("a.label") === col("b.lid"))
        .select(col("a.id").as("id"),
          least(col("a.label"), col("llabel")).as("label"))
      val t1 = System.nanoTime()
      val next =
        if ((iter + 1) % checkpointEvery == 0) graft.Exec.materialize(jumped)
        else jumped.persist()
      val t2 = System.nanoTime()
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.label") =!= col("o.label"))
        .count()
      val t3 = System.nanoTime()
      viaNbr.unpersist()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
      println(f"  old round $iter plan=${(t1-t0)/1e6}%.0f ckpt=${(t2-t1)/1e6}%.0f cnt=${(t3-t2)/1e6}%.0f ms")
    }
    sym.unpersist()
    require(converged, "no converge")
    labels
  }

  // variant: TWO pointer-doubling updates per Spark action; sum-invariant
  // convergence checked at action boundaries only
  def twoStepFoldTimed(edges: DataFrame, maxActions: Int = 12): DataFrame = {
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .persist()
    var prevSum: Option[java.math.BigDecimal] = None
    var converged = false
    var iter = 0
    def round(l: DataFrame): DataFrame = {
      val incoming = sym.join(l, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val viaNbr = l.unionByName(incoming)
        .groupBy("id").agg(min(col("label")).as("label"))
      viaNbr.as("a")
        .join(viaNbr.select(col("id").as("lid"), col("label").as("llabel")).as("b"),
          col("a.label") === col("b.lid"))
        .select(col("a.id").as("id"),
          least(col("a.label"), col("llabel")).as("label"))
    }
    while (!converged && iter < maxActions) {
      val t0 = System.nanoTime()
      val jumped = round(round(labels)).persist()
      val t1 = System.nanoTime()
      val sumNow = jumped
        .agg(sum(col("label").cast("decimal(38,0)")).as("s"))
        .collect()(0).getDecimal(0)
      val t2 = System.nanoTime()
      val next =
        if (!prevSum.exists(_.compareTo(sumNow) == 0)) {
          val cut = graft.Exec.materialize(jumped)
          jumped.unpersist()
          cut
        } else jumped
      val t3 = System.nanoTime()
      labels.unpersist()
      labels = next
      converged = prevSum.exists(_.compareTo(sumNow) == 0)
      prevSum = Some(sumNow)
      iter += 1
      println(f"  two round $iter plan=${(t1-t0)/1e6}%.0f act=${(t2-t1)/1e6}%.0f ckpt=${(t3-t2)/1e6}%.0f ms")
    }
    sym.unpersist()
    require(converged, "no converge")
    labels
  }

  // variant (r17, verdict task 6): Kiveris et al. large-star/small-star
  // alternation — a STRUCTURALLY different algorithm (per-node
  // neighborhood-min stars over a shrinking edge list, no global label
  // frame), not a re-fusion of the rejected r16 variants. Each round =
  // large-star (attach strictly-larger neighbors of every node to the
  // neighborhood min) then small-star (attach the smaller neighbors and
  // the center to the local min), on a (big, small)-oriented distinct
  // edge list. Fixpoint = a star forest; detected by a (count, Σa, Σb)
  // checksum that is invariant exactly at the fixpoint, and the final
  // component count is cross-checked against the shipped fold in main.
  def lssFoldTimed(edges: DataFrame, maxIters: Int = 40,
                   checkpointEvery: Int = 3): DataFrame = {
    var e = edges
      .filter(col("doc_a") =!= col("doc_b"))
      .select(greatest(col("doc_a"), col("doc_b")).as("a"),
        least(col("doc_a"), col("doc_b")).as("b"))
      .distinct()
      .persist()
    var prev: Option[(Long, java.math.BigDecimal, java.math.BigDecimal)] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val t0 = System.nanoTime()
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val lmin = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(lmin, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val smin = large.groupBy("a").agg(min(col("b")).as("m"))
      val small = large.join(smin, "a")
        .select(col("b").as("a2"), col("m").as("b2"))
        .unionByName(smin.select(col("a").as("a2"), col("m").as("b2")))
        .filter(col("a2") =!= col("b2"))
        .select(greatest(col("a2"), col("b2")).as("a"),
          least(col("a2"), col("b2")).as("b"))
        .distinct()
      val next =
        if ((iter + 1) % checkpointEvery == 0) graft.Exec.materialize(small)
        else small.persist()
      val t1 = System.nanoTime()
      val sums = next.agg(count(lit(1)),
        sum(col("a").cast("decimal(38,0)")),
        sum(col("b").cast("decimal(38,0)"))).collect()(0)
      val now = (sums.getLong(0), sums.getDecimal(1), sums.getDecimal(2))
      val t2 = System.nanoTime()
      e.unpersist()
      e = next
      converged = prev.exists(p => p._1 == now._1 &&
        p._2.compareTo(now._2) == 0 && p._3.compareTo(now._3) == 0)
      prev = Some(now)
      iter += 1
      println(f"  lss round $iter plan+ckpt=${(t1-t0)/1e6}%.0f act=${(t2-t1)/1e6}%.0f ms")
    }
    require(converged, "no converge")
    // labels: every child points at its root; roots label themselves
    val roots = e.select(col("b").as("id")).distinct()
      .join(e.select(col("a").as("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
    e.select(col("a").as("id"), col("b").as("label")).unionByName(roots)
  }

  // variant (r17): partition-local union-find SEED + the shipped
  // pointer-doubling rounds, unchanged. The seed emits (id, localMin)
  // per edge partition (one mapPartitions pass, no shuffle of its own);
  // the global min-merge produces INITIAL labels that already collapse
  // every component segment that happens to sit inside one partition,
  // so the surviving rounds only have to close the CONTRACTED graph —
  // log2(contracted diameter) instead of log2(raw diameter). The label
  // invariant (every label is the id of a same-component vertex, ≤ own
  // id) holds for the seed, so the fixpoint — and the convergence
  // THROW — are untouched.
  def seededFoldTimed(edges: DataFrame, maxIters: Int = 20,
                      checkpointEvery: Int = 3): DataFrame = {
    val spark0 = edges.sparkSession
    import spark0.implicits._
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    val t0 = System.nanoTime()
    val seed = edges
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (c != r) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        // materialize keys before find(): path compression mutates the
        // map, which must not interleave with its own key iterator
        val ks = parent.keys.toArray
        ks.iterator.map(x => (x, find(x)))
      }.toDF("id", "label")
    var labels = seed.groupBy("id").agg(min(col("label")).as("label"))
      .persist()
    labels.count()
    println(f"  seed pass ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val r0 = System.nanoTime()
      val incoming = sym.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val viaNbr = labels.unionByName(incoming)
        .groupBy("id").agg(min(col("label")).as("label"))
        .persist()
      val jumped = viaNbr.as("a")
        .join(viaNbr.select(col("id").as("lid"), col("label").as("llabel")).as("b"),
          col("a.label") === col("b.lid"))
        .select(col("a.id").as("id"),
          least(col("a.label"), col("llabel")).as("label"))
      val next =
        if ((iter + 1) % checkpointEvery == 0) graft.Exec.materialize(jumped)
        else jumped.persist()
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.label") =!= col("o.label"))
        .count()
      viaNbr.unpersist()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
      println(f"  seeded round $iter ${(System.nanoTime() - r0) / 1e6}%.0f ms")
    }
    sym.unpersist()
    require(converged, "no converge")
    labels
  }

  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // chain of N nodes (default 50k) -> diameter N; pointer doubling
    // ~ log2 rounds. args: [nNodes] [comma-separated modes]
    val nNodes = args.headOption.map(_.toLong).getOrElse(50000L)
    val modes: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("two", "old", "two", "old")
    val edges = spark.range(nNodes - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      .persist()
    edges.count()
    def jobs(): Int = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    @volatile var stageTime = 0L
    @volatile var taskCount = 0L
    @volatile var gcTime = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageTime += si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        taskCount += si.numTasks
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) gcTime += te.taskMetrics.jvmGCTime
    })
    for (mode <- modes) {
      val j0 = jobs(); val t0 = System.nanoTime()
      val s0 = stageTime; val tk0 = taskCount; val g0 = gcTime
      val out = if (mode == "two") twoStepFoldTimed(edges)
      else if (mode == "new") newFoldTimed(edges)
      else if (mode == "lss") lssFoldTimed(edges)
      else if (mode == "seed") seededFoldTimed(edges)
      else oldFoldTimed(edges)
      val n = out.agg(countDistinct(col("label"))).as[Long].head()
      println(f"MODE=$mode comps=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s " +
        f"jobs=${jobs()-j0} stageMs=${stageTime-s0} tasks=${taskCount-tk0} gcMs=${gcTime-g0}")
      out.unpersist()
    }
    spark.stop()
  }
}
