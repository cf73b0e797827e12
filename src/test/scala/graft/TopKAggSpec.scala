package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKBuffer, VectorFunctions}
import graft.llm.Ann

class TopKAggSpec extends AnyFunSuite with SparkFixture {

  test("TopKBuffer keeps the k best with deterministic tie-breaks") {
    val b = new TopKBuffer(3)
    Seq((0.5, 10L), (0.9, 7L), (0.1, 3L), (0.9, 2L), (0.7, 99L))
      .foreach { case (s, i) => b.add(s, i) }
    // 0.9 tie broken to the smaller id first; 0.1 evicted
    assert(b.sortedIds.toSeq === Seq(2L, 7L, 99L))
    // fewer entries than k: all retained, still rank-ordered
    val small = new TopKBuffer(5)
    small.add(0.2, 1L); small.add(0.8, 0L)
    assert(small.sortedIds.toSeq === Seq(0L, 1L))
  }

  test("TopKBuffer is a total order under NaN and signed zero") {
    // NaN admitted while the heap FILLS must not poison later inserts:
    // under the old primitive-comparison beats() the NaN at the root
    // made every subsequent add() a no-op
    val b = new TopKBuffer(2)
    b.add(Double.NaN, 50L); b.add(0.1, 1L); b.add(0.9, 2L); b.add(0.8, 3L)
    // NaN ranks LARGEST (Spark sort / DuckDB ORDER BY convention), and
    // the genuinely-better 0.9 displaced 0.1 — not silently discarded
    assert(b.sortedIds.toSeq === Seq(50L, 2L))
    // multiple NaNs tie-break by id like any equal score
    val n = new TopKBuffer(3)
    n.add(Double.NaN, 9L); n.add(Double.NaN, 4L); n.add(1.0, 1L); n.add(2.0, 2L)
    assert(n.sortedIds.toSeq === Seq(4L, 9L, 2L))
    // -0.0 and 0.0 are the SAME score: tie-break goes to the smaller id
    // (Double.compare alone would rank 0.0 above -0.0)
    val z = new TopKBuffer(2)
    z.add(-0.0, 7L); z.add(0.0, 3L); z.add(-1.0, 1L)
    assert(z.sortedIds.toSeq === Seq(3L, 7L))
  }

  test("topk_pairs resolves from SQL and skips null rows") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(0.9), Some(11L)), (1L, Some(0.8), Some(12L)),
      (1L, None, Some(13L)), (1L, Some(0.95), None),
      (1L, Some(0.7), Some(14L)), (2L, Some(0.1), Some(21L)))
      .toDF("g", "s", "i")
    df.createOrReplaceTempView("topk_in")
    val out = spark.sql(
      "SELECT g, topk_pairs(s, i, 2) AS nn FROM topk_in GROUP BY g ORDER BY g")
      .collect()
    assert(out(0).getSeq[Long](1) === Seq(11L, 12L))
    assert(out(1).getSeq[Long](1) === Seq(21L))
  }

  test("partial/merge path agrees with the single-partition result") {
    import spark.implicits._
    // 1000 rows, one group, scores engineered with ties; forcing many
    // input partitions exercises serialize/deserialize + merge
    val rows = (0 until 1000).map(i => (1L, (i % 13).toDouble, i.toLong))
    val wide = rows.toDF("g", "s", "i").repartition(16)
    val narrow = rows.toDF("g", "s", "i").coalesce(1)
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(VectorFunctions.topKPairs(col("s"), col("i"), 7).as("nn"))
        .head().getSeq[Long](1)
    assert(topk(wide) === topk(narrow))
    // ground truth: score desc (i % 13 == 12 best), then id asc
    assert(topk(wide) === Seq(12L, 25L, 38L, 51L, 64L, 77L, 90L))
  }

  test("knn_graph matches a row_number reference and stays window-free") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sfDir)
    val graph = Ann.knnGraph(emb, k = 5)
    // reference: the naive window form over the same scored pairs
    val corpus = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.vecDot(col("v"), col("v"))))
    val nbrs = corpus.select(col("vec_id").as("nbr_id"),
      col("v").as("w"), col("nrm").as("nw"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    val ref = corpus.join(nbrs, col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        (VectorFunctions.vecDot(col("v"), col("w")) / (col("nrm") * col("nw"))).as("sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("vec_id"), col("rank"), col("nbr_id"))
    assert(graph.exceptAll(ref).isEmpty && ref.exceptAll(graph).isEmpty)
    // every node has exactly k edges (corpus > k)
    val counts = graph.groupBy("vec_id").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSeq === Seq(5L))
    // the scale contract: bounded aggregation, not a window sort — the
    // executed plan must carry an ObjectHashAggregate and no Window
    val plan = graph.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    // r10 scale contract: pair generation is block-wise — a shuffled
    // hash join on the block id, NO corpus-sized broadcast anywhere
    assert(plan.contains("ShuffledHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastExchange"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(2000))
  }

  test("block-wise knn_graph equals the broadcast form at any block count") {
    val emb = Tables.embeddings(spark, sfDir)
    val bcast = Ann.knnGraphBroadcast(emb, k = 5)
    for (blocks <- Seq(1, 7, 32)) {
      val blk = Ann.knnGraph(emb, k = 5, blocks = blocks)
      assert(blk.exceptAll(bcast).isEmpty && bcast.exceptAll(blk).isEmpty,
        s"blocks=$blocks diverged from broadcast form")
    }
  }

  test("knn_graph_lsh is deterministic with recall >= 0.9 vs exact") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Ann.knnGraph(emb, k = 5).select("vec_id", "nbr_id")
    // the documented recall-0.9 banding (the driver entry's pin)
    val approx = Ann.knnGraphLsh(emb, k = 5, bitsPerBand = 3)
      .select("vec_id", "nbr_id")
    val hit = approx.intersect(exact).count().toDouble
    val total = exact.count().toDouble
    assert(hit / total >= 0.9, s"recall ${hit / total}")
    val again = Ann.knnGraphLsh(emb, k = 5, bitsPerBand = 3)
      .select("vec_id", "nbr_id")
    assert(approx.exceptAll(again).isEmpty && again.exceptAll(approx).isEmpty)
  }

  test("knn_graph_lsh auto-banding equals its derived explicit pin") {
    val emb = Tables.embeddings(spark, sfDir)
    // n = 500, k = 5 → bits = ceil(log2(500 / 20)) = 5
    val auto = Ann.knnGraphLsh(emb, k = 5)
    val pinned = Ann.knnGraphLsh(emb, k = 5, bitsPerBand = 5)
    assert(auto.exceptAll(pinned).isEmpty && pinned.exceptAll(auto).isEmpty)
    // narrower buckets keep a useful fraction of the exact graph even
    // on this weakly-clustered corpus, with bounded candidate volume
    val exact = Ann.knnGraph(emb, k = 5).select("vec_id", "nbr_id")
    val hit = auto.select("vec_id", "nbr_id").intersect(exact)
      .count().toDouble
    assert(hit / exact.count() >= 0.5,
      s"auto-banding recall ${hit / exact.count()}")
  }

  test("vec_moments equals the declarative sum bank, exactly on one partition") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val dim = 3
    val rows = Seq(
      Array(1.0, 2.0, -1.0), Array(0.5, 0.0, 4.0), Array(-2.0, 1.0, 0.25))
    // ONE partition: identical addition order on both forms → bit-equal
    val df = rows.toDF("v").coalesce(1)
    val m = df.agg(VectorFunctions.vecMoments(col("v"), dim).as("m"))
      .head().getSeq[Double](0)
    def el(i: Int) = col("v").getItem(i)
    val upper = for { i <- 0 until dim; j <- i until dim } yield (i, j)
    val decl = df.agg(
      count(lit(1)).cast("double").as("n"),
      (0 until dim).map(i => sum(el(i))) ++
        upper.map { case (i, j) => sum(el(i) * el(j)) }: _*).head()
    assert(m(0) === decl.getDouble(0))
    (0 until dim).foreach(i => assert(m(1 + i) === decl.getDouble(1 + i)))
    upper.zipWithIndex.foreach { case ((i, j), k) =>
      assert(m(graft.functions.VecMoments.gramIndex(dim, i, j))
        === decl.getDouble(1 + dim + k),
        s"gram ($i,$j) diverges")
    }
    // the packed layout covers the buffer exactly: last index is (d-1,d-1)
    assert(graft.functions.VecMoments.gramIndex(dim, dim - 1, dim - 1)
      === m.length - 1)
  }
}
