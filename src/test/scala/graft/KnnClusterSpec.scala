package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann

/** Pins the semantics of the mutual-kNN cluster / hubness pair
  * (`Ann.knnCluster`, `Ann.knnHubness`) on a hand-verifiable fixture:
  *
  * Five 2-d unit-ish vectors, k=1. Cosine table (worked by hand; every
  * decisive margin ≥ 0.01, far above float noise):
  *
  *   A=0:(1,0)  H=1:(.8,.6)  C=2:(.79,.61)  D=3:(-1,0)  E=4:(0,1)
  *
  *   top-1 edges: A→H (.8 > .7915), H→C (.9999), C→H (.9999),
  *                D→E (0 > -.7915), E→C (.6112 > .6)
  *
  * so H is a HUB CHAIN target: A ranks H but H does not rank A back,
  * and the only MUTUAL pair in the whole graph is H↔C. */
class KnnClusterSpec extends AnyFunSuite with SparkFixture {

  private def fixture = {
    import spark.implicits._
    Seq(
      (0L, Array(1.00f, 0.00f)),  // A
      (1L, Array(0.80f, 0.60f)),  // H — ranked by A and C
      (2L, Array(0.79f, 0.61f)),  // C — ranked by H and E
      (3L, Array(-1.00f, 0.00f)), // D — far; ranked by nobody
      (4L, Array(0.00f, 1.00f))   // E — ranked only by D
    ).toDF("vec_id", "embedding")
  }

  test("knn_cluster: mutuality excludes asymmetric hub edges; singletons label themselves") {
    val out = Ann.knnCluster(fixture, k = 1)
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    // A→H is asymmetric (H's own top-1 is C), so A must NOT join H's
    // cluster — mutuality kills the hub-induced chain
    assert(out(0L) === 0L)
    // the one mutual pair H↔C forms the one non-trivial cluster,
    // labeled by its minimum vec_id
    assert(out(1L) === 1L && out(2L) === 1L)
    // D→E and E→C are both asymmetric: singleton clusters = own vec_id
    assert(out(3L) === 3L && out(4L) === 4L)
    assert(out.size === 5)
  }

  test("knn_hubness: zero-degree rows present, is_hub exactly at in_degree >= 2k") {
    val out = Ann.knnHubness(fixture, k = 1)
      .as[(Long, Long, Boolean)](
        org.apache.spark.sql.Encoders.product[(Long, Long, Boolean)])
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // H and C each collect two reverse neighbors = 2k at k=1 → hubs
    assert(out(1L) === ((2L, true)))
    assert(out(2L) === ((2L, true)))
    // E sits at degree 1, one below the threshold → NOT a hub
    assert(out(4L) === ((1L, false)))
    // A and D are ranked by nobody: the zero-degree anti-hub rows must
    // appear explicitly (right-join semantics), not vanish
    assert(out(0L) === ((0L, false)))
    assert(out(3L) === ((0L, false)))
    assert(out.size === 5)
  }

  test("knn_cluster/hubness invariants hold on the real embeddings table") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val k = 3
    val clusters = Ann.knnCluster(emb, k)
    assert(clusters.count() === n) // one row per corpus vector, always
    // every cluster label is the minimum vec_id OF ITS OWN cluster —
    // so the label row itself is a member (labels are real vectors)
    val bad = clusters.groupBy(col("cluster"))
      .agg(min(col("vec_id")).as("lo"))
      .filter(col("cluster") =!= col("lo"))
    assert(bad.isEmpty)
    val hub = Ann.knnHubness(emb, k)
    assert(hub.count() === n)
    // the exact graph emits exactly k edges per node (n > k here), so
    // reverse degrees must sum to n·k and the flag must match 2k
    val agg = hub.agg(sum(col("in_degree")),
      sum(when(col("is_hub") =!= (col("in_degree") >= 2 * k), 1)
        .otherwise(0))).head()
    assert(agg.getLong(0) === n * k)
    assert(agg.getLong(1) === 0L)
  }

  test("knn_pagerank: hand fixture — mutual pair holds its fixed point, isolates floor") {
    val out = Ann.knnPagerank(fixture, k = 1)
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    // n=5 in nano-units: init 200 000 000, base floor 30 000 000. The
    // one mutual pair H↔C each has degree 1, so pr' = base + 85%·pr —
    // and the uniform init IS the fixed point (30M + 170M = 200M).
    // Isolated A, D, E drop to the floor after round 1.
    assert(out(1L) === 200000000L && out(2L) === 200000000L)
    assert(out(0L) === 30000000L && out(3L) === 30000000L
      && out(4L) === 30000000L)
  }

  test("knn_pagerank on the real corpus: floor, coverage, boundedness") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Ann.knnPagerankQ(spark, sfDir)
    val n = emb.count()
    assert(out.count() === n)
    val floorU = 15L * (1000000000L / n) / 100L
    assert(out.filter(col("pr_nano") < floorU).isEmpty)
    // no node can hold more than floor + 85% of total mass
    assert(out.filter(col("pr_nano") > floorU + 850000000L).isEmpty)
  }

  test("knn_coreset: centrality-ranked representative per cluster, full coverage") {
    val out = Ann.knnCoreset(fixture, k = 1)
      .as[(Long, Long, Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)])
      .collect().map(r => r._1 -> r).toMap
    // the H↔C cluster: both at the 200M fixed point — vec_id breaks the
    // tie, H (=1) represents, size 2
    assert(out(1L) === ((1L, 1L, 200000000L, 2L)))
    // singletons represent themselves at the floor
    assert(out(0L) === ((0L, 0L, 30000000L, 1L)))
    assert(out(3L) === ((3L, 3L, 30000000L, 1L)))
    assert(out(4L) === ((4L, 4L, 30000000L, 1L)))
    // the coreset covers the corpus: sizes sum to n
    assert(out.values.map(_._4).sum === 5L)
  }

  test("embed_centroid_classify: separable clusters classify perfectly") {
    import spark.implicits._
    // two tight clusters on orthogonal axes, 64-d; seeds = ids % 10 == 0
    def vec(axis: Int, i: Int) =
      Array.tabulate(64)(d => if (d == axis) 1.0f else 0.001f * i)
    val vecs = ((0 until 20).map(i => (i.toLong, vec(0, i), 0)) ++
      (20 until 40).map(i => (i.toLong, vec(7, i), 1)))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.embedCentroidClassify(vecs)
      .as[(Int, Int, Long, Double)].collect()
    assert(out.forall(r => r._1 === r._2), out.mkString(","))
    assert(out.forall(_._4 === 1.0))
    // holdout only: 4 seeds excluded → 36 evaluated rows total
    assert(out.map(_._3).sum === 36L)
  }

  test("embed_centroid_classify on the real corpus: closure and bounds") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Ann.embedCentroidClassifyQ(spark, sfDir)
    val holdout = emb.filter(col("vec_id") % 10 =!= 0).count()
    assert(out.agg(sum(col("n"))).head().getLong(0) === holdout)
    val acc = out.select("accuracy").head().getDouble(0)
    assert(acc >= 0.0 && acc <= 1.0)
    // every predicted label is a label some seed carries
    import spark.implicits._
    val seedLabels = emb.filter(col("vec_id") % 10 === 0)
      .select("label").distinct().as[Int].collect().toSet
    val preds = out.select("label_pred").distinct().as[Int].collect().toSet
    assert(preds.subsetOf(seedLabels))
  }

  test("knn_quality_score: hand-worked neighborhood means at k=1") {
    import spark.implicits._
    // quality_score = min(n_tokens/64, 1) · (1 − punct/chars); all-alpha
    // texts keep the punct term at 1, so quality = n_tokens/64 exactly
    val docs = Seq(
      (0L, "aa bb"),                       // 2 tokens → 0.03125 → 0.0313
      (1L, "aa bb cc dd"),                 // 4 tokens → 0.0625
      (2L, "aa bb cc dd ee ff gg hh")      // 8 tokens → 0.125
    ).toDF("doc_id", "text")
    val vecs = Seq(
      (0L, Array(1.00f, 0.00f)),  // top-1: vec 1 (cos .8 > 0)
      (1L, Array(0.80f, 0.60f)),  // top-1: vec 0 (.8 > .6)
      (2L, Array(0.00f, 1.00f))   // top-1: vec 1 (.6 > 0)
    ).toDF("vec_id", "embedding")
    val out = Ann.knnQualityScore(docs, vecs, k = 1)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.values.forall(_._2 === 1L))
    assert(out(0L)._3 === 0.0313 && out(0L)._4 === 0.0625)
    assert(out(0L)._5 === -0.0312)             // 0.0313 − 0.0625
    assert(out(1L)._4 === 0.0313)              // neighbor is doc 0
    assert(out(2L)._3 === 0.125 && out(2L)._4 === 0.0625)
    assert(out(2L)._5 === 0.0625)
  }

  test("knn_quality_score on the real corpus: bounded and consistent") {
    val out = Ann.knnQualityScoreQ(spark, sfDir)
    val bad = out.filter(
      col("n_nbrs") < 1 || col("n_nbrs") > 5 ||
        col("own_quality") < 0 || col("own_quality") > 1 ||
        col("knn_quality") < 0 || col("knn_quality") > 1 ||
        abs(col("quality_gap") - round(col("own_quality") - col("knn_quality"), 4)) > 1e-9)
    assert(bad.isEmpty)
  }
}
