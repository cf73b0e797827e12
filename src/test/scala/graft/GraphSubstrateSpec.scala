package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann

/** The r13 substrate contract: every kNN-graph consumer accepts a
  * caller-supplied (vec_id, rank, nbr_id) edge frame, defaulting to the
  * exact [[Ann.knnGraph]] build.
  *
  * Two pins per the VERDICT r12 task:
  *  - IDENTITY: feeding the exact graph explicitly reproduces the
  *    default path bit-for-bit — the parameterized path IS the path,
  *    not a fork.
  *  - LSH SUBSTRATE: feeding [[Ann.knnGraphLsh]] at the recall-0.9
  *    banding (bitsPerBand = 3, the TopKAggSpec recall pin's corpus and
  *    config) keeps the consumer-level answers close to the exact
  *    substrate's — the evidence that the 100 TB path (LSH build, no n²
  *    scoring) serves the same analytics, not just the same edge shape.
  */
class GraphSubstrateSpec extends AnyFunSuite with SparkFixture {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val exactG =
    graft.Exec.materialize(Ann.knnGraph(emb, k = 5))
  private lazy val lshG =
    graft.Exec.materialize(Ann.knnGraphLsh(emb, k = 5, bitsPerBand = 3))

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("explicit exact substrate reproduces every consumer's default path") {
    val pairs: Seq[(String, (DataFrame, DataFrame))] = Seq(
      "reciprocity" -> (Ann.knnReciprocity(emb, 5),
        Ann.knnReciprocity(emb, 5, Some(exactG))),
      "confusion" -> (Ann.knnConfusion(emb, 5),
        Ann.knnConfusion(emb, 5, Some(exactG))),
      "hubness" -> (Ann.knnHubness(emb, 5),
        Ann.knnHubness(emb, 5, Some(exactG))),
      "modularity" -> (Ann.knnModularity(emb, 5),
        Ann.knnModularity(emb, 5, Some(exactG))),
      "triangles" -> (Ann.knnTriangles(emb, 5),
        Ann.knnTriangles(emb, 5, Some(exactG))),
      "assortativity" -> (Ann.knnAssortativity(emb, 5),
        Ann.knnAssortativity(emb, 5, Some(exactG))),
      "cluster" -> (Ann.knnCluster(emb, 5),
        Ann.knnCluster(emb, 5, Some(exactG))),
      "pagerank" -> (Ann.knnPagerank(emb, 5),
        Ann.knnPagerank(emb, 5, graph = Some(exactG))),
      "labelprop" -> (Ann.knnLabelProp(emb, 5),
        Ann.knnLabelProp(emb, 5, graph = Some(exactG))),
      "coreset" -> (Ann.knnCoreset(emb, 5),
        Ann.knnCoreset(emb, 5, Some(exactG))),
      "quality" -> (Ann.knnQualityScore(docs, emb, 5),
        Ann.knnQualityScore(docs, emb, 5, Some(exactG))),
      "intrinsic_dim" -> (Ann.embedIntrinsicDim(emb),
        Ann.embedIntrinsicDim(emb, graph = Some(exactG))),
      "edge_jaccard" -> (Ann.knnEdgeJaccard(emb, 5),
        Ann.knnEdgeJaccard(emb, 5, graph = Some(exactG))))
    pairs.foreach { case (name, (dflt, explicitPath)) =>
      assert(sameRows(dflt, explicitPath), s"$name diverged")
    }
  }

  test("sessionLshGraph equals a fresh knnGraphLsh build exactly") {
    // r17 (verdict task 2): the four *_lsh driver entries serve the
    // 16×3-band substrate from a per-JVM session store instead of
    // rebuilding it in-query; the store must be a bit-exact
    // materialization of the fresh build (integer columns only, so the
    // parquet round-trip cannot perturb anything) — the
    // sessionExactGraph/sessionBruteTruth contract extended to the
    // LSH family.
    val fresh = Ann.knnGraphLsh(emb, k = 5, bitsPerBand = 3)
    val stored = Ann.sessionLshGraph(spark, sfDir)
    assert(sameRows(fresh, stored))
  }

  test("LSH substrate tracks the exact substrate at consumer level") {
    // reciprocity: same node universe, ratio within the recall gap
    val rE = Ann.knnReciprocity(emb, 5, Some(exactG)).head()
    val rL = Ann.knnReciprocity(emb, 5, Some(lshG)).head()
    assert(rL.getAs[Long]("n_nodes") === rE.getAs[Long]("n_nodes"))
    assert(math.abs(rL.getAs[Double]("reciprocity") -
      rE.getAs[Double]("reciprocity")) <= 0.15,
      s"reciprocity ${rL.getAs[Double]("reciprocity")} vs ${rE.getAs[Double]("reciprocity")}")

    // hubness: per-node in-degree within the recall tolerance on average
    val hE = Ann.knnHubness(emb, 5, Some(exactG))
      .select(col("vec_id"), col("in_degree").as("de"))
    val hL = Ann.knnHubness(emb, 5, Some(lshG))
      .select(col("vec_id"), col("in_degree").as("dl"))
    val meanAbs = hE.join(hL, "vec_id")
      .agg(avg(abs(col("de") - col("dl")))).head().getDouble(0)
    assert(meanAbs <= 1.0, s"mean |in_degree gap| $meanAbs")

    // confusion: the global accuracy (diag mass share) moves < 5 pts
    def acc(g: DataFrame): Double = {
      val m = Ann.knnConfusion(emb, 5, Some(g))
        .agg(sum(when(col("is_correct"), col("n")).otherwise(0L))
          .cast("double"),
          sum(col("n")).cast("double")).head()
      m.getDouble(0) / m.getDouble(1)
    }
    assert(math.abs(acc(exactG) - acc(lshG)) <= 0.05)

    // intrinsic dimension: the global MLE is a corpus-level constant —
    // the approximate neighborhood must not move it materially
    def mlid(g: Option[DataFrame]): Double =
      Ann.embedIntrinsicDim(emb, graph = g)
        .filter(col("k") === 5).head().getAs[Double]("mlid_global")
    val (mE, mL) = (mlid(Some(exactG)), mlid(Some(lshG)))
    assert(math.abs(mE - mL) / mE <= 0.1, s"mlid_global $mE vs $mL")

    // pagerank: rank mass is conserved regardless of substrate (the
    // nano-unit iteration's invariant), and the top-decile overlap is
    // high — centrality survives the approximate build
    val pE = Ann.knnPagerank(emb, 5, graph = Some(exactG))
    val pL = Ann.knnPagerank(emb, 5, graph = Some(lshG))
    val n = emb.count()
    val topE = pE.orderBy(col("pr_nano").desc, col("vec_id"))
      .limit((n / 10).toInt).select("vec_id")
    val topL = pL.orderBy(col("pr_nano").desc, col("vec_id"))
      .limit((n / 10).toInt).select("vec_id")
    val overlap = topE.intersect(topL).count().toDouble / (n / 10).toDouble
    assert(overlap >= 0.6, s"top-decile pagerank overlap $overlap")
  }
}
