package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann

/** Pointer-doubling SNN clustering (r15, verdict task 1): the scale
  * variant must agree with the fixed-linear-schedule oracle contract
  * wherever that schedule converges, and must NOT share its failure
  * mode (a survivor component of diameter > 25 silently
  * under-merges) — the [[ComponentsFastSpec]] protocol applied to the
  * SNN fold. */
class SnnClusterFastSpec extends AnyFunSuite with SparkFixture {

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("fast ≡ linear on the driver corpus (exact substrate)") {
    val emb = Tables.embeddings(spark, sfDir)
    val g = Exec.materialize(
      Ann.sessionExactGraph(spark, sfDir).select("vec_id", "nbr_id"))
    assert(rows(Ann.knnSnnClusterFast(emb, graph = Some(g)))
      === rows(Ann.knnSnnCluster(emb, graph = Some(g))))
  }

  test("fast ≡ linear on the LSH substrate") {
    val emb = Tables.embeddings(spark, sfDir)
    val g = Exec.materialize(
      Ann.knnGraphLsh(emb, bitsPerBand = 3).select("vec_id", "nbr_id"))
    assert(rows(Ann.knnSnnClusterFast(emb, graph = Some(g)))
      === rows(Ann.knnSnnCluster(emb, graph = Some(g))))
  }

  test("a 40-triangle chain: linear-25 under-merges, fast does not") {
    import spark.implicits._
    // Chain of m vertex-sharing triangles (2i, 2i+1, 2i+2): every edge
    // has a common neighbor, and each surviving edge's open
    // neighborhoods give Jaccard ≥ 1/5 EXCEPT the interior spine
    // (2i, 2i+2) edges (J = 1/7 < 1/5, cut) — so the SNN survivor
    // graph stays connected only through the apex path
    // 2i → 2i+1 → 2i+2, with diameter ≈ 2m. m = 40 → diameter ~80,
    // far past the linear fold's fixed 25 rounds.
    val m = 40
    val tri = (0 until m).flatMap { i =>
      val (a, b, c) = (2L * i, 2L * i + 1, 2L * i + 2)
      Seq((a, b), (b, c), (a, c))
    }
    val edges = tri.flatMap { case (x, y) => Seq((x, y), (y, x)) }
      .toDF("vec_id", "nbr_id")
    val linear = Ann.knnSnnCluster(edges, graph = Some(edges)).collect()
    val fast = Ann.knnSnnClusterFast(edges, graph = Some(edges)).collect()
    // the fixed schedule reports MANY components on the ~80-diameter
    // survivor path — the documented failure mode the fast fold retires
    assert(linear.map(_.getLong(1)).sum > 1,
      "expected the linear schedule to under-merge the survivor chain")
    val n = 2L * m + 1
    assert(fast.length === 1 && fast.head.getLong(0) === n &&
      fast.head.getLong(1) === 1L,
      s"fast fold must return ONE $n-node component, got ${fast.toSeq}")
  }
}
