package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann

/** r17 optimization pin: the linear components fold's FIXPOINT
  * EARLY-EXIT must be unobservable — byte-identical output to the full
  * fixed schedule on a converging corpus, AND an identical under-merge
  * on a corpus whose diameter exceeds the schedule (where no fixpoint
  * is reached, the early exit must never fire and both paths walk all
  * 25 rounds to the same split labels). */
class LinearFoldEarlyExitSpec extends AnyFunSuite with SparkFixture {

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("earlyExit ≡ fixed schedule on the driver corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    assert(rows(Ann.knnComponents(emb, earlyExit = true))
      === rows(Ann.knnComponents(emb, earlyExit = false)))
  }

  test("earlyExit ≡ fixed schedule through the SNN cut") {
    val emb = Tables.embeddings(spark, sfDir)
    assert(rows(Ann.knnSnnCluster(emb, earlyExit = true))
      === rows(Ann.knnSnnCluster(emb, earlyExit = false)))
  }

  test("no fixpoint ⇒ no early exit: identical under-merge on a 300-chain") {
    import spark.implicits._
    val chain = (0L until 299L).flatMap(i =>
      Seq((i, i + 1), (i + 1, i))).toDF("vec_id", "nbr_id")
    val ee = rows(Ann.knnComponents(chain, graph = Some(chain),
      earlyExit = true))
    val fixed = rows(Ann.knnComponents(chain, graph = Some(chain),
      earlyExit = false))
    assert(ee === fixed)
    // and it IS the documented under-merge, not a converged result
    assert(ee.map(_._2).sum > 1,
      "expected the 299-diameter chain to under-merge at 25 rounds")
  }
}
