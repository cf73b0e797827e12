package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann

/** Pointer-doubling components (r14, verdict task 4): the scale
  * variant must agree with the fixed-linear-schedule oracle contract
  * wherever that schedule converges, and must NOT share its failure
  * mode (diameter > iters silently under-merges). */
class ComponentsFastSpec extends AnyFunSuite with SparkFixture {

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("fast ≡ linear on the driver corpus (exact substrate)") {
    val emb = Tables.embeddings(spark, sfDir)
    assert(rows(Ann.knnComponentsFast(emb)) === rows(Ann.knnComponents(emb)))
  }

  test("fast ≡ linear on the LSH substrate") {
    val emb = Tables.embeddings(spark, sfDir)
    val g = Exec.materialize(
      Ann.knnGraphLsh(emb, bitsPerBand = 3).select("vec_id", "nbr_id"))
    assert(rows(Ann.knnComponentsFast(emb, graph = Some(g)))
      === rows(Ann.knnComponents(emb, graph = Some(g))))
  }

  test("a 300-chain: linear-25 under-merges, pointer doubling does not") {
    import spark.implicits._
    // mutual chain 0-1-2-...-299 (both directions so the mutual filter
    // keeps it); diameter 299 >> 25
    val chain = (0L until 299L).flatMap(i =>
      Seq((i, i + 1), (i + 1, i))).toDF("vec_id", "nbr_id")
    val linear = Ann.knnComponents(chain, graph = Some(chain)).collect()
    val fast = Ann.knnComponentsFast(chain, graph = Some(chain)).collect()
    // the fixed schedule reports MANY components on a 299-diameter
    // chain — the documented failure mode the fast variant retires
    assert(linear.map(r => r.getLong(1)).sum > 1,
      "expected the linear schedule to under-merge the chain")
    assert(fast.length === 1 && fast.head.getLong(0) === 300L &&
      fast.head.getLong(1) === 1L,
      s"pointer doubling must return ONE 300-node component, got ${fast.toSeq}")
  }
}
