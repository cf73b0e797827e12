package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann
import graft.Tables

/** Pins `Ann.knnLabelProp`'s propagation semantics on hand-verifiable
  * 2-d fixtures (all margins worked by angle, far above float noise):
  * synchronous per-iteration spread along a mutual chain, the
  * (count DESC, label ASC) vote order, seed immutability, and the -1
  * never-reached sentinel. */
class KnnLabelPropSpec extends AnyFunSuite with SparkFixture {

  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  /** A mutual path 0–1–2–3 (angles 0/5/10/15, k=2) plus an isolated
    * far pair 4–5 (175/180). Seed set at seedMod=10 is exactly {0}. */
  private def chain = {
    import spark.implicits._
    Seq(
      (0L, vec(0), 7), (1L, vec(5), 0), (2L, vec(10), 0),
      (3L, vec(15), 0), (4L, vec(175), 0), (5L, vec(180), 0)
    ).toDF("vec_id", "embedding", "label")
  }

  test("labels spread one mutual hop per synchronous iteration; unreached stays -1") {
    val out3 = Ann.knnLabelProp(chain, k = 2, iters = 3, seedMod = 10)
      .as[(Long, Int, Boolean)](
        org.apache.spark.sql.Encoders.product[(Long, Int, Boolean)])
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // seed keeps its own label and carries the flag
    assert(out3(0L) === ((7, true)))
    // the chain is three hops deep: all reached by iteration 3
    assert(out3(1L) === ((7, false)))
    assert(out3(2L) === ((7, false)))
    assert(out3(3L) === ((7, false)))
    // the far pair has no labeled neighbor at any round
    assert(out3(4L) === ((-1, false)))
    assert(out3(5L) === ((-1, false)))
    // synchronicity: with iters=2 the third hop must NOT be reached yet
    val out2 = Ann.knnLabelProp(chain, k = 2, iters = 2, seedMod = 10)
      .as[(Long, Int, Boolean)](
        org.apache.spark.sql.Encoders.product[(Long, Int, Boolean)])
      .collect().map(r => r._1 -> r._2).toMap
    assert(out2(2L) === 7)
    assert(out2(3L) === -1)
  }

  test("vote ties break to the smallest label; majority beats label order") {
    import spark.implicits._
    // T=1 (0°) is mutual with seeds A=2 (6°, label 5) and B=4 (−6°,
    // label 3) at k=2 — a 1:1 tie, so the SMALLER label 3 must win
    val tie = Seq(
      (1L, vec(0), 0), (2L, vec(6), 5), (4L, vec(-6), 3)
    ).toDF("vec_id", "embedding", "label")
    val t = Ann.knnLabelProp(tie, k = 2, iters = 1, seedMod = 2)
      .filter(col("vec_id") === 1L).select("label").head().getInt(0)
    assert(t === 3)
    // T=1 (0°) mutual with 9/9/1-labeled seeds at k=3: count 2 beats
    // count 1 even though label 1 < label 9
    val maj = Seq(
      (1L, vec(0), 0), (2L, vec(5), 9), (4L, vec(-5), 9), (6L, vec(10), 1)
    ).toDF("vec_id", "embedding", "label")
    val m = Ann.knnLabelProp(maj, k = 3, iters = 1, seedMod = 2)
      .filter(col("vec_id") === 1L).select("label").head().getInt(0)
    assert(m === 9)
  }

  test("invariants on the real embeddings table") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val out = Ann.knnLabelProp(emb, k = 3, iters = 2)
    assert(out.count() === n) // one row per vector, always
    // seeds keep exactly their own label
    val seedBad = out.filter(col("is_seed"))
      .join(emb.select(col("vec_id"), col("label").as("orig")), "vec_id")
      .filter(col("label") =!= col("orig"))
    assert(seedBad.isEmpty)
    // every propagated label is -1 or a real seed label (labels never
    // invent values), and the labeled set only grows with iterations
    val seedLabels = emb.filter(col("vec_id") % 10 === 0)
      .select("label").distinct()
      .collect().map(_.getInt(0)).toSet
    val propLabels = out.filter(!col("is_seed") && col("label") =!= -1)
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(propLabels.subsetOf(seedLabels))
    val n1 = Ann.knnLabelProp(emb, k = 3, iters = 1)
      .filter(col("label") =!= -1).count()
    val n2 = out.filter(col("label") =!= -1).count()
    assert(n1 <= n2)
  }
}
