package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann
import graft.Tables

/** Pins `Ann.jacobiEigen` (the driver-side symmetric eigensolver) and
  * `Ann.embedPca` (the distributed-moments → driver-eigen → plan-literal
  * projection split): a hand-solved 2×2, orthonormality + the eigen
  * equation on a seeded random matrix, planted-axis recovery, variance
  * ordering, and determinism. */
class EmbedPcaSpec extends AnyFunSuite with SparkFixture {

  test("jacobiEigen solves the hand-solvable 2x2 with the sign convention") {
    // [[2,1],[1,2]]: eigenvalues 3, 1; vectors (1,1)/√2 and (1,−1)/√2.
    // Sign rule: the largest-|coordinate| entry (first index on ties)
    // is made positive — so λ=1 yields (+0.7071, −0.7071), not its flip.
    val (vals, vecs) = Ann.jacobiEigen(Array(2.0, 1.0, 1.0, 2.0), 2)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    assert(math.abs(vecs(0)(0) - r) < 1e-12 && math.abs(vecs(0)(1) - r) < 1e-12)
    assert(math.abs(vecs(1)(0) - r) < 1e-12 && math.abs(vecs(1)(1) + r) < 1e-12)
  }

  test("jacobiEigen: orthonormal vectors satisfying A·e = λ·e on a seeded matrix") {
    val dim = 8
    val rnd = new scala.util.Random(7)
    val a = Array.ofDim[Double](dim * dim)
    for (i <- 0 until dim; j <- i until dim) {
      val x = rnd.nextGaussian()
      a(i * dim + j) = x; a(j * dim + i) = x
    }
    val (vals, vecs) = Ann.jacobiEigen(a, dim)
    // eigenvalues sorted descending
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    for (u <- 0 until dim; w <- u until dim) {
      val dot = (0 until dim).map(i => vecs(u)(i) * vecs(w)(i)).sum
      assert(math.abs(dot - (if (u == w) 1.0 else 0.0)) < 1e-8)
    }
    for (j <- 0 until dim; i <- 0 until dim) {
      val av = (0 until dim).map(k => a(i * dim + k) * vecs(j)(k)).sum
      assert(math.abs(av - vals(j) * vecs(j)(i)) < 1e-8)
    }
  }

  test("embedPca recovers a planted dominant axis and orders variance") {
    import spark.implicits._
    // 40 vectors spread along d=(1,1,0,0)/√2 with small orthogonal
    // noise: component 0 must carry far more variance than component 1
    val rnd = new scala.util.Random(11)
    val rows = (0L until 40L).map { i =>
      val t = (i.toDouble - 19.5) / 4.0
      val n1 = rnd.nextGaussian() * 0.05; val n2 = rnd.nextGaussian() * 0.05
      (i, Array((t * 0.7071 + n1 * 0.7071).toFloat,
        (t * 0.7071 - n1 * 0.7071).toFloat, n2.toFloat, 0.0f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Ann.embedPca(emb, dim = 4, outDim = 3)
    val stats = out.agg(
      variance(col("p0")), variance(col("p1")), variance(col("p2"))).head()
    assert(stats.getDouble(0) > 100 * stats.getDouble(1))
    assert(stats.getDouble(1) >= stats.getDouble(2) - 1e-9)
    // projections are centered: each component's mean is ~0 (rounding
    // leaves ≤ 1e-4 per row)
    val means = out.agg(avg(col("p0")), avg(col("p1"))).head()
    assert(math.abs(means.getDouble(0)) < 1e-3)
    assert(math.abs(means.getDouble(1)) < 1e-3)
    // determinism: identical rounded coordinates on a second run
    val a = out.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = Ann.embedPca(emb, dim = 4, outDim = 3)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a === b)
  }

  test("variance ordering holds on the real embeddings table") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Ann.embedPca(emb, outDim = 4)
    assert(out.count() === emb.count())
    val v = out.agg(variance(col("p0")), variance(col("p1")),
      variance(col("p2")), variance(col("p3"))).head()
    val vs = (0 until 4).map(v.getDouble)
    // PCA's defining property, with slack for the 4-decimal rounding
    assert(vs.sliding(2).forall(p => p(0) >= p(1) - 1e-6))
  }

  test("embedSpectrum: planted single axis concentrates the spectrum") {
    import spark.implicits._
    // all variance on dim 0 → share(0) = 1.0, participation ratio = 1
    val vecs = (0 until 16).map { i =>
      (i.toLong, Array.tabulate(4)(d => if (d == 0) i.toFloat else 0f))
    }.toDF("vec_id", "embedding")
    val out = Ann.embedSpectrum(vecs, dim = 4)
      .as[(Int, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.length === 4)
    assert(out(0)._3 === 1.0 && out(0)._4 === 1.0)
    assert(out.drop(1).forall(r => r._2 === 0.0 && r._4 === 1.0))
    assert(out(0)._5 === 1.0)
  }

  test("embedSpectrum on the real table: ordering, closure, PR bounds") {
    val out = Ann.embedSpectrumQ(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    assert(out.length === 64)
    val shares = out.map(_.getDouble(2))
    val vars = out.map(_.getDouble(1))
    assert(vars.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(math.abs(shares.sum - 1.0) < 64 * 5e-5 + 1e-9)
    assert(math.abs(out.last.getDouble(3) - 1.0) < 1e-3)
    val pr = out.head.getDouble(4)
    assert(pr >= 1.0 - 1e-9 && pr <= 64.0 + 1e-9)
    // cum_share is monotone
    val cums = out.map(_.getDouble(3))
    assert(cums.sliding(2).forall(p => p(0) <= p(1) + 1e-9))
  }
}
