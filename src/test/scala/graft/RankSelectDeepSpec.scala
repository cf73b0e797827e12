package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankSelect

/** Fused two-level binning in [[RankSelect]] (r15, verdict task 4):
  * on a continuous domain a one-level histogram's located bucket holds
  * ~n/buckets DISTINCT values — the fine level must shrink the final
  * window to ~n/buckets², and the two-level selection must return
  * EXACTLY what a direct sort would. */
class RankSelectDeepSpec extends AnyFunSuite with SparkFixture {

  test("two-level path ≡ truth for every rank (buckets=4, 100 distinct)") {
    import spark.implicits._
    // 100 distinct values, buckets=4 → 16 fine bins, every coarse
    // bucket holds ~25 distinct values > 4 — the fine level carries
    // real residual accounting for EVERY rank. Values are a
    // deterministic shuffle (i*37 mod 100) so bucket boundaries don't
    // align with insertion order.
    val vals = (0 until 100).map(i => ((i * 37) % 100).toLong)
    val df = vals.toDF("v")
    val ranksOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => array((1 to 100).map(r => lit(r.toLong)): _*)
    val got = RankSelect.selectValues(df, Seq.empty, "v", ranksOf,
      buckets = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // rank r (1-based) over sorted 0..99 is r-1
    assert(got.length === 100)
    for ((ridx, v) <- got) assert(v === ridx.toLong,
      s"rank index $ridx selected $v")
  }

  test("two-level path with groups and ties ≡ direct truth") {
    import spark.implicits._
    // two groups; group a: 60 distinct values ×2 copies (ties collapse
    // in the final frame), group b: 7 distinct values (near-collapsed
    // regime) — both regimes in one call
    val a = (0 until 120).map(i => ("a", (i % 60).toLong))
    val b = (0 until 7).map(i => ("b", i.toLong * 10))
    val df = (a ++ b).toDF("g", "v")
    val med = RankSelect.selectValues(df, Seq("g"), "v",
      RankSelect.lowMedian, buckets = 4).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    // a: 120 rows, rank 60 over value i%60 ×2 → value 29; b: rank 4 → 30
    assert(med === Map("a" -> 29L, "b" -> 30L))
  }

  test("weighted two-level path ≡ expansion truth") {
    import spark.implicits._
    // 50 distinct values, weight i+1 → total weight 1275; buckets=4
    // forces recursion; the rank-638 value of the expanded multiset
    // (cumulative i(i+1)/2 ≥ 638 → i = 35 since 35·36/2 = 630 < 638
    // ≤ 36·37/2 = 666 → value 35)
    val df = (0 until 50).map(i => (i.toLong, (i + 1).toLong))
      .toDF("v", "w")
    val got = RankSelect.selectValuesWeighted(df, Seq.empty, "v", "w",
      RankSelect.lowMedian, buckets = 4).collect()
    assert(got.length === 1 && got.head.getLong(1) === 35L)
  }

  test("continuous-domain smoke: 2M unique doubles, default buckets") {
    // a one-level histogram would leave ≈ 2M/1024 ≈ 1953 distinct
    // values in the final window; the fine level (1024² bins) leaves
    // ~2 — and the selected values must still be exact
    val df = spark.range(2000000L)
      .select((col("id").cast("double") * lit(0.001)).as("v"))
    val qs = Seq(0.5, 0.99)
    val ranksOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => array(qs.map(q =>
        ceil(lit(q) * n.cast("double")).cast("long")): _*)
    val got = RankSelect.selectValues(df, Seq.empty, "v", ranksOf)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    // rank 1000000 → id 999999; rank 1980000 → id 1979999
    assert(got(0) === 999999 * 0.001)
    assert(got(1) === 1979999 * 0.001)
  }
}
