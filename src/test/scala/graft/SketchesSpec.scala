package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sketches

class SketchesSpec extends AnyFunSuite with SparkFixture {

  private def ests(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("sketch-table rollup == direct coarse sketch, exactly") {
    val d = Tables.documents(spark, sfDir)
    val viaTable = ests(Sketches.rollupByLang(Sketches.sketchTable(d)))
    val direct = ests(Sketches.directByLang(d))
    assert(viaTable === direct,
      "HLL union-of-fine-sketches must equal the direct coarse sketch")
  }

  test("incrementally-built sketch tables merge to the same rollup") {
    val d = Tables.documents(spark, sfDir)
    // two "daily" increments, sketched independently, then unioned — the
    // way a 100 TB pipeline accumulates the table without re-reading history
    val day1 = Sketches.sketchTable(d.filter(col("doc_id") % 2 === 0))
    val day2 = Sketches.sketchTable(d.filter(col("doc_id") % 2 === 1))
    val merged = ests(Sketches.rollupByLang(day1.unionByName(day2)))
    assert(merged === ests(Sketches.directByLang(d)))
  }

  test("estimates land within 5% of exact distinct counts") {
    val d = Tables.documents(spark, sfDir)
    val exact = d.groupBy(col("lang"))
      .agg(countDistinct(col("text")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = ests(Sketches.rollupByLang(Sketches.sketchTable(d)))
    exact.foreach { case (lang, n) =>
      val e = est(lang)._1
      assert(math.abs(e - n).toDouble / n < 0.05,
        s"lang=$lang exact=$n est=$e drifts > 5%")
    }
  }
}
