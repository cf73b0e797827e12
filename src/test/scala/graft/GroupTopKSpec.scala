package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GroupTopK

class GroupTopKSpec extends AnyFunSuite with SparkFixture {

  test("two-phase top-k == naive window on real events, any layout") {
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "event_id", "value")
    val ordering = Seq(col("value").desc, col("event_id").asc)
    def naive(df: org.apache.spark.sql.DataFrame, k: Int) = {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(ordering: _*)))
        .filter(col("rn") <= k).drop("rn")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (k <- Seq(1, 7, 100)) {
      val want = rows(naive(ev, k))
      assert(rows(GroupTopK.topK(ev, Seq("event_type"), ordering, k)) === want)
      // layout-independence: a hostile repartition changes nothing
      assert(rows(GroupTopK.topK(ev.repartition(17, col("value")),
        Seq("event_type"), ordering, k)) === want, s"k=$k repartitioned")
    }
  }

  test("the engine bounds the shuffle map-side (WindowGroupLimit Partial)") {
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "event_id", "value")
    val plan = GroupTopK.topK(ev, Seq("event_type"),
        Seq(col("value").desc, col("event_id").asc), 5)
      .queryExecution.executedPlan.toString
    // the whole reason topK is a plain window: InferWindowGroupLimit must
    // have inserted the pre-exchange partial limit. If this disappears
    // (engine upgrade, pattern change), the operator needs the manual
    // two-phase construction back.
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"map-side group limit missing from plan:\n$plan")
    // a collision-prone input column is preserved, not clobbered
    val withCol = ev.withColumn("__gtk0", lit(7))
    val out = GroupTopK.topK(withCol, Seq("event_type"),
      Seq(col("value").desc, col("event_id").asc), 3)
    assert(out.columns.contains("__gtk0"))
    assert(out.select("__gtk0").distinct().collect().map(_.getInt(0)).toSeq === Seq(7))
  }

  test("randomized cross-check vs plain-Scala sort") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 3) {
      val rows = (1 to 300).map(i =>
        (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(50)))
      val k = 1 + rnd.nextInt(6)
      val expected = rows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(r => (-r._3, r._2)).take(k)
      }.toSet
      val got = GroupTopK.topK(rows.toDF("grp", "id", "score"),
          Seq("grp"), Seq(col("score").desc, col("id").asc), k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === expected, s"trial $trial k=$k")
    }
  }
}
