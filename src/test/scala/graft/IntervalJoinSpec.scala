package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite with SparkFixture {

  private def purchases = Tables.events(spark, sfDir)
    .filter(col("event_type") === "purchase")
    .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))

  private def incidents = Tables.events(spark, sfDir)
    .filter(col("event_type") === "error")
    .select(col("event_id").as("incident_id"), col("ts").as("i_start"),
      (col("ts") + expr("INTERVAL 15 MINUTES")).as("i_end"))

  /** Ground truth: the plan Spark would pick unaided — a nested-loop
    * range join. Only viable at test scale, which is the point. */
  private def naive(endInclusive: Boolean) = {
    val upper =
      if (endInclusive) col("p_ts") <= col("i_end")
      else col("p_ts") < col("i_end")
    purchases.crossJoin(incidents)
      .filter(col("p_ts") >= col("i_start") && upper)
      .select("purchase_id", "incident_id")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("purchase_id", "incident_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bin-overlap join == naive range join (exclusive end)") {
    val got = pairs(IntervalJoin.join(purchases, "p_ts",
      incidents, "i_start", "i_end"))
    assert(got.nonEmpty, "test data produced no overlapping pairs")
    assert(got === pairs(naive(endInclusive = false)))
  }

  test("inclusive-end semantics match the naive join") {
    val got = pairs(IntervalJoin.join(purchases, "p_ts",
      incidents, "i_start", "i_end", endInclusive = true))
    assert(got === pairs(naive(endInclusive = true)))
  }

  test("result is bin-width invariant (intervals spanning many bins)") {
    val expected = pairs(naive(endInclusive = false))
    // 1-minute bins: every 15-min interval explodes to ~16 bins
    assert(pairs(IntervalJoin.join(purchases, "p_ts", incidents,
      "i_start", "i_end", binMicros = 60L * 1000 * 1000)) === expected)
    // 6-hour bins: many intervals share one bin
    assert(pairs(IntervalJoin.join(purchases, "p_ts", incidents,
      "i_start", "i_end", binMicros = 6L * 3600 * 1000 * 1000)) === expected)
  }

  test("empty intervals are dropped, not walked backward") {
    import spark.implicits._
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("lid", "t")
    val r = Seq(
      (10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), // empty [s, s)
      (11L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))  // inverted
    ).toDF("rid", "s", "e")
    assert(IntervalJoin.join(l, "t", r, "s", "e").count() === 0)
    // inclusive: [s, s] contains s
    assert(IntervalJoin.join(l, "t", r, "s", "e", endInclusive = true)
      .select("rid").collect().map(_.getLong(0)).toSeq === Seq(10L))
  }

  test("the plan is an equi-join on the bin, never a nested loop") {
    val p = IntervalJoin.join(purchases, "p_ts", incidents, "i_start", "i_end")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop join in plan")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"no hash/merge equi-join found:\n$p")
  }

  test("salted join == unsalted at several salt counts") {
    val expected = pairs(IntervalJoin.join(purchases, "p_ts",
      incidents, "i_start", "i_end"))
    Seq(1, 3, 8).foreach { s =>
      assert(pairs(IntervalJoin.joinSalted(purchases, "p_ts", incidents,
        "i_start", "i_end", salts = s)) === expected, s"salts=$s diverged")
    }
    // inclusive-end flows through the salted path too
    assert(pairs(IntervalJoin.joinSalted(purchases, "p_ts", incidents,
      "i_start", "i_end", endInclusive = true, salts = 4)) ===
      pairs(naive(endInclusive = true)))
  }

  test("a STREAMING point side joins static intervals unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val inputDir = tmpDir("ivj_in_")
    def write(f: String, rows: (Long, String)*): Unit =
      rows.toDF("pid", "p_ts")
        .withColumn("p_ts", col("p_ts").cast("timestamp"))
        .coalesce(1).write.parquet(s"$inputDir/$f")
    write("f0", (1L, "2024-01-01 10:05:00"), (2L, "2024-01-01 11:00:00"))
    write("f1", (3L, "2024-01-01 10:14:59"), (4L, "2024-01-01 10:15:00"))
    val incidents = Seq((100L, "2024-01-01 10:00:00", "2024-01-01 10:15:00"))
      .toDF("incident_id", "i_s", "i_e")
      .select(col("incident_id"), col("i_s").cast("timestamp").as("i_s"),
        col("i_e").cast("timestamp").as("i_e"))
    val schema = spark.read.parquet(s"$inputDir/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
    // the same operator, applied verbatim to a streaming left side —
    // the bin column is a stateless projection and the equi-join is a
    // supported stream-static inner join, so the CDC-style continuous
    // pipeline gets interval enrichment for free
    val q = IntervalJoin.join(stream, "p_ts", incidents, "i_s", "i_e")
      .select("pid", "incident_id")
      .writeStream.format("memory").queryName("ivj")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ivj_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("ivj").as[(Long, Long)].collect().toSet
    // 1 and 3 are inside [10:00, 10:15); 2 is far out; 4 sits on the
    // exclusive end
    assert(got === Set((1L, 100L), (3L, 100L)))
  }

  test("overlapping column names are rejected up front") {
    val ev = Tables.events(spark, sfDir)
    intercept[IllegalArgumentException] {
      IntervalJoin.join(ev, "ts", ev, "ts", "ts")
    }
  }
}
