package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamIntervalJoin

class StreamIntervalJoinSpec extends AnyFunSuite with SparkFixture {

  private def sides() = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("ts").as("i_start"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("i_end"))
    (purchases, incidents)
  }

  test("stream-stream interval join == the batch bin join, via symmetric hash state") {
    val (purchases, incidents) = sides()
    val pDir = tmpDir("ssij_p_"); val iDir = tmpDir("ssij_i_")
    purchases.coalesce(1).write.parquet(s"$pDir/f0")
    incidents.coalesce(1).write.parquet(s"$iDir/f0")
    val pS = spark.readStream.schema(purchases.schema).parquet(s"$pDir/f*")
    val iS = spark.readStream.schema(incidents.schema).parquet(s"$iDir/f*")
    val q = StreamIntervalJoin.join(pS, "p_ts", iS, "i_start", "i_end")
      .select("purchase_id", "incident_id")
      .writeStream.format("memory").queryName("ssij")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ssij_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(progress.nonEmpty &&
      progress.flatMap(_.stateOperators).exists(
        _.operatorName.toLowerCase.contains("symmetrichashjoin")),
      "join did not run through the streaming symmetric hash join operator")
    val got = spark.table("ssij")
    val want = graft.operators.IntervalJoin
      .join(purchases, "p_ts", incidents, "i_start", "i_end")
      .select("purchase_id", "incident_id")
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("batch passthrough of the streaming operator equals the batch operator") {
    val (purchases, incidents) = sides()
    val batch = StreamIntervalJoin
      .join(purchases, "p_ts", incidents, "i_start", "i_end")
      .select("purchase_id", "incident_id")
    val want = graft.operators.IntervalJoin
      .join(purchases, "p_ts", incidents, "i_start", "i_end")
      .select("purchase_id", "incident_id")
    assert(batch.exceptAll(want).isEmpty && want.exceptAll(batch).isEmpty)
  }

  test("over-horizon intervals are dropped, not silently mis-joined") {
    val (purchases, incidents) = sides()
    // stretch every interval past the 1 HOUR horizon → all dropped
    val longIncidents = incidents
      .withColumn("i_end", col("i_start") + expr("INTERVAL 2 HOURS"))
    assert(StreamIntervalJoin
      .join(purchases, "p_ts", longIncidents, "i_start", "i_end")
      .count() === 0)
    // widening the horizon brings them back, equal to the batch operator
    val wide = StreamIntervalJoin.join(purchases, "p_ts", longIncidents,
      "i_start", "i_end", maxLen = "4 HOUR")
      .select("purchase_id", "incident_id")
    val want = graft.operators.IntervalJoin
      .join(purchases, "p_ts", longIncidents, "i_start", "i_end")
      .select("purchase_id", "incident_id")
    assert(wide.exceptAll(want).isEmpty && want.exceptAll(wide).isEmpty)
  }
}
