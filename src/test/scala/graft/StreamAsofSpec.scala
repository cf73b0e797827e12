package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamAsof
import graft.streaming.StreamAsof.EnrichEvent

class StreamAsofSpec extends AnyFunSuite with SparkFixture {

  private def evDs = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .as[EnrichEvent]
  }

  test("batch enrichment equals the batch as-of join on real events") {
    import spark.implicits._
    implicit val s = spark
    val got = StreamAsof.enrich(evDs)
      .select("event_id", "click_event_id").as[(Long, Long)]
      .collect().toMap
    val want = graft.operators.AsofJoin.eventsAsofQ(spark, sfDir)
      .select("event_id", "click_event_id").as[(Long, Long)]
      .collect().toMap
    assert(got === want)
  }

  test("streaming enrichment carries the last click across micro-batches") {
    import spark.implicits._
    implicit val s = spark
    val inputDir = tmpDir("sasof_in_")
    def write(f: String, rows: (Long, String, Long, String, Double)*): Unit =
      rows.toDF("user_id", "ts", "event_id", "event_type", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
        .coalesce(1).write.parquet(s"$inputDir/$f")
    // batch 0: a click; batch 1: a purchase after it, a click tying a
    // purchase's exact ts (strict → invisible), and an unrelated user
    write("f0", (1L, "2024-01-01 10:00:00", 100L, "click", 0.0))
    write("f1",
      (1L, "2024-01-01 10:05:00", 101L, "purchase", 9.99),
      (2L, "2024-01-01 10:06:00", 200L, "click", 0.0),
      (2L, "2024-01-01 10:06:00", 201L, "purchase", 5.0))
    val schema = spark.read.parquet(s"$inputDir/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inputDir/f*")
      .as[EnrichEvent]
    val q = StreamAsof.enrich(stream).writeStream
      .format("memory").queryName("sasof")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("sasof_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("sasof")
      .select("event_id", "click_event_id").as[(Long, Long)]
      .collect().toMap
    // 101 enriched by the batch-0 click (state crossed the batch
    // boundary); 201 sees no strictly-earlier click
    assert(got === Map(101L -> 100L, 201L -> -1L))
  }
}
