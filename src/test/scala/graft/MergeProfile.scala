package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiler for mergePartitionedQ phases (not a test). */
object MergeProfile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warmup
    spark.read.parquet(s"$dir/events.parquet").count()

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      t("full mergePartitionedQ") {
        graft.cdc.MergePipeline.mergePartitionedQ(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      val tmp = java.nio.file.Files.createTempDirectory("prof_wh_").toString
      val sink = new graft.sinks.WarehouseSink(tmp)
      val events = Tables.events(spark, dir)
      val cutoff = lit("2024-01-15").cast("timestamp")
      val b1 = graft.cdc.Cdc.flatten(events.filter(col("ts") < cutoff))
      val b2 = graft.cdc.Cdc.flatten(events.filter(col("ts") >= cutoff))
      t("merge 1 (create)") {
        graft.cdc.MergePipeline.mergeBatch(spark, sink, "t", b1, Seq("user_id"))
      }
      t("merge 2 (incremental)") {
        graft.cdc.MergePipeline.mergeBatch(spark, sink, "t", b2, Seq("user_id"))
      }
      t("read back + noop") {
        sink.read(spark, "t").write.format("noop").mode("overwrite").save()
      }
      // manual merge-2 phase split against a fresh copy of the state
      val tmp2 = java.nio.file.Files.createTempDirectory("prof_wh2_").toString
      val sink2 = new graft.sinks.WarehouseSink(tmp2)
      graft.cdc.MergePipeline.mergeBatch(spark, sink2, "t", b1, Seq("user_id"))
      val bucket = graft.sinks.WarehouseSink.bucketPartition(Seq("user_id"), 32)
      val cached = t("  persist batch") { val c = b2.persist(); c.count(); c }
      val buckets = t("  bucket discovery") {
        cached.select(bucket.as("b")).distinct().collect().map(_.getInt(0))
      }
      val merged = t("  union+dedup+persist") {
        val existing = sink2.read(spark, "t")
          .filter(col("part_bucket").isin(buckets.toIndexedSeq.map(b => lit(b)): _*))
          .drop("part_bucket")
        val m = graft.cdc.Cdc.dedupLatest(
          existing.unionByName(cached), Seq("user_id"),
          Seq(col("__source_ts_ms"), graft.cdc.Cdc.opPriorityCol(col("__op")), col("event_id")))
          .filter(col("__op") =!= "d")
          .withColumn("part_bucket", bucket)
          .persist()
        m.count(); m
      }
      t("  write dyn-overwrite") {
        sink2.write(merged, "t", "part_bucket",
          graft.sinks.WarehouseSink.clusteringColumns(Seq("user_id")),
          createDisposition = graft.sinks.CreateDisposition.CreateNever,
          writeDisposition = graft.sinks.WriteDisposition.WriteAppend,
          dynamicOverwrite = true)
      }
      t("  written collect") {
        merged.select("part_bucket").distinct().collect()
      }
      merged.unpersist(); cached.unpersist()
    }
    spark.stop()
  }
}
