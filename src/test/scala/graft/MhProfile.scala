package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiler for dedupIncrementalMinhash phases (not a test). */
object MhProfile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/documents.parquet").count()
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val docs = Tables.documents(spark, dir)
      val sink = new graft.sinks.WarehouseSink(
        java.nio.file.Files.createTempDirectory("prof_mh_").toString)
      t("build store") {
        graft.llm.Dedup.buildMinhashStore(
          docs.filter(pmod(col("doc_id"), lit(10)) < 6), sink)
      }
      t("probe") {
        graft.llm.Dedup.dedupIncrementalMinhash(
          docs.filter(pmod(col("doc_id"), lit(10)) >= 6), spark, sink)
          .write.format("noop").mode("overwrite").save()
      }
      t("plain dedup_minhash") {
        graft.llm.Dedup.dedupMinhash(docs)
          .write.format("noop").mode("overwrite").save()
      }
      // probe phase split
      locally {
        import graft.llm.Dedup
        val newDocs = docs.filter(pmod(col("doc_id"), lit(10)) >= 6)
        val sigs = t("  sigs persist") {
          val s = Dedup.minhashSigs(Dedup.shingleHashes(newDocs)).persist()
          s.count(); s
        }
        val bands = Dedup.bandRows(sigs)
          .withColumn("part_bucket",
            graft.sinks.WarehouseSink.bucketPartition(Seq("band", "bh"), 32))
          .persist()
        val touched = t("  bands+touched") {
          bands.select("part_bucket").distinct().collect().map(_.getInt(0))
        }
        val store = sink.read(spark, "minhash_bands")
          .filter(col("part_bucket").isin(touched.toIndexedSeq.map(t => lit(t)): _*))
        t("  store scan") { store.write.format("noop").mode("overwrite").save() }
        val cross = store.as("c")
          .join(bands.as("n"),
            col("c.band") === col("n.band") && col("c.bh") === col("n.bh") &&
              col("c.doc_id") =!= col("n.doc_id"))
          .groupBy(col("c.doc_id").as("cid"), col("n.doc_id").as("nid"))
          .agg(first(col("c.sig")).as("sa"), first(col("n.sig")).as("sb"))
          .select(least(col("cid"), col("nid")).as("doc_a"),
            greatest(col("cid"), col("nid")).as("doc_b"))
        t("  cross join") { cross.write.format("noop").mode("overwrite").save() }
        t("  within") {
          Dedup.minhashPairs(sigs, 0.5).write.format("noop").mode("overwrite").save()
        }
        bands.unpersist(); sigs.unpersist()
      }
    }
    spark.stop()
  }
}
