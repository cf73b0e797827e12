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
    // 10x dup-heavy corpus: collapse-path phase split
    locally {
      import graft.llm.Dedup
      val docs10 = (0 until 10).map(i =>
        Tables.documents(spark, dir)
          .withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
      (1 to 2).foreach { round =>
        println(s"--- collapse round $round")
        val classes = t("  classes") {
          val c = docs10.select(col("doc_id"), md5(col("text")).as("tkey"))
            .groupBy(col("tkey")).agg(min(col("doc_id")).as("rep_id"))
          c.count(); c
        }
        val members = t("  members persist") {
          val m = docs10.select(col("doc_id"), md5(col("text")).as("tkey"))
            .join(classes, "tkey").select(col("doc_id"), col("rep_id"))
            .persist()
          m.count(); m
        }
        val repSigs = t("  repSigs persist") {
          val s = Dedup.minhashSigs(
            Dedup.shingleHashes(docs10)
              .join(members.filter(col("doc_id") === col("rep_id"))
                .select(col("rep_id")), col("doc_id") === col("rep_id"))
              .select(col("doc_id"), col("sh_h")))
            .persist()
          s.count(); s
        }
        val repPairs = t("  repPairs") {
          val p = Dedup.minhashPairs(repSigs, 0.5).persist(); p.count(); p
        }
        t("  expand+materialize") {
          val cross = repPairs
            .join(members.as("ma"), col("doc_a") === col("ma.rep_id"))
            .join(members.as("mb"), col("doc_b") === col("mb.rep_id"))
            .select(least(col("ma.doc_id"), col("mb.doc_id")).as("doc_a"),
              greatest(col("ma.doc_id"), col("mb.doc_id")).as("doc_b"),
              col("est_sim"))
          val signed = repSigs.select(col("doc_id").as("signed_rep"))
          val within = members.as("ma")
            .join(members.as("mb"),
              col("ma.rep_id") === col("mb.rep_id") &&
                col("ma.doc_id") < col("mb.doc_id"))
            .join(signed, col("ma.rep_id") === col("signed_rep"))
            .select(col("ma.doc_id").as("doc_a"), col("mb.doc_id").as("doc_b"),
              lit(1.0).as("est_sim"))
          graft.Exec.materialize(cross.unionByName(within))
        }
        members.unpersist(); repSigs.unpersist(); repPairs.unpersist()
        t("  full dedupMinhash 10x") {
          Dedup.dedupMinhash(docs10).write.format("noop").mode("overwrite").save()
        }
        t("  direct dedupMinhash 10x") {
          Dedup.dedupMinhash(docs10, collapseThreshold = 0.0)
            .write.format("noop").mode("overwrite").save()
        }
      }
      // breakeven sweep: same 50k docs, class sizes 25 / 100
      Seq(25, 100).foreach { k =>
        val base = Tables.documents(spark, dir)
          .filter(col("doc_id") < lit(5000L / k))
        val rep = (0 until k).map(i =>
          base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
          .reduce(_ unionByName _)
        println(s"--- class size $k (${5000 / k} classes)")
        t(s"  direct k=$k") {
          Dedup.dedupMinhash(rep, collapseThreshold = 0.0)
            .write.format("noop").mode("overwrite").save()
        }
        t(s"  collapse k=$k") {
          Dedup.dedupMinhash(rep, collapseThreshold = 2.0)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
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
      t("embed store build") {
        val emb = Tables.embeddings(spark, dir)
        val esink = new graft.sinks.WarehouseSink(
          java.nio.file.Files.createTempDirectory("prof_emb_").toString)
        graft.llm.Ann.buildEmbedStore(
          emb.filter(pmod(col("vec_id"), lit(10)) < 6), esink)
        t("embed probe") {
          graft.llm.Ann.dedupEmbedIncremental(
            emb.filter(pmod(col("vec_id"), lit(10)) >= 6), spark, esink)
            .write.format("noop").mode("overwrite").save()
        }
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
          .agg(first(col("c.sigb")).as("sa"), first(col("n.sig")).as("sb"))
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
