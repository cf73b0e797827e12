package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiler for the r5 dedup-family sf0.1 regression (not a
  * test): phase-times dedup_embed and dedup_corpus exactly as Bench runs
  * them, to attribute the r4→r5 delta to specific jobs. */
object DedupProfile {
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
    graft.functions.VectorFunctions.register(spark)
    val dir = "/root/testdata/sf0.1"
    // warmup like Bench
    spark.read.parquet(s"$dir/nation.parquet").groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()

    (1 to 3).foreach { round =>
      println(s"--- dedup_embed round $round")
      val emb = Tables.embeddings(spark, dir)
      val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      t("  gate job") {
        vecs.agg(count(lit(1)), approx_count_distinct(xxhash64(col("v")), 0.02)).head()
      }
      val sigs = t("  sigs persist fill") {
        val s = vecs.withColumn("nrm", sqrt(
          graft.functions.VectorFunctions.vecDot(col("v"), col("v")))).persist()
        s.count(); s
      }
      val cand = t("  bucket join + distinct") {
        val buckets = sigs.select(col("vec_id"),
          posexplode(graft.llm.Ann.lshBucketInts(col("v"))).as(Seq("tbl", "bucket")))
        val c = buckets.as("x")
          .join(buckets.as("y"),
            col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
          .distinct().persist()
        println(s"    pairs=${c.count()}")
        c
      }
      val verified = t("  verify joins") {
        val v = cand
          .join(sigs.as("ma"), col("vec_a") === col("ma.vec_id"))
          .join(sigs.as("mb"), col("vec_b") === col("mb.vec_id"))
          .select(col("vec_a"), col("vec_b"),
            (graft.functions.VectorFunctions.vecDot(col("ma.v"), col("mb.v")) /
              (col("ma.nrm") * col("mb.nrm"))).as("cos"))
          .filter(col("cos") >= 0.4)
        v.write.format("noop").mode("overwrite").save(); v
      }
      t("  materialize (lchkpt)") { verified.localCheckpoint() }
      cand.unpersist(); sigs.unpersist()
      t("  full op end-to-end") {
        graft.llm.Ann.dedupEmbed(emb)
          .write.format("noop").mode("overwrite").save()
      }
    }

    (1 to 3).foreach { round =>
      println(s"--- dedup_corpus round $round")
      val docs = Tables.documents(spark, dir)
      val pairs = t("  jaccard end-to-end") { graft.llm.Dedup.dedupNgramJaccard(docs) }
      val edges = t("  edges persist+count") {
        val e = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
          .persist()
        println(s"    edges=${e.count()}")
        e
      }
      val collected = t("  collect") { edges.collect() }
      edges.unpersist()
      t("  union-find driver") {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        collected.foreach { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
      }
      t("  anti-join + noop") {
        import spark.implicits._
        val drops = (1L to 10L).toDF("doc_id") // placeholder-size drop set
        docs.join(broadcast(drops), Seq("doc_id"), "left_anti")
          .select(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
      t("  full op end-to-end") {
        graft.llm.Dedup.dedupCorpusQ(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

/** Phase profiler for the incremental simhash store cycle. */
object ShProfile {
  import DedupProfile.t
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/nation.parquet").groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { round =>
      println(s"--- incr simhash round $round")
      val docs = Tables.documents(spark, dir)
      val sink = new graft.sinks.WarehouseSink(
        java.nio.file.Files.createTempDirectory("graft_shprof_").toString)
      t("  build store") {
        graft.llm.Dedup.buildSimhashStore(
          docs.filter(pmod(col("doc_id"), lit(10)) < 6), sink)
      }
      t("  probe") {
        graft.llm.Dedup.dedupIncrementalSimhash(
          docs.filter(pmod(col("doc_id"), lit(10)) >= 6), spark, sink)
          .write.format("noop").mode("overwrite").save()
      }
      println(s"--- incr minhash round $round")
      val sink2 = new graft.sinks.WarehouseSink(
        java.nio.file.Files.createTempDirectory("graft_mhprof_").toString)
      t("  build store") {
        graft.llm.Dedup.buildMinhashStore(
          docs.filter(pmod(col("doc_id"), lit(10)) < 6), sink2)
      }
      t("  probe") {
        graft.llm.Dedup.dedupIncrementalMinhash(
          docs.filter(pmod(col("doc_id"), lit(10)) >= 6), spark, sink2)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

/** Phase profiler for IVF at a realistic nlist. */
object IvfProfile {
  import DedupProfile.t
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val dir = "/root/testdata/sf0.1"
    val emb10 = (0 until 10).map(i =>
      Tables.embeddings(spark, dir)
        .withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    val nlist = 1024
    val vecs = emb10.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")).persist()
    t("corpus count")(vecs.count())
    val cents0 = t("init collect") {
      vecs.orderBy("vec_id").limit(nlist)
        .collect().map(_.getSeq[Double](1).toArray).toSeq
    }
    def assignCol(cents: Seq[Array[Double]]) =
      graft.functions.VectorFunctions.centroidArgmax(
        col("v"), cents.flatten.toIndexedSeq, cents.size)
    t("assign pass (count)") {
      vecs.withColumn("cid", assignCol(cents0)).groupBy("cid").count().count()
    }
    t("lloyd means job") {
      vecs.select(assignCol(cents0).as("cid"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
        .collect()
    }
    t("full annIvfTopK nlist=1024") {
      graft.llm.Ann.annIvfTopK(emb10, nlist = nlist, nprobe = 64)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

/** A/B: assignment before vs inside the explode projection. */
object IvfProfile2 {
  import DedupProfile.t
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val dir = "/root/testdata/sf0.1"
    val emb10 = (0 until 10).map(i =>
      Tables.embeddings(spark, dir)
        .withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    val vecs = emb10.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")).persist()
    vecs.count()
    val cents0 = vecs.orderBy("vec_id").limit(1024)
      .collect().map(_.getSeq[Double](1).toArray).toSeq
    def assignCol(cents: Seq[Array[Double]]) =
      graft.functions.VectorFunctions.centroidArgmax(
        col("v"), cents.flatten.toIndexedSeq, cents.size)
    (1 to 2).foreach { _ =>
      t("means, assign inside explode select") {
        vecs.select(assignCol(cents0).as("cid"),
            posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cid", "pos").agg(avg(col("x")).as("m")).collect()
      }
      t("means, assign in prior select") {
        vecs.select(col("v"), assignCol(cents0).as("cid"))
          .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cid", "pos").agg(avg(col("x")).as("m")).collect()
      }
    }
    spark.stop()
  }
}
