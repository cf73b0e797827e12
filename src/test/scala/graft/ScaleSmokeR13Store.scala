package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** r13 verdict task 5: the measurement behind the store family's central
  * promise — probe cost ∝ BATCH, not store size. The 10× smokes showed
  * sub-linear probes; this one pins store-size-INVARIANCE by building each
  * store at 10× and 100× the driver SF and probing both with the SAME
  * fixed batch, on the axis each store actually scales along at 100 TB:
  *
  *  - fingerprint store: corpus grows 10×→100×, bucket COUNT grows with
  *    it (32→320 — the build-time knob a 100 TB deployment sets ∝ corpus
  *    so bucket size stays bounded); fixed 50-doc probe. Expectation:
  *    probe wall ≈ flat, store scan PartitionFilters-pruned to the
  *    batch's buckets.
  *  - merge pipeline (upsert snapshot): KEY cardinality grows 10×→100×
  *    with buckets ∝ keys (32→320); fixed 500-event batch over 20 users.
  *  - SCD2 store: closed HISTORY grows 10×→100× (time-replication, key
  *    set fixed — the axis a changelog actually grows along); fixed
  *    1 000-event batch at the head of time. foldBatch reads the open
  *    partition + the batch's touched months only, so closed-month
  *    growth must not show up in the fold.
  */
object ScaleSmokeR13Store {
  def t(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime(); f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"=== $label: $s%.2f s"); s
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val base = java.nio.file.Files.createTempDirectory("r13store_").toString

    val docs = Tables.documents(spark, dir)
    val events = Tables.events(spark, dir)

    // ---- 1) exact fingerprint store: corpus 10x -> 100x driver SF ----
    // replica i gets a DISTINCT text suffix — identical texts would
    // collapse in the md5-keyed store and the corpus would not actually
    // grow (first run of this harness measured a 4 992-row store at
    // every replication factor)
    def docsX(times: Int): DataFrame =
      (0 until times).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", concat(col("text"), lit(s" replica$i"))))
        .reduce(_ unionByName _)
    // FIXED probe batch: 50 fresh docs (ids clear of every replica shift)
    val fpBatch = docs.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + lit(900000000L))
      .persist()
    fpBatch.count()

    def fpProbe(times: Int, buckets: Int): Unit = {
      val sink = new graft.sinks.WarehouseSink(s"$base/fp${times}_$buckets")
      t(s"fp store build ${times}x (buckets=$buckets)") {
        graft.llm.Dedup.buildFingerprintStore(docsX(times), sink,
          numBuckets = buckets)
      }
      // one warm-up + 3 timed probes; min is the quiet number
      val walls = (0 to 3).map { _ =>
        var n = 0L
        val s = t(s"fp probe ${times}x") {
          n = graft.llm.Dedup.dedupIncremental(fpBatch, spark, sink,
            numBuckets = buckets).count()
        }
        (s, n)
      }
      println(f"=== FP ${times}x quiet probe: ${walls.tail.map(_._1).min}%.2f s" +
        s" (rows ${walls.head._2})")
      // the probe result goes through Exec.materialize, which hides the
      // store scan from explain — pin the pruning on the probe's store
      // read directly (the same isin(touched) filter dedupIncremental
      // builds), and count the rows it admits vs the full store
      val touched = fpBatch
        .select(md5(col("text")).as("h"))
        .select(graft.sinks.WarehouseSink
          .bucketPartition(Seq("h"), buckets).as("b"))
        .distinct().collect().map(_.getInt(0))
      val pruned = sink.read(spark, "fingerprints")
        .filter(col("part_bucket")
          .isin(touched.toIndexedSeq.map(b => lit(b)): _*))
      pruned.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.filter(_.contains("PartitionFilters"))
        .foreach(l => println(s"=== FP ${times}x ${l.trim.take(160)}"))
      println(s"=== FP ${times}x pruned store rows ${pruned.count()}" +
        s" of ${sink.read(spark, "fingerprints").count()}" +
        s" (${touched.length} of $buckets buckets)")
    }
    fpProbe(10, 32)
    fpProbe(100, 320)
    // control: SAME store at 100x but with the bucket knob left at 32 —
    // bucket size grows 10x and the probe must read 10x the rows; the
    // contrast with fpProbe(100, 320) is the invariance evidence
    fpProbe(100, 32)

    // ---- 2) merge pipeline: key cardinality 10x -> 100x ----
    // mergeBatch's ordering expects the flattened CDC changelog shape
    val flat = graft.cdc.Cdc.flatten(events)
    def eventsKeysX(times: Int): DataFrame =
      (0 until times).map(i =>
        flat.withColumn("user_id", col("user_id") + lit(i * 100000L))
          .withColumn("event_id", col("event_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
    val mergeBatch = flat.filter(col("user_id") < 20)
      .withColumn("event_id", col("event_id") + lit(900000000L))
      .persist()
    mergeBatch.count()

    def mergeProbe(times: Int, buckets: Int): Unit = {
      val sink = new graft.sinks.WarehouseSink(s"$base/mp${times}_$buckets")
      t(s"merge snapshot seed ${times}x (buckets=$buckets)") {
        graft.cdc.MergePipeline.mergeBatch(spark, sink, "snap",
          eventsKeysX(times), Seq("user_id"), numBuckets = buckets)
      }
      val walls = (0 to 3).map { _ =>
        t(s"merge probe ${times}x") {
          graft.cdc.MergePipeline.mergeBatch(spark, sink, "snap",
            mergeBatch, Seq("user_id"), numBuckets = buckets)
        }
      }
      println(f"=== MERGE ${times}x quiet probe: ${walls.tail.min}%.2f s")
      // separate the probe's READ cost (the O(batch) claim) from the
      // dynamic-overwrite commit: pruned vs unpruned scans of the store
      val touched = mergeBatch
        .select(graft.sinks.WarehouseSink
          .bucketPartition(Seq("user_id"), buckets).as("b"))
        .distinct().collect().map(_.getInt(0))
      val prunedDf = sink.read(spark, "snap")
        .filter(col("part_bucket")
          .isin(touched.toIndexedSeq.map(b => lit(b)): _*))
      prunedDf.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.filter(_.contains("PartitionFilters"))
        .foreach(l => println(s"=== MERGE ${times}x ${l.trim.take(160)}"))
      println(s"=== MERGE ${times}x pruned store rows ${prunedDf.count()}" +
        s" of ${sink.read(spark, "snap").count()}")
      val prunedReads = (0 to 2).map { _ =>
        t(s"merge pruned read ${times}x") {
          prunedDf.write.format("noop").mode("overwrite").save()
        }
      }
      val fullReads = (0 to 2).map { _ =>
        t(s"merge FULL read ${times}x") {
          sink.read(spark, "snap")
            .write.format("noop").mode("overwrite").save()
        }
      }
      println(f"=== MERGE ${times}x pruned read quiet: ${prunedReads.tail.min}%.2f s" +
        f" vs full ${fullReads.tail.min}%.2f s (${touched.length} of $buckets buckets)")
    }
    mergeProbe(10, 32)
    mergeProbe(100, 320)
    // fixed-bucket control, as for the fingerprint store above
    mergeProbe(100, 32)

    // ---- 3) scd2: closed history 10x -> 100x, keys FIXED ----
    // time-replication: copy i shifts ts back i*31 days and event_id up,
    // so every copy lands in DIFFERENT closed months for the SAME keys
    def eventsHistX(times: Int): DataFrame =
      (0 until times).map(i =>
        events
          .withColumn("ts", col("ts") - expr(s"INTERVAL ${i * 31} DAYS"))
          .withColumn("event_id", col("event_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
    // one FIXED-size batch per fold iteration, each strictly later than
    // the last (the store's strict in-order contract forbids re-folding
    // the same timestamps): iteration i sits at +365 + 40*i days
    def scdBatch(i: Int): DataFrame = events.filter(col("user_id") < 100)
      .withColumn("ts", col("ts") + expr(s"INTERVAL ${365 + 40 * i} DAYS"))
      .withColumn("event_id",
        col("event_id") + lit(900000000L + i * 10000000L))

    def scdProbe(times: Int): Unit = {
      val sink = new graft.sinks.WarehouseSink(s"$base/scd$times")
      val store = new graft.cdc.Scd2Store(sink)
      t(s"scd2 build ${times}x history") { store.build(eventsHistX(times)) }
      val nParts = new java.io.File(sink.tablePath("scd2"))
        .listFiles().count(_.getName.startsWith("part="))
      val walls = (0 to 2).map { i =>
        val b = scdBatch(i).persist(); b.count()
        val s = t(s"scd2 foldBatch ${times}x") { store.foldBatch(spark, b) }
        b.unpersist(); s
      }
      println(f"=== SCD2 ${times}x quiet fold: ${walls.tail.min}%.2f s" +
        s" ($nParts month partitions on disk)")
    }
    scdProbe(10)
    scdProbe(100)

    spark.stop()
  }
}
