package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (r17 session 3) for the board-3→HEAD elevation of
  * events_rfm (1.54→7.08) and events_session_profile (1.91→5.55) on a
  * calm box (contention sentinels only +0.2): times the two entries in
  * a FRESH JVM (bench protocol: untimed warmup + timed runs), then —
  * with `polluted` — first replays the alphabetically-earlier ANN
  * family entries once (the d9ace2e lazy `.persist()` pins live until
  * the ContextCleaner GCs the plans), re-times, and prints storage
  * status. Distinguishes "HEAD code is slower" from "bench-session
  * accumulated state slows later entries". FoldBenchScratch
  * convention: profiling tool, not a spec. */
object RfmIsoScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val polluted = args.contains("polluted")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("rfm-iso-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val targets = Seq("events_rfm", "events_session_profile",
      "q_revenue_concentration", "table_profile")
    def time(name: String): Seq[Double] = {
      val fn = SparkEntry.queries(name)
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
    }
    def report(tag: String): Unit = targets.foreach { n =>
      val ts = time(n)
      println(f"[rfmiso] $tag $n%-26s min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    if (polluted) {
      // replay the persist-pinning families the bench runs before the
      // e* entries (each 4x like the bench: warmup + 3 timed)
      val pre = SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ < "events_rfm")
      pre.foreach { n =>
        val fn = SparkEntry.queries(n)
        (1 to 4).foreach { _ =>
          try fn(spark, dir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
      }
      val rdds = spark.sparkContext.getPersistentRDDs
      println(s"[rfmiso] persistent RDDs after prefix replay: ${rdds.size}")
    }
    report(if (polluted) "polluted" else "fresh")
    println(s"[rfmiso] persistent RDDs at end: ${spark.sparkContext.getPersistentRDDs.size}")
    spark.stop()
  }
}
