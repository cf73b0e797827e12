package graft

/** VERDICT r9 "what's wrong #2": the committed bench showed >1.5×
  * min-to-median spreads on `embed_project` (1.48 / 11.6 — 7.8×) and
  * `cdc_merge_partitioned` (1.83 / 9.94 — 5.4×). This harness separates
  * WHERE each iteration's time goes so the spread can be attributed:
  *
  *  - build   = the `SparkEntry.queries` fn call (DataFrame
  *              construction; for embed_project this includes the dim
  *              probe job, for cdc_merge_partitioned the ENTIRE merge —
  *              persist, bucket discovery, dynamic-overwrite write);
  *  - plan    = forcing analyzed → optimized → executed plan (driver-only
  *              Catalyst work; embed_project's 1024-term tree is the
  *              suspect the verdict names);
  *  - run     = the noop write of the already-planned frame.
  *
  * Findings land in BENCH_README / PROGRESS, per the repo's bench rules. */
object SpreadProfile {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPREAD_ITERS", "7").toInt

    def profile(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      // one untimed warm-up, as Bench does
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      val rows = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // forces analyze + optimize + plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      def stats(xs: Seq[Double]): String =
        f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f max=${xs.max}%.3f"
      println(s"=== $name build: " + stats(rows.map(_._1)))
      println(s"=== $name plan:  " + stats(rows.map(_._2)))
      println(s"=== $name run:   " + stats(rows.map(_._3)))
      println(s"=== $name total: " + stats(rows.map(r => r._1 + r._2 + r._3)))
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("embed_project", "cdc_merge_partitioned")
    names.foreach(profile)
    spark.stop()
  }
}
