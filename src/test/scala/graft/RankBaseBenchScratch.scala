package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B harness (r17) for the RankSelect-base materialization in
  * events_session_profile / q_ship_delay_profile — Test/runMain
  * graft.RankBaseBenchScratch. Old shapes copied VERBATIM from the r16
  * code (unmaterialized base), new shapes are the live entries;
  * interleaved, bench protocol, local[32]. FoldBenchScratch convention:
  * profiling tool, not a spec. */
object RankBaseBenchScratch {

  // verbatim r16 eventsSessionProfileOn (sessions NOT materialized)
  def oldSessionProfile(events: DataFrame): DataFrame = {
    import graft.operators.RankSelect
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ms = expr("unix_millis(ts)")
    val flagged = events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("ms", ms)
      .withColumn("new_s",
        when(lag(col("ms"), 1).over(w).isNull ||
          col("ms") - lag(col("ms"), 1).over(w) > lit(1800000L), 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
    val sessions = flagged.groupBy(col("user_id"), col("sid"))
      .agg(min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"),
        count(lit(1)).as("n_events"))
      .select((col("end_ms") - col("start_ms")).as("dur_ms"),
        col("n_events"))
    val qs = Seq(0.5, 0.9, 0.99)
    val ranksOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => array(qs.map(q => ceil(lit(q) * n.cast("double")).cast("long")): _*)
    def sel(valueCol: String, pfx: String): DataFrame =
      RankSelect.selectValues(sessions, Seq.empty, valueCol, ranksOf)
        .agg(max(when(col("__ridx") === 0, col(valueCol))).as(s"p50_$pfx"),
          max(when(col("__ridx") === 1, col(valueCol))).as(s"p90_$pfx"),
          max(when(col("__ridx") === 2, col(valueCol))).as(s"p99_$pfx"))
    val n = sessions.agg(count(lit(1)).as("n_sessions"))
    n.crossJoin(sel("dur_ms", "dur_ms"))
      .crossJoin(sel("n_events", "events"))
      .filter(col("n_sessions") > 0)
  }

  // verbatim r16 qShipDelayProfile (delays NOT materialized)
  def oldShipDelay(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankSelect
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val delays = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
          .as("delay_days"))
    val qs = Seq(0.5, 0.9, 0.99)
    val ranksOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => array(qs.map(q => ceil(lit(q) * n.cast("double")).cast("long")): _*)
    val sel = RankSelect.selectValues(delays, Seq("o_orderpriority"),
      "delay_days", ranksOf)
    val counts = delays.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"))
    sel.groupBy(col("o_orderpriority"))
      .agg(max(when(col("__ridx") === 0, col("delay_days"))).as("p50_days"),
        max(when(col("__ridx") === 1, col("delay_days"))).as("p90_days"),
        max(when(col("__ridx") === 2, col("delay_days"))).as("p99_days"))
      .join(broadcast(counts), Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("n_lines"), col("p50_days"),
        col("p90_days"), col("p99_days"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("rank-base-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.queries.Analytics8
    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("session_profile",
        () => oldSessionProfile(Tables.events(spark, dir)),
        () => Analytics8.eventsSessionProfile(spark, dir)),
      ("ship_delay",
        () => oldShipDelay(spark, dir),
        () => Analytics8.qShipDelayProfile(spark, dir)))
    cases.foreach { case (name, mkOld, mkNew) =>
      mkOld().write.format("noop").mode("overwrite").save()
      mkNew().write.format("noop").mode("overwrite").save()
      var tOld, tNew = List.empty[Double]
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime()
        mkOld().write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        mkNew().write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        tOld = tOld :+ (t1 - t0) / 1e9
        tNew = tNew :+ (t2 - t1) / 1e9
      }
      println(f"$name%-16s old min=${tOld.min}%.2f all=${tOld.map(t => f"$t%.2f").mkString(",")}")
      println(f"$name%-16s new min=${tNew.min}%.2f all=${tNew.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
