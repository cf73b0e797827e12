package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.RankSelect

/** Scratch A/B harness (r18, verdict task 6) for the selectRowsTied
  * driver-action count — run with Test/runMain graft.RankSelectLazyScratch.
  *
  * The shipped selectRowsTied issues THREE construction-time actions
  * (statsFor checkpoint, level-1 key checkpoint, level-2 statsFor
  * checkpoint) before the caller's own action runs. The variant here
  * persists those frames instead (no action — they are multiply
  * referenced, so they need a CACHE, not a lineage cut at sf sizes),
  * materializes the tiny (groups × ranks)-row OUTPUT once, and
  * explicitly unpersists the internals — one action per call, and no
  * CacheManager residue across invocations.
  *
  * Entries A/B'd (interleaved, bench protocol, min of 5): events_rfm
  * and q_revenue_concentration, the two selectRowsTied consumers.
  *
  * LEDGER (r18): measured and REJECTED —
  *   events_rfm               old min=2.54  lazy min=2.83  (+11%)
  *   q_revenue_concentration  old min=2.79  lazy min=3.27  (+17%)
  * (interleaved, local[32], sf0.1, outputs identical). Same mechanism
  * as the GraphFoldScratch fold rejection: the single action plans the
  * whole selection over InMemoryRelation caches, forfeiting the
  * per-segment AQE re-optimization and flat lineage the construction-
  * time localCheckpoints buy; three cheap checkpoint jobs cost less
  * than what the fused plan gives back. The r17 RevConcScratch verdict
  * ("collapsing passes needs a driver-side collect — correctly left")
  * stands; the shipped RankSelect is unchanged. */
object RankSelectLazyScratch {

  private def dbl(c: Column): Column = c.cast("double")

  private def joinG(big: DataFrame, small: DataFrame,
                    groups: Seq[String]): DataFrame =
    if (groups.isEmpty) big.crossJoin(broadcast(small))
    else big.join(broadcast(small), groups)

  /** statsFor without the checkpoint: persisted, caller unpersists. */
  private def statsForP(df: DataFrame, groups: Seq[String],
                        valueCol: String): DataFrame = {
    val vd = col(valueCol).cast("double")
    df.filter(col(valueCol).isNotNull).groupBy(groups.map(col): _*)
      .agg(min(vd).as("__vmin"), max(vd).as("__vmax"),
        count(lit(1)).as("__n"))
      .persist()
  }

  /** Verbatim copy of RankSelect.locateValue (private there). */
  private def locateValue(base: DataFrame, groups: Seq[String],
                          valueCol: String, stats: DataFrame,
                          targets: DataFrame, buckets: Int): DataFrame = {
    val gcols = groups.map(col)
    val proj = base.select((groups ++ Seq(valueCol, "__w")).map(col): _*)
    val vd = col(valueCol).cast("double")
    val fineN = least(lit(buckets.toLong * buckets),
      greatest(lit(buckets.toLong),
        floor(col("__n") / lit(buckets.toDouble)).cast("long")))
    val ext = stats.select((gcols ++
      Seq(col("__vmin"), col("__vmax"), fineN.as("__fineN"))): _*)
      .withColumn("__width",
        (col("__vmax") - col("__vmin")) / col("__fineN").cast("double"))
    val fbkt = when(col("__vmax") <= col("__vmin")
        || col("__width") === lit(0.0), lit(0L))
      .otherwise(least(col("__fineN") - lit(1L),
        floor((vd - col("__vmin")) / col("__width")).cast("long")))
    val binned = joinG(proj, ext, groups).withColumn("__fbkt", fbkt)
      .drop("__vmin", "__vmax", "__fineN", "__width")
    val hist = binned.groupBy((gcols :+ col("__fbkt")): _*)
      .agg(sum(col("__w")).as("__c"))
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(
        Window.partitionBy(gcols: _*).orderBy(col("__fbkt"))))
    val loc = joinG(cum, targets, groups)
      .filter(col("__cum") >= col("__r") &&
        col("__cum") - col("__c") < col("__r"))
      .select(gcols ++ Seq(col("__ridx"), col("__fbkt").as("__tfbkt"),
        (col("__r") - col("__cum") + col("__c")).as("__bresid")): _*)
    val marked = joinG(binned, loc, groups)
      .filter(col("__fbkt") === col("__tfbkt"))
    val vc = marked
      .groupBy((gcols ++ Seq(col("__ridx"), col("__bresid"),
        col(valueCol))): _*)
      .agg(sum(col("__w")).as("__vc"))
    val vcum = vc.withColumn("__vcum",
      sum(col("__vc")).over(Window
        .partitionBy((gcols :+ col("__ridx")): _*).orderBy(col(valueCol))))
    vcum.filter(col("__vcum") >= col("__bresid") &&
        col("__vcum") - col("__vc") < col("__bresid"))
      .select(gcols ++ Seq(col("__ridx"), col(valueCol),
        (col("__bresid") - col("__vcum") + col("__vc")).as("__resid"),
        col("__vc").as("__nties")): _*)
  }

  private def explodeRanks(stats: DataFrame, groups: Seq[String],
                           ranksOf: Column => Column): DataFrame =
    stats.select(groups.map(col) :+
      posexplode(ranksOf(col("__n"))).as(Seq("__ridx", "__r")): _*)

  /** selectRowsTied, ONE action: internals persisted, output
    * materialized, internals unpersisted. */
  def selectRowsTiedLazy(df: DataFrame, groups: Seq[String], valueCol: String,
                         tieCol: String, ranksOf: Column => Column,
                         buckets: Int = 1024): DataFrame = {
    val gcols = groups.map(col)
    val base = df.select((groups ++ Seq(valueCol, tieCol)).map(col): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("__w", lit(1L))
    val st = statsForP(base, groups, valueCol)
    val targets = explodeRanks(st, groups, ranksOf)
    val lv = locateValue(base, groups, valueCol, st, targets, buckets)
    val key = lv.select(gcols ++ Seq(col("__ridx").as("__oridx"),
      col(valueCol).as("__v"), col("__resid").as("__r2")): _*)
      .persist()
    val tied = joinG(base, key, groups)
      .filter(col(valueCol) === col("__v"))
      .select(gcols ++ Seq(col("__oridx"), col(tieCol), col("__w")): _*)
    val targets2 = key.select(gcols ++ Seq(col("__oridx"),
      lit(0).as("__ridx"), col("__r2").as("__r")): _*)
    val st2 = statsForP(tied, groups :+ "__oridx", tieCol)
    val lv2 = locateValue(tied, groups :+ "__oridx", tieCol, st2,
      targets2, buckets)
    val out = lv2.select(gcols ++ Seq(col("__oridx"), col(tieCol)): _*)
      .join(key.select(gcols ++ Seq(col("__oridx"), col("__v")): _*),
        groups :+ "__oridx")
      .select(gcols ++ Seq(col("__oridx").as("__ridx"),
        col("__v").as(valueCol), col(tieCol)): _*)
    val res = graft.Exec.materialize(out)
    st.unpersist(blocking = false)
    key.unpersist(blocking = false)
    st2.unpersist(blocking = false)
    res
  }

  // --- entry replicas swapping in the lazy selection ---

  def eventsRfmVariant(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val anchor = broadcast(p.agg(max(col("ts")).as("anchor_ts")))
    val per = graft.Exec.materialize(
      p.groupBy("user_id")
        .agg(max(col("ts")).as("last_ts"),
          count(lit(1)).as("frequency"),
          sum(col("value").cast("decimal(12,2)")).as("mon_dec"))
        .crossJoin(anchor))
    val quintileBounds: Column => Column = n => array((1 to 4).map { t =>
      lit(t.toLong) * (n / lit(5L)).cast("long") +
        least(lit(t.toLong), n % lit(5L))
    }: _*)
    def melt(m: String, c: Column): Column =
      struct(lit(m).as("m"), c.cast("double").as("mv"),
        col("user_id").as("u"))
    val melted = per.select(explode(array(
        melt("r", col("last_ts")), melt("f", col("frequency")),
        melt("m", col("mon_dec")))).as("x"))
      .select(col("x.m").as("metric"), col("x.mv").as("mv"),
        col("x.u").as("user_id"))
    val bounds = selectRowsTiedLazy(melted, Seq("metric"), "mv",
      "user_id", quintileBounds)
    def side(m: String): Column =
      collect_list(when(col("metric") === m,
        struct(col("mv").as("v"), col("user_id").as("u"))))
    val bArr = broadcast(bounds.groupBy().agg(
      side("r").as("__b_r"), side("f").as("__b_f"), side("m").as("__b_m")))
    def score(metric: Column, arr: String): Column =
      lit(1) + size(filter(col(arr),
        b => struct(metric.cast("double").as("v"),
          col("user_id").as("u")) > b))
    per.crossJoin(bArr)
      .select(
        col("user_id"),
        datediff(col("anchor_ts").cast("date"), col("last_ts").cast("date"))
          .as("recency_days"),
        col("frequency"),
        dbl(col("mon_dec")).as("monetary"),
        score(col("last_ts"), "__b_r").as("r_score"),
        score(col("frequency"), "__b_f").as("f_score"),
        score(col("mon_dec"), "__b_m").as("m_score"))
  }

  def qRevenueConcentrationVariant(spark: SparkSession, dir: String): DataFrame = {
    val perCust = graft.Exec.materialize(
      Tables.orders(spark, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
        .withColumn("nrev", -col("rev")))
    val decileBounds: Column => Column = n => array((1 to 9).map { t =>
      lit(t.toLong) * (n / lit(10L)).cast("long") +
        least(lit(t.toLong), n % lit(10L))
    }: _*)
    val bounds = selectRowsTiedLazy(perCust, Nil, "nrev",
      "o_custkey", decileBounds)
    val bArr = broadcast(bounds.agg(collect_list(
      struct(col("nrev").as("v"), col("o_custkey").as("u"))).as("__b")))
    val ranked = perCust.crossJoin(bArr)
      .withColumn("decile", lit(1) + size(filter(col("__b"),
        b => struct(col("nrev").as("v"), col("o_custkey").as("u")) > b)))
    val deciles = ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("rev")).as("rev_dec"))
    val total = broadcast(deciles.agg(sum(col("rev_dec")).as("tot")))
    deciles.crossJoin(total)
      .select(col("decile"), col("n_customers"),
        dbl(col("rev_dec")).as("revenue"),
        round(dbl(col("rev_dec")) / dbl(col("tot")), 4)
          .as("rev_share"),
        round(dbl(sum(col("rev_dec")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, 0))) /
          dbl(col("tot")), 4).as("cum_share"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("rankselect-lazy-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("events_rfm",
        () => graft.queries.Analytics2.eventsRfm(spark, dir),
        () => eventsRfmVariant(spark, dir)),
      ("q_revenue_concentration",
        () => graft.queries.Analytics2.qRevenueConcentration(spark, dir),
        () => qRevenueConcentrationVariant(spark, dir)))
    cases.foreach { case (name, mkOld, mkNew) =>
      val ref = mkOld().collect().map(_.toString).sorted
      val got = mkNew().collect().map(_.toString).sorted
      require(ref.sameElements(got), s"$name old/new outputs differ")
      println(s"[rsab] $name old/new equal (${got.length} rows)")
      noop(mkOld()); noop(mkNew())
      var tO, tN = List.empty[Double]
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime()
        noop(mkOld())
        val t1 = System.nanoTime()
        noop(mkNew())
        val t2 = System.nanoTime()
        tO = tO :+ (t1 - t0) / 1e9
        tN = tN :+ (t2 - t1) / 1e9
      }
      println(f"[rsab] $name%-26s old min=${tO.min}%.2f all=${tO.map(t => f"$t%.2f").mkString(",")}")
      println(f"[rsab] $name%-26s new min=${tN.min}%.2f all=${tN.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
