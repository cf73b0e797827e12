package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B harness (r17) for the shared-subframe persist batch —
  * Test/runMain graft.PersistBatchScratch. Old arms are the pre-persist
  * entry bodies copied VERBATIM (no cache boundaries — each shared
  * frame re-ran per reference; the _before.txt files under plans/r17
  * hold the plans);
  * new arms are the live entries. Interleaved, bench protocol,
  * local[32], sf0.1. FoldBenchScratch convention: profiling tool, not a
  * spec. */
object PersistBatchScratch {

  private def d(c: Column): Column = c.cast("double")

  // verbatim pre-r17 qBasketPairsOn (lines not persisted)
  def oldBasketPairs(lineitem: DataFrame, topK: Int = 50,
                     minOrders: Long = 3): DataFrame = {
    val lines = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val pairs = lines.as("a")
      .join(lines.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minOrders)
    val marg = lines.groupBy(col("pk")).agg(count(lit(1)).as("n"))
    val total = broadcast(lines.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders")))
    pairs
      .join(marg.select(col("pk").as("part_a"), col("n").as("na")), "part_a")
      .join(marg.select(col("pk").as("part_b"), col("n").as("nb")), "part_b")
      .crossJoin(total)
      .select(col("part_a"), col("part_b"), col("n_both"),
        round(col("n_both").cast("double") * col("n_orders") /
          (col("na").cast("double") * col("nb")), 4).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  // verbatim pre-r17 eventsWindowFunnelOn (no step persists)
  def oldWindowFunnel(events: DataFrame): DataFrame = {
    val steps = Seq("view", "click", "purchase")
    val window = "INTERVAL 1 HOUR"
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === steps(0))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === steps(1))
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + expr(window))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === steps(2))
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + expr(window))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val c = s1.agg(count(lit(1)).as("n1"))
      .crossJoin(s2.agg(count(lit(1)).as("n2")))
      .crossJoin(s3.agg(count(lit(1)).as("n3")))
    def conv(a: Column, b: Column): Column =
      round(d(a) / d(greatest(b, lit(1L))), 4)
    c.select(lit(1).as("step"), lit(steps(0)).as("step_type"),
        col("n1").as("n_users"), lit(1.0).as("conv_from_prev"),
        lit(1.0).as("conv_from_first"))
      .unionByName(c.select(lit(2).as("step"),
        lit(steps(1)).as("step_type"), col("n2").as("n_users"),
        conv(col("n2"), col("n1")).as("conv_from_prev"),
        conv(col("n2"), col("n1")).as("conv_from_first")))
      .unionByName(c.select(lit(3).as("step"),
        lit(steps(2)).as("step_type"), col("n3").as("n_users"),
        conv(col("n3"), col("n2")).as("conv_from_prev"),
        conv(col("n3"), col("n1")).as("conv_from_first")))
  }

  // verbatim pre-r17 joinCardinality (prod not persisted)
  def oldJoinCardinality(name: String, a: DataFrame, keyA: String,
                         b: DataFrame, keyB: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val ca = a.groupBy(col(keyA).as("k")).agg(count(lit(1)).as("ca"))
    val cb = b.groupBy(col(keyB).as("k")).agg(count(lit(1)).as("cb"))
    val prod = ca.join(cb, Seq("k"))
      .select(col("k"), (dec(col("ca")) * dec(col("cb"))).as("pm"))
    val tots = broadcast(prod.agg(
      count(lit(1)).as("n_keys_common"),
      sum(col("pm")).as("est"), max(col("pm")).as("mx")))
    val sides = broadcast(a.agg(count(lit(1)).as("n_left"))
      .crossJoin(b.agg(count(lit(1)).as("n_right"))))
    val top = prod.crossJoin(tots)
      .filter(col("pm") === col("mx"))
      .agg(min(col("k")).as("top_key"))
    broadcast(top).crossJoin(tots).crossJoin(sides)
      .select(lit(name).as("join_name"), col("n_left"), col("n_right"),
        col("n_keys_common"), d(col("est")).as("est_rows"),
        round(d(col("est")) / d(greatest(col("n_left"), col("n_right"))), 4)
          .as("amplification"),
        col("top_key"),
        round(d(col("mx")) / d(col("est")), 4).as("top_key_share"))
  }

  def oldJoinCardinalityQ(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val events = Tables.events(spark, dir)
    oldJoinCardinality("orders_x_lineitem_orderkey",
      orders, "o_orderkey", lineitem, "l_orderkey")
      .unionByName(oldJoinCardinality("lineitem_x_lineitem_partkey",
        lineitem, "l_partkey", lineitem, "l_partkey"))
      .unionByName(oldJoinCardinality("events_x_events_user",
        events, "user_id", events, "user_id"))
  }

  // verbatim pre-r17 qIntegrityAudit (edge frames not persisted)
  def oldIntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val edges = Seq(
      ("lineitem_orderkey", lineitem.select(col("l_orderkey").as("k")),
        orders.select(col("o_orderkey").as("k"))),
      ("orders_custkey", orders.select(col("o_custkey").as("k")),
        Tables.customer(spark, dir).select(col("c_custkey").as("k"))),
      ("lineitem_partkey", lineitem.select(col("l_partkey").as("k")),
        Tables.part(spark, dir).select(col("p_partkey").as("k"))))
    edges.map { case (nm, c, p) =>
      c.agg(count(lit(1)).as("n_child"))
        .crossJoin(c.join(p, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_orphans")))
        .crossJoin(p.agg(count(lit(1)).as("n_parent")))
        .crossJoin(p.join(c, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_childless")))
        .select(lit(nm).as("edge"), col("n_child"), col("n_orphans"),
          round(d(col("n_orphans")) / d(col("n_child")), 4)
            .as("orphan_share"),
          col("n_parent"), col("n_childless"),
          round(d(col("n_childless")) / d(col("n_parent")), 4)
            .as("childless_share"))
    }.reduce(_ unionByName _)
  }

  // verbatim pre-r17 eventsTypeAffinityOn (ud not persisted)
  def oldTypeAffinity(events: DataFrame): DataFrame = {
    val ud = events.select(col("user_id"), col("event_type")).distinct()
    val marg = ud.groupBy(col("event_type")).agg(count(lit(1)).as("users"))
    val nTot = broadcast(ud.agg(countDistinct(col("user_id")).as("n")))
    val a = ud.select(col("user_id"), col("event_type").as("type_a"))
    val b = ud.select(col("user_id"), col("event_type").as("type_b"))
    val both = a.join(b, Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("users_both"))
    both
      .join(broadcast(marg.select(col("event_type").as("type_a"),
        col("users").as("users_a"))), Seq("type_a"))
      .join(broadcast(marg.select(col("event_type").as("type_b"),
        col("users").as("users_b"))), Seq("type_b"))
      .crossJoin(nTot)
      .select(col("type_a"), col("type_b"),
        col("users_a"), col("users_b"), col("users_both"),
        round(d(col("users_both")) /
          d(col("users_a") + col("users_b") - col("users_both")), 4)
          .as("jaccard"),
        round(d(col("users_both")) * d(col("n")) /
          (d(col("users_a")) * d(col("users_b"))), 4).as("lift"),
        round(log(d(col("users_both")) * d(col("n")) /
          (d(col("users_a")) * d(col("users_b")))), 4).as("pmi"))
  }

  // old OrderedPrefix.distinctPrefix (no vc/out persists) driving the
  // verbatim qRevenuePareto body
  def oldDistinctPrefix(df: DataFrame, groups: Seq[String],
                        valueCol: String, buckets: Int = 1024): DataFrame = {
    val gcols = groups.map(col)
    val v = col(valueCol).cast("long")
    val base = df.filter(col(valueCol).isNotNull)
    val vc = base.groupBy((gcols :+ v.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val ext = vc.groupBy(gcols: _*)
      .agg(min(col("__v").cast("double")).as("__vmin"),
        max(col("__v").cast("double")).as("__vmax"))
    val joined =
      if (groups.isEmpty) vc.crossJoin(broadcast(ext))
      else vc.join(broadcast(ext), groups)
    val width = (col("__vmax") - col("__vmin")) / lit(buckets.toDouble)
    val bkt = when(col("__vmax") <= col("__vmin"), lit(0L))
      .otherwise(least(lit((buckets - 1).toLong),
        floor((col("__v").cast("double") - col("__vmin")) / width)
          .cast("long")))
    val vb = joined.withColumn("__bkt", bkt).drop("__vmin", "__vmax")
    val mass = col("__v").cast("decimal(38,0)") * col("__c")
    val wIn = Window.partitionBy((gcols :+ col("__bkt")): _*)
      .orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, -1)
    val inb = vb
      .withColumn("__ic", coalesce(sum(col("__c")).over(wIn), lit(0L)))
      .withColumn("__is", coalesce(sum(mass).over(wIn),
        lit(0).cast("decimal(38,0)")))
    val bt = vb.groupBy((gcols :+ col("__bkt")): _*)
      .agg(sum(col("__c")).as("__bc"), sum(mass).as("__bs"))
    val wB = Window.partitionBy(gcols: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ob = bt
      .withColumn("__oc", coalesce(sum(col("__bc")).over(wB), lit(0L)))
      .withColumn("__os", coalesce(sum(col("__bs")).over(wB),
        lit(0).cast("decimal(38,0)")))
      .select((gcols ++ Seq(col("__bkt"), col("__oc"), col("__os"))): _*)
    inb.join(broadcast(ob), groups :+ "__bkt")
      .withColumn("__cumc", col("__oc") + col("__ic"))
      .withColumn("__cums", (col("__os") + col("__is")).cast("decimal(38,0)"))
      .select((gcols ++ Seq(col("__v").as(valueCol), col("__c"),
        col("__cumc"), col("__cums"))): _*)
  }

  def oldRevenuePareto(lineitem: DataFrame, partT: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val li = lineitem.select(col("l_partkey"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
    val part = partT.select(col("p_partkey"), col("p_brand"))
    val rev = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(col("cents")).as("rev"))
      .select(col("p_brand"), (-col("rev")).as("nrev"))
    val pref = oldDistinctPrefix(rev, Seq("p_brand"), "nrev")
    val cls = pref.select(col("p_brand"), (-col("nrev")).as("v"),
      col("__c"), col("__cumc").as("f"), (-col("__cums")).as("s"))
    val tot = cls.groupBy(col("p_brand"))
      .agg(sum(col("__c")).as("n_parts"),
        sum(d38(col("v")) * col("__c")).as("t"))
    val j = expr("(__x + 5L * v - 1L) div (5L * v)")
    cls.join(broadcast(tot), Seq("p_brand"))
      .filter(lit(5) * col("s") < lit(4) * col("t") &&
        lit(5) * (col("s") + d38(col("v")) * col("__c")) >= lit(4) * col("t"))
      .withColumn("__x", (lit(4) * col("t") - lit(5) * col("s")).cast("long"))
      .select(col("p_brand"), col("n_parts"),
        round(col("t").cast("double") / lit(100.0), 2).as("total_revenue"),
        (col("f") + j).as("parts_for_80pct"),
        round((col("f") + j).cast("double") / d(col("n_parts")), 4)
          .as("share_of_parts"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("persist-batch-scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q_basket_pairs",
        () => oldBasketPairs(Tables.lineitem(spark, dir)),
        () => SparkEntry.queries("q_basket_pairs")(spark, dir)),
      ("events_window_funnel",
        () => oldWindowFunnel(Tables.events(spark, dir)),
        () => SparkEntry.queries("events_window_funnel")(spark, dir)),
      ("q_join_cardinality",
        () => oldJoinCardinalityQ(spark, dir),
        () => SparkEntry.queries("q_join_cardinality")(spark, dir)),
      ("q_integrity_audit",
        () => oldIntegrityAudit(spark, dir),
        () => SparkEntry.queries("q_integrity_audit")(spark, dir)),
      ("events_type_affinity",
        () => oldTypeAffinity(Tables.events(spark, dir)),
        () => SparkEntry.queries("events_type_affinity")(spark, dir)),
      ("q_revenue_pareto",
        () => oldRevenuePareto(Tables.lineitem(spark, dir),
          Tables.part(spark, dir)),
        () => SparkEntry.queries("q_revenue_pareto")(spark, dir)))

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
      println(f"[persistab] $name%-22s old min=${tOld.min}%.2f all=${tOld.map(t => f"$t%.2f").mkString(",")}")
      println(f"[persistab] $name%-22s new min=${tNew.min}%.2f all=${tNew.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
