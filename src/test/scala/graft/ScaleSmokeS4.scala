package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** 10× scale smoke for the session-4 operator family (VERDICT r10 #6):
  * the last ScaleSmoke predates them. Replicates sf0.1 with shifted ids
  * into a temp WAREHOUSE DIR (the s4 entries take (spark, dir), so the
  * smoke feeds them a real 10× table set), runs each op at 1× and 10×,
  * and prints both so the ratio is read off directly. ~Linear expected:
  * every op here is one-shuffle or map-side by design. */
object ScaleSmokeS4 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val dir10 = java.nio.file.Files.createTempDirectory("s4_10x_").toString

    def times10(df: DataFrame, shifts: Map[String, Long]): DataFrame =
      (0 until 10).map { i =>
        shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s))
        }
      }.reduce(_ unionByName _)

    t("write 10x warehouse") {
      times10(Tables.events(spark, dir),
        Map("event_id" -> 10000000L, "user_id" -> 100000L))
        .write.parquet(s"$dir10/events.parquet")
      times10(Tables.orders(spark, dir),
        Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
        .write.parquet(s"$dir10/orders.parquet")
      times10(Tables.lineitem(spark, dir), Map("l_orderkey" -> 10000000L))
        .write.parquet(s"$dir10/lineitem.parquet")
      times10(Tables.documents(spark, dir), Map("doc_id" -> 1000000L))
        .write.parquet(s"$dir10/documents.parquet")
    }
    println("=== events 10x: " + Tables.events(spark, dir10).count() +
      " docs 10x: " + Tables.documents(spark, dir10).count())

    import graft.llm.{Dedup, Multimodal, TextOps}
    import graft.queries.Analytics3

    // untimed warmup at 1x: the first execution of each plan pays
    // Janino codegen + reader init, which otherwise lands entirely in
    // the 1x column and understates every ratio
    noop(Multimodal.mediaPhashQ(spark, dir))
    noop(Multimodal.mediaPhashIncrementalQ(spark, dir))
    noop(Analytics3.eventsBotProfile(spark, dir))
    noop(Analytics3.qCohortLtv(spark, dir))
    noop(Analytics3.qFulfillmentLag(spark, dir))
    noop(Dedup.textSimilarTopk(Tables.documents(spark, dir)))
    noop(TextOps.textHtmlStrip(Tables.documents(spark, dir)))

    // one-shuffle confirmation for the lag-window + rollup pair
    val botPlan = Analytics3.eventsBotProfile(spark, dir10)
      .queryExecution.executedPlan.toString
    println("=== events_bot_profile exchanges: " +
      "Exchange hashpartitioning".r.findAllIn(botPlan).length)

    for ((label, d) <- Seq(("1x", dir), ("10x", dir10))) {
      t(s"media_phash $label")(noop(Multimodal.mediaPhashQ(spark, d)))
      t(s"media_phash_incremental $label (store build + probe)")(
        noop(Multimodal.mediaPhashIncrementalQ(spark, d)))
      t(s"events_bot_profile $label")(
        noop(Analytics3.eventsBotProfile(spark, d)))
      t(s"q_cohort_ltv $label")(noop(Analytics3.qCohortLtv(spark, d)))
      t(s"q_fulfillment_lag $label")(noop(Analytics3.qFulfillmentLag(spark, d)))
      t(s"text_similar_topk $label")(
        noop(Dedup.textSimilarTopk(Tables.documents(spark, d))))
      t(s"text_html_strip $label")(
        noop(TextOps.textHtmlStrip(Tables.documents(spark, d))))
    }
    // the 10x replica corpus is 90% duplicates — the collapse gate must
    // have picked the rep path for text_similar_topk (printed for the
    // PROGRESS note; the direct path measured 98 s on this regime)
    spark.stop()
  }
}
