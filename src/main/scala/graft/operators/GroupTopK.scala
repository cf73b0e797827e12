package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic per-group top-k — the "N best rows per key" shape q3/q10/
  * text_ngram_topk inline, packaged as one operator.
  *
  * The plan is the plain rank-and-filter window — and that is the point:
  * Spark 4's `InferWindowGroupLimit` rule recognizes `row_number() ≤ k`
  * and inserts a map-side partial `WindowGroupLimit` BEFORE the
  * exchange, so at most k rows per key per input partition ever cross
  * the wire, and the post-shuffle sort sees ≤ k × #input-partitions rows
  * per key regardless of skew. A hand-rolled two-phase construction
  * (local top-k per `spark_partition_id`, then global — the shape
  * [[graft.llm.Ann.annTopK]] needs for its NON-rank scoring) was
  * measured to duplicate exactly this bounding at the cost of a second
  * exchange and two extra sorts, so the operator deliberately leans on
  * the engine rule instead; GroupTopKSpec pins the `WindowGroupLimit
  * Partial` in the executed plan so an engine or query change that
  * silently loses the bounding fails the suite.
  *
  * `ordering` must be a TOTAL order (include a unique tiebreak column,
  * as every graft top-N query does) — under ties at the k boundary the
  * kept row set would otherwise be partition-layout-dependent.
  */
object GroupTopK {

  def topK(df: DataFrame, keyCols: Seq[String], ordering: Seq[Column],
           k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // collision-proof temp column: never silently replace caller data
    val rank = Iterator.from(0).map(i => s"__gtk$i")
      .find(n => !df.columns.contains(n)).get
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn(rank, row_number().over(w))
      .filter(col(rank) <= k)
      .drop(rank)
  }

  /** Driver entry (r12, upgrading this operator from test-only to
    * oracle-checked): per event_type, the 3 most active users by exact
    * event count, ties to the smaller user_id — the "top accounts per
    * segment" report, and a live exercise of the WindowGroupLimit
    * bounding on a real aggregate (the counts frame shuffles once;
    * the rank window rides the same event_type partitioning). */
  def eventsGroupTopKQ(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    val counts = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    topK(counts, Seq("event_type"),
      Seq(col("n").desc, col("user_id").asc), 3)
  }
}
