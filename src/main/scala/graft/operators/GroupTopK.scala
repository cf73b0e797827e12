package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic per-group top-k — the "N best rows per key" shape q3/q10/
  * text_ngram_topk inline, packaged as an operator with the skew-bounded
  * two-phase plan [[graft.llm.Ann.annTopK]] uses for its query groups.
  *
  * The naive plan (`row_number` over `partitionBy(keys)` then
  * `rank <= k`) shuffles EVERY row of a group to one task and sorts it
  * there — a hot key (one user with 100M events, one n-gram in every
  * doc) serializes into a single task's sort. The two-phase plan bounds
  * that: each input partition keeps its own local top-k per key first
  * (sort bounded by that partition's slice), so the global pass sees at
  * most k × #partitions rows per key regardless of skew.
  *
  * The local pass rides `spark_partition_id()` — correctness does not
  * depend on how rows are distributed, only the local-pass SIZE does, so
  * the result is identical to the naive window for any input layout
  * (GroupTopKSpec pins it, plus a randomized cross-check).
  *
  * `ordering` must be a TOTAL order (include a unique tiebreak column,
  * as every graft top-N query does) — under ties at the k boundary the
  * kept row set would otherwise be partition-layout-dependent in ANY
  * top-k plan, this one included.
  */
object GroupTopK {

  def topK(df: DataFrame, keyCols: Seq[String], ordering: Seq[Column],
           k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val keys = keyCols.map(col)
    val local = Window.partitionBy(keys :+ spark_partition_id(): _*)
      .orderBy(ordering: _*)
    val global = Window.partitionBy(keys: _*).orderBy(ordering: _*)
    df.withColumn("__ltk", row_number().over(local))
      .filter(col("__ltk") <= k)
      .withColumn("__gtk", row_number().over(global))
      .filter(col("__gtk") <= k)
      .drop("__ltk", "__gtk")
  }
}
