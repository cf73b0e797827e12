package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Key-skew profiler: the audit a pipeline runs on a join/groupBy key
  * BEFORE committing to an unsalted shuffle. Every skew mitigation in
  * this engine (the salted as-of, the salted interval join, AQE skew
  * splits) costs something — the profile is the evidence for paying it.
  *
  * For a candidate key column it reports, over the whole frame:
  * the top-K heaviest keys with their exact row counts, each key's
  * share of all rows, its ratio to the mean rows-per-key, and
  * `salt_buckets` = ceil(cnt / mean) — the replication factor that
  * would level that key's partition back to the average (the number
  * of sub-keys a salt would need; 1 = no salting required).
  *
  * This is the generic-frame sibling of the CDC-specific
  * `cdc_key_churn` (which audits change-stream PK churn with its own
  * hot-flag convention); here the frame, key, and K are parameters and
  * the output is ranked for a dashboard.
  *
  * Scale shape: ONE map-side-combined count per key (the shuffle
  * carries (key, partial-count) pairs, never rows); the mean/total
  * reduce that counts frame to a single broadcast row (the q11 scalar
  * convention); top-K is a global TakeOrderedAndProject over the
  * counts frame — K rows to the driver, not keys. Nothing here
  * touches the original rows twice, so profiling a 100 TB fact table
  * costs one scan and a |keys|-sized exchange.
  *
  * Determinism: ties in count break by key ascending; share/ratio are
  * ratios of exact longs rounded 4dp at output (the float rule).
  */
object SkewProfile {

  def skewProfile(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n_rows"))
    val stats = broadcast(counts.agg(
      sum(col("n_rows")).as("total_rows"),
      count(lit(1)).as("n_keys")))
    counts
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(topK)
      .crossJoin(stats)
      .select(
        col("key"),
        col("n_rows"),
        round(col("n_rows") / col("total_rows"), 4).as("share"),
        round(col("n_rows") * col("n_keys") / col("total_rows"), 4).as("x_mean"),
        ceil(col("n_rows") * col("n_keys") / col("total_rows")).as("salt_buckets"))
  }

  /** Driver entry: profile the event stream's `user_id` — the key the
    * sessionizer, the as-of join and the retention queries all shuffle
    * on, and the first place a bot account or a null-key sentinel shows
    * up as a hot partition. */
  def skewProfileQ(spark: SparkSession, dir: String): DataFrame =
    skewProfile(Tables.events(spark, dir), "user_id", topK = 20)
      .withColumnRenamed("key", "user_id")
}
