package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical readers for the test warehouse (TPC-H-ish star schema +
  * `events`/`documents`/`embeddings`, see TESTDATA.md).
  *
  * Plain `spark.read.parquet` keeps the scan declarative so Catalyst pushes
  * filters/projections into the parquet reader (verify via `PushedFilters`
  * in `.explain`).
  */
object Tables {

  /** Session configuration every graft entry point (Verify/Bench/tests)
    * applies at build time. `nanosAsLong`: `events.ts` is parquet INT64
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects — read it as
    * a raw long and floor-divide to micros, the same truncation DuckDB
    * applies, so oracle comparisons line up exactly. Set once here, not per
    * read (a reader-side `spark.conf.set` is a racy global side effect). */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** `events.ts` has shipped in TWO parquet encodings across driver data
    * refreshes: INT64 TIMESTAMP(NANOS) (read as a raw long under
    * `nanosAsLong` and floor-divided to micros — integer `div`, a double
    * division would lose precision on ~1.7e18 nanosecond values > 2^53)
    * and, since the r10 refresh, plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ, cast to TIMESTAMP
    * under the UTC session zone — same instants, and the same value
    * DuckDB's reader hands the oracle). Dispatch on the actual file
    * schema so either vintage reads identically. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
}
