package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Generic per-column table profiling — the `ANALYZE`-style statistics
  * sweep (row count, null count, exact distinct count, min/max) every
  * ingestion pipeline runs before planning joins or declaring a feed
  * healthy. One row out per input column, schema-driven: numerics and
  * timestamps carry min/max in `min_num`/`max_num` (timestamps as epoch
  * MICROSECONDS — a typed-timestamp output column would force nullable
  * timestamps on the non-timestamp rows, and NULL timestamps don't
  * survive every downstream renderer), strings in `min_str`/`max_str`.
  *
  * Distinct counts are EXACT: Spark plans the multi-column
  * count-distinct as one Expand (×|columns| row multiplication) feeding
  * a single shuffle — the honest price of exactness, paid in one pass.
  * At warehouse scale the same profile runs approximate on
  * [[graft.llm.Sketches]]' HLL (`sketch_distinct`), which this op is
  * the exact contract for.
  *
  * Scale shape: ONE aggregation over the table (all moments map-side
  * combined except the Expand for NDVs), persisted as a 1-row frame,
  * then |columns| trivial selects unioned — no per-column rescans. */
object TableProfile {

  def tableProfile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    def tsMicros(c: Column, dt: DataType): Column = dt match {
      case TimestampNTZType => unix_micros(c.cast("timestamp"))
      case _ => unix_micros(c)
    }
    val aggs: Seq[Column] = Seq(count(lit(1)).as("n_rows")) ++
      fields.zipWithIndex.flatMap { case (f, i) =>
        val c = col(f.name)
        Seq(count(c).as(s"nn_$i"), countDistinct(c).as(s"nd_$i")) ++
          (f.dataType match {
            case _: NumericType =>
              Seq(min(c).cast("double").as(s"mn_$i"),
                max(c).cast("double").as(s"mx_$i"))
            case TimestampType | TimestampNTZType =>
              Seq(tsMicros(min(c), f.dataType).cast("double").as(s"mn_$i"),
                tsMicros(max(c), f.dataType).cast("double").as(s"mx_$i"))
            case StringType =>
              Seq(min(c).as(s"ms_$i"), max(c).as(s"xs_$i"))
            case _ => Seq.empty
          })
      }
    val one = df.agg(aggs.head, aggs.tail: _*).persist()
    one.count()
    val nullNum = lit(null).cast("double")
    val nullStr = lit(null).cast("string")
    val rows = fields.zipWithIndex.map { case (f, i) =>
      val (mnNum, mxNum, mnStr, mxStr) = f.dataType match {
        case _: NumericType | TimestampType | TimestampNTZType =>
          (col(s"mn_$i"), col(s"mx_$i"), nullStr, nullStr)
        case StringType =>
          (nullNum, nullNum, col(s"ms_$i"), col(s"xs_$i"))
        case _ => (nullNum, nullNum, nullStr, nullStr)
      }
      val dt = f.dataType match {
        case TimestampNTZType => "timestamp"
        case other => other.simpleString
      }
      one.select(lit(f.name).as("column_name"), lit(dt).as("data_type"),
        col("n_rows"),
        (col("n_rows") - col(s"nn_$i")).as("n_null"),
        col(s"nd_$i").as("n_distinct"),
        mnNum.as("min_num"), mxNum.as("max_num"),
        mnStr.as("min_str"), mxStr.as("max_str"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Driver entry: profile `lineitem` (the widest, largest table). */
  def tableProfileQ(spark: SparkSession, dir: String): DataFrame =
    tableProfile(Tables.lineitem(spark, dir))
}
