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
  * Distinct counts are EXACT, and deliberately NOT via the single-agg
  * multi-count-distinct form: Spark plans that as one Expand
  * (×|columns| row multiplication) through one shuffle — measured 179×
  * wall at a 10× scale-up (6M-row lineitem, ScaleSmokeR13b). Instead
  * each column gets its own two-stage distinct-agg branch: on a
  * COLUMNAR store the |columns| single-column scans read the same
  * total bytes as one wide scan, each branch's shuffle is bounded by
  * that column's cardinality (map-side partial distinct), and the
  * branches run as independent stages of one DAG. At warehouse scale
  * the same profile runs approximate on [[graft.llm.Sketches]]' HLL
  * (`sketch_distinct`), which this op is the exact contract for.
  *
  * Scale shape: one aggregation for counts/nulls/min/max (map-side
  * combined, persisted as a 1-row frame) + |columns| cardinality-
  * bounded NDV branches, broadcast-joined — no Expand anywhere. */
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
        Seq(count(c).as(s"nn_$i")) ++
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
    // materialize (not persist): the 1-row frame is referenced by every
    // per-column row; localCheckpoint cuts the lineage without leaving
    // a cached frame behind per invocation (r13 advice)
    val one = graft.Exec.materialize(df.agg(aggs.head, aggs.tail: _*))
    // per-column NDV branches: a union of two-stage distinct aggs, each
    // shuffle bounded by its column's cardinality
    val ndv = fields.map { f =>
      df.agg(countDistinct(col(f.name)).as("n_distinct"))
        .select(lit(f.name).as("column_name"), col("n_distinct"))
    }.reduce(_ unionByName _)
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
        mnNum.as("min_num"), mxNum.as("max_num"),
        mnStr.as("min_str"), mxStr.as("max_str"))
    }
    rows.reduce(_ unionByName _)
      .join(broadcast(ndv), Seq("column_name"))
      .select(col("column_name"), col("data_type"), col("n_rows"),
        col("n_null"), col("n_distinct"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"))
  }

  /** Driver entry: profile `lineitem` (the widest, largest table). */
  def tableProfileQ(spark: SparkSession, dir: String): DataFrame =
    tableProfile(Tables.lineitem(spark, dir))
}
