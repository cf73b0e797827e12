package graft

import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableProfile

/** Pins for the single-sourced table_profile oracle (r15): the
  * declared column inventory the DuckDB oracle is GENERATED from must
  * match the real lineitem parquet schema exactly — the drift the r14
  * verdict flagged when the oracle was a free-standing copy. */
class TableProfileSpec extends AnyFunSuite with SparkFixture {

  test("LineitemProfileColumns ≡ the real parquet schema") {
    val rendered = Tables.lineitem(spark, sfDir).schema.fields.toSeq
      .map(f => f.name -> (f.dataType match {
        case TimestampNTZType => "timestamp"
        case other => other.simpleString
      }))
    assert(rendered === TableProfile.LineitemProfileColumns,
      "the oracle's declared inventory drifted from the parquet schema")
  }

  test("profile leaves nothing persisted behind (r14 board-delta fix)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    TableProfile.tableProfileQ(spark, sfDir).collect()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"tableProfile cached/checkpointed RDDs it never released: " +
        s"${after -- before}")
  }
}
