package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Export

class ExportSpec extends AnyFunSuite with SparkFixture {

  private def docs = Tables.documents(spark, sfDir).select("doc_id", "text")

  test("shards reassemble to the corpus; manifest totals match") {
    val out = tmpDir("shards_")
    val manifest = Export.exportShards(docs, out, nShards = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest.keySet.subsetOf((0L until 4L).toSet))
    assert(manifest.values.map(_._1).sum === docs.count())
    // read-back equals the corpus exactly (no doc lost, none duplicated)
    val back = spark.read.parquet(out).select("doc_id", "text")
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // every doc sits in the shard the consistent hash says, so a
    // re-export (or another engine) finds it in the same place
    val misplaced = spark.read.parquet(out)
      .withColumn("want", Export.shardCol(4))
      .filter(col("shard") =!= col("want"))
    assert(misplaced.count() === 0)
  }

  test("manifest checksum: deterministic, order-independent, corruption-sensitive") {
    def sums(df: org.apache.spark.sql.DataFrame) =
      Export.manifest(df, 4).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val base = sums(docs)
    assert(base === sums(docs.orderBy(rand(7))), "row order changed the checksum")
    // flip one doc's content: exactly its shard's checksum moves
    val tampered = docs.withColumn("text",
      when(col("doc_id") === 3, concat(col("text"), lit(" tampered")))
        .otherwise(col("text")))
    val after = sums(tampered)
    val movedShards = base.keySet.filter(s => base(s) != after(s))
    val shard3 = Export.manifest(docs.filter(col("doc_id") === 3), 4)
      .collect().head.getLong(0)
    assert(movedShards === Set(shard3),
      s"tampering doc 3 (shard $shard3) moved checksums of $movedShards")
  }
}
