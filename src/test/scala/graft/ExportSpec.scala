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

  test("exportShards rejects shard counts past the observe-aggregate bound") {
    // 3 driver-built observe aggregates per shard: unbounded nShards
    // would blow up planning/codegen (ADVICE r8)
    intercept[IllegalArgumentException] {
      Export.exportShards(docs, tmpDir("shards_"), nShards = 1025)
    }
    intercept[IllegalArgumentException] {
      Export.exportShards(docs, tmpDir("shards_"), nShards = 0)
    }
  }

  test("export manifest rides the write job: one corpus scan, local result") {
    val out = tmpDir("shards_once_")
    val srcDir = tmpDir("shards_src_")
    docs.write.mode("overwrite").parquet(srcDir)
    val src = spark.read.parquet(srcDir)
    val want = Export.manifest(src, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val m = Export.exportShards(src, out, nShards = 4)
    // observed inside the write: the returned frame is a LocalRelation —
    // nothing left to scan
    assert(m.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    // black-box proof of the same: delete the SOURCE, manifest still
    // collects, and agrees with the standalone grouped manifest
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(srcDir), true)
    val got = m.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
  }

  test("split export: tree reassembles, placement verified, manifest agrees") {
    val out = tmpDir("split_shards_")
    val m = Export.exportSplitShards(docs, out, nShards = 4)
    // manifest rides the write: local relation, nothing left to scan
    assert(m.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    val got = m.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // totals cover the corpus; all three splits materialized
    assert(got.values.map(_._1).sum === docs.count())
    assert(got.keySet.map(_._1) === Set("train", "val", "test"))
    // read-back equals the corpus exactly
    val back = spark.read.parquet(out)
    assert(back.select("doc_id", "text").exceptAll(docs).isEmpty &&
      docs.exceptAll(back.select("doc_id", "text")).isEmpty)
    // every doc sits where split + shard hashes say — re-exports and
    // other engines find it in the same leaf
    val misplaced = back
      .withColumn("wantSplit", graft.llm.TextOps.splitCol())
      .withColumn("wantShard", Export.shardCol(4))
      .filter(col("split") =!= col("wantSplit") ||
        col("shard") =!= col("wantShard"))
    assert(misplaced.count() === 0)
    // standalone recount agrees with the observed manifest
    val want = Export.splitManifest(docs, 4).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === want)
    // each split's shards fill evenly-ish: the decorrelated multipliers
    // mean no split inherits a contiguous bucket range's shard skew
    val trainShards = got.keys.filter(_._1 == "train").map(_._2).toSet
    assert(trainShards === (0L until 4L).toSet, s"train shards: $trainShards")
  }

  test("checksum is keyed: duplicate-pair add and id re-keying both flip it") {
    import spark.implicits._
    def sum1(rows: Seq[(Long, String)]): Long =
      Export.manifest(rows.toDF("doc_id", "text"), 1).collect().head.getLong(3)
    val base = Seq(1L -> "alpha text", 2L -> "beta text")
    // adding a PAIR of identical texts: a text-only xor would cancel
    // (h(x) XOR h(x) = 0) and miss it; the keyed checksum must move
    assert(sum1(base) !== sum1(base ++ Seq(3L -> "gamma text", 4L -> "gamma text")))
    // swapping two docs' ids leaves the text multiset identical — only a
    // keyed checksum can see the corruption
    assert(sum1(base) !== sum1(Seq(1L -> "beta text", 2L -> "alpha text")))
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

  test("jsonl export: same placement and manifest as parquet, round trips") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source")
    val pqDir = tmpDir("shards_pq_")
    val jlDir = tmpDir("shards_jl_")
    val mPq = Export.exportShards(docs, pqDir, nShards = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    val mJl = Export.exportShardsJsonl(docs, jlDir, nShards = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // identical manifests: same consistent-hash placement, same totals,
    // same keyed checksums — only the sink encoder differs
    assert(mJl === mPq)
    // the jsonl tree is gzip .json files that round-trip to the corpus
    val files = new java.io.File(jlDir).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty)
    val back = spark.read.json(jlDir)
      .select("doc_id", "text", "lang", "source")
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
