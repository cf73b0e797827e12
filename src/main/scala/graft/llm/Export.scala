package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-shard export — the LAST step of the data pipeline: hand the
  * trainer N deterministic, evenly-sized shards plus a manifest it can
  * trust without re-reading the data.
  *
  *  - Shard assignment is the shared Knuth consistent hash
  *    ([[TextOps.sampleBucket]]'s mix) mod `nShards` — deterministic
  *    across runs/engines, independent of partition layout, and
  *    re-export of the same corpus lands every doc in the same shard
  *    (resumable distributed export).
  *  - One shuffle: repartition BY the shard column, so ALL of a shard's
  *    rows land in one task (a task may own several shards when their
  *    hashes collide, but no shard is ever split across tasks) and each
  *    `shard=K/` directory is written by exactly one writer, rows sorted
  *    by doc_id for reproducible files.
  *  - The manifest rides the SAME pass (per-shard doc/token counts and
  *    an order-independent content checksum — bit_xor of the doc
  *    content hashes, so any changed/missing/extra doc flips it).
  *    Trainer-side integrity checking needs no corpus scan.
  */
object Export {

  def shardCol(nShards: Int) =
    pmod(TextOps.sampleBucket, lit(nShards.toLong)).as("shard")

  /** Write `docs` into `nShards` shard directories under `outDir` and
    * return the manifest (shard, n_docs, n_tokens, checksum). */
  def exportShards(docs: DataFrame, outDir: String,
                   nShards: Int = 8): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val sharded = docs
      .withColumn("shard", shardCol(nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    manifest(docs, nShards)
  }

  /** The manifest alone (no write): per-shard doc count, whitespace
    * token count, and the order-independent 64-bit content checksum. */
  def manifest(docs: DataFrame, nShards: Int = 8): DataFrame =
    docs
      .withColumn("shard", shardCol(nShards))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text")))).as("n_tokens"),
        bit_xor(xxhash64(col("text"))).as("checksum"))

  /** Driver query: manifest WITHOUT the engine-specific checksum column
    * (xxhash64 has no DuckDB twin — the checksum is pinned instead by
    * ExportSpec's determinism and corruption-detection tests). */
  def corpusShardsQ(spark: SparkSession, dir: String): DataFrame =
    manifest(Tables.documents(spark, dir)).drop("checksum")
}
