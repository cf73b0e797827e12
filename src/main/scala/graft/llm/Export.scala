package graft.llm

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
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
  *  - The manifest rides the SAME job (CollectMetrics inside the write —
  *    the [[graft.cdc.MergePipeline.mergeBatch]] Observation pattern):
  *    per-shard doc/token counts and an order-independent content
  *    checksum, computed as the rows stream to the writers. The corpus
  *    is scanned exactly ONCE — at 100 TB a trailing manifest scan would
  *    double the export's IO.
  *  - The checksum is `bit_xor(xxhash64(doc_id, text))`: keyed by BOTH
  *    identity and content, so a changed doc, a missing/extra doc, or
  *    two docs swapping ids all flip it. Hashing text alone would cancel
  *    pairwise on duplicate texts (x XOR x = 0 — adding or dropping a
  *    duplicate PAIR went unseen) and miss re-keying entirely.
  */
object Export {

  def shardCol(nShards: Int) =
    pmod(TextOps.sampleBucket, lit(nShards.toLong)).as("shard")

  /** Per-row content hash behind the manifest checksum. doc_id seeds the
    * fold (multi-arg xxhash64 chains arg-by-arg), so identical texts
    * under different ids hash differently. */
  private def contentHash = xxhash64(col("doc_id"), col("text"))

  /** Write `docs` into `nShards` shard directories under `outDir` and
    * return the manifest (shard, n_docs, n_tokens, checksum), observed
    * inside the write job — one corpus scan total. Shards that received
    * no docs are absent from the manifest (same shape as [[manifest]]).
    * The returned frame is a LOCAL relation: collecting it re-reads
    * nothing. */
  def exportShards(docs: DataFrame, outDir: String,
                   nShards: Int = 8): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // 3 observe aggregates per shard are driver-built expressions: fine
    // for the export-config range (8-64, even a few hundred), but an
    // unbounded nShards would blow up planning/codegen with tens of
    // thousands of aggregates. Shard counts beyond this belong to a
    // groupBy manifest ([[manifest]]) + join, not per-shard observe slots.
    require(nShards <= 1024,
      s"nShards=$nShards too large for observe-based manifest; " +
        "use manifest() + a second scan beyond 1024 shards")
    val spark = docs.sparkSession
    val sharded = docs
      .withColumn("shard", shardCol(nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    // 3 conditional aggregates per shard: nShards is a small export-config
    // constant (8-64), so the expression list is bounded and driver-built;
    // all of it evaluates in the writers' single pass over the rows
    val ntok = size(TextOps.tokens(col("text")))
    val aggs = (0 until nShards).flatMap { k =>
      val in = col("shard") === k
      Seq(count(when(in, 1)).as(s"d$k"),
        sum(when(in, ntok)).as(s"t$k"),
        bit_xor(when(in, contentHash)).as(s"c$k"))
    }
    val obs = Observation("export_shards")
    sharded.observe(obs, aggs.head, aggs.tail: _*)
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    // missing metrics ⇔ the write ran zero tasks ⇔ empty corpus
    val row = scala.util.Try(obs.get).getOrElse(Map.empty[String, Any])
    def long(k: String): Long = row.get(k) match {
      case Some(v: Long) => v
      case _ => 0L
    }
    import spark.implicits._
    (0 until nShards)
      .map(k => (k.toLong, long(s"d$k"), long(s"t$k"), long(s"c$k")))
      .filter(_._2 > 0)
      .toDF("shard", "n_docs", "n_tokens", "checksum")
  }

  /** [[exportShards]] in the wire format most trainers actually consume:
    * gzip JSON-LINES shards (one JSON object per document, shard=K
    * directory tree) with the SAME consistent-hash placement, writer
    * fan-out, within-shard doc_id ordering, and manifest contract. A
    * parquet shard is the better interchange format (typed, splittable,
    * columnar); this exists because tokenizer/training stacks that read
    * `.jsonl.gz` outnumber the ones that read parquet, and a hand-off
    * format the trainer can't read is not a hand-off. Same one shuffle
    * — only the sink encoder differs. */
  def exportShardsJsonl(docs: DataFrame, outDir: String,
                        nShards: Int = 8): DataFrame = {
    require(nShards > 0 && nShards <= 1024, s"bad nShards=$nShards")
    val spark = docs.sparkSession
    val sharded = docs
      .withColumn("shard", shardCol(nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    val ntok = size(TextOps.tokens(col("text")))
    val aggs = (0 until nShards).flatMap { k =>
      val in = col("shard") === k
      Seq(count(when(in, 1)).as(s"d$k"),
        sum(when(in, ntok)).as(s"t$k"),
        bit_xor(when(in, contentHash)).as(s"c$k"))
    }
    val obs = Observation("export_shards_jsonl")
    sharded.observe(obs, aggs.head, aggs.tail: _*)
      .write.mode("overwrite").partitionBy("shard")
      .option("compression", "gzip").json(outDir)
    val row = scala.util.Try(obs.get).getOrElse(Map.empty[String, Any])
    def long(k: String): Long = row.get(k) match {
      case Some(v: Long) => v
      case _ => 0L
    }
    import spark.implicits._
    (0 until nShards)
      .map(k => (k.toLong, long(s"d$k"), long(s"t$k"), long(s"c$k")))
      .filter(_._2 > 0)
      .toDF("shard", "n_docs", "n_tokens", "checksum")
  }

  /** Split-aware export — the complete trainer hand-off: the corpus
    * lands as a `split=train|val|test / shard=K` directory tree and the
    * trainer mounts each split's shard set directly. Destination comes
    * from [[TextOps.splitCol]], placement within the split from the
    * shared Knuth shard hash — DIFFERENT multipliers (the corpusSplit
    * decorrelation), so each split's shards fill evenly instead of
    * inheriting the split boundary's bucket ranges. Same contracts as
    * [[exportShards]]: ONE shuffle (by split, shard), one writer per
    * leaf directory, rows sorted for reproducible files, and the
    * per-(split, shard) manifest (docs, tokens, keyed checksum) observed
    * inside the write job — one corpus scan total. */
  def exportSplitShards(docs: DataFrame, outDir: String,
                        nShards: Int = 8): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // 3 splits × nShards × 3 observe slots — same planning bound as
    // exportShards, a third the shard headroom
    require(nShards <= 256,
      s"nShards=$nShards too large for observe-based split manifest; " +
        "use splitManifest() + a second scan beyond 256 shards")
    val spark = docs.sparkSession
    val splits = Seq("train", "val", "test")
    val sharded = docs
      .withColumn("split", TextOps.splitCol())
      .withColumn("shard", shardCol(nShards))
      .repartition(splits.size * nShards, col("split"), col("shard"))
      .sortWithinPartitions(col("split"), col("shard"), col("doc_id"))
    val ntok = size(TextOps.tokens(col("text")))
    val aggs = for {
      (s, si) <- splits.zipWithIndex
      k <- 0 until nShards
      a <- {
        val in = col("split") === s && col("shard") === k
        Seq(count(when(in, 1)).as(s"d${si}_$k"),
          sum(when(in, ntok)).as(s"t${si}_$k"),
          bit_xor(when(in, contentHash)).as(s"c${si}_$k"))
      }
    } yield a
    val obs = Observation("export_split_shards")
    sharded.observe(obs, aggs.head, aggs.tail: _*)
      .write.mode("overwrite").partitionBy("split", "shard").parquet(outDir)
    val row = scala.util.Try(obs.get).getOrElse(Map.empty[String, Any])
    def long(k: String): Long = row.get(k) match {
      case Some(v: Long) => v
      case _ => 0L
    }
    import spark.implicits._
    (for { (s, si) <- splits.zipWithIndex; k <- 0 until nShards }
      yield (s, k.toLong,
        long(s"d${si}_$k"), long(s"t${si}_$k"), long(s"c${si}_$k")))
      .filter(_._3 > 0)
      .toDF("split", "shard", "n_docs", "n_tokens", "checksum")
  }

  /** The split manifest alone (no write, one agg scan) — the recount
    * partner of [[exportSplitShards]]. */
  def splitManifest(docs: DataFrame, nShards: Int = 8): DataFrame =
    docs
      .withColumn("split", TextOps.splitCol())
      .withColumn("shard", shardCol(nShards))
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text")))).as("n_tokens"),
        bit_xor(contentHash).as("checksum"))

  /** The manifest alone (no write, one agg scan): per-shard doc count,
    * whitespace token count, and the order-independent 64-bit keyed
    * content checksum. */
  def manifest(docs: DataFrame, nShards: Int = 8): DataFrame =
    docs
      .withColumn("shard", shardCol(nShards))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text")))).as("n_tokens"),
        bit_xor(contentHash).as("checksum"))

  /** Driver query: manifest WITHOUT the engine-specific checksum column
    * (xxhash64 has no DuckDB twin — the checksum is pinned instead by
    * ExportSpec's determinism and corruption-detection tests). */
  def corpusShardsQ(spark: SparkSession, dir: String): DataFrame =
    manifest(Tables.documents(spark, dir)).drop("checksum")

  /** Driver query: split manifest sans the engine-specific checksum. */
  def corpusSplitShardsQ(spark: SparkSession, dir: String): DataFrame =
    splitManifest(Tables.documents(spark, dir)).drop("checksum")
}
