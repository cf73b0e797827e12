package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Document deduplication for LLM training corpora, over `documents`.
  *
  * Four tiers, cheapest first:
  *  - exact:         hash-groupBy keep-first (one shuffle)
  *  - ngram_jaccard: exact n-gram Jaccard via inverted-index join
  *  - minhash:       MinHash signatures + LSH band buckets (scale path)
  *  - simhash:       64-bit SimHash + block buckets + hamming verify
  *
  * Scale design (100 TB): every candidate-generation step is map-side until
  * a single hash-shuffle on a bucket key (text hash, shingle, band hash, or
  * simhash block). Candidate PAIRS only materialize inside buckets — never
  * the O(n²) cross product. Signatures are computed once per doc and
  * persisted before the self-join so the corpus is scanned once.
  */
object Dedup {

  /** Distinct word n-gram shingles of `text` (lower-cased, whitespace
    * tokens). Empty for docs shorter than n tokens. */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(c)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Exact dedup, keep-first: group by content hash, keep the smallest
    * doc_id. Single hash aggregation with map-side partial combine — at
    * 100 TB this shuffles one (hash, id, count) triple per distinct text,
    * not the text itself. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard pairs at threshold `tau`.
    *
    * Inverted-index shape: explode distinct shingles, self-join on the
    * shingle (the ONLY shuffle key), count shared shingles per pair, then
    * |A∩B| / (|A|+|B|−|A∩B|) ≥ τ. Shingles unique to one doc join to
    * nothing and cost only their hash; ultra-frequent shingles are the
    * skew risk at 100 TB (m docs sharing a shingle → m² bucket pairs) —
    * the MinHash variant below is the scale path for that regime. */
  def dedupNgramJaccard(docs: DataFrame, tau: Double = 0.8, n: Int = 3): DataFrame = {
    val sh = docs.select(col("doc_id"), explode(shingles(col("text"), n)).as("sh"))
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("ca.n_sh") + col("cb.n_sh") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  // --- MinHash + LSH ---

  /** Signature width and banding: 64 hashes in 16 bands of 4 rows.
    * P(candidate | J) = 1-(1-J^4)^16: ≈1.0 at J=0.8, ≈1e-4 at J=0.05. */
  val NumHashes = 64
  val NumBands = 16
  val RowsPerBand = NumHashes / NumBands

  /** Prime just above 2^31 for the affine permutations. The modulus must
    * be SMALL relative to a*h (so the product wraps ~2^31 times): with a
    * large prime like 2^61−1 the map wraps at most once and stays
    * piecewise-monotonic in h — every "permutation" then picks nearly the
    * same minimum and est_sim is wildly inflated. a,h < 2^31 keeps
    * a*h+b < 2^62: no overflow under ANSI mode. */
  val MinhashPrime = 2147483659L

  /** Seeded affine permutation coefficients (a odd-ish in [1, 2^31), b in
    * [0, 2^31)) — deterministic across runs and executors. */
  val MinhashSeeds: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumHashes)((rnd.nextInt(Int.MaxValue).toLong + 1L,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature (array of 64 longs) of a shingle array column.
    * Pure expression tree — evaluated map-side inside codegen, no shuffle,
    * no UDF. */
  def minhashSig(shCol: String): Column = {
    val seedsSql = MinhashSeeds
      .map { case (a, b) => s"named_struct('a', ${a}L, 'b', ${b}L)" }
      .mkString("array(", ", ", ")")
    expr(
      s"""transform($seedsSql, s ->
         |  array_min(transform($shCol, sh ->
         |    pmod(s.a * pmod(xxhash64(sh), ${MinhashPrime}L) + s.b, ${MinhashPrime}L))))
         |""".stripMargin)
  }

  /** MinHash+LSH near-duplicate candidate pairs with signature-estimated
    * similarity ≥ `minEstSim`.
    *
    * Plan: one corpus scan computes (doc_id, sig); persisted so the band
    * explode and the pair verification reuse it. Bands shuffle only
    * (band_idx, band_hash, doc_id); pairs materialize per bucket, are
    * distinct-ed (a pair can collide in several bands), then the two
    * signature joins re-attach sigs for verification — joins on a pair set
    * that is ≪ corpus. */
  def dedupMinhash(docs: DataFrame, minEstSim: Double = 0.5): DataFrame = {
    val sigs = docs
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSig("sh").as("sig"))
      .persist()
    val bands = sigs.select(
      col("doc_id"),
      explode(expr(
        s"""transform(sequence(0, ${NumBands - 1}), j ->
           |  named_struct('band', j, 'bh',
           |    xxhash64(concat_ws(',', transform(
           |      slice(sig, j * $RowsPerBand + 1, $RowsPerBand),
           |      x -> CAST(x AS STRING))))))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val est = expr(
      """aggregate(zip_with(sa, sb, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
        |  0, (acc, v) -> acc + v)""".stripMargin)
      .cast("double") / NumHashes
    cand
      .join(sigs.as("pa"), col("doc_a") === col("pa.doc_id"))
      .join(sigs.as("pb"), col("doc_b") === col("pb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        col("pa.sig").as("sa"), col("pb.sig").as("sb"))
      .select(col("doc_a"), col("doc_b"), est.as("est_sim"))
      .filter(col("est_sim") >= minEstSim)
  }

  // --- SimHash ---

  /** 64-bit SimHash of a shingle array: per-bit ±1 votes over xxhash64 of
    * each distinct shingle, bit set where the vote is positive. Entirely
    * expression-level (aggregate/zip_with over the shingle array), so it
    * runs map-side in codegen. */
  def simhashSig(shCol: String): Column = expr(
    s"""aggregate(
       |  zip_with(
       |    aggregate($shCol, array_repeat(CAST(0 AS BIGINT), 64),
       |      (acc, sh) -> zip_with(acc,
       |        transform(sequence(0, 63), i ->
       |          CASE WHEN (shiftright(xxhash64(sh), i) & 1) = 1
       |               THEN 1 ELSE -1 END),
       |        (a, v) -> a + v)),
       |    sequence(0, 63),
       |    (vote, i) -> CASE WHEN vote > 0
       |                 THEN shiftleft(CAST(1 AS BIGINT), i)
       |                 ELSE CAST(0 AS BIGINT) END),
       |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin)

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming` (≤3).
    *
    * Pigeonhole banding: split the 64-bit signature into 4 blocks of 16
    * bits; any pair within hamming 3 shares at least one block verbatim, so
    * bucketing by (block_idx, block_value) finds ALL such pairs while only
    * shuffling (block, doc_id). Exact hamming (bit_count of xor) verifies
    * candidates. */
  def dedupSimhash(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = docs
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), simhashSig("sh").as("sig"))
      .persist()
    val blocks = sigs.select(
      col("doc_id"), col("sig"),
      explode(expr(
        """transform(sequence(0, 3), j ->
          |  named_struct('blk', j,
          |    'v', shiftright(sig, j * 16) & 65535))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.blk").as("blk"), col("b.v").as("v"))
    blocks.as("x")
      .join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // --- SparkEntry wiring ---
  def dedupExactQ(spark: SparkSession, dir: String): DataFrame =
    dedupExact(Tables.documents(spark, dir))
  def dedupNgramJaccardQ(spark: SparkSession, dir: String): DataFrame =
    dedupNgramJaccard(Tables.documents(spark, dir))
  def dedupMinhashQ(spark: SparkSession, dir: String): DataFrame =
    dedupMinhash(Tables.documents(spark, dir))
  def dedupSimhashQ(spark: SparkSession, dir: String): DataFrame =
    dedupSimhash(Tables.documents(spark, dir))
}
