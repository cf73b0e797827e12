package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Span-level exact dedup (the "paragraph/line dedup" of C4-style
  * pipelines, generalized): split every document into fixed-size token
  * chunks, drop every chunk whose exact text already occurred earlier in
  * the corpus (first occurrence wins, ordered by (doc_id, chunk_ord)),
  * and reassemble the surviving chunks into the cleaned document. A doc
  * whose every chunk occurred before (e.g. an exact copy of an earlier
  * doc) disappears entirely — span dedup subsumes whole-doc exact dedup.
  *
  * On corpora with newline structure the chunker would be
  * `split(text, '\n')` (true paragraph dedup); the synthetic `documents`
  * table is single-line (TESTDATA.md), so the fixed-token chunker stands
  * in — the plan shape is identical either way.
  *
  * Scale design: the dedup key is a 128-bit hash pair of the chunk (two
  * independent xxhash64 seeds — same collision stance as the md5 key in
  * [[Dedup.dedupExact]], but 16 bytes of longs instead of a 32-byte hex
  * string on the shuffle wire). One shuffle ranks occurrences per chunk
  * key (groups are duplicate-multiplicity sized, so the in-group sort is
  * O(dups)); the second shuffle reassembles docs. Chunk text rides the
  * wire only as agg payload — there is no string equi-join anywhere.
  */
object SpanDedup {

  /** @param chunkTokens tokens per chunk; chunk boundaries are fixed
    *                    offsets (i*chunkTokens), so a duplicated span is
    *                    only caught when aligned — the standard tradeoff
    *                    of chunk-level vs suffix-array substring dedup. */
  def dedupChunks(docs: DataFrame, chunkTokens: Int = 10): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val chunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .select(col("doc_id"), col("l"),
        explode(sequence(lit(0L),
          ceil(size(col("l")) / lit(chunkTokens.toDouble)).cast("long") - 1))
          .as("chunk_ord"))
      .select(col("doc_id"), col("chunk_ord"),
        array_join(slice(col("l"),
          (col("chunk_ord") * chunkTokens + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk"))
    val byChunk = Window
      .partitionBy(xxhash64(col("chunk")), xxhash64(col("chunk"), lit(1)))
      .orderBy(col("doc_id"), col("chunk_ord"))
    chunks
      .withColumn("rn", row_number().over(byChunk))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("chunk_ord"), col("chunk")))),
          x => x.getField("chunk"))).as("text"))
  }

  /** Driver entry: 10-token span dedup over `documents`. */
  def dedupChunksQ(spark: SparkSession, dir: String): DataFrame =
    dedupChunks(Tables.documents(spark, dir))
}
