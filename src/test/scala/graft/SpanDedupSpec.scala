package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.SpanDedup

class SpanDedupSpec extends AnyFunSuite with SparkFixture {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def out(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  // 3-token chunks keep the handcrafted cases readable
  private val chunk3 = 3

  test("first occurrence wins; later aligned copies of a span are cut") {
    val d = docs(
      1L -> "a b c d e f",       // chunks: [a b c] [d e f]
      2L -> "a b c x y z",       // [a b c] duplicates doc 1's first chunk
      3L -> "x y z a b c",       // both chunks seen before → vanishes
      4L -> "q a b c r s")       // contains "a b c" UNALIGNED → all new
    val r = out(SpanDedup.dedupChunks(d, chunk3))
    assert(r.get(1L) === Some("a b c d e f"))
    assert(r.get(2L) === Some("x y z"))
    assert(r.get(3L) === None)
    assert(r.get(4L) === Some("q a b c r s"))
  }

  test("an exact-duplicate doc vanishes entirely (span ⊇ doc dedup)") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e f")
    val r = out(SpanDedup.dedupChunks(d, chunk3))
    assert(r === Map(1L -> "a b c d e f"))
  }

  test("within-doc repeated spans also collapse to the first") {
    val d = docs(1L -> "a b c a b c d")
    // chunks: [a b c] [a b c] [d] — second is a repeat
    assert(out(SpanDedup.dedupChunks(d, chunk3)) === Map(1L -> "a b c d"))
  }

  test("reassembly preserves chunk order past 10 chunks (numeric sort)") {
    val text = (0 until 36).map(i => s"w$i").mkString(" ") // 12 chunks of 3
    val r = out(SpanDedup.dedupChunks(docs(1L -> text), chunk3))
    assert(r(1L) === text)
  }

  test("incremental span dedup == full span dedup restricted to the batch") {
    val d = Tables.documents(spark, sfDir).select("doc_id", "text")
    val split = 30L // sf0.001 ids are 0..49
    val sink = new graft.sinks.WarehouseSink(tmpDir("span_store_"))
    SpanDedup.buildSpanStore(d.filter(col("doc_id") < split), sink)
    val inc = SpanDedup.dedupChunksIncremental(
      d.filter(col("doc_id") >= split), spark, sink)
    val full = SpanDedup.dedupChunks(d).filter(col("doc_id") >= split)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental result diverges from the full run's batch slice")
    // and with handcrafted spans: corpus span cut, batch-first wins in-batch
    val sink2 = new graft.sinks.WarehouseSink(tmpDir("span_store2_"))
    SpanDedup.buildSpanStore(docs(1L -> "a b c"), sink2, chunkTokens = 3)
    val r = out(SpanDedup.dedupChunksIncremental(
      docs(10L -> "a b c x y z", 11L -> "x y z w"), spark, sink2,
      chunkTokens = 3))
    assert(r === Map(10L -> "x y z", 11L -> "w"))
  }

  test("incremental span store read is partition-pruned") {
    val d = Tables.documents(spark, sfDir).select("doc_id", "text")
    val sink = new graft.sinks.WarehouseSink(tmpDir("span_prune_"))
    SpanDedup.buildSpanStore(d, sink)
    val store = sink.read(spark, "spans")
      .filter(col("part_bucket").isin(0, 1))
    assert(store.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [part_bucket"),
      "span store read not partition-pruned")
  }

  test("on the corpus: injected exact copies disappear, originals intact") {
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    // re-key 20 docs as exact copies with higher ids — the non-keeper
    // side of an exact-dup class, which span dedup must erase entirely
    val copies = base.filter(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 1000000)
    val kept = SpanDedup.dedupChunks(base.unionByName(copies))
    assert(kept.filter(col("doc_id") >= 1000000).count() === 0,
      "an exact copy survived span dedup")
    // and the originals reassemble byte-identically to a copy-free run
    val alone = SpanDedup.dedupChunks(base)
    assert(kept.exceptAll(alone).isEmpty && alone.exceptAll(kept).isEmpty,
      "injecting exact copies changed the surviving corpus")
  }

  test("boilerplate: a span in >= minDf docs is cut EVERYWHERE, first included") {
    val d = docs(
      1L -> "a b c d e f",       // [a b c] in docs 1,2,3 → df=3 → boilerplate
      2L -> "a b c x y z",
      3L -> "a b c p q r",
      4L -> "x y z u v w")       // [x y z] df=2 → survives in both docs
    val r = out(SpanDedup.removeBoilerplate(d, chunk3, minDf = 3))
    assert(r.get(1L) === Some("d e f"), "first occurrence must be cut too")
    assert(r.get(2L) === Some("x y z"))
    assert(r.get(3L) === Some("p q r"))
    assert(r.get(4L) === Some("x y z u v w"))
  }

  test("boilerplate: df counts DISTINCT docs, not occurrences") {
    // [a b c] occurs 3 times but in only 2 docs → df=2 < 3 → kept
    val d = docs(1L -> "a b c a b c", 2L -> "a b c z z z")
    val r = out(SpanDedup.removeBoilerplate(d, chunk3, minDf = 3))
    assert(r === Map(1L -> "a b c a b c", 2L -> "a b c z z z"))
  }

  test("boilerplate: a pure-boilerplate doc vanishes; minDf < 2 rejected") {
    val d = docs(
      1L -> "a b c", 2L -> "a b c", 3L -> "a b c", // the whole doc is the span
      4L -> "a b c d e f")
    val r = out(SpanDedup.removeBoilerplate(d, chunk3, minDf = 3))
    assert(r === Map(4L -> "d e f"))
    intercept[IllegalArgumentException] {
      SpanDedup.removeBoilerplate(d, chunk3, minDf = 1)
    }
  }

  test("boilerplate on the corpus: deterministic, and a df=3 injection is erased") {
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val r1 = SpanDedup.removeBoilerplate(base)
    val r2 = SpanDedup.removeBoilerplate(base)
    assert(r1.exceptAll(r2).isEmpty && r2.exceptAll(r1).isEmpty,
      "boilerplate removal is not deterministic")
    // inject one 10-token banner into 3 re-keyed docs → df=3; the banner
    // must vanish from all three while their payload chunks survive
    val banner = (0 until 10).map(i => s"bp$i").mkString(" ")
    val carriers = base.filter(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 2000000)
      .withColumn("text", concat(lit(banner + " "), col("text")))
    val out2 = SpanDedup.removeBoilerplate(base.unionByName(carriers))
    val carried = out2.filter(col("doc_id") >= 2000000)
      .collect().map(_.getString(1))
    assert(carried.length === 3, "banner carriers must survive minus the banner")
    assert(carried.forall(!_.contains("bp0")), "injected banner not removed")
  }

  test("newline chunker: an empty paragraph list is one empty chunk, not a crash") {
    import spark.implicits._
    // paragraph chunker: split on newlines, DROP empty paragraphs — the
    // documented swap that can hand chunkRows an empty token array
    // (pre-guard: sequence(0, -1) walked downward and the -1 ord fed
    // slice() a start index of 0, which throws)
    val paras: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => filter(split(c, "\n"), p => p =!= lit(""))
    val docs = Seq(
      (1L, "alpha\nbeta"),
      (2L, ""), // empty doc → EMPTY token array under this chunker
      (3L, "alpha\nbeta")) // exact dup of doc 1
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupChunks(docs, chunkTokens = 1, tokenize = paras)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // dup fully erased; the empty doc survives as a single empty chunk
    assert(out === Map(1L -> "alpha beta", 2L -> ""))
  }

  test("dedup_substrings catches the shifted copy chunk dedup misses; within-doc repeats count") {
    import org.apache.spark.sql.functions._
    // d2 embeds d1's tokens a3..a17 (a 15-token run) at a DIFFERENT
    // offset — invisible to fixed 10-token chunk boundaries, caught by
    // every stride-1 window; d3 is unique; d4 repeats a 15-run within
    // itself (coverage closes the whole doc)
    val a = (1 to 20).map(i => s"a$i")
    val b = (1 to 15).map(i => s"b$i")
    val d = docs(
      (1L, a.mkString(" ")),
      (2L, ("x1 x2 " + a.slice(2, 17).mkString(" ") + " y1 y2")),
      (3L, (1 to 18).map(i => s"u$i").mkString(" ")),
      (4L, (b ++ b).mkString(" ")))
    val out = SpanDedup.dedupSubstrings(d, n = 15)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // exactly one shared window (the run itself) per side → 15 covered
    assert(out(1L) === ((20L, 15L, 0.75)))
    assert(out(2L) === ((19L, 15L, 0.7895)))
    assert(out(3L) === ((18L, 0L, 0.0)))
    // within-doc repeat: flagged starts {0, 15} merge to full coverage
    assert(out(4L) === ((30L, 30L, 1.0)))
    // the contrast that motivates the operator: chunk dedup at its
    // default alignment sees NO duplicate chunk between d1 and d2
    val chunked = SpanDedup.dedupChunks(d.filter(col("doc_id") <= 2), chunkTokens = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunked(2L).split(" ").length === 19) // d2 intact
  }
}
