package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeFunctions
import graft.llm.TextOps

/** Pins BPE INFERENCE ([[graft.functions.BpeApply]] + [[TextOps
  * .bpeEncode]]) against the same hand-derived Sennrich fixture that
  * pins training (Round9PropertiesSpec): merges (e,s) (es,t) (l,o)
  * (lo,w) (e,w), in that order. */
class BpeEncodeSpec extends AnyFunSuite with SparkFixture {

  private val merges =
    Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w"))

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
  }

  test("bpe_apply segments the Sennrich vocabulary by hand-derived merges") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val words = Seq("low", "lower", "newest", "widest", "lowest").toDF("w")
    val got = words.select(col("w"),
        BpeFunctions.bpeApply(col("w"), merges).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("low") === Seq("low"))
    assert(got("lower") === Seq("low", "e", "r"))
    // newest: es → est → (e,w) merges the remaining e,w pair
    assert(got("newest") === Seq("n", "ew", "est"))
    assert(got("widest") === Seq("w", "i", "d", "est"))
    // the UNSEEN word generalizes: lowest = low + est — subword units
    // transfer, the whole point of BPE
    assert(got("lowest") === Seq("low", "est"))
  }

  test("zero merges degrade to character segmentation") {
    import spark.implicits._
    val out = TextOps.bpeEncode(fixture, Seq.empty)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // chars per word: low=3, lower=5, newest=6, widest=6
    assert(out(1L) === ((5L, 15L)))
    assert(out(2L) === ((2L, 10L)))
    assert(out(3L) === ((6L, 36L)))
    assert(out(4L) === ((3L, 18L)))
  }

  test("bpe_encode doc totals under the trained merge table") {
    import spark.implicits._
    val out = TextOps.bpeEncode(fixture, merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // low→1 sym, lower→3, newest→3, widest→4 (hand-derived above)
    assert(out(1L) === ((5L, 5L)))
    assert(out(2L) === ((2L, 6L)))
    assert(out(3L) === ((6L, 18L)))
    assert(out(4L) === ((3L, 12L)))
  }

  test("encode bounds and merge-prefix monotonicity on the real corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val trained = TextOps.bpeTrain(docs).orderBy(col("merge_rank"))
      .select(col("left"), col("right")).as[(String, String)].collect().toSeq
    assert(trained.nonEmpty)
    val full = TextOps.bpeEncode(docs, trained)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val half = TextOps.bpeEncode(docs, trained.take(trained.size / 2))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val chars = TextOps.bpeEncode(docs, Seq.empty)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(full.keySet === chars.keySet)
    for ((id, (_, nw, nb)) <- full) {
      // every merge can only SHORTEN a doc, and a doc is never shorter
      // than one token per word
      assert(nb <= half(id)._3, s"doc $id grew under more merges")
      assert(half(id)._3 <= chars(id)._3, s"doc $id grew vs chars")
      assert(nb >= nw, s"doc $id has fewer tokens than words")
    }
  }

  test("bpe_fertility: fully-merged language at 1.0, unmerged at chars-per-word") {
    import spark.implicits._
    // merges cover lang aa's only word ("ab" → one symbol); lang bb's
    // "xyz" never merges → 3 chars/word. Integer sums, exact ratios.
    val d = Seq(
      (1L, "ab ab ab", "aa"), (2L, "ab ab", "aa"), (3L, "xyz xyz", "bb")
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.bpeFertility(d, Seq(("a", "b")))
      .select("lang", "n_docs", "n_words", "n_bpe_tokens", "fertility")
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out === Array(
      ("aa", 2L, 5L, 5L, 1.0), ("bb", 1L, 2L, 6L, 3.0)))
  }
}
