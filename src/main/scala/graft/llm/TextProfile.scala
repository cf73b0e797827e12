package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 text/corpus profiling wave: numeric-content density,
  * Good–Turing vocabulary mass, word-length distributions, casing
  * audits, template-prefix clustering, and in-document sentence
  * repetition — the per-document surface signals and per-source
  * distributional profiles a curation pipeline consults BEFORE the
  * heavier model-based filters ([[TextOps.textGopher]], the trained
  * classifier) run.
  *
  * Same execution contract as [[TextOps]]: per-document operators are
  * pure projections over codegen'd built-ins (no UDFs — they run at
  * parquet-scan speed with only doc_id/text/source read); per-source
  * operators explode tokens ONCE and aggregate with exact integer
  * counts, doubles only in a final shared IEEE tree rounded 4dp.
  */
object TextProfile {

  import TextOps.tokens

  private val d = (c: Column) => c.cast("double")

  /** Nonempty whitespace tokens (lower-cased, [[TextOps.tokens]]
    * convention; the empty-string artifact `split` leaves on empty
    * input is filtered, matching the vocab ops). */
  private def neTokens(c: Column): Column =
    filter(tokens(c), t => length(t) > lit(0))

  /** Numeric-content density per document — the "is this a number
    * dump" screen (price lists, sensor logs, sports tables score high;
    * prose scores near zero) plus the ≥8-consecutive-digit flag that
    * catches serial numbers / phone numbers / IDs a privacy scrub
    * ([[TextOps.textScrub]]) should have caught. Numeric tokens are
    * full-token matches of `[0-9]+([.,][0-9]+)*%?` — integers,
    * decimals, thousand-grouped, percents.
    *
    * Scale shape: pure map-side projection, zero shuffles. */
  def textNumericDensity(docs: DataFrame): DataFrame = {
    val toks = neTokens(col("text"))
    val numTok = size(filter(toks,
      t => t.rlike("^[0-9]+([.,][0-9]+)*%?$")))
    docs.select(col("doc_id"),
      size(toks).as("n_tokens"),
      numTok.as("numeric_tokens"),
      length(regexp_replace(col("text"), "[^0-9]", "")).as("digit_chars"),
      round(d(length(regexp_replace(col("text"), "[^0-9]", ""))) /
        d(greatest(length(col("text")), lit(1))), 4).as("digit_char_ratio"),
      round(d(numTok) / d(greatest(size(toks), lit(1))), 4)
        .as("numeric_token_share"),
      col("text").rlike("[0-9]{8}").as("has_long_number"))
  }

  def textNumericDensityQ(spark: SparkSession, dir: String): DataFrame =
    textNumericDensity(Tables.documents(spark, dir))

  /** Good–Turing vocabulary mass per source: how much probability mass
    * the UNSEEN vocabulary carries (p₀ = V₁/N, Good 1953) and how
    * discounted a singleton should be (c* = 2·V₂/V₁). High p₀ means
    * the source's vocabulary is nowhere near exhausted at this corpus
    * size — more data from it keeps buying new types — which is
    * exactly the signal [[TextOps]]'s budget/mix planners want next to
    * raw dedup rates. `singleton_share` (V₁/V) doubles as an OCR/noise
    * alarm: garbled sources mint endless one-off types.
    *
    * Scale shape: one token explode + (source, token) count — the
    * same slim shuffle every vocab op pays — then a |sources| rollup.
    * Counts exact; one final IEEE tree, 4dp. */
  def vocabGoodTuring(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(neTokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("v1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("v2"))
      .select(col("source"), col("vocab"), col("n_tokens"), col("v1"),
        col("v2"),
        round(d(col("v1")) / d(col("n_tokens")), 4).as("p_unseen"),
        round(d(col("v1")) / d(col("vocab")), 4).as("singleton_share"),
        round(lit(2.0) * d(col("v2")) / d(greatest(col("v1"), lit(1L))), 4)
          .as("gt_singleton_discount"))

  def vocabGoodTuringQ(spark: SparkSession, dir: String): DataFrame =
    vocabGoodTuring(Tables.documents(spark, dir))

  /** Word-length distribution per source — the surface fingerprint
    * that separates languages, tokenizer-hostile sources (agglutinated
    * 20+-char types inflate BPE fertility) and char-noise (a mass at
    * length 1–2 that isn't function words). Lengths cap at 20 into a
    * tail bucket; shares and the cumulative curve ride a per-source
    * window over ≤ 20 cells.
    *
    * Scale shape: one token explode + (source, len) count (the cell
    * frame is ≤ |sources|·20 rows), windows on cells only. */
  def textWordLengthProfile(docs: DataFrame): DataFrame = {
    val cells = docs
      .select(col("source"), explode(neTokens(col("text"))).as("tok"))
      .groupBy(col("source"), least(length(col("tok")), lit(20))
        .as("word_len"))
      .agg(count(lit(1)).as("n_tokens"))
    val bySrc = Window.partitionBy(col("source"))
    val cum = bySrc.orderBy(col("word_len"))
    cells
      .withColumn("tot", sum(col("n_tokens")).over(bySrc))
      .withColumn("cum", sum(col("n_tokens")).over(cum))
      .select(col("source"), col("word_len"), col("n_tokens"),
        round(d(col("n_tokens")) / d(col("tot")), 4).as("share"),
        round(d(col("cum")) / d(col("tot")), 4).as("cum_share"))
  }

  def textWordLengthProfileQ(spark: SparkSession, dir: String): DataFrame =
    textWordLengthProfile(Tables.documents(spark, dir))

  /** Casing audit per document — SHOUTING detection and
    * title-case density on the ORIGINAL-case text (the [[TextOps]]
    * tokenizer lower-cases, so this op splits raw): all-caps token
    * share (≥2 letters), TitleCase token share, the capital share of
    * alphabetic characters, and the >30%-caps shouting flag used as a
    * spam/header-dump screen.
    *
    * Scale shape: pure map-side projection, zero shuffles. */
  def textCaseProfile(docs: DataFrame): DataFrame = {
    val toks = filter(split(trim(col("text")), "\\s+"),
      t => length(t) > lit(0))
    val nTok = greatest(size(toks), lit(1))
    val upperTok = size(filter(toks, t => t.rlike("^[A-Z]{2,}$")))
    val titleTok = size(filter(toks, t => t.rlike("^[A-Z][a-z]+$")))
    val alpha = greatest(
      length(regexp_replace(col("text"), "[^A-Za-z]", "")), lit(1))
    val caps = length(regexp_replace(col("text"), "[^A-Z]", ""))
    docs.select(col("doc_id"),
      size(toks).as("n_tokens"),
      upperTok.as("upper_tokens"),
      round(d(upperTok) / d(nTok), 4).as("upper_share"),
      round(d(titleTok) / d(nTok), 4).as("title_share"),
      round(d(caps) / d(alpha), 4).as("caps_char_ratio"),
      (d(caps) / d(alpha) > lit(0.3)).as("is_shouting"))
  }

  def textCaseProfileQ(spark: SparkSession, dir: String): DataFrame =
    textCaseProfile(Tables.documents(spark, dir))

  /** Template-prefix clusters: documents sharing the same normalized
    * 32-char prefix (lower-cased, whitespace collapsed to single
    * spaces) — the cheap screen for boilerplate families
    * ("breaking news:", mail headers, scraped nav bars) that
    * [[SpanDedup]] prices per-span and [[Dedup]] per-pair; the prefix
    * group-by prices them per CLUSTER at one slim shuffle. Only
    * clusters (n ≥ 2) are emitted, with source spread and the lowest
    * doc_id as the canonical exemplar.
    *
    * Scale shape: one 32-char-key group-by (map-side combined), a
    * 1-row broadcast total. */
  def corpusPrefixClusters(docs: DataFrame): DataFrame = {
    val prefix = substring(
      regexp_replace(lower(trim(col("text"))), "\\s+", " "), 1, 32)
    val tot = broadcast(docs.agg(count(lit(1)).as("n_docs_total")))
    docs.select(prefix.as("prefix"), col("doc_id"), col("source"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("exemplar_doc_id"))
      .filter(col("n_docs") >= 2)
      .crossJoin(tot)
      .select(col("prefix"), col("n_docs"), col("n_sources"),
        col("exemplar_doc_id"),
        round(d(col("n_docs")) / d(col("n_docs_total")), 4)
          .as("corpus_share"))
  }

  def corpusPrefixClustersQ(spark: SparkSession, dir: String): DataFrame =
    corpusPrefixClusters(Tables.documents(spark, dir))

  /** In-document sentence repetition — the C4/Gopher "repeated lines"
    * filter adapted to sentence units (this corpus has no newlines):
    * sentences are `[.!?]+`-delimited runs, trimmed, empties dropped;
    * a doc whose sentences repeat (dup_sentence_frac high, max_repeat
    * large) is template spam even when its n-gram profile looks clean
    * ([[TextOps.textRepetition]] catches sub-sentence loops; this
    * catches whole-unit loops). avg_sentence_words rides exact token
    * counts per sentence occurrence.
    *
    * Scale shape: one (doc, sentence) explode + count — the only
    * shuffle, slim keys — then a per-doc rollup. */
  def textSentenceStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(split(col("text"), "[.!?]+")).as("sent"))
      .select(col("doc_id"), trim(col("sent")).as("sent"))
      .filter(length(col("sent")) > 0)
      .withColumn("words", size(filter(split(col("sent"), "\\s+"),
        t => length(t) > lit(0))))
      .groupBy(col("doc_id"), col("sent"), col("words"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_sentences"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_repeat"),
        sum(col("c") * col("words")).as("w"))
      .select(col("doc_id"), col("n_sentences"), col("n_distinct"),
        col("max_repeat"),
        round(lit(1.0) - d(col("n_distinct")) / d(col("n_sentences")), 4)
          .as("dup_sentence_frac"),
        round(d(col("w")) / d(col("n_sentences")), 4)
          .as("avg_sentence_words"))

  def textSentenceStatsQ(spark: SparkSession, dir: String): DataFrame =
    textSentenceStats(Tables.documents(spark, dir))
}
