package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-14 text/corpus profiling wave: source-mix diversity indices,
  * the quality-threshold budget curve, vocabulary concentration, and
  * the foreign-syntax (markup/code/link) audit — the curation
  * dashboard questions that sit ABOVE the per-document signals of
  * [[TextProfile]]: how concentrated is the corpus across sources,
  * what does a quality bar actually cost in tokens, how top-heavy is
  * the vocabulary, and how much non-prose syntax leaks through.
  *
  * Same execution contract as [[TextProfile]]: exact integer counts
  * through every shuffle, doubles only in a final shared IEEE tree
  * rounded 4dp. */
object TextProfile2 {

  import TextOps.tokens

  private val d = (c: Column) => c.cast("double")

  private def neTokens(c: Column): Column =
    filter(tokens(c), t => length(t) > lit(0))

  /** Source-mix diversity per language: Shannon entropy (nats, the
    * [[graft.queries.Analytics4]] `ln(n) − Σc·ln(c)/n` identity —
    * exact integer counts in, one shared double tree out), Simpson
    * concentration Σp² (the "collision probability" — computed from
    * the EXACT Σc² in DECIMAL(38,0), so the only doubles are the
    * final division), and effective source count 1/Σp². The corpus
    * planner's first question — "is this language fed by one crawler
    * or twenty" — before [[TextOps]]'s mix/KL reports compare AGAINST
    * a target.
    *
    * Scale shape: one (lang, source) count aggregate (domain-bounded:
    * langs × sources), then a per-lang rollup of that tiny frame. */
  def corpusSourceDiversity(docs: DataFrame): DataFrame =
    corpusSourceDiversityFromCounts(
      docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c")))

  /** The diversity dashboard off a pre-aggregated (lang, source, c)
    * count table — the serving path for the STREAM-maintained mix
    * table ([[graft.streaming.StreamSketches.servedSourceMixTable]]):
    * the count merge is plain addition, so the streamed table feeds
    * this bit-exactly. */
  def corpusSourceDiversityFromCounts(ls: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    ls.groupBy(col("lang"))
      .agg(sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(d(col("c")) * log(d(col("c")))).as("clogc"),
        sum(d38(col("c")) * col("c")).as("c2"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        round(greatest(lit(0.0),
          log(d(col("n_docs"))) - col("clogc") / d(col("n_docs"))), 4)
          .as("entropy"),
        round(col("c2").cast("double") /
          (d(col("n_docs")) * d(col("n_docs"))), 4).as("simpson"),
        round(d(col("n_docs")) * d(col("n_docs"))
          / col("c2").cast("double"), 4).as("effective_sources"))
  }

  def corpusSourceDiversityQ(spark: SparkSession, dir: String): DataFrame =
    corpusSourceDiversity(Tables.documents(spark, dir))

  /** Quality-threshold budget curve: for each score bar t = b/20, the
    * docs and whitespace tokens RETAINED at quality ≥ t — "what does
    * raising the quality bar actually cost in training tokens", the
    * curve a data-budget negotiation reads before
    * [[TextOps.corpusBudgetSelect]] commits to one point on it. The
    * score is [[TextOps.qualityScoreCol]]'s exact IEEE tree; binning
    * is floor(20·score) clamped to 19, and the curve is a DESCENDING
    * prefix sum over the ≤20-row bucket frame (retention at bar b =
    * mass of buckets ≥ b).
    *
    * Scale shape: one map-side projection + a ≤20-bucket aggregate;
    * the cumulative window runs over ≤20 rows. */
  def corpusQualityBudgetCurve(docs: DataFrame): DataFrame = {
    val q = TextOps.qualityScoreCol(col("text"))
    val nt = size(tokens(col("text"))).cast("long")
    val b = least(floor(lit(20.0) * q).cast("long"), lit(19L))
    val buckets = docs.select(b.as("bucket"), nt.as("nt"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("nd"), sum(col("nt")).as("ntk"))
    val wDesc = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    buckets
      .withColumn("n_docs_ge", sum(col("nd")).over(wDesc))
      .withColumn("n_tokens_ge", sum(col("ntk")).over(wDesc))
      .withColumn("td", sum(col("nd")).over(wAll))
      .withColumn("tt", sum(col("ntk")).over(wAll))
      .select(
        round(d(col("bucket")) / lit(20.0), 2).as("threshold"),
        col("n_docs_ge"), col("n_tokens_ge"),
        round(d(col("n_docs_ge")) / d(col("td")), 4).as("doc_share"),
        round(d(col("n_tokens_ge")) / d(col("tt")), 4).as("token_share"))
  }

  def corpusQualityBudgetCurveQ(spark: SparkSession, dir: String): DataFrame =
    corpusQualityBudgetCurve(Tables.documents(spark, dir))

  /** Vocabulary concentration per language: the exact Gini of token
    * frequencies ([[graft.operators.OrderedPrefix.gini]] — the third
    * regime for the prefix operator: the value domain is term COUNTS,
    * Zipf-skewed, so the distinct frame nearly collapses while the
    * underlying term frame is vocabulary-sized). G → 1 means a few
    * types carry the corpus (boilerplate, templates); G near the
    * Zipf baseline (~0.78 for α≈1) is healthy prose —
    * [[TextOps]]'s zipf fit reads the slope, this reads the mass.
    *
    * Scale shape: one token explode + (lang, term) count (the
    * vocabulary shuffle every vocab op pays), then the bounded
    * prefix-frame passes over (lang, count). */
  def textVocabGini(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("lang"), explode(neTokens(col("text"))).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("freq"))
    graft.operators.OrderedPrefix.gini(tf, Seq("lang"), "freq")
      .select(col("lang"), col("n").as("n_terms"),
        round(col("mean_raw"), 4).as("mean_freq"), col("gini"))
  }

  def textVocabGiniQ(spark: SparkSession, dir: String): DataFrame =
    textVocabGini(Tables.documents(spark, dir))

  /** Foreign-syntax audit per source: markup tags, brace/bracket
    * code syntax, link/email fragments — the "did HTML stripping and
    * code fencing actually run upstream" gate
    * ([[TextOps.textHtmlStrip]] is the FIX; this is the alarm that
    * says which source needs it). All counts are exact integers off
    * regexp char-class extraction (identical semantics both engines);
    * a document flags as foreign when ANY class hits.
    *
    * Scale shape: pure map-side projection + one per-source rollup. */
  def textMarkupAudit(docs: DataFrame): DataFrame = {
    val braces = size(regexp_extract_all(col("text"),
      lit("[{}()\\[\\];]"), lit(0)))
    val tags = size(regexp_extract_all(col("text"),
      lit("<[a-zA-Z/]"), lit(0)))
    val links = size(regexp_extract_all(col("text"),
      lit("http|www\\."), lit(0)))
    val emails = size(regexp_extract_all(col("text"),
      lit("[a-zA-Z0-9]@[a-zA-Z0-9]"), lit(0)))
    val perDoc = docs.select(col("source"),
      braces.cast("long").as("braces"), tags.cast("long").as("tags"),
      links.cast("long").as("links"), emails.cast("long").as("emails"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("braces")).as("brace_chars"),
        sum(col("tags")).as("tag_hits"),
        sum(col("links")).as("link_hits"),
        sum(col("emails")).as("email_hits"),
        sum(when(col("braces") + col("tags") + col("links")
          + col("emails") > 0, 1L).otherwise(0L)).as("foreign_docs"))
      .select(col("source"), col("n_docs"), col("brace_chars"),
        col("tag_hits"), col("link_hits"), col("email_hits"),
        col("foreign_docs"),
        round(d(col("foreign_docs")) / d(col("n_docs")), 4)
          .as("foreign_share"))
  }

  def textMarkupAuditQ(spark: SparkSession, dir: String): DataFrame =
    textMarkupAudit(Tables.documents(spark, dir))
}
