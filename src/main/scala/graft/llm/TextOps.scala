package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for an LLM training-data pipeline, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Every operator here is a pure per-row projection built from codegen'd
  * built-in functions — no UDFs, no shuffle, no state. At 100 TB these run
  * at parquet-scan speed inside a single WholeStageCodegen span, and column
  * pruning means only `doc_id`/`text` are ever read.
  */
object TextOps {

  /** Lower-cased whitespace tokens of `text`. */
  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** BPE-ish pre-tokenizer: runs of letters, runs of digits, or a single
    * non-alphanumeric non-space symbol — the classic GPT-2-style regex
    * family reduced to character classes both Java regex and RE2 agree on. */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Token counting: whitespace tokens and BPE-ish regex tokens per doc. */
  def textTokens(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("bpe_tokens")
    )

  /** Stopword list for the quality score (English function words). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** The composite quality expression of [[textQuality]] as a bare
    * Column, for operators that need the score NEXT TO other per-doc
    * columns in one scan projection (dedup survivorship audit) instead
    * of a doc_id join against textQuality's frame. Identical IEEE tree
    * to the `quality_score` column below. */
  def qualityScoreCol(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = size(tokens(text)).cast("double")
    val nPunct = size(regexp_extract_all(text,
      lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    least(nTokens / lit(64.0), lit(1.0)) * (lit(1.0) - nPunct / nChars)
  }

  /** Quality scoring: doc length, punctuation ratio, stopword ratio, mean
    * word length, and a composite score — the standard cheap heuristics
    * (C4/Gopher-style) for filtering web-scale corpora. All arithmetic is
    * int-derived doubles, deterministic across engines. */
  def textQuality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nChars = length(col("text")).cast("double")
    val nTokens = size(toks).cast("double")
    val nPunct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val nStop = size(filter(toks, t => t.isin(Stopwords: _*))).cast("double")
    docs.select(
      col("doc_id"),
      nChars.cast("bigint").as("n_chars_m"),
      nTokens.cast("bigint").as("n_tokens"),
      (nPunct / nChars).as("punct_ratio"),
      (nStop / nTokens).as("stopword_ratio"),
      (nChars / nTokens).as("mean_token_len"),
      // composite: long enough, not punctuation soup — bounded [0,1]
      (least(nTokens / lit(64.0), lit(1.0)) * (lit(1.0) - nPunct / nChars)).as("quality_score")
    )
  }

  /** The Gopher rule's stop-word list (Rae et al. 2021, §A1.1): a doc must
    * contain at least two of these to pass. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher document-quality rule set (Rae et al. 2021, §A1.1) —
    * the de-facto standard web-corpus filter, complementing the composite
    * score of [[textQuality]] with per-rule metrics and a hard pass flag:
    *
    *  1. word count within [minWords, maxWords];
    *  2. mean word length within [3, 10] characters;
    *  3. symbol-to-word ratio (`#`, `...`, `…`) below 0.1;
    *  4. fewer than 90% of lines starting with a bullet;
    *  5. fewer than 30% of lines ending in an ellipsis;
    *  6. over 80% of words containing at least one alphabetic character;
    *  7. at least two distinct [[GopherStopwords]] present.
    *
    * Every metric is an int-derived ratio (counts over counts), so the
    * oracle agrees bit-for-bit; line ratios divide by `max(1, n_lines)` so
    * the expression never divides by zero on either engine. Like the rest
    * of the family this is a pure per-row projection of codegen'd
    * built-ins — no UDFs, no shuffle; at 100 TB it fuses into the parquet
    * scan reading only (doc_id, text). */
  private final case class GopherCols(nWords: Column, meanLen: Column,
    symbolRatio: Column, bulletRatio: Column, ellipsisRatio: Column,
    alphaRatio: Column, nStop: Column)

  private def gopherCols: GopherCols = {
    val toks = tokens(col("text"))
    val nWords = size(toks).cast("bigint")
    val sumLen = aggregate(transform(toks, t => length(t)), lit(0),
      (acc, x) => acc + x).cast("double")
    val lines = filter(split(col("text"), "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines).cast("double")
    val nBullet = size(filter(lines, l => l.rlike("^\\s*[-*•]")))
      .cast("double")
    val nEllipsis = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$")))
      .cast("double")
    val nSymbols = size(regexp_extract_all(col("text"),
      lit("#|\\.\\.\\.|…"), lit(0))).cast("double")
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("double")
    val nStop = GopherStopwords
      .map(s => when(array_contains(toks, s), 1).otherwise(0))
      .reduce(_ + _).cast("bigint")
    GopherCols(
      nWords,
      sumLen / nWords.cast("double"),
      nSymbols / nWords.cast("double"),
      nBullet / greatest(nLines, lit(1.0)),
      nEllipsis / greatest(nLines, lit(1.0)),
      nAlpha / nWords.cast("double"),
      nStop)
  }

  /** The pass predicate over an already-built [[GopherCols]] — shared so
    * [[textGopher]]'s projection holds ONE copy of each metric
    * expression: the HOF lambdas (filter/transform/aggregate) carry
    * LambdaVariables, which Spark's subexpression elimination skips, so
    * a second structural copy of the metrics inside the predicate would
    * genuinely tokenize and regex-scan every row twice. */
  private def gopherPass(g: GopherCols, minWords: Long, maxWords: Long,
                         minStop: Int): Column =
    g.nWords.between(minWords, maxWords) &&
      g.meanLen.between(3.0, 10.0) &&
      g.symbolRatio < 0.1 &&
      g.bulletRatio < 0.9 &&
      g.ellipsisRatio < 0.3 &&
      g.alphaRatio > 0.8 &&
      g.nStop >= minStop

  /** The hard pass/fail predicate behind [[textGopher]], reusable by any
    * pipeline stage that only needs the gate (e.g. the streaming quality
    * monitor) — same reusable-Column pattern as [[sampleKeep]]. */
  def gopherPassCol(minWords: Long = 50, maxWords: Long = 100000,
                    minStop: Int = 2): Column =
    gopherPass(gopherCols, minWords, maxWords, minStop)

  /** The seven Gopher metric columns in [[textGopher]]'s column order —
    * the Column-level surface model-based gates compose with
    * ([[graft.llm.Classifier.scoreCol]]). Each metric tree appears ONCE
    * in the composed expression, so the textGopher duplication caveat
    * does not apply. */
  private[llm] def gopherMetricColsSeq: Seq[Column] = {
    val g = gopherCols
    Seq(g.nWords, g.meanLen, g.symbolRatio, g.bulletRatio,
      g.ellipsisRatio, g.alphaRatio, g.nStop)
  }

  def textGopher(docs: DataFrame,
                 minWords: Long = 50, maxWords: Long = 100000,
                 minStop: Int = 2): DataFrame = {
    val g = gopherCols
    // metrics project ONCE; the flag then reads the NAMED columns in a
    // second select. Re-passing the same Column trees into the predicate
    // would plant a second structural copy of each lambda-bearing metric
    // (no subexpression elimination, see [[gopherPass]]) — and Catalyst's
    // CollapseProject refuses to re-inline duplicated non-cheap aliases,
    // so the two-step form keeps exactly one evaluation per metric.
    docs.select(
      col("doc_id"),
      g.nWords.as("n_words"),
      g.meanLen.as("mean_word_len"),
      g.symbolRatio.as("symbol_ratio"),
      g.bulletRatio.as("bullet_ratio"),
      g.ellipsisRatio.as("ellipsis_ratio"),
      g.alphaRatio.as("alpha_word_ratio"),
      g.nStop.as("n_stop_present"))
      .withColumn("gopher_pass", gopherPass(
        GopherCols(col("n_words"), col("mean_word_len"),
          col("symbol_ratio"), col("bullet_ratio"), col("ellipsis_ratio"),
          col("alpha_word_ratio"), col("n_stop_present")),
        minWords, maxWords, minStop))
  }

  /** Demo blocklist for the driver query ONLY — two terms drawn from the
    * synthetic vocabulary so the flag varies at every SF. A deployment
    * supplies its own vetted wordlist (the C4 pipeline used the public
    * "dirty/naughty" list); the operator is list-agnostic. */
  val DemoBlocklist: Seq[String] = Seq("slow", "big")

  /** Blocklist screen — the C4-style wordlist filter every web-scale
    * pipeline runs before training: per-doc count of blocklisted terms
    * and the hard drop flag (C4 dropped a page on ANY hit). Token-level
    * matching on the shared lower-cased tokenizer, so "class" never
    * matches a blocked "ass" (the classic substring false positive).
    * Pure map-side projection, no shuffle, fused into the scan; the
    * term list lives in the plan as literals — at realistic list sizes
    * (hundreds of terms) prefer this over a broadcast join, which would
    * explode tokens and re-aggregate the corpus. */
  def textBlocklist(docs: DataFrame,
                    terms: Seq[String] = DemoBlocklist): DataFrame = {
    require(terms.nonEmpty, "blocklist must not be empty")
    val n = size(filter(tokens(col("text")), t => t.isin(terms: _*)))
    docs.select(col("doc_id"), n.as("n_blocked"), (n > 0).as("blocked"))
  }

  def textBlocklistQ(spark: SparkSession, dir: String): DataFrame =
    textBlocklist(Tables.documents(spark, dir))

  /** The composite quality score of [[textQuality]] as a reusable Column
    * (int-derived double, bit-identical across engines) — the gate form
    * model-free filters compose with. */
  def qualityScoreCol: Column = {
    val toks = tokens(col("text"))
    val nChars = length(col("text")).cast("double")
    val nTokens = size(toks).cast("double")
    val nPunct =
      size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
        .cast("double")
    least(nTokens / lit(64.0), lit(1.0)) * (lit(1.0) - nPunct / nChars)
  }

  /** Quality-filter agreement matrix: for every pair of named boolean
    * gates, keep counts, overlap, raw agreement (fraction of docs where
    * the two flags coincide) and keep-set Jaccard — the filter-ablation
    * audit a curation team runs before stacking gates (near-1.0 Jaccard
    * means the second gate buys nothing; low agreement between two
    * "quality" filters means at least one is mislabeled). DataComp/DCLM
    * report exactly these overlaps when comparing filter recipes.
    *
    * Scale shape: the gates are caller-supplied Column predicates, so
    * the whole matrix costs ONE corpus scan feeding ONE map-side-combined
    * aggregate to a single row of counters (n + one per gate + one per
    * pair); the pair rows then explode from that 1-row frame — nothing
    * corpus-sized ever shuffles, and adding a gate adds counters, not
    * passes. Ratios are exact integer-count ratios rounded 4dp. */
  def filterAgreement(docs: DataFrame, gates: Seq[(String, Column)]): DataFrame = {
    require(gates.size >= 2, "need at least two gates to compare")
    require(gates.map(_._1).distinct.size == gates.size, "gate names must be unique")
    val pairs = for {
      i <- gates.indices; j <- (i + 1) until gates.size
    } yield (gates(i)._1, gates(j)._1)
    val flags = docs.select(gates.map { case (n, c) =>
      c.cast("long").as(s"f_$n") }: _*)
    val aggs: Seq[Column] =
      count(lit(1)).as("n") +:
        (gates.map { case (n, _) => sum(col(s"f_$n")).as(s"k_$n") } ++
          pairs.map { case (a, b) =>
            sum(col(s"f_$a") * col(s"f_$b")).as(s"k_${a}_$b") })
    val tot = flags.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val (ka, kb, kab) = (col(s"k_$a"), col(s"k_$b"), col(s"k_${a}_$b"))
      val union = ka + kb - kab
      struct(
        lit(a).as("gate_a"), lit(b).as("gate_b"),
        col("n").as("n_docs"), ka.as("n_a"), kb.as("n_b"), kab.as("n_both"),
        round((col("n") + lit(2L) * kab - ka - kb).cast("double") / col("n"), 4)
          .as("agreement"),
        when(union === 0L, lit(0.0))
          .otherwise(round(kab.cast("double") / union, 4)).as("jaccard"))
    }
    tot.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Driver entry: the three standard model-free gates at their driver
    * parameters — Gopher pass (minWords=8, minStop=1, the textGopherQ
    * args), composite quality ≥ 0.5, and blocklist-clean. */
  def filterAgreementQ(spark: SparkSession, dir: String): DataFrame =
    filterAgreement(Tables.documents(spark, dir), Seq(
      "gopher" -> gopherPassCol(8, 100000, 1),
      "quality" -> (qualityScoreCol >= 0.5),
      "clean" -> (size(filter(tokens(col("text")),
        t => t.isin(DemoBlocklist: _*))) === 0)))

  /** Marker-token sets per language for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny: langid at corpus scale is a cheap vote
    * over high-frequency function words. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和")
  )

  /** Language ID: per-language marker-token hit count, argmax with a fixed
    * priority order (en > es > de > fr > zh) on ties — deterministic. */
  def textLangid(docs: DataFrame): DataFrame =
    langidWith(docs, Nil)

  /** [[textLangid]] with extra pass-through columns carried on the SAME
    * scan (no self-join back onto the corpus). NULL text coalesces to ''
    * BEFORE tokenizing: Spark's legacy `size(null) = -1` would otherwise
    * score every language -1 and vote the first one, while the oracle's
    * NULL comparisons would fall through its CASE to the LAST — a silent
    * cross-engine divergence on any corpus with null docs. */
  private def langidWith(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val toks = tokens(coalesce(col("text"), lit("")))
    val scored = docs.select(
      ((col("doc_id") +: carry.map(col)) ++ LangMarkers.map {
        case (lang, markers) =>
          size(filter(toks, t => t.isin(markers: _*))).as(s"score_$lang")
      }): _*
    )
    // argmax by CASE chain: first language (in declaration order) whose
    // score is >= all others wins — same chain in the oracle SQL.
    val langs = LangMarkers.map(_._1)
    val pred = langs.init.foldRight(lit(langs.last)) { (lang, rest) =>
      val ge = langs.filter(_ != lang)
        .map(o => col(s"score_$lang") >= col(s"score_$o"))
        .reduce(_ && _)
      when(ge, lit(lang)).otherwise(rest)
    }
    scored.select(
      ((col("doc_id") +: carry.map(col)) :+
        pred.as("pred_lang") :+
        greatest(langs.map(l => col(s"score_$l")): _*).as("score")): _*
    )
  }

  /** Declared-vs-predicted language disagreement report — the text-label
    * twin of [[graft.llm.Ann.embedOutliers]]: documents whose `lang`
    * column disagrees with the marker-vote prediction are mislabeled,
    * code-switched, or junk — either way the label-audit review queue of
    * a multilingual corpus.
    *
    * One scan: the declared lang rides THROUGH the langid projection
    * (`langidWith`) rather than self-joining the prediction frame back
    * onto the corpus — at 100 TB a doc_id self-join would shuffle the
    * corpus twice for a column it already had in hand. Pure map-side
    * projection + filter, no shuffle at all. */
  def textLangConfusion(docs: DataFrame): DataFrame =
    langidWith(docs, Seq("lang"))
      .filter(col("pred_lang") =!= col("lang"))
      .select(col("doc_id"), col("lang").as("declared_lang"),
        col("pred_lang"), col("score"))

  /** Document fingerprinting: (a) content fingerprint = md5 over the
    * sorted distinct token set (order-insensitive exact-set identity);
    * (b) prefix fingerprint = md5 of the first 16 BPE-ish tokens (cheap
    * rolling-window-style locality hash over the doc head). */
  def textFingerprint(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(toks)))).as("set_fingerprint"),
      md5(concat_ws(" ", slice(toks, 1, 16))).as("prefix_fingerprint")
    )
  }

  /** PII scrubbing: redact e-mail addresses, phone-ish number runs and
    * IPv4 addresses with typed placeholders — the standard first pass over
    * web-scale training text. Patterns stick to character classes both
    * Java regex and RE2 interpret identically. Pure projection. */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Scrub + count what was redacted (audit columns). */
  def textScrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      scrubPii(col("text")).as("clean_text"),
      size(regexp_extract_all(col("text"), lit(EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Pattern), lit(0))).as("n_ips"))

  /** HTML boilerplate stripping: the markup-removal pass a web-scraped
    * corpus runs before ANY text analysis (every quality metric, shingle
    * and tokenizer in this engine assumes prose, and raw HTML poisons
    * them all — tags inflate token counts, scripts dominate n-grams).
    * The trafilatura-class extraction problem reduced to its portable,
    * deterministic core: comments out first, then script/style blocks
    * WITH their payloads (each element in its own pass — RE2 has no
    * backreferences, so `</(script|style)>` cross-matching is avoided
    * structurally), remaining tags → spaces, the five ubiquitous
    * entities decoded (`&amp;` LAST, so `&amp;lt;` yields the literal
    * `&lt;` — the standard double-escape rule), whitespace collapsed.
    * `n_tags` counts raw tag occurrences (the audit: how marked-up was
    * this source), `had_html` gates cheap downstream routing.
    *
    * Pure map-side projection fused into the scan — zero shuffle, the
    * text_scrub shape. Every pattern is written in the Java-regex ∩ RE2
    * common dialect ((?is) inline flags, explicit `[ \t\r\n\f]` class —
    * `\s` differs between the engines on VT) so the DuckDB oracle runs
    * the IDENTICAL pass chain. */
  def textHtmlStrip(docs: DataFrame): DataFrame = {
    val noComments =
      regexp_replace(col("text"), "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComments, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    val clean = trim(regexp_replace(decoded, "[ \t\r\n\f]+", " "))
    val nTags = size(regexp_extract_all(col("text"), lit("<[^>]*>"), lit(0)))
    docs.select(
      col("doc_id"),
      clean.as("clean_text"),
      nTags.cast("long").as("n_tags"),
      (nTags > 0).as("had_html"))
  }

  /** Decontamination: flag training docs sharing any word n-gram with a
    * benchmark/eval set — the standard guard against test-set leakage.
    *
    * Scale shape: benchmark shingles are DISTINCT, HASHED to longs and
    * broadcast (eval sets are small by definition); the corpus side hashes
    * its shingles map-side, so the check is one broadcast semi-join probing
    * 8-byte keys — no shuffle of the corpus, no strings in the broadcast.
    * Returns (doc_id, n_contaminated_ngrams) for flagged docs. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 3): DataFrame = {
    val docSh = Dedup.shingleHashes(docs, n)
    val benchSh = broadcast(
      Dedup.shingleHashes(benchmark, n).select(col("sh_h")).distinct())
    docSh.join(benchSh, "sh_h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
  }

  /** Decontamination threshold sweep (r12 sD): per candidate flagging
    * threshold k (flag a doc when ≥ k of its distinct n-grams appear
    * in the benchmark), the documents and tokens lost — the
    * [[graft.llm.Dedup.dedupThresholdSweep]] shape applied to
    * [[decontaminate]]: k=1 is paranoid (one shared trigram kills the
    * doc, common idioms bleed corpus), k too high leaks verbatim
    * benchmark spans into training. This is the table you read before
    * choosing what [[decontaminate]]'s consumers filter on.
    *
    * Scale shape: ONE overlap-count pass (the decontaminate join,
    * benchmark side broadcast by definition) left-joined onto the doc
    * token books, then the broadcast k-grid crossJoin fans the slim
    * (n_tokens, n_contaminated) rows |k| ways map-side and reduces
    * immediately; totals ride a 1-row broadcast. Exact integers + two
    * 4dp ratios. */
  def decontaminateSweep(docs: DataFrame, benchmark: DataFrame,
                         ks: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    require(ks.nonEmpty, "ks must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val overlap = decontaminate(docs, benchmark)
    // PERSISTED (r17, guide §1.2): the per-doc (tokens, contaminated)
    // frame feeds the totals agg and the k-sweep rollup — unpersisted,
    // each re-ran the n-gram decontamination join. Two longs per doc.
    val per = docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("nt"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("nt"),
        coalesce(col("n_contaminated_ngrams"), lit(0L)).as("nc"))
      .persist()
    val tot = broadcast(per.agg(count(lit(1)).as("n_docs"),
      sum(col("nt")).as("n_tokens")))
    val flagged = col("nc") >= col("k")
    per.crossJoin(broadcast(ks.sorted.toDF("k")))
      .groupBy(col("k")).agg(
        sum(when(flagged, 1L).otherwise(0L)).as("n_flagged"),
        sum(when(flagged, col("nt")).otherwise(0L)).as("tokens_flagged"))
      .crossJoin(tot)
      .select(col("k"), col("n_flagged"),
        round(col("n_flagged").cast("double") /
          col("n_docs").cast("double"), 4).as("doc_share"),
        col("tokens_flagged"),
        round(col("tokens_flagged").cast("double") /
          col("n_tokens").cast("double"), 4).as("token_share"))
  }

  /** Benchmark split = [[textDecontaminateQ]]'s (doc_id < 20). */
  def decontaminateSweepQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    decontaminateSweep(docs.filter(col("doc_id") >= 20),
      docs.filter(col("doc_id") < 20))
  }

  /** Add-α smoothing constant of [[dsirScore]]'s two unigram LMs. */
  val DsirAlpha = 0.5

  /** DSIR-style importance score per corpus document (Xie et al. 2023,
    * "Data Selection via Importance Resampling"): the mean over the
    * doc's token occurrences of log₂ p_target(t) − log₂ p_raw(t), where
    * p_target is an add-α unigram LM over a small TARGET set (the
    * domain/benchmark sample you wish the corpus looked like) and p_raw
    * the same over the corpus itself. Docs whose language is more
    * probable under the target than under the raw pool score high —
    * the principled replacement for hand-tuned quality thresholds when
    * curating toward a domain (the paper hashes n-grams into buckets;
    * the unigram form keeps the oracle exact, and the bucketed variant
    * is the same pipeline with `th % B` as the key). Both LMs share one
    * vocabulary V = distinct tokens of target ∪ corpus, so the smoothed
    * denominators agree.
    *
    * Scale shape, the [[textPerplexity]] family: tokens hash to longs
    * map-side; the TARGET count table is tiny by definition and the RAW
    * table vocab-sized (AQE broadcasts both while small); corpus token
    * occurrences LEFT-join the target counts (absent → 0, smoothing
    * keeps the log finite) and inner-join the raw counts, then ONE
    * map-side-combined per-doc aggregate. The three scalars (N_target,
    * N_raw, |V|) ride as a 1-row broadcast. Rounded to 4 decimals (the
    * shared cross-engine float rule). */
  def dsirScore(docs: DataFrame, target: DataFrame,
                alpha: Double = DsirAlpha): DataFrame = {
    def occ(d: DataFrame) =
      d.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
        .select(col("doc_id"), xxhash64(col("t")).as("th"))
    val corpusTok = occ(docs).persist()
    val targetTok = occ(target).persist()
    val rawCnt = corpusTok.groupBy("th").agg(count(lit(1)).as("cr"))
    val tgtCnt = targetTok.groupBy("th").agg(count(lit(1)).as("ct"))
    val scalars = broadcast(
      corpusTok.select(col("th")).unionAll(targetTok.select(col("th")))
        .agg(countDistinct(col("th")).cast("double").as("v"))
        .crossJoin(broadcast(corpusTok.agg(
          count(lit(1)).cast("double").as("n_raw"))))
        .crossJoin(broadcast(targetTok.agg(
          count(lit(1)).cast("double").as("n_tgt")))))
    val pT = (coalesce(col("ct"), lit(0L)).cast("double") + alpha) /
      (col("n_tgt") + lit(alpha) * col("v"))
    val pR = (col("cr") + alpha) / (col("n_raw") + lit(alpha) * col("v"))
    val result = graft.Exec.materialize(
      corpusTok.join(rawCnt, "th").join(tgtCnt, Seq("th"), "left")
        .crossJoin(scalars)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(log2(pT) - log2(pR)), 4).as("dsir_score")))
    corpusTok.unpersist(); targetTok.unpersist()
    result
  }

  /** Driver entry: the decontaminate split — doc_id < 20 plays the
    * target set, the rest the raw corpus. */
  def dsirScoreQ(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    dsirScore(d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20))
  }

  /** Benchmark-side contamination report — the TRANSPOSE of
    * [[decontaminate]]: per BENCHMARK item, how many corpus documents
    * share at least one n-gram with it and how many of its distinct
    * n-grams leak anywhere — the eval-integrity view ("which of MY eval
    * questions are burned, and how badly") that decides whether a
    * benchmark stays usable, where decontaminate's corpus-side view
    * decides which training docs to drop. Clean benchmark items appear
    * explicitly at 0 (the audit must show what is safe, not only what
    * is not).
    *
    * Scale shape: the corpus side is [[decontaminate]]'s — shingles
    * hashed map-side, benchmark shingles broadcast (eval sets are small
    * by definition); the ONE aggregation is keyed by bench_id, so the
    * two distinct-counts shuffle only (bench_id, hit) pairs — bounded
    * by actual contamination volume, never corpus size. */
  def decontaminateReport(docs: DataFrame, benchmark: DataFrame,
                          n: Int = 3): DataFrame = {
    val corpusSh = Dedup.shingleHashes(docs, n)
    val benchSh = broadcast(Dedup.shingleHashes(benchmark, n)
      .withColumnRenamed("doc_id", "bench_id"))
    val hits = corpusSh.join(benchSh, "sh_h")
      .groupBy("bench_id")
      .agg(countDistinct(col("doc_id")).as("h_docs"),
        countDistinct(col("sh_h")).as("h_ngrams"))
    benchmark.select(col("doc_id").as("bench_id"))
      .join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("h_docs"), lit(0L)).as("n_hit_docs"),
        coalesce(col("h_ngrams"), lit(0L)).as("n_leaked_ngrams"))
  }

  def decontaminateReportQ(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    decontaminateReport(d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20))
  }

  /** Per-language mixture rates in per-mille for [[corpusSample]] — a
    * typical keep-English / downsample-others training mixture. */
  val SampleRatesPermille: Seq[(String, Int)] = Seq(
    "en" -> 1000, "de" -> 500, "es" -> 500, "fr" -> 500, "zh" -> 250)
  val SampleDefaultPermille = 100

  /** Knuth multiplicative-hash constant (⌊2³²/φ⌋) — also used by the
    * reference ecosystem's consistent-hash samplers; any odd constant with
    * good bit mixing works. */
  val SampleMultiplier = 2654435761L
  /** doc_id is reduced mod this prime BEFORE the multiply so the product
    * stays < 2⁶³ for any int64 id — ANSI mode (Spark 4 default) throws on
    * long overflow rather than wrapping. */
  val SampleIdPrime = 999983L
  /** Bucket bits come from the product SHIFTED DOWN by this — the Knuth
    * scheme takes high bits because bit i of k*M depends only on bits
    * 0..i of k: a plain `product mod 1000` (ADVICE r3) reads the low ~10
    * bits, which mix only the low bits of the id, so block-allocated ids
    * sample with systematic bias. Bits ≥20 of the product depend on ALL
    * 20 bits of `doc_id mod prime`. */
  val SampleShift = 20

  /** Stratified corpus sampling: deterministic per-language downsampling to
    * a target training mixture. A doc is kept iff
    * `hash(doc_id) mod 1000 < rate(lang)` with
    * `hash(id) = (((id mod p) * M) >> 20)` — a genuine Knuth
    * multiplicative mix (every bucket bit depends on every id bit), the
    * same integer arithmetic on any engine. Reproducible across
    * runs/engines, stable under corpus growth (a doc's fate never changes
    * as neighbors arrive), and a pure map-side filter: no shuffle, no
    * randomness, pushed to the scan. Residual caveat: ids congruent mod
    * the ~10⁶ prime share a fate — irrelevant unless id blocks are
    * allocated in exact multiples of it. */
  def corpusSample(docs: DataFrame,
                   ratesPermille: Seq[(String, Int)] = SampleRatesPermille,
                   defaultPermille: Int = SampleDefaultPermille): DataFrame =
    docs.filter(sampleKeep(ratesPermille, defaultPermille))
      .select(col("doc_id"), col("lang"), col("source"))

  /** The consistent-hash keep predicate of [[corpusSample]], reusable by
    * any pipeline stage (map-side, deterministic, engine-portable). */
  def sampleKeep(ratesPermille: Seq[(String, Int)] = SampleRatesPermille,
                 defaultPermille: Int = SampleDefaultPermille): Column = {
    val rate = ratesPermille.foldLeft(lit(defaultPermille)) {
      case (acc, (l, r)) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    sampleBucket < rate
  }

  /** The Knuth-mix permille bucket of `doc_id` — the shared consistent
    * hash behind [[corpusSample]] and [[corpusRebalance]]. */
  def sampleBucket: Column = pmod(
    shiftright(pmod(col("doc_id"), lit(SampleIdPrime)) * SampleMultiplier,
      SampleShift),
    lit(1000L))

  /** Corpus-frequency rarity profile per document — the integer-exact core
    * of a CCNet-style LM quality filter: documents dominated by tokens the
    * corpus has barely seen are OOV-heavy noise (or rare gold — either way
    * the filter's signal). A float log-prob mean would be order-dependent
    * across engines; rare-token counts and count ratios are exact.
    *
    * Two-pass distributed shape: (1) corpus unigram frequencies — one
    * explode + hash agg with map-side combine; (2) re-join occurrences to
    * frequencies on the token and aggregate per doc. The frequency table
    * is vocab-sized: AQE broadcasts it while small, shuffles at web scale.
    *
    * @param rareMax a token is "rare" when its corpus occurrence count is
    *                ≤ this. */
  def textRarity(docs: DataFrame, rareMax: Long = 2L): DataFrame = {
    // tokens hash to longs map-side (same trick as the shingle
    // pipelines): the vocab aggregation and the occurrence⋈frequency
    // join shuffle 8-byte keys, never the token strings. xxhash64
    // collisions merge two tokens' counts with odds ~|vocab|²/2⁶⁴ —
    // vanishing at any real vocabulary size.
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("th"))
    val freq = tok.groupBy("th").agg(count(lit(1)).as("c"))
    tok.join(freq, "th")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("c") <= rareMax, 1L).otherwise(0L)).as("n_rare"),
        (sum(when(col("c") <= rareMax, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("rarity_ratio"),
        (sum(col("c")).cast("double") / count(lit(1))).as("mean_tok_freq"))
  }

  /** Vocabulary-coverage (OOV-rate) report: per document, how many of its
    * token occurrences fall outside the corpus's own top-`vocabSize`
    * vocabulary — the question a fixed-vocabulary consumer (a fasttext
    * classifier, a hash-embedding model, a legacy tokenizer) asks of a
    * new corpus before trusting its outputs on it. High OOV = the model
    * sees `<unk>` soup; the per-doc grain localizes WHICH documents.
    * Complements [[textRarity]] (rare by corpus count, vocabulary-free)
    * and [[bpeEncode]] (subword fertility under a trained merge table) —
    * this is the whole-word closed-vocabulary view.
    *
    * Scale shape: corpus frequencies are ONE map-side-combined agg
    * (vocab-sized after combine); the top-V cut is a global
    * TakeOrderedAndProject over that frame — V rows, broadcast back —
    * and the coverage join is a broadcast hash join fused into the
    * token stream with a map-side-combined per-doc agg behind it. The
    * corpus is scanned twice and never shuffled; the only exchange
    * carries (token, partial-count) pairs.
    *
    * Determinism: the vocabulary cut orders by (count DESC, token ASC) —
    * a total order, both engines binary-compare UTF-8 — and the rate is
    * a ratio of exact longs rounded 4dp at output. */
  /** Vocabulary-growth (Heaps' law) curve: at ingest-order prefixes of
    * the corpus (doc_id cutoffs at 1/8, 1/4, 1/2, 1 of the id range),
    * cumulative docs, token occurrences and DISTINCT vocabulary, plus
    * the fitted Heaps exponent β (slope of ln V against ln N by least
    * squares over the checkpoints, V ≈ K·N^β) riding every row — the
    * projection that answers "how big does the vocab table / BPE merge
    * budget / rarity join get at 10× the corpus" before the corpus is
    * 10×. Sub-linear β (typically 0.4–0.6 for natural text) is what
    * makes every vocab-shaped frame in this engine Heaps-bounded; a β
    * near 1 means ids/noise are leaking into tokens and vocab-keyed
    * operators will NOT stay small.
    *
    * Scale shape: checkpoints are INTEGER cutoffs on the id range
    * (min/max only — no rank sort anywhere); one exploded-token pass
    * computes all checkpoints' occurrence counts as conditional sums,
    * and the (token, first_doc) frame — vocab-sized, Heaps-bounded,
    * the [[textRarity]] argument — yields the distinct counts the same
    * way. β is driver arithmetic over the |checkpoints| collected
    * values; ln is the one transcendental, 4dp. */
  def vocabGrowth(docs: DataFrame,
                  fracs: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val b = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    // fracs are EIGHTHS: cutoff_k = lo + (hi - lo) * k / 8, exact ints
    val cuts = fracs.sorted.map(k => (k, lo + (hi - lo) * k / 8))
    // persisted: the occurrence sums and the vocab first-doc frame both
    // consume the exploded stream — one tokenize+explode pass, not two
    val toks = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("t")).persist()
    def condSums(idCol: String, tag: String) = cuts.map { case (k, c) =>
      sum(when(col(idCol) <= c, 1L).otherwise(0L)).as(s"${tag}_$k")
    }
    val occAggs = condSums("doc_id", "occ")
    val occ = toks.agg(occAggs.head, occAggs.tail: _*).head()
    val vocAggs = condSums("fd", "v")
    val voc = toks.groupBy(col("t")).agg(min(col("doc_id")).as("fd"))
      .agg(vocAggs.head, vocAggs.tail: _*).head()
    toks.unpersist()
    val ndAggs = condSums("doc_id", "d")
    val nd = docs.agg(ndAggs.head, ndAggs.tail: _*).head()
    val rows = cuts.indices.map { i =>
      (cuts(i)._1, nd.getLong(i), occ.getLong(i), voc.getLong(i))
    }
    // Heaps fit over checkpoints with nonzero tokens and vocab
    val pts = rows.filter(r => r._3 > 0 && r._4 > 0)
      .map(r => (math.log(r._3.toDouble), math.log(r._4.toDouble)))
    val beta =
      if (pts.size < 2) 0.0
      else {
        val n = pts.size.toDouble
        val sx = pts.map(_._1).sum
        val sy = pts.map(_._2).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        val sx2 = pts.map(p => p._1 * p._1).sum
        val den = n * sx2 - sx * sx
        if (den == 0.0) 0.0
        // + 0.0 normalizes the signed zero a tiny negative residual
        // rounds to (a flat curve's slope is cancellation noise and
        // both engines may land on either zero)
        else BigDecimal((n * sxy - sx * sy) / den)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      }
    rows.map { case (k, d, o, v) => (k, d, o, v, beta) }
      .toDF("eighths", "n_docs", "n_tokens", "vocab", "heaps_beta")
  }

  def vocabGrowthQ(spark: SparkSession, dir: String): DataFrame =
    vocabGrowth(Tables.documents(spark, dir))

  /** Pairwise source-vocabulary overlap (r12 sC): for every pair of
    * sources, the shared distinct-token count with Jaccard and BOTH
    * directional containments — the mix-curation evidence reading
    * [[corpusMixReport]] can't give: two sources with high Jaccard are
    * redundant (downweight one), a small source fully CONTAINED in a
    * big one (containment ≈ 1 on its side, low Jaccard) adds zero
    * lexical signal, and a low-overlap source is where new vocabulary
    * actually lives. The source-dimension twin of [[linkJaccard]]'s
    * per-document set overlap.
    *
    * Scale shape: ONE distinct over (source, token) — map-side partial,
    * Heaps-bounded per source; the pair frame is a self-equi-join ON
    * THE TOKEN (the [[graft.queries.Analytics4.eventsTypeAffinity]]
    * shape): each token held by m sources emits m(m−1)/2 pairs, so the
    * join output is bounded by |vocab|·S² with S = |sources| (tens),
    * never documents². Marginals ride two broadcast joins. Exact
    * integers + three 4dp ratios. */
  def vocabOverlap(docs: DataFrame): DataFrame = {
    // PERSISTED (r17, guide §1.2): the distinct (source, token) frame
    // feeds the marginals and both sides of the overlap self-join —
    // three otherwise-recomputed tokenize+distinct passes. Vocabulary-
    // bounded; ContextCleaner-freed.
    val st = docs.select(col("source"),
        explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
      .persist()
    val marg = st.groupBy(col("source")).agg(count(lit(1)).as("vocab"))
    val counts = st.select(col("source").as("source_a"), col("tok"))
      .join(st.select(col("source").as("source_b"), col("tok")),
        Seq("tok"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared"))
    // full S² pair grid so ZERO-overlap pairs (the interesting ones —
    // that's where new vocabulary lives) appear explicitly
    val grid = marg.select(col("source").as("source_a"),
        col("vocab").as("vocab_a"))
      .crossJoin(marg.select(col("source").as("source_b"),
        col("vocab").as("vocab_b")))
      .filter(col("source_a") < col("source_b"))
    val d = (c: Column) => c.cast("double")
    grid.join(broadcast(counts), Seq("source_a", "source_b"), "left")
      .withColumn("shared", coalesce(col("shared"), lit(0L)))
      .select(col("source_a"), col("source_b"),
        col("vocab_a"), col("vocab_b"), col("shared"),
        round(d(col("shared")) /
          d(col("vocab_a") + col("vocab_b") - col("shared")), 4)
          .as("jaccard"),
        round(d(col("shared")) / d(col("vocab_a")), 4)
          .as("containment_a"),
        round(d(col("shared")) / d(col("vocab_b")), 4)
          .as("containment_b"))
  }

  def vocabOverlapQ(spark: SparkSession, dir: String): DataFrame =
    vocabOverlap(Tables.documents(spark, dir))

  /** Per-source lexical health profile (r12 sC): docs, tokens, distinct
    * vocabulary, hapax legomena (count-1 tokens) with hapax share,
    * type-token ratio and mean doc length — the per-FEED table behind
    * [[vocabOverlap]]'s pairwise view and [[textLexicalDiversity]]'s
    * corpus number. A feed whose TTR or hapax share spikes relative to
    * its peers is usually ids/markup leaking through the tokenizer
    * (the vocab_growth β≈1 smell, localized to the feed that causes
    * it); one that craters is templated/boilerplate mass.
    *
    * Scale shape: tokens hash to longs map-side (the [[textRarity]]
    * trick — strings never shuffle), ONE (source, token) count, one
    * source rollup, one doc-count join on the |sources| dimension.
    * Exact integers + three 4dp ratios. */
  def corpusVocabProfile(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"),
        explode(tokens(col("text"))).as("t"))
      .select(col("source"), xxhash64(col("t")).as("th"))
    val counts = tok.groupBy(col("source"), col("th"))
      .agg(count(lit(1)).as("c"))
    val v = counts.groupBy(col("source")).agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"))
    val d = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    v.join(d, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("vocab"), col("hapax"),
        round(col("vocab").cast("double") /
          col("n_tokens").cast("double"), 4).as("ttr"),
        round(col("hapax").cast("double") /
          col("vocab").cast("double"), 4).as("hapax_share"),
        round(col("n_tokens").cast("double") /
          col("n_docs").cast("double"), 4).as("mean_doc_tokens"))
  }

  def corpusVocabProfileQ(spark: SparkSession, dir: String): DataFrame =
    corpusVocabProfile(Tables.documents(spark, dir))

  /** Per-document n-gram novelty (r12): for each doc, the share of its
    * distinct word n-grams whose FIRST corpus occurrence (by doc_id
    * order) is the doc itself — the ingestion-order memorization audit.
    * A doc near novelty 0 is assembled entirely from n-grams the corpus
    * already contains (boilerplate, template spam, near-copy — the
    * span-level complement of [[graft.llm.Dedup.dedupSpans]]); a stream
    * of docs whose novelty trend falls is a crawl revisiting itself.
    * Docs too short for one n-gram report novelty 1.0 on 0 grams
    * (nothing seen before, nothing copied).
    *
    * Scale shape: two aggregations over ONE persisted distinct-shingle
    * frame — per-doc totals (groupBy doc_id) and first-occurrence
    * credits (min doc_id per shingle, then count per first doc); both
    * map-side-combine to slim frames, joined back on the docs spine.
    * Shingle STRINGS ride the shuffle here because the DuckDB oracle
    * replays them; the 100 TB form swaps in
    * [[graft.llm.Dedup.shingleHashes]] (8-byte wire, xxhash64's
    * vanishing collision trade) without touching the shape. */
  def textNovelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = Dedup.shingleRows(docs, n).persist()
    val totals = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val novel = sh.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    val out = graft.Exec.materialize(
      docs.select(col("doc_id"))
        .join(totals, Seq("doc_id"), "left")
        .join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          when(coalesce(col("n_grams"), lit(0L)) === 0L, lit(1.0))
            .otherwise(round(coalesce(col("n_novel"), lit(0L))
              .cast("double") / col("n_grams"), 4)).as("novelty")))
    sh.unpersist()
    out
  }

  def textNoveltyQ(spark: SparkSession, dir: String): DataFrame =
    textNovelty(Tables.documents(spark, dir))

  /** Quality-vs-budget Pareto curve (r12): the sweep that prices
    * [[corpusBudgetSelect]]'s single point — at each decile of the
    * corpus token mass, greedily keeping best-quality-first, how many
    * docs and tokens are in, and the mean quality of what's kept. The
    * read before committing a budget: the decile where mean quality
    * falls off the cliff is the real size of the usable corpus,
    * everything past it is what a bigger budget would actually buy.
    *
    * Scale shape: reuses the distributed prefix-sum of
    * [[corpusBudgetSelect]] — exact 1e-4 quality grid, per-cell token
    * totals collected (≤ 10 001 rows), offsets prefix-summed driver
    * side, within-cell cumsum windowed per (qk) cell — NO global sort,
    * no corpus-sized single partition. The decile thresholds are plan
    * literals (integer floor of k·T/10); each decile row aggregates the
    * selected prefix via one broadcast grid crossJoin + filter, the
    * [[graft.llm.Dedup.dedupThresholdSweep]] pattern. Mean quality
    * averages exact grid ints, 4dp. */
  def corpusQualityPareto(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val q = textQuality(docs).select(col("doc_id"), col("n_tokens"),
      round(col("quality_score") * 10000).cast("long").as("qk"))
    val totals = q.groupBy("qk").agg(sum("n_tokens").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (qk, _) => -qk }
    val grandTotal = totals.map(_._2).sum
    val offsets = totals
      .zip(totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot })
      .map { case ((qk, _), prefix) => (qk, prefix) }.toSeq
    val offsetDf = broadcast(offsets.toDF("qk", "qk_offset"))
    val w = Window.partitionBy("qk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = q.join(offsetDf, "qk")
      .select(col("doc_id"), col("n_tokens"), col("qk"),
        (col("qk_offset") + sum(col("n_tokens")).over(w)).as("cum_tokens"))
    val grid = broadcast((1 to 10)
      .map(k => (k, k.toLong * grandTotal / 10L))
      .toDF("decile", "budget_tokens"))
    val selected = cum.crossJoin(grid)
      .filter(col("cum_tokens") <= col("budget_tokens"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("cum_tokens")).as("n_tokens"),
        round(avg(col("qk").cast("double") / 10000.0), 4)
          .as("mean_quality"))
    grid.join(selected, Seq("decile"), "left")
      .select(col("decile"), col("budget_tokens"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("mean_quality"), lit(0.0)).as("mean_quality"))
  }

  def corpusQualityParetoQ(spark: SparkSession, dir: String): DataFrame =
    corpusQualityPareto(Tables.documents(spark, dir))

  /** Boilerplate-mass coverage curve (r12): what share of ALL 3-gram
    * occurrences the top-k most frequent shingles account for, at k
    * checkpoints — the corpus-level complement of [[textNovelty]]'s
    * per-doc view. A corpus where 100 shingles cover half the
    * occurrence mass is template soup ([[graft.llm.SpanDedup]]'s
    * span-level targets, quantified before choosing thresholds); a
    * flat curve is genuinely diverse text.
    *
    * Scale shape: one shingle pass to the (sh, count) frame (map-side
    * combined), then `orderBy(count desc, sh).limit(maxK)` — a
    * distributed TakeOrdered, NOT a global sort — so only the top-k
    * frame (≤ 1000 rows) ever concentrates; checkpoint sums are a
    * broadcast grid crossJoin over it; the total is one scalar agg.
    * The deterministic (count desc, shingle asc) cutoff is the
    * [[textNgramTopK]] rule. Exact ints, coverage 4dp. */
  def textNgramCoverage(docs: DataFrame,
                        ks: Seq[Int] = Seq(10, 100, 1000),
                        n: Int = 3): DataFrame = {
    require(ks.nonEmpty, "textNgramCoverage needs at least one k")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val occ = Dedup.shingleRowsAll(docs, n)
    val counts = occ.groupBy(col("sh")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c"))).head().getLong(0)
    val top = counts.orderBy(col("c").desc, col("sh").asc)
      .limit(ks.max)
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("sh").asc)))
    val grid = broadcast(ks.sorted.toDF("k"))
    val covered = top.crossJoin(grid).filter(col("r") <= col("k"))
      .groupBy(col("k"))
      .agg(sum(col("c")).as("covered_occurrences"))
    grid.join(covered, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("covered_occurrences"), lit(0L))
          .as("covered_occurrences"),
        lit(total).as("total_occurrences"),
        when(lit(total) > 0L,
          round(coalesce(col("covered_occurrences"), lit(0L))
            .cast("double") / total, 4)).otherwise(0.0).as("coverage"))
  }

  def textNgramCoverageQ(spark: SparkSession, dir: String): DataFrame =
    textNgramCoverage(Tables.documents(spark, dir))

  def vocabCoverage(docs: DataFrame, vocabSize: Int = 256): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val vocab = broadcast(
      tok.groupBy("t").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t").asc).limit(vocabSize)
        .select(col("t"), lit(1).as("in_vocab")))
    val oov = sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
    tok.join(vocab, Seq("t"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        oov.as("n_oov"),
        round(oov.cast("double") / count(lit(1)), 4).as("oov_rate"))
  }

  /** Unigram-LM cross-entropy per document, in bits per token — the
    * CCNet-style perplexity quality filter reduced to its self-trained
    * unigram core: H(d) = log₂N − mean(log₂ c_t) over d's token
    * OCCURRENCES, where c_t is the token's corpus count and N the corpus
    * total. High bits/token = the doc is dominated by tokens the corpus
    * rarely produces (noise, OOV soup, or rare gold — the filter's
    * signal either way); low = boilerplate the corpus has memorized.
    * Complements [[textRarity]]: rarity counts rare tokens, this WEIGHS
    * every token by its improbability.
    *
    * Same two-pass shape as [[textRarity]] (corpus frequencies, then an
    * occurrence⋈frequency re-join aggregated per doc); the corpus total
    * rides as a 1-row broadcast. Floats are unavoidable here (logs), so
    * the result is ROUNDED to 4 decimals: the pre-round value differs
    * across engines only in the last ulps (summation order, libm log2),
    * which rounding absorbs — the ~1e-12 absolute wobble flips a 1e-4
    * boundary with vanishing probability. */
  def textPerplexity(docs: DataFrame): DataFrame = {
    // tokens → longs map-side, the textRarity trick: joins and aggs
    // shuffle 8-byte hashes, never token strings
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("th"))
    // freq is PERSISTED (vocab-sized): it feeds both the corpus total
    // and the occurrence join, and without the cache each reference
    // re-runs the whole tokenize/explode/agg pipeline — measured as a
    // third full corpus scan in the plan (exchange reuse does not fire
    // across these branches, the dedupNgramJaccard lesson)
    val freq = tok.groupBy("th").agg(count(lit(1)).as("c")).persist()
    val total = broadcast(freq.agg(sum(col("c")).cast("double").as("n_total")))
    val result = graft.Exec.materialize(
      tok.join(freq, "th").crossJoin(total)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          round(log2(max(col("n_total"))) - avg(log2(col("c"))), 4)
            .as("bits_per_token")))
    freq.unpersist()
    result
  }

  /** Difficulty-staged curriculum plan (r12 sC): the corpus split into
    * `stages` phases of (near-)equal TOKEN mass ordered by per-doc
    * unigram cross-entropy — the curriculum-learning schedule (Bengio
    * et al. 2009: train predictable → surprising) priced as a table:
    * per stage, its difficulty band [min_bits, max_bits], document and
    * token counts, and token share. Equal token mass per stage means
    * equal COMPUTE per phase, which is what a training scheduler
    * actually allocates.
    *
    * No global sort: per-doc difficulty ([[textPerplexity]]'s 4dp
    * bits/token) quantizes to centibit bins, the stage boundaries come
    * from HISTOGRAM algebra (cumulative token mass before each bin,
    * integer `div` — the events_power_users trick applied to
    * difficulty), and a bin straddling a boundary is assigned wholly
    * by its start, deterministically on both engines — so a single
    * bin holding more than a full 1/stages of the token mass SWALLOWS
    * the stage labels it spans (a narrow-difficulty corpus can emit
    * fewer than `stages` rows; the fixture pins this). Windows touch
    * only the bin histogram (difficulty-resolution-bounded, never the
    * corpus). */
  def corpusCurriculum(docs: DataFrame, stages: Int = 4): DataFrame = {
    require(stages >= 1, "stages must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val per = textPerplexity(docs)
      .select(col("n_tokens"),
        round(col("bits_per_token") * 100).cast("long").as("bin"))
    val hist = per.groupBy(col("bin")).agg(
      count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_toks"))
    val wBefore = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val staged = hist
      .withColumn("cum_before",
        coalesce(sum(col("n_toks")).over(wBefore), lit(0L)))
      .withColumn("total", sum(col("n_toks")).over(wAll))
      .withColumn("stage", least(lit(stages.toLong),
        lit(1L) + expr(s"(cum_before * $stages) div total")))
    staged.groupBy(col("stage")).agg(
        count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        round(min(col("bin")).cast("double") / 100, 4).as("min_bits"),
        round(max(col("bin")).cast("double") / 100, 4).as("max_bits"),
        round(sum(col("n_toks")).cast("double") /
          max(col("total")).cast("double"), 4).as("token_share"))
  }

  def corpusCurriculumQ(spark: SparkSession, dir: String): DataFrame =
    corpusCurriculum(Tables.documents(spark, dir))

  /** The executable twin of [[corpusCurriculum]]: per-document stage
    * assignment (doc_id, difficulty bits, bin, stage) — what a training
    * loader actually consumes, where the plan op reports the stage
    * BOOKS. Same bins, same histogram-algebra boundaries, same
    * straddling rule, so `assign.groupBy(stage)` reproduces the plan
    * exactly (spec-pinned).
    *
    * Scale shape: the per-doc difficulty frame joins the ≤ 64-row
    * staged bin table by BROADCAST — no second corpus exchange beyond
    * [[textPerplexity]]'s own. */
  def corpusCurriculumAssign(docs: DataFrame, stages: Int = 4): DataFrame = {
    require(stages >= 1, "stages must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val per = textPerplexity(docs)
      .select(col("doc_id"), col("n_tokens"), col("bits_per_token"),
        round(col("bits_per_token") * 100).cast("long").as("bin"))
    val hist = per.groupBy(col("bin"))
      .agg(sum(col("n_tokens")).as("n_toks"))
    val wBefore = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val staged = hist
      .withColumn("cum_before",
        coalesce(sum(col("n_toks")).over(wBefore), lit(0L)))
      .withColumn("total", sum(col("n_toks")).over(wAll))
      .select(col("bin"), least(lit(stages.toLong),
        lit(1L) + expr(s"(cum_before * $stages) div total")).as("stage"))
    per.join(broadcast(staged), Seq("bin"))
      .select(col("doc_id"), col("n_tokens"), col("bits_per_token"),
        col("bin"), col("stage"))
  }

  def corpusCurriculumAssignQ(spark: SparkSession, dir: String): DataFrame =
    corpusCurriculumAssign(Tables.documents(spark, dir))

  /** Interpolation weight on the bigram term of
    * [[textPerplexityBigram]]'s LM: p = λ·p_bigram + (1−λ)·p_unigram. */
  val BigramLambda = 0.7

  /** Bigram-LM cross-entropy per document, in bits per transition — the
    * context-aware upgrade of [[textPerplexity]]'s unigram core (the
    * actual CCNet/KenLM regime is an n-gram LM; a unigram model scores
    * shuffled text identically to prose, a bigram model is the cheapest
    * one that does not). The model is Jelinek-Mercer interpolated,
    * p(b|a) = λ·c(ab)/c(a·) + (1−λ)·c(b)/N, with c(a·) the count of `a`
    * as a bigram PREFIX (so the conditional sums to 1 over observed
    * continuations) and N the corpus token total; λ = [[BigramLambda]].
    * The unigram floor means unseen-in-context transitions are scored,
    * never −∞. H(d) = −mean log₂ p over d's transitions; docs with < 2
    * tokens have no transitions and drop out (both engines).
    *
    * Scale shape, the [[textPerplexity]] two-pass design extended one
    * order: bigram occurrences are generated MAP-SIDE from each doc's
    * token array (a `sequence`/`transform` explode fused into the scan —
    * no self-join on position), hashed to an (a, b) pair of xxhash64
    * longs so every downstream agg/join shuffles 16-byte keys, never
    * token strings. The occurrence frame is persisted once and feeds
    * three vocab-sized count tables (bigram, prefix-context, unigram) —
    * AQE broadcasts them back while small, shuffles at web scale — plus
    * a 1-row broadcast total. Rounded to 4 decimals (the shared float
    * rule: summation order and libm log2 differ across engines in the
    * last ulps; rounding absorbs that). */
  def textPerplexityBigram(docs: DataFrame,
                           lambda: Double = BigramLambda): DataFrame = {
    // (doc_id, a, b) bigram occurrences: adjacent token-hash pairs,
    // generated map-side from the token array (positions 0..n-2)
    val ts = tokens(col("text"))
    val big = docs
      .select(col("doc_id"), ts.as("ts"))
      // <2-token docs have no transitions — and `sequence(0, -1)` would
      // DESCEND (Spark's step defaults to sign(stop-start)), not empty
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("ts")) - 2),
        i => struct(xxhash64(element_at(col("ts"), i + 1)).as("a"),
          xxhash64(element_at(col("ts"), i + 2)).as("b")))).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
      .persist()
    // unigram counts come from token OCCURRENCES (textPerplexity's
    // table), not from bigram endpoints — last tokens of docs count too
    val tok = docs.select(explode(ts).as("t"))
      .select(xxhash64(col("t")).as("th")).persist()
    val uni = tok.groupBy("th").agg(count(lit(1)).as("cu"))
    val ctx = big.groupBy("a").agg(count(lit(1)).as("ca"))
    val bgc = big.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val total = broadcast(tok.agg(count(lit(1)).cast("double").as("n_total")))
    val p = lit(lambda) * col("cab") / col("ca") +
      lit(1.0 - lambda) * col("cu") / col("n_total")
    val result = graft.Exec.materialize(
      big.join(bgc, Seq("a", "b")).join(ctx, Seq("a"))
        .join(uni, col("b") === col("th")).crossJoin(total)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(-avg(log2(p)), 4).as("bits_per_transition")))
    big.unpersist(); tok.unpersist()
    result
  }

  def textPerplexityBigramQ(spark: SparkSession, dir: String): DataFrame =
    textPerplexityBigram(Tables.documents(spark, dir))

  /** Absolute discount for [[textPerplexityKn]] — the classic 0.75. */
  val KnDiscount = 0.75

  /** Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995;
    * Chen & Goodman 1999) — the smoothing the KenLM-style filtering
    * models (CCNet et al.) actually use, and the fix for
    * [[textPerplexityBigram]]'s known JM weakness: JM backs off to raw
    * UNIGRAM frequency, so a token frequent in exactly one context
    * ("francisco", which only ever follows "san") is overrated in every
    * other context; KN backs off to the CONTINUATION distribution
    * P_cont(b) = N1+(·b)/|bigram types| — how many distinct contexts b
    * completes — which scores such tokens low outside their collocation.
    * P(b|a) = (c(ab) − D)/c(a·) + D·N1+(a·)/c(a·) · P_cont(b), D = 0.75;
    * self-trained like the JM twin, so every eval bigram has c(ab) ≥ 1
    * and no zero branch is reachable. Per-context probabilities sum to
    * EXACTLY 1 (spec-pinned) — KN is a proper distribution, not a
    * heuristic blend.
    *
    * Scale shape identical to the JM twin: map-side bigram generate,
    * hashes on the wire, four vocab/bigram-type-bounded count frames
    * joined back (AQE broadcasts them), the 1-row type total as a
    * broadcast crossJoin, one per-doc agg. Heaps' law bounds every
    * joined frame sublinearly in the corpus. */
  def textPerplexityKn(docs: DataFrame,
                       discount: Double = KnDiscount): DataFrame = {
    require(discount > 0 && discount < 1,
      s"absolute discount must be in (0,1), got $discount")
    val ts = tokens(col("text"))
    val big = docs
      .select(col("doc_id"), ts.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("ts")) - 2),
        i => struct(xxhash64(element_at(col("ts"), i + 1)).as("a"),
          xxhash64(element_at(col("ts"), i + 2)).as("b")))).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
      .persist()
    val bgc = big.groupBy("a", "b").agg(count(lit(1)).as("cab")).persist()
    val ctx = big.groupBy("a").agg(count(lit(1)).as("ca"))
    val n1a = bgc.groupBy("a").agg(count(lit(1)).as("n1a"))
    val n1b = bgc.groupBy("b").agg(count(lit(1)).as("n1b"))
    val tot = broadcast(bgc.agg(count(lit(1)).cast("double").as("nbt")))
    val p = (col("cab") - lit(discount)) / col("ca") +
      lit(discount) * col("n1a") / col("ca") * (col("n1b") / col("nbt"))
    val result = graft.Exec.materialize(
      big.join(bgc, Seq("a", "b")).join(ctx, Seq("a"))
        .join(n1a, Seq("a")).join(n1b, Seq("b")).crossJoin(tot)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(-avg(log2(p)), 4).as("bits_per_transition")))
    big.unpersist(); bgc.unpersist()
    result
  }

  def textPerplexityKnQ(spark: SparkSession, dir: String): DataFrame =
    textPerplexityKn(Tables.documents(spark, dir))

  /** Split-boundary permilles for [[corpusSplit]]: bucket < 900 → train,
    * < 950 → val, else test — a 90/5/5 split. */
  val SplitTrainPermille = 900
  val SplitValPermille = 950
  /** [[corpusSplit]]'s OWN odd mixing constant (xxhash32's second prime).
    * It must differ from [[SampleMultiplier]]: the sampler keeps LOW
    * buckets, so a split keyed on the same bucket would send every
    * sampled doc to `train` and leave val/test empty the moment the two
    * compose. A different multiplier gives an independent-looking
    * permutation of the id space (spec-verified: split shares hold
    * inside the sampled subset). */
  val SplitMultiplier = 2246822519L

  /** Deterministic disjoint train/val/test assignment — the hold-out
    * companion to [[corpusSample]]: every doc lands in EXACTLY one split
    * (sampling decides membership; splitting decides destination), via
    * the same Knuth multiplicative mix shape as [[sampleBucket]] but
    * under [[SplitMultiplier]], so the two hashes decorrelate and
    * sample∘split composes. A doc's split never changes as the corpus
    * grows (no count-based boundaries), the assignment reproduces on any
    * engine (integer-only arithmetic), and the whole operator is a pure
    * map-side projection: no shuffle, no randomness, pushed to the
    * scan. */
  def corpusSplit(docs: DataFrame,
                  trainPermille: Int = SplitTrainPermille,
                  valPermille: Int = SplitValPermille): DataFrame = {
    require(0 < trainPermille && trainPermille < valPermille &&
      valPermille <= 1000,
      s"need 0 < train < val <= 1000, got ($trainPermille, $valPermille)")
    docs.select(col("doc_id"), col("lang"), col("source"),
      splitCol(trainPermille, valPermille).as("split"))
  }

  /** The split-label expression behind [[corpusSplit]], reusable by any
    * stage that needs the assignment without the projection (e.g.
    * [[graft.llm.Export.exportSplitShards]]). */
  def splitCol(trainPermille: Int = SplitTrainPermille,
               valPermille: Int = SplitValPermille): Column =
    when(splitBucket < trainPermille, "train")
      .when(splitBucket < valPermille, "val")
      .otherwise("test")

  /** The permille bucket behind [[corpusSplit]] — [[sampleBucket]]'s
    * arithmetic under the decorrelated [[SplitMultiplier]]. */
  def splitBucket: Column = pmod(
    shiftright(pmod(col("doc_id"), lit(SampleIdPrime)) * SplitMultiplier,
      SampleShift),
    lit(1000L))

  /** Sequence packing: lay the corpus out as one concatenated token stream
    * (doc_id order) chunked into fixed `packTokens` training sequences —
    * each doc gets the pack it STARTS in and its token offset within it.
    *
    * Scale shape — a distributed prefix-sum, because a single global
    * window (`ORDER BY doc_id` over everything) would serialize the corpus
    * through one task:
    *  1. docs bucket by `doc_id div bucketWidth` (contiguous ranges);
    *  2. per-bucket token totals aggregate map-side; only #buckets rows
    *     reach the driver, which prefix-sums them into bucket offsets;
    *  3. offsets broadcast back; each bucket runs its own bounded window
    *     cumsum in parallel, shifted by its offset.
    * Pick `bucketWidth` so #buckets stays driver-small (~10⁴ at 100 TB)
    * while each bucket holds far more rows than cores. */
  def corpusPack(docs: DataFrame, packTokens: Int = 512,
                 bucketWidth: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tok"),
      call_function("div", col("doc_id"), lit(bucketWidth)).as("bkt"))
    val bucketTotals = toks.groupBy("bkt").agg(sum("n_tok").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // prefix-sum the bucket totals: bucket k's offset is the sum of all
    // earlier buckets' totals
    val offsets = bucketTotals
      .zip(bucketTotals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot })
      .map { case ((bkt, _), prefix) => (bkt, prefix) }.toSeq
    val offsetDf = broadcast(offsets.toDF("bkt", "bkt_offset"))
    val w = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = (col("bkt_offset") + sum(col("n_tok")).over(w) - col("n_tok"))
      .as("tok_start")
    toks.join(offsetDf, "bkt")
      .select(col("doc_id"), col("n_tok"), start)
      .select(col("doc_id"), col("n_tok"),
        call_function("div", col("tok_start"), lit(packTokens.toLong)).as("pack_id"),
        pmod(col("tok_start"), lit(packTokens.toLong)).as("pack_offset"))
  }

  /** Token-budget selection — the data-constrained-scaling move: keep
    * the PREFIX of the quality ranking whose cumulative token count
    * stays within `budgetTokens` ("train on the best B tokens we
    * have"). The ranking key is [[textQuality]]'s composite score in
    * exact ten-thousandths (int-derived double arithmetic → identical
    * on every engine, the corpus_sample_quality permille convention),
    * ties broken by doc_id; selection is strictly prefix-based — after
    * the first overflowing doc nothing else enters, so the kept set is
    * a deterministic function of the corpus, not a knapsack heuristic.
    * Output keeps EVERY doc with its running total and verdict (the
    * audit frame; filter `selected` for the training cut).
    *
    * Scale shape = [[corpusPack]]'s distributed prefix-sum with the
    * quality key as the bucket: per-score-value totals (≤ 10 001 rows —
    * the score lives on a fixed 1e-4 grid) collect to the driver,
    * prefix-sum in rank order, broadcast back as offsets; each doc's
    * global running total is its bucket offset + a within-bucket
    * window cumsum ordered by doc_id. No global sort, no single-task
    * funnel — the window partitions by score value. */
  def corpusBudgetSelect(docs: DataFrame,
                         budgetTokens: Long = 8000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val q = textQuality(docs).select(col("doc_id"), col("n_tokens"),
      round(col("quality_score") * 10000).cast("long").as("qk"))
    val totals = q.groupBy("qk").agg(sum("n_tokens").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (qk, _) => -qk }
    val offsets = totals
      .zip(totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot })
      .map { case ((qk, _), prefix) => (qk, prefix) }.toSeq
    val offsetDf = broadcast(offsets.toDF("qk", "qk_offset"))
    val w = Window.partitionBy("qk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = (col("qk_offset") + sum(col("n_tokens")).over(w)).as("cum_tokens")
    q.join(offsetDf, "qk")
      .select(col("doc_id"), col("n_tokens"), cum)
      .withColumn("selected", col("cum_tokens") <= budgetTokens)
  }

  def corpusBudgetSelectQ(spark: SparkSession, dir: String): DataFrame =
    corpusBudgetSelect(Tables.documents(spark, dir))

  /** STRATIFIED token-budget selection: every language gets its own
    * budget and keeps its own quality-ranked prefix — the budgeted twin
    * of [[corpusSampleStratified]], and what a multilingual curation
    * actually runs, because [[corpusBudgetSelect]]'s single global
    * ranking silently spends the whole budget on the majority language
    * (quality scores aren't comparable across languages: a rare
    * language's best docs lose a global rank fight on length/punct
    * statistics alone). Equal per-language budgets are the uniform-mix
    * convention ([[corpusRebalance]]'s goal expressed as tokens);
    * callers with a temperature-weighted allocation pass their own map.
    *
    * Scale shape: [[corpusBudgetSelect]]'s distributed prefix-sum keyed
    * per (lang, quality-grid value) — the bounded collect grows to
    * ≤ |langs| × 10 001 rows, offsets prefix-sum per language in rank
    * order driver-side, and the within-grid-cell cumsum windows on
    * (lang, qk) — no global sort, no per-language single-task funnel.
    * The quality key lives on the exact 1e-4 grid (int-derived,
    * bit-identical cross-engine), and `lang` rides the ONE quality
    * scan (no doc_id self-join re-attaching it). */
  def corpusBudgetMix(docs: DataFrame,
                      budgetPerLang: Long = 4000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = tokens(col("text"))
    val nChars = length(col("text")).cast("double")
    val nTokens = size(toks).cast("double")
    val nPunct = size(regexp_extract_all(col("text"),
      lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val q = docs.select(col("doc_id"), col("lang"),
      nTokens.cast("bigint").as("n_tokens"),
      round(least(nTokens / lit(64.0), lit(1.0)) *
        (lit(1.0) - nPunct / nChars) * 10000).cast("long").as("qk"))
    val totals = q.groupBy("lang", "qk").agg(sum("n_tokens").as("tot"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      val sorted = rows.sortBy { case (_, qk, _) => -qk }
      sorted.zip(sorted.scanLeft(0L) { case (acc, (_, _, t)) => acc + t })
        .map { case ((l, qk, _), prefix) => (l, qk, prefix) }
    }
    val offsetDf = broadcast(offsets.toDF("lang", "qk", "qk_offset"))
    val w = Window.partitionBy("lang", "qk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q.join(offsetDf, Seq("lang", "qk"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("qk_offset") + sum(col("n_tokens")).over(w)).as("cum_tokens"))
      .withColumn("selected", col("cum_tokens") <= budgetPerLang)
  }

  def corpusBudgetMixQ(spark: SparkSession, dir: String): DataFrame =
    corpusBudgetMix(Tables.documents(spark, dir))

  /** Mixture-drift report: per language, token share vs the uniform
    * target and the KL-divergence contribution p·ln(p/q), plus the
    * total KL riding every row — the one NUMBER that says how far the
    * corpus mixture has drifted from spec between refreshes, where
    * [[corpusMixReport]] shows the raw shares and leaves the judgment
    * to the reader (KL ≈ 0: ship it; rising KL across refreshes:
    * the crawler's language balance is rotting). Uniform q = 1/|L| is
    * the [[corpusRebalance]]/[[corpusBudgetMix]] goal expressed as a
    * divergence; `targetMix` swaps in a caller-supplied q per language
    * (same arithmetic — languages absent from the map fall back to the
    * uniform share, so a partial spec still yields a finite KL).
    *
    * ONE map-side-combined agg to the |langs| frame; totals and the
    * KL sum are windows over THAT frame. Shares are exact-int ratios;
    * ln is the one transcendental (the text_tfidf precedent), with
    * every float rounded 4dp at the boundary. A language whose docs
    * all tokenize empty has p = 0: its KL term is 0 by the measure-
    * theoretic convention 0·ln 0 = 0 (guarded — Spark's log(0) is
    * NULL, which would silently drop the row from kl_total while
    * DuckDB's ln(0) errors; the oracle mirrors the CASE). */
  def corpusMixKl(docs: DataFrame,
                  targetMix: Map[String, Double] = Map.empty): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(tokens(col("text"))).cast("bigint")).as("n_tokens"))
    val w = Window.partitionBy()
    // two projection levels: p/nl are window results, the KL total is a
    // window over the term derived from them (nesting is not allowed)
    val withShares = agg.select(col("lang"), col("n_docs"), col("n_tokens"),
      (col("n_tokens").cast("double") / sum(col("n_tokens")).over(w)).as("p"),
      count(lit(1)).over(w).cast("double").as("nl"))
    // q: caller target (plan-literal map, |langs|-bounded) or uniform.
    // The uniform branch keeps the p·ln(p·nl) form — bit-identical to
    // the oracle's expression, where p/(1/nl) would round differently
    // whenever nl is not a power of two.
    val (q, term) =
      if (targetMix.isEmpty)
        (lit(1.0) / col("nl"), col("p") * log(col("p") * col("nl")))
      else {
        val qc = coalesce(
          element_at(
            map(targetMix.toSeq.sortBy(_._1)
              .flatMap { case (l, v) => Seq(lit(l), lit(v)) }: _*),
            col("lang")),
          lit(1.0) / col("nl"))
        (qc, col("p") * log(col("p") / qc))
      }
    val shares = withShares
      .withColumn("q", q)
      .withColumn("term", when(col("p") > 0, term).otherwise(lit(0.0)))
    shares.select(col("lang"), col("n_docs"), col("n_tokens"),
      round(col("p"), 4).as("token_share"),
      round(col("q"), 4).as("target_share"),
      round(col("term"), 4).as("kl_term"),
      round(sum(col("term")).over(w), 4).as("kl_total"))
  }

  def corpusMixKlQ(spark: SparkSession, dir: String): DataFrame =
    corpusMixKl(Tables.documents(spark, dir))

  /** Deterministic proportional source interleaving — the training-order
    * scheduler: doc r of a source with n docs gets the stride key
    * (r − ½)/n (its fraction through its own source), and the global
    * order sorts by that key — so every prefix of the training stream
    * carries each source in proportion to its size (within one doc; the
    * spec pins the bound), instead of front-loading whichever source
    * sorts first. The deterministic, replayable version of the sampled
    * source-mixing T5/Pile-style loaders do at read time; ties on the
    * key (exact fraction collisions) break by (source, doc_id).
    *
    * Scale shape — NO global sort and no per-source single-task window:
    * both ranks come from [[corpusPack]]'s distributed prefix-sum.
    * `src_rank` = per-(source, id-bucket) counts (bounded collect)
    * prefix-summed per source on the driver + a within-bucket
    * row_number; `train_order` = the same trick keyed on the stride
    * key's integer millesimal bucket — floor of bit-identical doubles,
    * so bucketing is engine-exact and monotone in the key. Both
    * engines compute the key with the same IEEE ops on the same
    * integers, so the sort order (ties included) is identical — the
    * oracle's two plain windows replay it. */
  def corpusInterleave(docs: DataFrame, bucketWidth: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val t = docs.select(col("doc_id"), col("source"),
      call_function("div", col("doc_id"), lit(bucketWidth)).as("bkt"))
    // per-(source, bucket) counts: one bounded collect feeds BOTH the
    // per-source rank offsets and the source totals
    val counts = t.groupBy("source", "bkt").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val srcOffsets = counts.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zip(sorted.scanLeft(0L) { case (acc, (_, _, c)) => acc + c })
        .map { case ((_, bkt, _), prefix) => (src, bkt, prefix) }
    }
    val totals = counts.groupBy(_._1).map { case (s, rows) =>
      (s, rows.map(_._3).sum) }.toSeq
    val offsetDf = broadcast(srcOffsets.toDF("source", "bkt", "rank_offset"))
    val totalsDf = broadcast(totals.toDF("source", "n_s"))
    val wb = Window.partitionBy("source", "bkt").orderBy("doc_id")
    val ranked = t.join(offsetDf, Seq("source", "bkt"))
      .join(totalsDf, "source")
      .select(col("doc_id"), col("source"),
        (col("rank_offset") + row_number().over(wb)).as("src_rank"),
        col("n_s"))
      .withColumn("k", (col("src_rank") - lit(0.5)) / col("n_s"))
      .withColumn("kb", floor(col("k") * 1000).cast("long"))
    val ranked2 = graft.Exec.materialize(ranked)
    val kbCounts = ranked2.groupBy("kb").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val kbOffsets = kbCounts
      .zip(kbCounts.scanLeft(0L) { case (acc, (_, c)) => acc + c })
      .map { case ((kb, _), prefix) => (kb, prefix) }.toSeq
    val kbDf = broadcast(kbOffsets.toDF("kb", "kb_offset"))
    val wk = Window.partitionBy("kb")
      .orderBy(col("k"), col("source"), col("doc_id"))
    ranked2.join(kbDf, "kb")
      .select(col("doc_id"), col("source"), col("src_rank"),
        (col("kb_offset") + row_number().over(wk)).as("train_order"))
  }

  def corpusInterleaveQ(spark: SparkSession, dir: String): DataFrame =
    corpusInterleave(Tables.documents(spark, dir))

  /** The power-of-two length ladder of [[corpusPackBins]] up to
    * `packTokens` (1, 2, 4, …, packTokens) — shared with the oracle's
    * CASE chain so both engines classify identically with integer
    * comparisons only (log2 on doubles would wobble at exact powers). */
  private[graft] def packClasses(packTokens: Int): Seq[Long] =
    Iterator.iterate(1L)(_ * 2).takeWhile(_ < packTokens).toSeq :+
      packTokens.toLong

  /** WHOLE-DOC histogram packing — the "no cross-doc attention"
    * alternative to [[corpusPack]]'s concatenated stream: each doc is
    * rounded up to its power-of-two length class (over-budget docs
    * truncate to one full pack) and packs hold `packTokens/class` docs
    * of one class, so no document ever splits across sequences and the
    * padding waste is bounded by the class rounding (< 2× per doc,
    * far less in aggregate on Zipf-ish length mixes) — the histogram
    * flavor of Packed-BERT-style packing, deterministic by
    * construction. Output (doc_id, n_tok, len_class, pack_id, slot);
    * (len_class, pack_id) is the composite sequence key and every
    * pack except each class's last is exactly full.
    *
    * Scale shape — [[corpusPack]]'s distributed prefix-sum, keyed per
    * class: per-(class, doc-bucket) COUNTS (bounded collect: ~10
    * classes × corpus/bucketWidth buckets) prefix-summed driver-side
    * within each class, broadcast back, per-(class, bucket) local
    * row_number + offset. No class ever funnels through one task, no
    * global sort; the doc-id ordering within a class equals the
    * (bucket, doc_id) window order, which is what the oracle's single
    * row_number reproduces. */
  def corpusPackBins(docs: DataFrame, packTokens: Int = 512,
                     bucketWidth: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val classes = packClasses(packTokens)
    // smallest class >= n_tok: smallest condition OUTERMOST
    val clsCol = classes.reverse.tail.foldLeft(
      lit(classes.last): Column) { (acc, c) =>
      when(col("n_tok") <= c, lit(c)).otherwise(acc)
    }
    val toks = docs.select(col("doc_id"),
        least(size(tokens(col("text"))).cast("long"),
          lit(packTokens.toLong)).as("n_tok"),
        call_function("div", col("doc_id"), lit(bucketWidth)).as("bkt"))
      .withColumn("cls", clsCol)
    val counts = toks.groupBy("cls", "bkt").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .sortBy(_._1)
    val offsets = counts.groupBy(_._1._1).toSeq.flatMap { case (cls, rows) =>
      val sorted = rows.sortBy(_._1._2)
      sorted.zip(sorted.scanLeft(0L) { case (acc, (_, n)) => acc + n })
        .map { case (((c, bkt), _), prefix) => (c, bkt, prefix) }
    }
    val offsetDf = broadcast(offsets.toDF("cls", "bkt", "off"))
    val w = Window.partitionBy("cls", "bkt").orderBy("doc_id")
    val cap = call_function("div", lit(packTokens.toLong), col("cls"))
    toks.join(offsetDf, Seq("cls", "bkt"))
      .withColumn("idx",
        col("off") + row_number().over(w).cast("long") - 1L)
      .select(col("doc_id"), col("n_tok"), col("cls").as("len_class"),
        call_function("div", col("idx"), cap).as("pack_id"),
        pmod(col("idx"), cap).as("slot"))
  }

  def corpusPackBinsQ(spark: SparkSession, dir: String): DataFrame =
    corpusPackBins(Tables.documents(spark, dir))

  /** Within-doc repetition metrics (Gopher-style quality signals): how
    * much of a document is itself repeated. High values flag boilerplate,
    * template spam and degenerate generations.
    *
    *  - `tok_rep`: 1 − distinct/total tokens
    *  - `max_tok_frac`: share of the single most frequent token
    *  - `dup_3gram_frac`: 1 − distinct/total word 3-grams
    *
    * Shape: one token explode + two-level aggregation and one shingle
    * explode + aggregation, all keyed by doc_id — codegen'd, map-side
    * combined, integer arithmetic into final double ratios. */
  def textRepetition(docs: DataFrame): DataFrame = {
    val tokRows = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tokFreq = tokRows.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val tokStats = tokFreq.groupBy("doc_id").agg(
      sum(col("c")).as("n_tok"),
      count(lit(1)).as("nd_tok"),
      max(col("c")).as("max_c"))
    // distinct 3-gram counting goes through the 8-byte hash — the expanded
    // (doc_id, shingle) distinct pass never shuffles the strings
    val shStats = Dedup.shingleRowsAll(docs)
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_3g"),
        count_distinct(xxhash64(col("sh"))).as("nd_3g"))
    tokStats.join(shStats, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        (lit(1.0) - col("nd_tok").cast("double") / col("n_tok")).as("tok_rep"),
        (col("max_c").cast("double") / col("n_tok")).as("max_tok_frac"),
        coalesce(lit(1.0) - col("nd_3g").cast("double") / col("n_3g"), lit(0.0))
          .as("dup_3gram_frac"))
  }

  /** Corpus mixture report: per-(lang, source) document, token and
    * character totals plus corpus shares — the dashboard every training
    * mixture is steered by (what fraction of the corpus is English web
    * text, how many tokens does each source contribute). One hash
    * aggregation with map-side combine over a 3-column scan; the group
    * count is bounded by |langs| × |sources|, so the shuffle is
    * dimension-sized at any corpus size. Shares divide exact integer
    * totals — engine-stable. */
  def corpusMixReport(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = docs.select(col("lang"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
    // corpus totals via an unpartitioned window — g is dimension-sized
    // (|langs| × |sources| rows), so the single-partition pass is free
    // and the corpus itself is scanned exactly once
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
      col("n_chars"),
      (col("n_docs").cast("double") / sum(col("n_docs")).over(w)).as("doc_share"),
      (col("n_tokens").cast("double") / sum(col("n_tokens")).over(w)).as("token_share"))
  }

  /** Corpus-wide top-k word n-grams — the vocabulary/boilerplate report
    * (an n-gram suddenly dominating a crawl usually IS the boilerplate).
    *
    * The count aggregates over the shingle STRING, which is safe here
    * precisely because of map-side partial aggregation: each task
    * pre-reduces to its distinct shingles, so the shuffle carries
    * (shingle, partial count), not the corpus. The top-k cutoff is a
    * TakeOrdered (per-partition heaps, no global sort) with a
    * deterministic (count desc, shingle asc) order. */
  def textNgramTopK(docs: DataFrame, n: Int = 3, k: Int = 100): DataFrame =
    Dedup.shingleRowsAll(docs, n)
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("sh").asc)
      .limit(k)

  /** Zipf rank–frequency fit (r12): least-squares slope of
    * ln(frequency) against ln(rank) over the corpus's top-`topR`
    * terms, with intercept and r² — the one-row law-of-language audit
    * (Zipf 1949: natural text slopes ≈ −1). A corpus that bends off
    * the line is telling you something upstream ops act on: slope
    * shallower than −1 ⇒ boilerplate/templating inflating the mid
    * ranks (the [[textNgramTopK]] signal in scalar form), steeper ⇒
    * vocabulary collapse (OCR noise, language mixing); r² is the
    * goodness-of-law. Complements [[vocabGrowth]] (Heaps = types vs
    * corpus size; Zipf = frequency vs rank — the two dual exponents).
    *
    * Scale shape: ONE map-side-combined term count collapses the
    * corpus to the Heaps-bounded vocab frame; the top-R cut is a
    * TakeOrdered under the total (freq DESC, term ASC) order; rank
    * assignment and the five regression sums run over the R-row
    * frame, output is ONE row. Determinism: ranks/counts are exact
    * integers; ln of exact integers is correctly rounded on both
    * engines; the closed-form slope/intercept/r² derive from the five
    * sums through one shared IEEE expression tree, rounded 4dp. */
  def textZipf(docs: DataFrame, topR: Int = 500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("w").asc)
      .limit(topR)
    val pts = tf
      .withColumn("r", row_number().over(
        Window.orderBy(col("tf").desc, col("w").asc)))
      .select(log(col("r").cast("double")).as("x"),
        log(col("tf").cast("double")).as("y"))
    val s = pts.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    s.select(col("n").cast("long").as("n_terms"),
      round(slope, 4).as("slope"),
      round((col("sy") - slope * col("sx")) / col("n"), 4).as("intercept"),
      round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
        ((col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy"))), 4).as("r2"))
  }

  def textZipfQ(spark: SparkSession, dir: String): DataFrame =
    textZipf(Tables.documents(spark, dir))

  /** Term burstiness (r12): Church & Gale's variance-to-mean ratio of
    * per-document term counts over the whole corpus (zeros included),
    * for the top-`topK` terms by total frequency. Under a Poisson
    * null a term spreads evenly and b ≈ 1 (function words); content
    * words BURST — they recur within the documents that mention them
    * — so b ≫ 1. The scalar the quality stack reads it with:
    * boilerplate n-grams score bursty AND high-df (templating), while
    * a supposedly-common word with b ≈ 1 everywhere is a tokenizer
    * artifact. Complements [[textTfidf]] (df weights), [[textZipf]]
    * (corpus-rank law) and [[textCollocations]] (PMI pairs).
    *
    * The zeros trick: Var/Mean over ALL N docs needs no dense
    * (doc × term) frame — zero cells contribute nothing to Σx or Σx²,
    * so b = Σx²/Σx − Σx/N from the SPARSE counts alone. Scale shape:
    * one (doc_id, term) map-side-combined count (the shuffle carries
    * distinct-per-doc terms, not token occurrences), ONE rollup to
    * the Heaps-bounded vocab frame carrying exact integer sums, a
    * 1-row doc-count broadcast, TakeOrdered top-K; b is one shared
    * IEEE tree over exact integers, 4dp. */
  def textBurstiness(docs: DataFrame, topK: Int = 100): DataFrame = {
    val cells = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("x"))
    val n = broadcast(docs.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs")))
    cells.groupBy(col("w").as("term"))
      .agg(sum(col("x")).as("total_tf"),
        count(lit(1)).as("doc_freq"),
        sum(col("x") * col("x")).as("sx2"))
      .crossJoin(n)
      .select(col("term"), col("total_tf"), col("doc_freq"),
        round(col("sx2").cast("double") / col("total_tf") -
          col("total_tf").cast("double") / col("n_docs"), 4)
          .as("burstiness"))
      .orderBy(col("total_tf").desc, col("term").asc)
      .limit(topK)
  }

  def textBurstinessQ(spark: SparkSession, dir: String): DataFrame =
    textBurstiness(Tables.documents(spark, dir))

  /** First-iteration BPE merge-pair statistics: corpus-wide counts of
    * adjacent character pairs WITHIN words, ranked — the pair-counting
    * step a tokenizer-training run executes over the whole corpus before
    * its first merge (Sennrich et al. 2016). Pairs are intra-word only
    * (the classic word-boundary-respecting formulation).
    *
    * Scale shape — the decisive trick is that pairs explode from the
    * VOCABULARY, not the corpus: one map-side-combined hash agg reduces
    * the corpus to (word, freq) — vocab-sized, millions of rows at
    * 100 TB — and the quadratic-ish pair generation then runs over that
    * small frame with each pair weighted by its word's frequency.
    * Exploding pairs per token OCCURRENCE would shuffle ~|corpus tokens|
    * rows; this shuffles |vocab| + |pair vocab|. Top-k is a TakeOrdered
    * (per-partition heaps) with the deterministic (count desc, pair asc)
    * order, like [[textNgramTopK]]. */
  def corpusBpePairs(docs: DataFrame, k: Int = 100): DataFrame = {
    val vocab = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair").asc)
      .limit(k)
  }

  def corpusBpePairsQ(spark: SparkSession, dir: String): DataFrame =
    corpusBpePairs(Tables.documents(spark, dir))

  /** Full BPE merge TRAINING (Sennrich et al. 2016): `iters` greedy
    * merges, returning the ordered merge table (merge_rank, left,
    * right, n_occurrences) — the artifact a tokenizer ships. Extends
    * [[corpusBpePairs]] (= this loop's first iteration) to the whole
    * training run. Deterministic: ties on pair count break
    * lexicographically on (left, right); merges apply left-to-right
    * non-overlapping, the reference greedy semantics.
    *
    * Scale shape — the same split real trainers use on web-scale
    * corpora: the CORPUS-sized work is one map-side-combined word
    * count (the only stage that touches the data), reduced to a
    * (word, freq) vocabulary that is sublinear in corpus size (Heaps'
    * law) and capped at `maxVocab` by (freq desc, word asc) for a
    * BOUNDED driver collect. The merge loop then runs driver-side over
    * that table — iters × Σ|word| symbol scans, independent of corpus
    * size — exactly as SentencePiece/HF tokenizers train from
    * pre-aggregated word counts. A distributed merge loop would pay
    * iters round-trips over a vocab-sized frame for work a single core
    * finishes in milliseconds.
    *
    * Symbols are Java chars (the corpus is ASCII-tokenized by
    * [[tokens]]); words shorter than 2 symbols never produce pairs and
    * drop out naturally. Stops early when no pair occurs ≥ 2 times. */
  def bpeTrain(docs: DataFrame, iters: Int = 20,
               maxVocab: Int = 50000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] =
      docs.select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("w").asc)
        .limit(maxVocab)
        .as[(String, Long)].collect()
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var it = 0
    var done = false
    while (it < iters && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        if (c < 2) done = true
        else {
          merges += ((it + 1, l, r, c))
          val m = l + r
          words = words.map { case (syms, f) =>
            if (syms.length < 2) (syms, f)
            else {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                  out += m; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.toArray, f)
            }
          }
          it += 1
        }
      }
    }
    merges.toSeq.toDF("merge_rank", "left", "right", "n_occurrences")
  }

  def bpeTrainQ(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(Tables.documents(spark, dir))

  // --- SparkEntry wiring ---
  def textTokensQ(spark: SparkSession, dir: String): DataFrame =
    textTokens(Tables.documents(spark, dir))
  def textQualityQ(spark: SparkSession, dir: String): DataFrame =
    textQuality(Tables.documents(spark, dir))
  /** The synthetic docs average ~35 words and their vocabulary carries
    * only "the" from [[GopherStopwords]], so the paper's 50-word floor and
    * 2-stopword minimum would make the flag constant; 8 words / 1 stopword
    * keep every rule live and the flag varied at every SF. */
  def textGopherQ(spark: SparkSession, dir: String): DataFrame =
    textGopher(Tables.documents(spark, dir), minWords = 8, minStop = 1)
  def textLangidQ(spark: SparkSession, dir: String): DataFrame =
    textLangid(Tables.documents(spark, dir))
  def textLangConfusionQ(spark: SparkSession, dir: String): DataFrame =
    textLangConfusion(Tables.documents(spark, dir))
  def textFingerprintQ(spark: SparkSession, dir: String): DataFrame =
    textFingerprint(Tables.documents(spark, dir))
  def textScrubQ(spark: SparkSession, dir: String): DataFrame =
    textScrub(Tables.documents(spark, dir))
  def textHtmlStripQ(spark: SparkSession, dir: String): DataFrame =
    textHtmlStrip(Tables.documents(spark, dir))
  def corpusSampleQ(spark: SparkSession, dir: String): DataFrame =
    corpusSample(Tables.documents(spark, dir))
  def corpusPackQ(spark: SparkSession, dir: String): DataFrame =
    corpusPack(Tables.documents(spark, dir))
  def vocabCoverageQ(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.documents(spark, dir))
  def textRarityQ(spark: SparkSession, dir: String): DataFrame =
    textRarity(Tables.documents(spark, dir))
  def textPerplexityQ(spark: SparkSession, dir: String): DataFrame =
    textPerplexity(Tables.documents(spark, dir))
  def corpusSplitQ(spark: SparkSession, dir: String): DataFrame =
    corpusSplit(Tables.documents(spark, dir))
  def corpusMixReportQ(spark: SparkSession, dir: String): DataFrame =
    corpusMixReport(Tables.documents(spark, dir))
  def textNgramTopKQ(spark: SparkSession, dir: String): DataFrame =
    textNgramTopK(Tables.documents(spark, dir))
  def textRepetitionQ(spark: SparkSession, dir: String): DataFrame =
    textRepetition(Tables.documents(spark, dir))
  /** Benchmark set = docs with doc_id < 20 (stand-in eval set); training
    * corpus = the rest. */
  def textDecontaminateQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    decontaminate(docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20))
  }

  /** End-to-end corpus refinery — the composed daily pipeline of a
    * training-data run, as ONE declarative plan: PII scrub → quality gate
    * (token floor + composite score on the CLEAN text) → exact content
    * dedup keep-first → stratified consistent-hash sampling.
    *
    * Scale shape: scrub, quality and sampling are pure map-side
    * projections/filters fused into the scan by Catalyst; the only
    * shuffle in the whole pipeline is the dedup window keyed on the
    * content hash. Filters run BEFORE the shuffle (gated docs never
    * shuffle), and the hash, not the text, is the window key — the same
    * one-shuffle discipline as [[graft.llm.Dedup.dedupExact]]. Composing
    * the stages as separate jobs would scan the corpus four times; the
    * fused plan scans it once. */
  def corpusRefine(docs: DataFrame,
                   minTokens: Long = 8,
                   minQuality: Double = 0.25,
                   ratesPermille: Seq[(String, Int)] = SampleRatesPermille,
                   defaultPermille: Int = SampleDefaultPermille): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scrubbed = docs.select(col("doc_id"), col("lang"), col("source"),
      scrubPii(col("text")).as("ct"))
    val nc = length(col("ct")).cast("double")
    val nt = size(tokens(col("ct"))).cast("double")
    val np = size(regexp_extract_all(col("ct"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("double")
    val qs = least(nt / lit(64.0), lit(1.0)) * (lit(1.0) - np / nc)
    val gated = scrubbed
      .withColumn("n_tokens", nt.cast("bigint"))
      .withColumn("quality_score", qs)
      .filter(col("n_tokens") >= minTokens &&
        col("quality_score") >= minQuality)
    val keeper = min(col("doc_id"))
      .over(Window.partitionBy(md5(col("ct"))))
    gated
      .withColumn("keeper", keeper)
      .filter(col("doc_id") === col("keeper") &&
        sampleKeep(ratesPermille, defaultPermille))
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_tokens"), col("quality_score"))
  }

  def corpusRefineQ(spark: SparkSession, dir: String): DataFrame =
    corpusRefine(Tables.documents(spark, dir))

  /** [[corpusRefine]] with the LEARNED gate: the same scrub → gate →
    * exact-dedup-keep-first → stratified-sample composition, but the
    * quality decision is the trained classifier's σ(w·x̂+b) ≥ 0.5
    * ([[Classifier.scoreCol]] over the SCRUBBED text) instead of the
    * hand-set heuristic threshold — the production shape once a
    * pipeline graduates from rules to a learned filter.
    *
    * The gate stays a map-side projection (weights are plan
    * LITERALS), so the composition keeps corpusRefine's defining
    * property: exactly ONE exchange — the dedup window's content-hash
    * shuffle — with scrub, the seven metric trees, the sigmoid, and
    * the sampler all fused into the scan (plan-pinned, same spec shape
    * as corpusRefine). */
  def corpusRefineLearned(docs: DataFrame, m: Classifier.Model,
                          minTokens: Long = 8,
                          ratesPermille: Seq[(String, Int)] = SampleRatesPermille,
                          defaultPermille: Int = SampleDefaultPermille): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // scrubbed content takes over the `text` name so the classifier's
    // metric columns read the cleaned bytes, as corpusRefine's gate does
    val scrubbed = docs.select(col("doc_id"), col("lang"), col("source"),
      scrubPii(col("text")).as("text"))
    val gated = scrubbed
      .withColumn("n_tokens", size(tokens(col("text"))).cast("bigint"))
      .withColumn("quality_score", Classifier.scoreCol(m))
      .filter(col("n_tokens") >= minTokens && col("quality_score") >= 0.5)
    val keeper = min(col("doc_id"))
      .over(Window.partitionBy(md5(col("text"))))
    gated
      .withColumn("keeper", keeper)
      .filter(col("doc_id") === col("keeper") &&
        sampleKeep(ratesPermille, defaultPermille))
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_tokens"), col("quality_score"))
  }

  /** Driver query: train on the raw corpus (once per JVM — the model is
    * a deterministic function of the immutable dir,
    * [[Classifier.sessionModel]]), refine under the learned gate. */
  def corpusRefineLearnedQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    corpusRefineLearned(docs, Classifier.sessionModel(spark, dir))
  }

  /** Mixture rebalancing: downsample every language stratum toward the
    * SMALLEST one — keep rate `min(1000, (1000·min_n) div n_lang)` ‰ —
    * the "flatten the mixture" resampling step of multilingual training
    * runs ([[corpusSample]]'s fixed-rate sampler with rates DERIVED from
    * corpus statistics instead of configured).
    *
    * All arithmetic is integer (counts, integer division, the Knuth
    * bucket hash), so engine and oracle agree bit-for-bit — no float
    * rate ever decides a boundary doc.
    *
    * Scale shape: one hash agg to a #languages-sized frame, its 1-row
    * min cross-joined back (broadcast), then the keep filter runs
    * MAP-SIDE on the corpus scan via a broadcast join — the corpus
    * itself never shuffles, same discipline as [[corpusSample]]. */
  def corpusRebalance(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val mn = counts.agg(min(col("n")).as("mn"))
    val rates = counts.crossJoin(broadcast(mn))
      .select(col("lang"),
        least(lit(1000L), expr("(1000 * mn) div n")).as("permille"))
    docs.join(broadcast(rates), "lang")
      .filter(sampleBucket < col("permille"))
      .select(col("doc_id"), col("lang"), col("source"))
  }

  def corpusRebalanceQ(spark: SparkSession, dir: String): DataFrame =
    corpusRebalance(Tables.documents(spark, dir))

  /** Per-document DEFLATE compressibility — the byte-level redundancy
    * signal web-scale pipelines use alongside the character/token
    * screens: [[textEntropy]] sees the unigram byte distribution and
    * [[textRepetition]] sees n-gram repeats, but only a real
    * compressor sees LONG-RANGE redundancy (a page of boilerplate
    * repeated every 2 KB compresses to nothing and fools both).
    * `ratio` = compressed/raw bytes; `high_redundancy` flags docs
    * under `flagBelow` — machine-generated filler, log spew, template
    * spam. Empty docs pin ratio 1.0, unflagged.
    *
    * DEFLATE level 6, raw (nowrap) streams: a pure function of the
    * bytes, evaluated inside one `mapPartitions` batch boundary (the
    * media-codec convention — compression is a codec, and a per-row
    * Catalyst expression would re-allocate the 256 KB deflater state
    * per value). Zero shuffle; output is 4 scalars per doc. */
  def textCompressibility(docs: DataFrame,
                          flagBelow: Double = 0.4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6, true)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, t) =>
          val raw = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          if (raw.isEmpty) (id, 0, 0, 1.0)
          else {
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var n = 0
            while (!deflater.finished()) n += deflater.deflate(buf)
            val ratio = math.rint(n.toDouble / raw.length * 1e4) / 1e4
            (id, raw.length, n, ratio)
          }
        }
      }
      .toDF("doc_id", "n_bytes", "n_compressed", "ratio")
      .withColumn("high_redundancy",
        col("n_bytes") > 0 && col("ratio") < flagBelow)
  }

  def textCompressibilityQ(spark: SparkSession, dir: String): DataFrame =
    textCompressibility(Tables.documents(spark, dir))

  /** Unicode hygiene audit per document — the encoding-corruption
    * screen text filters built on visible characters cannot see:
    *  - U+FFFD replacement chars: the mojibake signature of a bad
    *    transcode somewhere upstream — the DOC isn't bad, the
    *    EXTRACTION is; route to re-fetch, not to the filter;
    *  - zero-width characters (ZWSP/ZWNJ/ZWJ/word-joiner/BOM): the
    *    invisible-payload & text-watermark vector, and a tokenizer
    *    saboteur (identical-looking strings, different tokens);
    *  - C0/C1 control characters (tab/newline/CR excluded): binary
    *    junk masquerading as text.
    * `is_clean` gates on all three. Pure map-side projection fused
    * into the scan, zero shuffle; patterns use `\x{...}` escapes,
    * which Java regex and RE2 read identically — no raw control bytes
    * ride the plan or the oracle SQL. */
  def textUnicodeAudit(docs: DataFrame): DataFrame = {
    def cnt(pat: String) =
      size(regexp_extract_all(col("text"), lit(pat), lit(0)))
    val repl = cnt(ReplacementPattern)
    val zw = cnt(ZeroWidthPattern)
    val ctl = cnt(ControlPattern)
    docs.select(col("doc_id"),
      repl.as("n_replacement"), zw.as("n_zero_width"), ctl.as("n_control"),
      (repl + zw + ctl === 0).as("is_clean"))
  }

  /** Script-mix profile per document: counts of Latin / CJK / Cyrillic /
    * Arabic letters, the dominant script's share of all letters, and a
    * `mixed_script` flag when no script reaches `domThresh` of the
    * letter mass — the homoglyph-spoofing and code-switching screen
    * that complements [[textLangid]] (which assumes ONE script family)
    * and [[textLangConfusion]] (which audits the LABEL, not the
    * bytes). A "Latin" doc with a Cyrillic 'о' planted in URLs is
    * invisible to word-level language ID and flagrant here.
    *
    * Pure map-side regex counts fused into the scan ([[textUnicodeAudit]]'s
    * contract — `\x{...}` ranges read identically by Java regex and
    * RE2); share is an exact-int ratio rounded 4dp; all-zero docs
    * (no letters at all) land share 0.0 and flag true. */
  def textScriptProfile(docs: DataFrame,
                        domThresh: Double = 0.9): DataFrame = {
    def cnt(pat: String) =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    val lat = cnt(LatinPattern)
    val cjk = cnt(CjkPattern)
    val cyr = cnt(CyrillicPattern)
    val ara = cnt(ArabicPattern)
    val tot = col("n_latin") + col("n_cjk") + col("n_cyrillic") + col("n_arabic")
    val dom = greatest(col("n_latin"), col("n_cjk"), col("n_cyrillic"),
      col("n_arabic"))
    docs.select(col("doc_id"), lat.as("n_latin"), cjk.as("n_cjk"),
        cyr.as("n_cyrillic"), ara.as("n_arabic"))
      .withColumn("dom_share",
        when(tot === 0, 0.0)
          .otherwise(round(dom.cast("double") / tot, 4)))
      .withColumn("mixed_script", col("dom_share") < domThresh)
  }

  // Latin-1 letter ranges exclude U+00D7 (×) and U+00F7 (÷)
  val LatinPattern =
    "[A-Za-z\\x{C0}-\\x{D6}\\x{D8}-\\x{F6}\\x{F8}-\\x{FF}\\x{100}-\\x{17F}]"
  val CjkPattern = "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]"
  val CyrillicPattern = "[\\x{400}-\\x{4FF}]"
  val ArabicPattern = "[\\x{600}-\\x{6FF}]"

  def textScriptProfileQ(spark: SparkSession, dir: String): DataFrame =
    textScriptProfile(Tables.documents(spark, dir))

  val ReplacementPattern = "\\x{FFFD}"
  val ZeroWidthPattern = "[\\x{200B}-\\x{200D}\\x{2060}\\x{FEFF}]"
  val ControlPattern =
    "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}-\\x{9F}]"

  def textUnicodeAuditQ(spark: SparkSession, dir: String): DataFrame =
    textUnicodeAudit(Tables.documents(spark, dir))

  /** One-row corpus health report — the headline numbers a pipeline
    * team reads before anything else: corpus size, exact distinct
    * content count and the implied duplicate ratio, language/source
    * diversity, token volume, and the Gopher pass rate. Each is a
    * drill-down into an existing operator ([[graft.llm.Dedup
    * .dedupExact]], [[corpusMixReport]], [[textGopher]]); this is the
    * one-call summary that decides WHICH drill-down to run.
    *
    * ONE scan, ONE aggregation to a single row: content hash, token
    * count and the gopher gate are all map-side projections feeding
    * count / count-distinct / sum aggregates (the distinct lands as a
    * partial-aggregated expand, never a second scan). At 100 TB the
    * exact distinct is the one expensive term — swap in
    * `approx_count_distinct` when ±2% serves; exact here because the
    * oracle replays it. */
  def corpusReport(docs: DataFrame,
                   minWords: Long = 8, minStop: Int = 1): DataFrame = {
    val toks = size(tokens(col("text"))).cast("long")
    docs
      .select(md5(col("text")).as("h"), col("lang"), col("source"),
        toks.as("n_toks"),
        when(gopherPassCol(minWords, 100000, minStop), 1L).otherwise(0L)
          .as("pass"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct_texts"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("pass")).as("n_gopher_pass"))
      .select(col("n_docs"), col("n_distinct_texts"),
        round(lit(1.0) - col("n_distinct_texts").cast("double") /
          col("n_docs"), 4).as("dup_ratio"),
        col("n_langs"), col("n_sources"), col("total_tokens"),
        round(col("total_tokens").cast("double") / col("n_docs"), 4)
          .as("mean_tokens"),
        round(col("n_gopher_pass").cast("double") / col("n_docs"), 4)
          .as("gopher_pass_rate"))
  }

  def corpusReportQ(spark: SparkSession, dir: String): DataFrame =
    corpusReport(Tables.documents(spark, dir))

  /** Multiplier for [[corpusSampleFixed]]'s ranking key (xxhash
    * PRIME32_4) — fourth member of the decorrelated-multiplier family:
    * the fixed sample must not preferentially pick the rate-sampler's
    * keep range, the split's low buckets, or the temperature
    * fractional-copy winners. */
  val FixedMultiplier = 668265263L

  /** The million-range ranking key behind [[corpusSampleFixed]] —
    * [[sampleBucket]]'s arithmetic under [[FixedMultiplier]] at 10⁶
    * granularity (a permille key would tie ~N/1000 docs per value and
    * push selection onto the doc_id tiebreak). */
  def fixedSampleKey: Column = pmod(
    shiftright(pmod(col("doc_id"), lit(SampleIdPrime)) * FixedMultiplier,
      SampleShift),
    lit(1000000L))

  /** Deterministic FIXED-SIZE sample: the `k` docs with the smallest
    * (consistent-hash key, doc_id) — exactly k rows where
    * [[corpusSample]] gives rate·N, replayable forever, and
    * append-STABLE in the bottom-k/KMV sense: adding docs can only
    * REPLACE members (a new doc hashing lower), never reshuffle the
    * rest — so an eval subset drawn this way stays comparable across
    * corpus refreshes, the property a `LIMIT k` over arbitrary layout
    * or a rate sample at shifting N both lack.
    *
    * Scale shape: the order-by-limit plans as TakeOrderedAndProject —
    * each partition keeps its local bottom-k (O(k) memory), the driver
    * merges P·k rows — no global sort, no full shuffle, the same
    * bound [[graft.operators.GroupTopK]] relies on. */
  def corpusSampleFixed(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
        fixedSampleKey.as("sample_key"))
      .orderBy(col("sample_key"), col("doc_id"))
      .limit(k)

  def corpusSampleFixedQ(spark: SparkSession, dir: String): DataFrame =
    corpusSampleFixed(Tables.documents(spark, dir))

  /** Multiplier for the WEIGHTED sampler's uniform — must differ from
    * [[SampleMultiplier]]/[[FixedMultiplier]]/[[TempMultiplier]] so
    * the weighted draw decorrelates from every other sampler's kept
    * set. Another well-mixed odd public constant (xxhash PRIME32_2). */
  val WeightedMultiplier = 2246822519L

  /** Deterministic WEIGHTED sample: priority sampling
    * (Duffield–Lund–Thorup, JACM 2007) with q_i = w_i / u_i and the
    * top-k cut — inclusion odds scale with the weight (here n_chars:
    * a length-proportional draw, the right null model for "sample
    * k docs' worth of TEXT", where the unweighted samplers answer
    * "k docs"). The uniform is the doc's consistent-hash key at 10⁻⁶
    * granularity and the priority is the INTEGER
    * floor(w·10¹² / (u+1)) — ordering is integer-exact end to end (no
    * libm call anywhere near the cut, the determinism rule every
    * selected-row op here follows), replayable forever, append-stable
    * in the bottom-k sense. Bound: w·10¹² must fit int64 — fine to
    * ~9·10⁶-char docs; chunk longer docs upstream ([[corpusChunk]]).
    *
    * Scale shape: TakeOrderedAndProject (per-partition top-k, driver
    * merges P·k rows) — no global sort, no shuffle. */
  def corpusWeightedSample(docs: DataFrame, k: Int = 100): DataFrame = {
    val uInt = pmod(
      shiftright(pmod(col("doc_id"), lit(SampleIdPrime)) * WeightedMultiplier,
        SampleShift),
      lit(1000000L))
    docs.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        uInt.as("u1"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        expr("n_chars * 1000000000000 div (u1 + 1)").as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
  }

  def corpusWeightedSampleQ(spark: SparkSession, dir: String): DataFrame =
    corpusWeightedSample(Tables.documents(spark, dir))

  /** Stratified weighted sample: the top-k PRIORITIES of EVERY
    * language — [[corpusWeightedSample]]'s draw balanced across
    * strata the way [[corpusSampleStratified]] balances the
    * unweighted one ("k docs' worth of text per language, same ones
    * every run"). Same integer priorities, same append-stability per
    * stratum.
    *
    * Scale shape: [[graft.operators.GroupTopK]] over the priority
    * order — Spark 4's WindowGroupLimit keeps a map-side partial
    * top-k per stratum. */
  def corpusWeightedSampleStratified(docs: DataFrame, k: Int = 20)
      : DataFrame = {
    val uInt = pmod(
      shiftright(pmod(col("doc_id"), lit(SampleIdPrime)) * WeightedMultiplier,
        SampleShift),
      lit(1000000L))
    graft.operators.GroupTopK.topK(
      docs.select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), uInt.as("u1"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          expr("n_chars * 1000000000000 div (u1 + 1)").as("priority")),
      Seq("lang"), Seq(col("priority").desc, col("doc_id").asc), k)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("priority"))
  }

  def corpusWeightedSampleStratifiedQ(spark: SparkSession,
                                      dir: String): DataFrame =
    corpusWeightedSampleStratified(Tables.documents(spark, dir))

  /** Deterministic STRATIFIED fixed-size sample: the `k` smallest
    * (consistent-hash key, doc_id) docs of EVERY language — the
    * balanced eval-set draw ("50 docs per language, same ones every
    * run") that [[corpusSampleFixed]]'s global bottom-k can't give
    * (it mirrors the corpus mix, so rare languages get ~0 rows).
    * Same append-stability per stratum: growth within a language only
    * replaces that language's members.
    *
    * Scale shape: [[graft.operators.GroupTopK]] over the hash order —
    * Spark 4's WindowGroupLimit keeps a map-side partial bottom-k per
    * partition BEFORE the exchange, so the shuffle carries ≤ P·k rows
    * per stratum, never the corpus (plan-guarded inside GroupTopK's
    * own spec). */
  def corpusSampleStratified(docs: DataFrame, k: Int = 50): DataFrame =
    graft.operators.GroupTopK.topK(
      docs.select(col("doc_id"), col("lang"), col("source"),
        fixedSampleKey.as("sample_key")),
      Seq("lang"), Seq(col("sample_key").asc, col("doc_id").asc), k)
      .select(col("doc_id"), col("lang"), col("source"), col("sample_key"))

  def corpusSampleStratifiedQ(spark: SparkSession, dir: String): DataFrame =
    corpusSampleStratified(Tables.documents(spark, dir))

  /** Multiplier for [[tempBucket]] — must differ from
    * [[SampleMultiplier]] AND [[SplitMultiplier]] so temperature
    * replication decorrelates from both the sampler's kept set and the
    * split assignment (a doc's extra copies must not preferentially
    * land in, say, the sampler's keep range). Another well-mixed odd
    * public constant (xxhash PRIME32_3). */
  val TempMultiplier = 3266489917L

  /** The basis-point bucket behind [[corpusTemperatureSample]] —
    * [[sampleBucket]]'s arithmetic at 10⁴ granularity under the
    * decorrelated [[TempMultiplier]] (fractional replication rates are
    * basis points, so permille would quantize them 10× coarser). */
  def tempBucket: Column = pmod(
    shiftright(pmod(col("doc_id"), lit(SampleIdPrime)) * TempMultiplier,
      SampleShift),
    lit(10000L))

  /** Temperature-based mixture UPSAMPLING (the mT5/UNIMAX move,
    * Xue et al. 2021 / Chung et al. 2023): every language stratum is
    * replicated toward the largest at rate √(n_max/n_l) — temperature
    * α = 0.5 on the mixture exponent — capped at `epochCap` copies
    * (UNIMAX's repetition budget: past a few epochs, repeating
    * low-resource data stops helping and starts memorizing). The
    * complement of [[corpusRebalance]], which DOWNsamples toward the
    * smallest stratum; here the largest keeps exactly one copy and
    * low-resource languages gain whole copies plus a deterministic
    * fractional remainder. Output is one row per (doc, copy) — the
    * replicated training stream with `copy` disambiguating epochs.
    *
    * Determinism/engine-portability: the rate is derived from two
    * integer counts via one IEEE division and one `sqrt` (both
    * correctly-rounded, so both engines compute the identical double),
    * scaled to integer BASIS POINTS before any comparison; whole
    * copies = rate_bp div 10⁴, the remainder keeps a copy iff the
    * doc's [[tempBucket]] < rate_bp mod 10⁴. No order-dependent float
    * summation anywhere.
    *
    * Scale shape: per-lang counts are ONE map-side-combined agg to a
    * \|langs\| frame; n_max rides back as a 1-row broadcast; the rate
    * table broadcast-joins onto the corpus and the replication is a
    * map-side `explode(sequence(...))` fused into the scan — the
    * corpus never shuffles, and output size is Σ n_l·rate_l (the
    * training-mix contract), bounded by epochCap·N. */
  def corpusTemperatureSample(docs: DataFrame, epochCap: Int = 3): DataFrame = {
    val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val nMax = broadcast(perLang.agg(max(col("n_l")).as("n_max")))
    val rates = perLang.crossJoin(nMax).select(
      col("lang"),
      least(
        round(lit(10000.0) *
          sqrt(col("n_max").cast("double") / col("n_l").cast("double")), 0),
        lit(epochCap * 10000.0)).cast("long").as("rate_bp"))
    docs.join(broadcast(rates), "lang")
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0L),
          expr("rate_bp div 10000") - lit(1L) +
            when(tempBucket < col("rate_bp") % 10000L, 1L).otherwise(0L)))
          .as("copy"))
  }

  def corpusTemperatureSampleQ(spark: SparkSession, dir: String): DataFrame =
    corpusTemperatureSample(Tables.documents(spark, dir))

  /** Corpus snapshot diff: content-level changes between two versions of
    * a keyed corpus — `added` (key only in new), `removed` (key only in
    * old), `changed` (key in both, content hash differs). The audit every
    * dataset release pipeline runs before publishing a refresh.
    *
    * Scale shape: both sides reduce map-side to (key, md5) — 40 bytes/doc
    * on the shuffle wire regardless of doc size — then ONE co-partitioned
    * full-outer join on the key. Unchanged rows (the overwhelming
    * majority of a daily refresh) are filtered immediately after the
    * join, so nothing downstream sees them. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    oldDocs.select(col("doc_id"), md5(col("text")).as("h_old"))
      .join(newDocs.select(col("doc_id"), md5(col("text")).as("h_new")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")

  /** The dataset-refresh RELEASE NOTES: [[corpusDiff]]'s per-doc rows
    * rolled to (status, lang) — doc and token deltas per language,
    * tokens counted on the side that defines the change (added/changed
    * → the NEW text, removed → the OLD) — the summary a dataset
    * publisher ships with a refresh and the first thing a consumer
    * reads ("did my language lose mass?"). Unchanged docs contribute
    * nothing, so the report is churn-sized.
    *
    * One co-partitioned full-outer id join (the corpusDiff shape with
    * lang + token counts riding the 40-byte side rows), ONE
    * map-side-combined rollup. Exact integers only. */
  def corpusDiffReport(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def side(df: DataFrame, sfx: String) = df.select(
      col("doc_id"), md5(col("text")).as(s"h_$sfx"),
      col("lang").as(s"lang_$sfx"),
      size(tokens(col("text"))).cast("long").as(s"t_$sfx"))
    side(oldDocs, "old")
      .join(side(newDocs, "new"), Seq("doc_id"), "full_outer")
      .select(
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("lang_new"), col("lang_old")).as("lang"),
        when(col("h_old").isNull || col("h_old") =!= col("h_new"),
          col("t_new")).otherwise(col("t_old")).as("n_toks"))
      .filter(col("status") =!= "unchanged")
      .groupBy(col("status"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
  }

  /** Driver entry: the corpusDiffQ synthetic "next release", rolled up. */
  def corpusDiffReportQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "lang")
    val next = docs
      .filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 1000000))
    corpusDiffReport(docs, next)
  }

  /** Driver query: a synthetic "next release" derived deterministically
    * from `documents` — every 7th doc dropped, every 5th doc's text
    * edited, 10 re-keyed copies appended — diffed against the original. */
  def corpusDiffQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val next = docs
      .filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 1000000))
    corpusDiff(docs, next)
  }

  /** Sliding-window chunking: each doc split into `chunkWords`-word
    * windows every `stride` words (overlap = chunkWords − stride) — the
    * retrieval/context-window prep step (RAG indexing, long-doc
    * training splits) that turns a document table into a chunk table.
    * Output (doc_id, chunk_id, n_words, chunk_text); chunk_id counts
    * windows within the doc, the final window may be shorter, and every
    * doc yields at least one chunk (short docs = one window of
    * themselves).
    *
    * Scale shape: pure per-row generate — split once, one `sequence`
    * explode of ⌈words/stride⌉ start offsets, `slice` + `array_join`
    * per start — fused into the scan, no shuffle, no UDF; output rows
    * ~(1 + overlap/stride)× input words, the unavoidable cost of
    * overlapped windows. */
  def corpusChunk(docs: DataFrame, chunkWords: Int = 32,
                  stride: Int = 24): DataFrame = {
    require(chunkWords > 0 && stride > 0, "chunkWords and stride must be > 0")
    docs.select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"), explode(
        sequence(lit(0), greatest(size(col("ws")) - 1, lit(0)),
          lit(stride))).as("st"))
      .select(col("doc_id"),
        expr(s"st div $stride").cast("int").as("chunk_id"),
        size(slice(col("ws"), col("st") + 1, lit(chunkWords))).as("n_words"),
        array_join(slice(col("ws"), col("st") + 1, lit(chunkWords)), " ")
          .as("chunk_text"))
  }

  def corpusChunkQ(spark: SparkSession, dir: String): DataFrame =
    corpusChunk(Tables.documents(spark, dir))

  /** Apply a TRAINED BPE merge table to the corpus: per-doc whitespace
    * word count and encoded-token count under the learned vocabulary —
    * the "how many tokens is my corpus, under MY tokenizer" question
    * every training-data budget starts from (whitespace counts are off
    * 1.3-2× from any real subword vocab). Completes the tokenizer
    * story: [[bpeTrain]] produces the merge table, this consumes it.
    *
    * Scale shape — the memoized split real tokenizer pipelines use:
    * the corpus-sized stages are all codegen'd built-ins (tokenize +
    * one map-side-combined groupBy to (doc_id, word, n)); the actual
    * merge-loop segmentation ([[graft.functions.BpeApply]], eval-only
    * by design) runs once per DISTINCT word — Heaps-law sublinear, the
    * same memoization HF's fast tokenizers keep in their word cache —
    * and joins back by word (vocab side is the small one;
    * AQE/autoBroadcast picks the broadcast at any realistic vocab
    * size). Zipf makes the savings real: the top 100 words alone are
    * typically ~half the corpus' word occurrences.
    *
    * `merges` is bounded by [[bpeTrain]]'s `iters` (its driver-side
    * collect is capped by construction), so plan-literal transport is
    * KBs. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val docWords = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
    val vocab = docWords.select(col("w")).distinct()
      .withColumn("n_sym",
        size(graft.functions.BpeFunctions.bpeApply(col("w"), merges))
          .cast("long"))
    docWords.join(vocab, "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("n_sym")).as("n_bpe_tokens"))
  }

  /** Driver query: train 20 merges on the corpus ([[bpeTrain]]'s exact
    * driver-side loop), then encode the same corpus under them — the
    * full train→apply tokenizer round trip in one plan. */
  def bpeEncodeQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val merges = bpeTrain(docs).orderBy(col("merge_rank"))
      .select(col("left"), col("right"))
      .as[(String, String)].collect().toSeq
    bpeEncode(docs, merges)
  }

  /** Tokenizer FERTILITY report per language: mean BPE tokens per word
    * under a trained merge table — the standard multilingual tokenizer
    * health metric (a tokenizer trained on one language's data segments
    * other languages into near-character soup; fertility ≫ 1 on a
    * language means its docs cost that many times the compute per word
    * and the merge table needs rebalancing). Completes the
    * train → encode → EVALUATE tokenizer loop.
    *
    * One co-partitioned doc_id join of [[bpeEncode]]'s per-doc counts
    * onto the (doc_id, lang) projection, then a map-side-combined agg
    * to a |langs|-row frame. Fertility is the ratio of two exact
    * integer sums, rounded 4dp only at output. */
  def bpeFertility(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    bpeEncode(docs, merges)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
        round(sum(col("n_bpe_tokens")).cast("double") /
          sum(col("n_words")), 4).as("fertility"))

  def bpeFertilityQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val merges = bpeTrain(docs).orderBy(col("merge_rank"))
      .select(col("left"), col("right"))
      .as[(String, String)].collect().toSeq
    bpeFertility(docs, merges)
  }

  /** Per-doc top-k TF-IDF terms — the classic keyword/topic-signal
    * primitive (smooth idf: tf · (ln((N+1)/(df+1)) + 1), the
    * scikit-learn formula). Scores are ROUNDED to 4 decimals BEFORE
    * ranking (the [[textPerplexity]] float rule — ln is the one
    * non-integer ingredient and the two engines' ln may differ in the
    * last ulp), with the term as the total-order tiebreak, so the kept
    * row set is engine-stable.
    *
    * Scale shape: term counts reduce map-side to (doc, term, tf); the
    * df table is ONE more aggregation of that frame (vocab-sized,
    * Heaps-sublinear) joined back by term — AQE broadcasts it at any
    * realistic vocab size; N rides a 1-row broadcast crossJoin (the
    * scalar-subquery convention); the final per-doc top-k is
    * [[graft.operators.GroupTopK]], whose `WindowGroupLimit Partial`
    * bounds the rank exchange to k rows per doc per partition. The
    * (doc, term, tf) frame is persisted across its two consumers so
    * the corpus tokenization runs once. */
  def textTfidf(docs: DataFrame, k: Int = 5): DataFrame = {
    val t = tfidfTermCounts(docs).persist()
    val out = graft.Exec.materialize(tfidfRanked(t, docs, k))
    t.unpersist()
    out
  }

  /** The un-persisted/un-checkpointed [[textTfidf]] plan — what the spec
    * pins (`Exec.materialize` would hide the window under a checkpoint
    * scan). */
  private[graft] def textTfidfPlan(docs: DataFrame, k: Int = 5): DataFrame =
    tfidfRanked(tfidfTermCounts(docs), docs, k)

  private def tfidfTermCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  private def tfidfRanked(t: DataFrame, docs: DataFrame, k: Int): DataFrame = {
    val dfc = t.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = t.join(dfc, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * (log((col("n") + lit(1.0)) / (col("df") + lit(1.0)))
          + lit(1.0)), 4).as("tfidf"))
    // the GroupTopK shape inlined WITH the rank kept: row_number ≤ k
    // still triggers InferWindowGroupLimit's map-side partial bound
    // (plan-pinned in the spec), and the rank column is part of the
    // contract here
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  def textTfidfQ(spark: SparkSession, dir: String): DataFrame =
    textTfidf(Tables.documents(spark, dir))

  /** Top-k collocations: ordered token pairs co-occurring within
    * `window` positions, scored by a PMI-style association
    * ln(c_ab · N_tok / (c_a · c_b)) — the classic collocation /
    * distributional-statistics primitive (the word2vec-era
    * co-occurrence table, reduced to its high-signal head). `minCount`
    * suppresses the unstable low-frequency tail before scoring (PMI's
    * known pathology); scores round to 4 decimals BEFORE the global
    * (pmi desc, a, b) rank so the kept set is engine-stable.
    *
    * Scale shape: pair generation is a pure map-side nested-`transform`
    * generate fused into the scan (each position pairs with its next
    * ≤ window successors — output ~window·N_tok rows, no join, no
    * shuffle to BUILD pairs); then ONE map-side-combined pair count,
    * a vocab-sized unigram table joined back on both endpoints (AQE
    * broadcasts it), the 1-row token total as a broadcast crossJoin,
    * and a global TakeOrderedAndProject for the top k. */
  def textCollocations(docs: DataFrame, window: Int = 3,
                       minCount: Long = 5, k: Int = 100): DataFrame = {
    require(window >= 1 && k > 0, "window and k must be positive")
    val t = docs.select(tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val n = size(col("t"))
    val pairsArr = flatten(transform(sequence(lit(0), n - 2),
      i => transform(sequence(i + 1, least(i + lit(window), n - 1)),
        j => struct(element_at(col("t"), i + 1).as("a"),
          element_at(col("t"), j + 1).as("b")))))
    val pc = t.select(explode(pairsArr).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    // PERSISTED (r17, guide §1.2): the unigram table feeds both
    // marginal joins, and the token total is EXACTLY its count mass
    // (Σ c over the unigram groups ≡ count of exploded tokens — an
    // integer identity), so the corpus is tokenized twice (pairs +
    // unigrams) instead of four times. Vocabulary-bounded.
    val uni = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist()
    val nt = uni.agg(sum(col("c")).as("nt"))
    pc.join(uni.select(col("w").as("a"), col("c").as("ca")), "a")
      .join(uni.select(col("w").as("b"), col("c").as("cb")), "b")
      .crossJoin(broadcast(nt))
      .select(col("a"), col("b"), col("c_ab"),
        round(log(col("c_ab").cast("double") * col("nt") /
          (col("ca") * col("cb"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(k)
  }

  def textCollocationsQ(spark: SparkSession, dir: String): DataFrame =
    textCollocations(Tables.documents(spark, dir))

  /** Per-doc character-distribution Shannon entropy (nats) — the
    * randomness screen complementing [[textRepetition]] from the other
    * side: repeated-char/boilerplate garbage scores LOW (the
    * `is_low_entropy` flag), while base64/hex/encoded blobs pin near
    * the alphabet ceiling ln(|alphabet|), so both tails of the
    * distribution are review queues. Entropy is computed as
    * ln(T) − Σ n·ln(n)/T over per-char counts (the algebraic form that
    * needs only two aggregates), rounded to 4 decimals before the flag
    * (the [[textPerplexity]] float rule).
    *
    * Scale shape: one `[\s\S]` char explode → (doc, char) counts
    * (map-side combined — ≤ |alphabet| rows per doc per partition on
    * the wire) → one per-doc agg, also map-side combined. No joins, no
    * windows. Empty docs have no char rows and drop out on both
    * engines identically. */
  def textEntropy(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit("[\\s\\S]"), lit(0)))
          .as("c"))
      .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_chars"),
        sum(col("n") * log(col("n"))).as("nlogn"))
      .select(col("doc_id"), col("n_chars"),
        round(log(col("n_chars")) - col("nlogn") / col("n_chars"), 4)
          .as("entropy"))
      .withColumn("is_low_entropy", col("entropy") < 2.0)

  def textEntropyQ(spark: SparkSession, dir: String): DataFrame =
    textEntropy(Tables.documents(spark, dir))

  /** Flesch reading-ease + Flesch–Kincaid grade per document — the
    * classic readability screen (Flesch 1948; Kincaid 1975) used as a
    * quality feature alongside [[textQuality]]'s surface ratios: very
    * low ease flags legalese/run-on machine text, impossibly HIGH ease
    * on long docs flags token soup. Conventions (pinned in the spec and
    * mirrored verbatim in the oracle): words = whitespace tokens;
    * sentences = runs of `[.!?]+`, floor 1 (headlines count as one);
    * syllables = per-word maximal `[aeiouy]+` vowel groups on the
    * lower-cased token, floor 1 per word (vowel-less tokens — numbers,
    * "qqq" — still cost a beat). Both scores are the textbook linear
    * forms, computed in one fixed association order and rounded to 4
    * decimals ([[textPerplexity]] float rule); docs with zero words
    * drop out on both engines identically.
    *
    * Scale shape: pure map-side — the syllable sum is a higher-order
    * `aggregate` over the token array (no explode, no groupBy), so the
    * whole operator is one projection fused into the parquet scan with
    * only (doc_id, text) read. Zero shuffles at any corpus size. */
  def textReadability(docs: DataFrame): DataFrame = {
    val ws = tokens(col("text"))
    val syl = aggregate(ws, lit(0L), (acc, t) =>
      acc + greatest(lit(1L),
        size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))).cast("long")))
    val sent = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
        .cast("long"))
    docs.select(col("doc_id"), size(ws).cast("long").as("n_words"),
        sent.as("n_sentences"), syl.as("n_syllables"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        round(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")),
          4).as("flesch"),
        round(lit(0.39) * (col("n_words").cast("double") / col("n_sentences"))
          + lit(11.8) * (col("n_syllables").cast("double") / col("n_words"))
          - lit(15.59), 4).as("fk_grade"))
  }

  def textReadabilityQ(spark: SparkSession, dir: String): DataFrame =
    textReadability(Tables.documents(spark, dir))

  /** Per-doc lexical diversity (r12 sB): type-token ratio, hapax share
    * and Yule's K — the vocabulary-richness screen that catches what
    * [[textRepetition]]'s surface n-grams and [[textEntropy]]'s
    * character distribution both miss: a doc can be repetition-free
    * and char-diverse while cycling a 20-word vocabulary (K explodes —
    * template/spam tell), or suspiciously NEVER reuse a word (TTR ≈ 1
    * on a long doc — shuffled-dictionary synthetic text). Yule's
    * K = 10⁴·(Σc² − N)/N² over per-type counts is length-insensitive
    * where raw TTR is not, which is why both ship.
    *
    * Scale shape: one (doc, type) map-side-combined count (the
    * [[textBurstiness]] cells frame) then one per-doc rollup — every
    * statistic (N, V, hapax, Σc²) is an exact integer, the three
    * ratios one shared IEEE tree, 4dp. */
  def textLexicalDiversity(docs: DataFrame): DataFrame = {
    val cells = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    cells.groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("c") * col("c")).as("sc2"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") /
          col("n_tokens").cast("double"), 4).as("ttr"),
        round(col("n_hapax").cast("double") /
          col("n_types").cast("double"), 4).as("hapax_ratio"),
        round(lit(10000.0) *
          (col("sc2") - col("n_tokens")).cast("double") /
          (col("n_tokens").cast("double") *
            col("n_tokens").cast("double")), 4).as("yule_k"))
  }

  def textLexicalDiversityQ(spark: SparkSession, dir: String): DataFrame =
    textLexicalDiversity(Tables.documents(spark, dir))

  /** Corpus length histogram (r12 sB): docs and token mass per
    * (source, power-of-two token-length bucket) with each bucket's
    * corpus-wide token share — the shape report behind every packing
    * and curriculum decision ([[corpusPack]]'s bin efficiency and
    * [[corpusChunk]]'s truncation loss are both functions of WHERE the
    * mass sits: a corpus whose tokens live in 2^4-word snippets packs
    * badly and a source whose mass sits ≥2^12 needs chunking, and
    * neither shows in a mean length).
    *
    * Bucket = ⌊log₂ n⌋ computed as binary-digit count − 1 — EXACT
    * integer arithmetic on both engines, where floor(log2(·)) puts
    * n = 64 in bucket 5 whenever one libm rounds ln64/ln2 to
    * 5.999…97 (the float-boundary rule). Scale shape: token counts
    * are a map-side projection fused into the scan; ONE rollup to the
    * (source × ~20 buckets) frame; shares via a window over THAT
    * frame. */
  def corpusLengthProfile(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ntok = size(filter(tokens(col("text")),
      t => length(t) > 0)).cast("long")
    val bucket = when(ntok === 0L, lit(-1L))
      .otherwise((length(bin(ntok)) - 1).cast("long"))
    val cells = docs
      .select(col("source"), ntok.as("n"), bucket.as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    val tot = Window.partitionBy(lit(1))
    cells.select(col("source"), col("bucket"),
      when(col("bucket") >= 0, expr("shiftleft(1L, int(bucket))"))
        .otherwise(lit(0L)).as("bucket_lo"),
      col("n_docs"), col("n_tokens"),
      round(col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(tot).cast("double"), 4)
        .as("token_share"))
  }

  def corpusLengthProfileQ(spark: SparkSession, dir: String): DataFrame =
    corpusLengthProfile(Tables.documents(spark, dir))

  /** RAKE keyphrase extraction (Rose et al. 2010), corpus-level top-k
    * (r12 sB): candidate phrases are maximal runs of non-stopword
    * tokens; each word scores deg/freq (deg = Σ length of phrases
    * containing it — co-occurrence degree including itself; freq =
    * occurrences) and a phrase scores the sum over its words — long
    * technical collocations win over bare frequent words, which is
    * exactly what [[textNgramTopK]] (raw counts) can't do and
    * [[textCollocations]] only does for pairs. The corpus view ranks
    * DISTINCT phrase strings with their occurrence counts.
    *
    * Scale shape: phrase assembly is per-doc — a posexplode, a
    * running stopword-count window partitioned BY DOC (parallel over
    * the corpus, never a global sort), and a sort_array-of-structs
    * concat (deterministic word order without an ordered
    * collect_list). Word stats and phrase scores are token-scale
    * map-side-combined aggs; the per-phrase score join fans out ≤
    * phrase length. Integer deg/freq; the score sum is the one
    * distributed double fold (the textZipf float rule), 4dp; top-k
    * ties break on the phrase string. */
  def textKeywordRake(docs: DataFrame, k: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stop = Seq("a", "an", "the", "of", "to", "and", "in", "is",
      "it", "on", "for", "with", "as", "at", "by", "or", "be")
    val toks = docs
      .select(col("doc_id"), posexplode(tokens(col("text")))
        .as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .withColumn("is_stop", col("w").isin(stop: _*))
    val perDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val phrased = toks
      .withColumn("pid", sum(when(col("is_stop"), 1L).otherwise(0L))
        .over(perDoc))
      .filter(!col("is_stop"))
    val phrases = phrased.groupBy(col("doc_id"), col("pid"))
      .agg(sort_array(collect_list(struct(col("pos"), col("w"))))
        .as("ws"))
      .select(col("doc_id"),
        transform(col("ws"), x => x.getField("w")).as("ws"))
      .select(concat_ws(" ", col("ws")).as("phrase"),
        size(col("ws")).cast("long").as("n_words"))
    val wordStats = phrases
      .select(col("n_words"), explode(split(col("phrase"), " ")).as("w"))
      .groupBy(col("w"))
      .agg(sum(col("n_words")).as("deg"), count(lit(1)).as("freq"))
    val distinctPhrases = phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        first(col("n_words")).as("n_words"))
    distinctPhrases
      .select(col("phrase"), col("n_occurrences"), col("n_words"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wordStats, Seq("w"))
      .groupBy(col("phrase"))
      .agg(first(col("n_occurrences")).as("n_occurrences"),
        first(col("n_words")).as("n_words"),
        round(sum(col("deg").cast("double") / col("freq").cast("double")),
          4).as("score"))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(k)
  }

  def textKeywordRakeQ(spark: SparkSession, dir: String): DataFrame =
    textKeywordRake(Tables.documents(spark, dir))

  /** Epoch plan under a token budget (r12 sB): the data-constrained
    * scaling arithmetic (Muennighoff et al. 2023) a training run
    * executes when the budget EXCEEDS the corpus — where
    * [[corpusBudgetSelect]] picks the best prefix of too-much data,
    * this allocates REPEATS of too-little: each source gets the
    * uniform-mix target budget/|sources| and fills it by repeating its
    * own tokens, capped at `maxEpochs` passes (the ~4-epoch point
    * where repeated data's value decays to noise in the paper's
    * fits); the shortfall column is the mass you must source
    * elsewhere, and `epochs` > 1 quantifies repetition pressure
    * per source.
    *
    * Scale shape: ONE map-side-combined token count to the |sources|
    * frame; every plan column is exact integer arithmetic off it
    * (achieved = least(target, maxEpochs·avail) — never a float
    * floor), the two ratios 4dp. */
  def corpusEpochPlan(docs: DataFrame, budgetTokens: Long = 400000L,
                      maxEpochs: Int = 4): DataFrame = {
    val ntok = size(filter(tokens(col("text")),
      t => length(t) > 0)).cast("long")
    import org.apache.spark.sql.expressions.Window
    val bySource = docs.select(col("source"), ntok.as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("avail_tokens"))
    val planned = bySource
      .withColumn("n_sources",
        count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("target_tokens",
        expr(s"${budgetTokens}L div n_sources"))
    planned.select(col("source"), col("n_docs"), col("avail_tokens"),
        col("target_tokens"),
        least(col("target_tokens"), lit(maxEpochs.toLong) *
          col("avail_tokens")).as("achieved_tokens"))
      .select(col("source"), col("n_docs"), col("avail_tokens"),
        col("target_tokens"), col("achieved_tokens"),
        (col("target_tokens") - col("achieved_tokens")).as("shortfall"),
        round(col("achieved_tokens").cast("double") /
          col("avail_tokens").cast("double"), 4).as("epochs"),
        round(col("achieved_tokens").cast("double") /
          col("target_tokens").cast("double"), 4).as("fill_rate"))
  }

  def corpusEpochPlanQ(spark: SparkSession, dir: String): DataFrame =
    corpusEpochPlan(Tables.documents(spark, dir))

  /** Corpus predictability report (r12 sB): unigram entropy, bigram
    * CONDITIONAL entropy H(w₂|w₁) and the redundancy ratio 1 − H₂/H₁ —
    * the information-rate summary behind the perplexity family
    * ([[textPerplexityBigram]] scores DOCS against the corpus LM; this
    * scores the CORPUS itself: H₂ far below H₁ says the text is
    * template-locked — the next token is near-determined by the
    * previous one, boilerplate/log-file tell — while H₂ ≈ H₁ says
    * bigram structure adds nothing and an n-gram quality filter is
    * wasted compute). One row out.
    *
    * Scale shape: the [[textPerplexityBigram]] frames — map-side
    * bigram generation from the token array, hashed tokens on the
    * wire, unigram + bigram + context counts all Heaps-bounded,
    * folded to ONE row; conditional entropy assembles as
    * Σ c_ab·(ln c_a − ln c_ab)/N₂ — ln of exact integers, the sums
    * the one distributed double fold, 4dp. */
  def textPredictability(docs: DataFrame): DataFrame = {
    val ts = tokens(col("text"))
    val tok = docs.select(explode(ts).as("t"))
      .select(xxhash64(col("t")).as("th"))
    val big = docs
      .select(col("doc_id"), ts.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("ts")) - 2),
        i => struct(xxhash64(element_at(col("ts"), i + 1)).as("a"),
          xxhash64(element_at(col("ts"), i + 2)).as("b")))).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val uniAgg = tok.groupBy(col("th")).agg(count(lit(1)).as("cu"))
      .agg(sum(col("cu")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(d(col("cu")) * log(d(col("cu")))).as("culn"))
    val bgc = big.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cab"))
    val ctx = bgc.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
    val bgAgg = bgc.join(ctx, Seq("a"))
      .agg(sum(col("cab")).as("n_bigrams"),
        sum(d(col("cab")) * (log(d(col("ca"))) - log(d(col("cab")))))
          .as("h2num"))
    val res = uniAgg.crossJoin(bgAgg)
      .withColumn("h1",
        log(d(col("n_tokens"))) - col("culn") / d(col("n_tokens")))
      .withColumn("h2", col("h2num") / d(col("n_bigrams")))
      .select(col("n_tokens"), col("vocab"), col("n_bigrams"),
        round(col("h1"), 4).as("h_unigram"),
        round(col("h2"), 4).as("h_bigram_cond"),
        round(lit(1.0) - col("h2") / col("h1"), 4).as("redundancy"))
    res
  }

  def textPredictabilityQ(spark: SparkSession, dir: String): DataFrame =
    textPredictability(Tables.documents(spark, dir))
}
