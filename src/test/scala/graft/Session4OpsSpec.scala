package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Session-4 LLM-pipeline ops: independent plain-Scala replays +
  * bounded-shape pins. */
class Session4OpsSpec extends AnyFunSuite with SparkFixture {

  private def r4(v: Double) = BigDecimal(v)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference shingle-set computation shared by the replays. */
  private def shingleSets(docs: Seq[(Long, String)], n: Int = 3) =
    docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      id -> toks.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap

  test("text_similar_topk equals a plain-Scala replay on the real corpus") {
    val docsDf = Tables.documents(spark, sfDir)
    val out = Dedup.textSimilarTopk(docsDf, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap

    val docs = docsDf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val sets = shingleSets(docs)
    val ids = sets.keys.toSeq.sorted
    val expect = ids.flatMap { a =>
      val nbrs = ids.filter(_ != a).flatMap { b =>
        val inter = (sets(a) & sets(b)).size
        if (inter == 0) None
        else Some((b, r4(inter.toDouble /
          (sets(a).size + sets(b).size - inter))))
      }
      val top = nbrs.sortBy { case (id, j) => (-j, id) }.take(5)
      if (top.isEmpty) None else Some(a -> top.sortBy(_._1))
    }.toMap
    assert(out === expect)
    // the output really is n·k-bounded
    assert(out.values.forall(_.size <= 5))
  }

  test("text_html_strip extracts prose from a real HTML page") {
    import spark.implicits._
    val html =
      """<!DOCTYPE html><html><head>
        |<style type="text/css">body { color: red; }</style>
        |<SCRIPT src="x.js">var hidden = "payload";</SCRIPT>
        |</head><body>
        |<!-- nav boilerplate -->
        |<h1>Title &amp; subtitle</h1>
        |<p>First&nbsp;paragraph with &lt;literal&gt; angle brackets,
        |&quot;quotes&quot; and &#39;apostrophes&#39;.</p>
        |<p>Double escape: &amp;lt; stays as an entity.</p>
        |</body></html>""".stripMargin
    val docs = Seq((1L, html), (2L, "plain prose, no markup"))
      .toDF("doc_id", "text")
    val out = graft.llm.TextOps.textHtmlStrip(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    val (clean, nTags, hadHtml) = out(1L)
    assert(clean === "Title & subtitle First paragraph with <literal> " +
      "angle brackets, \"quotes\" and 'apostrophes'. " +
      "Double escape: &lt; stays as an entity.")
    assert(hadHtml)
    // script/style payloads are GONE, not just their tags
    assert(!clean.contains("payload") && !clean.contains("color: red"))
    assert(!clean.contains("nav boilerplate"))
    // raw tag audit counts every <...> occurrence in the source
    assert(nTags > 10)
    // a markup-free doc passes through untouched
    assert(out(2L) === (("plain prose, no markup", 0L, false)))
  }

  test("ivf_tuning_report: monotone recall, exact full-probe identity") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val rep = graft.llm.Ann.ivfTuningReport(emb, nQueries = 8, k = 5,
      nlist = 8, probes = Seq(1, 2, 4, 8))
      .orderBy("nprobe").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rep.map(_._1).toSeq === Seq(1, 2, 4, 8))
    // probe lists are nested prefixes → recall cannot decrease
    rep.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 >= lo._2, s"mean recall fell: $lo -> $hi")
      assert(hi._3 >= lo._3, s"min recall fell: $lo -> $hi")
    }
    // full probe IS brute force: every truth member is a candidate
    assert(rep.last._2 === 1.0)
    assert(rep.last._3 === 1.0)
    // ...and the exact candidate count is the whole corpus minus self
    assert(rep.last._4 === (n - 1).toDouble)
    assert(rep.last._5 ===
      BigDecimal((n - 1).toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // cost grows with nprobe and never exceeds the corpus
    rep.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._4 >= lo._4)
    }
    assert(rep.forall(r => r._4 >= 0 && r._4 <= n - 1))
  }

  test("embed_norm_profile counts defects and excludes them from the stats") {
    import spark.implicits._
    val nan = Double.NaN
    val inf = Double.PositiveInfinity
    def pad(v: Double*) = (v ++ Seq.fill(4 - v.length)(0.0)).toArray
    val emb = Seq(
      (0L, pad(3.0, 4.0)),          // norm 5
      (1L, pad(0.0, 0.0)),          // zero norm: cosine-killer
      (2L, Array(nan, 1.0, 0.0, 0.0)),  // NaN component
      (3L, Array(inf, 1.0, 0.0, 0.0)),  // Inf component
      (4L, pad(6.0, 8.0))           // norm 10, same direction as 0
    ).toDF("vec_id", "embedding")
    val r = graft.llm.Ann.embedNormProfile(emb, dim = 4).head()
    assert(r.getLong(0) === 5)     // n_vecs
    assert(r.getLong(1) === 2)     // n_nonfinite (NaN + Inf rows)
    assert(r.getLong(2) === 1)     // n_zero_norm
    // norm stats over FINITE vectors only: {5, 0, 10}
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 5.0)
    assert(r.getDouble(5) === 10.0)
    // both nonzero finite vectors point along the centroid exactly →
    // perfect anisotropy 1.0; defective rows never reached the mean
    assert(r.getDouble(6) === 1.0)
  }

  test("embed_norm_profile on the real corpus: clean, non-degenerate space") {
    val r = graft.llm.Ann
      .embedNormProfile(Tables.embeddings(spark, sfDir)).head()
    assert(r.getLong(1) === 0 && r.getLong(2) === 0)
    assert(r.getDouble(3) > 0 && r.getDouble(3) <= r.getDouble(4) &&
      r.getDouble(4) <= r.getDouble(5))
    // cosine to the centroid is a cosine
    assert(r.getDouble(6) >= -1.0 && r.getDouble(6) <= 1.0)
  }

  test("dedup_embed_consistency separates aligned from broken vectors") {
    import spark.implicits._
    import graft.llm.Ann
    val text = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq((1L, text), (2L, text), (3L, text),
      (4L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.99, 0.01, 0.0, 0.0)), // aligned with 1: consistent dup
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),   // orthogonal: broken vector
      (4L, Seq(0.5, 0.5, 0.5, 0.5))
    ).toDF("vec_id", "embedding")
    val out = Ann.dedupEmbedConsistency(docs, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(4)).toMap
    // the three identical texts yield exactly three dup pairs
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out((1L, 2L)) === true)   // vectors agree with the text
    assert(out((1L, 3L)) === false)  // doc 3's vector is broken
    assert(out((2L, 3L)) === false)
  }

  test("ann_mmr_topk: diversity beats redundancy, lambda=1 is pure sim") {
    import spark.implicits._
    import graft.llm.Ann
    // query 0 = [1,0,...]; A and B are nearly parallel to EACH OTHER
    // (redundant pair) but distinct from the query, C is diverse with
    // moderate relevance — so B's redundancy penalty (≈1 vs A) crushes
    // its score while C's (≈0.43 vs A) doesn't
    def pad(v: Double*) = (v ++ Seq.fill(4 - v.length)(0.0))
    val emb = Seq(
      (0L, pad(1.0, 0.0)),        // the query (vec_id < nQueries=1)
      (10L, pad(0.9, 0.1)),       // A: sim ~0.994
      (11L, pad(0.9, 0.11)),      // B: sim ~0.993, cos(B,A) ~0.9999
      (12L, pad(0.6, -0.6))       // C: sim ~0.707, cos(C,A) ~0.62
    ).toDF("vec_id", "embedding")
    val mmr = Ann.annMmrTopK(emb, nQueries = 1, k = 2, poolFactor = 2,
      lambdaDiv = 0.5)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    // pure sim top-2 would be (A, B); MMR swaps the redundant B for C
    assert(mmr.toSeq === Seq((1, 10L), (2, 12L)))
    // λ=1: MMR degenerates to the plain similarity ranking
    val pure = Ann.annMmrTopK(emb, nQueries = 1, k = 3, poolFactor = 1,
      lambdaDiv = 1.0)
      .orderBy("rank").collect().map(_.getLong(2))
    val brute = Ann.annTopK(emb, nQueries = 1, k = 3)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(pure.toSeq === brute.toSeq)
  }

  test("ann_mmr_topk on the real corpus: dense ranks from the pool") {
    import graft.llm.Ann
    val emb = Tables.embeddings(spark, sfDir)
    val out = Ann.annMmrTopK(emb, nQueries = 5, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === (0L until 5L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq === (1 to 5))
      assert(rows.map(_._3).distinct.length === 5)
    }
    // selections come from the candidate pool (top 15 by sim)
    val pool = Ann.annTopK(emb, nQueries = 5, k = 15).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out.forall(r => pool((r._1, r._3))))
  }

  test("schema drift report summarizes the DDL log per table") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val sink = new graft.sinks.WarehouseSink(tmpDir("drift_wh_"))
    val hist = new graft.state.SchemaHistory(tmpDir("drift_hist_"), spark)
    val df1 = Seq((1L, "a")).toDF("id", "name").withColumn("p", lit(1))
    sink.evolveAndAppend(spark, df1, "t1", "p", Seq("id"), Some(hist))
    // two new columns arrive in a later batch → two ALTER records
    val df2 = df1.withColumn("extra", lit(2.0)).withColumn("more", lit("x"))
    sink.evolveAndAppend(spark, df2, "t1", "p", Seq("id"), Some(hist))
    // a second, never-evolved table
    sink.evolveAndAppend(spark, df1, "t2", "p", Seq("id"), Some(hist))
    val rep = hist.driftReport().collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(rep("t1") === ((0L, 3L, 2L, 5L, 2L)))
    assert(rep("t2") === ((3L, 3L, 0L, 3L, 3L)))
  }

  test("corpus_budget_mix: per-language clean prefixes under equal budgets") {
    import graft.llm.TextOps
    val docs = Tables.documents(spark, sfDir)
    val budget = 2000L
    val out = TextOps.corpusBudgetMix(docs, budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.length === docs.count())
    // selection semantics: selected exactly when the running total fits
    out.foreach { case (_, _, _, cum, sel) =>
      assert(sel === (cum <= budget))
    }
    val byLang = out.groupBy(_._2)
    byLang.foreach { case (_, rows) =>
      // cum_tokens restated from scratch: sort by cum (its order IS the
      // rank order), then each cum must be the prefix sum of n_tokens
      val sorted = rows.sortBy(_._4)
      var acc = 0L
      sorted.foreach { case (_, _, nt, cum, _) =>
        acc += nt
        assert(cum === acc)
      }
      // clean prefix: once over budget, never selected again
      assert(sorted.map(_._5).dropWhile(identity).forall(!_))
    }
    // the stratified point: EVERY language gets a selected prefix,
    // where the global single-budget form starves minority languages
    byLang.foreach { case (lang, rows) =>
      assert(rows.exists(_._5), s"language $lang got no budget")
    }
  }

  test("media_phash: dHash semantics on exact-size fixtures") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    import graft.llm.{MediaMeta, MediaRecord, Multimodal, Netpbm}
    // 9×8 sources make the dHash resize the identity, so every bit is
    // hand-predictable
    def gradient(perturbAt: Int = -1): Array[Byte] = {
      val raster = Array.tabulate(72)(i => ((i % 9) * 28).toByte)
      if (perturbAt >= 0) raster(perturbAt) = 0
      Netpbm.encodeP5(9, 8, raster)
    }
    val reversed = Netpbm.encodeP5(9, 8,
      Array.tabulate(72)(i => ((8 - i % 9) * 28).toByte))
    val meta = MediaMeta("pgm", 9, 8)
    val media = Seq(
      MediaRecord(1L, gradient(), meta),
      MediaRecord(2L, gradient(), meta),          // identical content
      MediaRecord(3L, gradient(4 * 9 + 4), meta), // one darkened pixel
      MediaRecord(4L, reversed, meta),            // every bit flipped
      MediaRecord(5L, Array[Byte](1, 2, 3), meta) // undecodable: dropped
    ).toDS()
    val hashes = Multimodal.mediaPhash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet === Set(1L, 2L, 3L, 4L))
    // ascending gradient: every left < right comparison fires
    assert(hashes(1L) === -1L)
    assert(hashes(2L) === hashes(1L))
    // the one perturbed pixel flips exactly one comparison
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(3L)) === 1)
    // reversed gradient: no comparison fires
    assert(hashes(4L) === 0L)
    val pairs = Multimodal.mediaPhashPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("media_phash_incremental equals the full pairs on new-image pairs") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val media = Multimodal.withMediaColumn(Tables.documents(spark, sfDir))
    val oldM = media.filter(col("doc_id") % 10 < 6)
    val newM = media.filter(col("doc_id") % 10 >= 6)
    val sink = new graft.sinks.WarehouseSink(tmpDir("ph_wh_"))
    Multimodal.buildPhashStore(oldM, sink)
    val inc = Multimodal.mediaPhashIncremental(newM, spark, sink).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val newIds = newM.collect().map(_.doc_id).toSet
    val full = Multimodal.mediaPhashPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(p => newIds(p._1) || newIds(p._2)).toSet
    assert(inc === full)
    // append keeps the store probing correctly: the batch joins the
    // store and a later (empty-new) probe finds nothing new
    Multimodal.buildPhashStore(newM, sink, append = true)
    val again = Multimodal
      .mediaPhashIncremental(spark.emptyDataset[graft.llm.MediaRecord](
        org.apache.spark.sql.Encoders.product[graft.llm.MediaRecord]),
        spark, sink)
    assert(again.isEmpty)
  }

  test("media_phash banding is pigeonhole-complete on the real media corpus") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import graft.llm.Multimodal
    val media = Multimodal.withMediaColumn(Tables.documents(spark, sfDir))
    val sigs = Multimodal.mediaPhash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // deterministic across runs
    val again = Multimodal.mediaPhash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(sigs.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    val banded = Multimodal.mediaPhashPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(banded === brute)
  }

  test("text_similar_topk: ties at the k boundary cut deterministically") {
    import spark.implicits._
    // base doc + three docs each sharing exactly its first 3-gram →
    // identical scores; k=2 must keep the two smallest neighbor ids
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma zz aa"),
      (3L, "alpha beta gamma zz bb"),
      (4L, "alpha beta gamma zz cc")
    ).toDF("doc_id", "text")
    val m = Dedup.textSimilarTopk(docs, k = 2)
      .filter(col("doc_id") === 1L).collect()
      .map(r => r.getLong(1)).sorted.toSeq
    // doc 1 vs 2/3/4: inter=1, |1|=2, |others|=3 → jaccard 0.25 each;
    // the (jaccard DESC, nbr_id ASC) total order keeps 2 and 3
    assert(m === Seq(2L, 3L))
  }
}
