package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Ann, TextOps}

class Round10PropertiesSpec extends AnyFunSuite with SparkFixture {

  test("corpus_chunk windows a hand-built doc exactly") {
    import spark.implicits._
    val words = (0 until 50).map(i => s"w$i")
    val docs = Seq((7L, words.mkString(" ")), (8L, "just three words"))
      .toDF("doc_id", "text")
    val out = TextOps.corpusChunk(docs, chunkWords = 32, stride = 24)
      .as[(Long, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // 50 words, stride 24 → starts 0, 24, 48
    val d7 = out(7L)
    assert(d7.map(c => (c._2, c._3)).toSeq === Seq((0, 32), (1, 26), (2, 2)))
    assert(d7(0)._4 === words.slice(0, 32).mkString(" "))
    assert(d7(1)._4 === words.slice(24, 50).mkString(" "))
    assert(d7(2)._4 === words.slice(48, 50).mkString(" "))
    // consecutive windows overlap by chunkWords − stride = 8 words
    assert(d7(0)._4.split(" ").takeRight(8).toSeq ===
      d7(1)._4.split(" ").take(8).toSeq)
    // a short doc yields exactly one window of itself
    assert(out(8L).toSeq === Seq((8L, 0, 3, "just three words")))
  }

  test("corpus_chunk covers every word of every real doc") {
    val docs = Tables.documents(spark, sfDir)
    val chunks = TextOps.corpusChunk(docs)
    // every doc chunked; chunk_ids contiguous from 0; every window
    // within size; total coverage = stride·(n_chunks−1) + last size
    val perDoc = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nc"), max(col("chunk_id")).as("mx"),
        min(col("chunk_id")).as("mn"), max(col("n_words")).as("mw"),
        sum(when(col("n_words") > 32, 1).otherwise(0)).as("oversize"))
    assert(perDoc.count() === docs.count())
    assert(perDoc.filter(col("mn") =!= 0 || col("mx") =!= col("nc") - 1)
      .isEmpty)
    assert(perDoc.filter(col("oversize") > 0).isEmpty)
    val words = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).as("nw"))
    val last = chunks.join(words, "doc_id")
      .filter(col("chunk_id") === floor((col("nw") - 1) / 24))
      .filter(col("n_words") =!= col("nw") - col("chunk_id") * 24)
    assert(last.isEmpty)
  }

  test("text_entropy matches closed forms on uniform alphabets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),           // one symbol: entropy 0
      (2L, "abababab"),       // two equiprobable: ln 2
      (3L, "abcd"),           // four equiprobable: ln 4
      (4L, "aaab")            // 3/4, 1/4: ln4 - (3 ln 3)/4
    ).toDF("doc_id", "text")
    val out = TextOps.textEntropy(docs)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((4L, 0.0, true)))
    assert(out(2L) === ((8L, BigDecimal(math.log(2)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble, true)))
    assert(out(3L) === ((4L, BigDecimal(math.log(4)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble, true)))
    val h4 = math.log(4) - 3.0 * math.log(3) / 4.0
    assert(out(4L)._2 === BigDecimal(h4).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    // real corpus: every non-empty doc scored, entropies inside [0, ln 256]
    val docsR = Tables.documents(spark, sfDir)
    val ent = TextOps.textEntropy(docsR)
    assert(ent.count() === docsR.filter(length(col("text")) > 0).count())
    assert(ent.filter(col("entropy") < 0 ||
      col("entropy") > math.log(256)).isEmpty)
  }

  test("corpus_chunk equals a plain-Scala sliding window on random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(1007)
    val docs = (0L until 40L).map { id =>
      val n = 1 + rng.nextInt(80)
      (id, (0 until n).map(i => s"t${rng.nextInt(30)}x$i").mkString(" "))
    }
    val expected = docs.flatMap { case (id, text) =>
      val ws = text.trim.toLowerCase.split("\\s+")
      (0 until ws.length by 24).zipWithIndex.map { case (st, ci) =>
        val w = ws.slice(st, st + 32)
        (id, ci, w.length, w.mkString(" "))
      }
    }.sorted
    val got = TextOps.corpusChunk(docs.toDF("doc_id", "text"))
      .as[(Long, Int, Int, String)].collect().toSeq.sorted
    assert(got === expected)
  }

  test("text_entropy equals a driver-side histogram on random strings") {
    import spark.implicits._
    val rng = new scala.util.Random(1013)
    val alphabet = "ab cX#\n09" // mixed case, digits, whitespace, newline
    val docs = (0L until 40L).map { id =>
      (id, (0 until (1 + rng.nextInt(200)))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }
    val expected = docs.map { case (id, text) =>
      val counts = text.groupBy(identity).map(_._2.length.toLong)
      val t = counts.sum.toDouble
      val h = math.log(t) - counts.map(n => n * math.log(n.toDouble)).sum / t
      (id, counts.sum,
        BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sorted
    val got = TextOps.textEntropy(docs.toDF("doc_id", "text"))
      .select(col("doc_id"), col("n_chars"), col("entropy"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got === expected)
  }

  test("bpe_apply equals the index-skipping reference merge loop on random words") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rng = new scala.util.Random(1019)
    // reference = bpeTrain's OWN loop shape (index skip), deliberately a
    // different implementation than the expression's output-top fold
    def refEncode(w: String, merges: Seq[(String, String)]): Seq[String] = {
      var syms: Array[String] = w.map(_.toString).toArray
      for ((l, r) <- merges if syms.length >= 2) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
      syms.toSeq
    }
    for (trial <- 1 to 10) {
      val words = (0 until 30).map(_ =>
        (0 until (1 + rng.nextInt(10)))
          .map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
      // random merges over the tiny alphabet and its early compounds —
      // including repeat-prone pairs like (a,a)
      var symbols = Seq("a", "b", "c")
      val merges = (0 until 6).map { _ =>
        val l = symbols(rng.nextInt(symbols.size))
        val r = symbols(rng.nextInt(symbols.size))
        symbols = symbols :+ (l + r)
        (l, r)
      }
      val got = words.toDF("w")
        .select(col("w"),
          graft.functions.BpeFunctions.bpeApply(col("w"), merges).as("s"))
        .as[(String, Seq[String])].collect().toMap
      for (w <- words)
        assert(got(w) === refEncode(w, merges),
          s"trial $trial word '$w' merges $merges")
    }
  }

  test("corpus_pack_bins: full packs, one slot per doc, bounded waste") {
    import spark.implicits._
    // hand ladder: n_tok 1,2,3,5,30 + a truncated long doc
    val docs = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d e"),
      (5L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (6L, (1 to 600).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.corpusPackBins(docs, packTokens = 512)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 1L, 1L, 0L, 0L)))   // class 1
    assert(out(2L) === ((2L, 2L, 2L, 0L, 0L)))   // class 2
    assert(out(3L) === ((3L, 3L, 4L, 0L, 0L)))   // rounds to class 4
    assert(out(4L) === ((4L, 5L, 8L, 0L, 0L)))   // rounds to class 8
    assert(out(5L) === ((5L, 30L, 32L, 0L, 0L))) // class 32
    assert(out(6L) === ((6L, 512L, 512L, 0L, 0L))) // truncated to a full pack
    // real corpus invariants: one row per doc; within every (class,
    // pack): <= capacity docs, all of the class, every pack but the
    // class's last exactly full
    val docsR = Tables.documents(spark, sfDir)
    val packed = TextOps.corpusPackBins(docsR)
    assert(packed.count() === docsR.count())
    val byPack = packed.groupBy(col("len_class"), col("pack_id"))
      .agg(count(lit(1)).as("n"), max(col("slot")).as("mx"),
        max(col("n_tok")).as("mt"))
    // slots are dense 0..n-1 and sizes never exceed the class
    assert(byPack.filter(col("mx") =!= col("n") - 1).isEmpty)
    assert(byPack.filter(col("mt") > col("len_class")).isEmpty)
    val lastPack = packed.groupBy(col("len_class"))
      .agg(max(col("pack_id")).as("last"))
    val notFull = byPack.join(lastPack, "len_class")
      .filter(col("pack_id") =!= col("last") &&
        col("n") * col("len_class") =!= 512)
    assert(notFull.isEmpty)
  }

  test("text_collocations equals a plain-Scala PMI count on random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(1021)
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (0L until 50L).map { id =>
      (id, (0 until (2 + rng.nextInt(40)))
        .map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val window = 3
    val toks = docs.map { case (_, text) =>
      text.trim.toLowerCase.split("\\s+").toSeq }
    val nt = toks.map(_.size).sum.toDouble
    val cUni = toks.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size }
    val cPair = scala.collection.mutable.Map[(String, String), Long]()
    for (ws <- toks; i <- 0 until ws.size - 1;
         j <- (i + 1) to math.min(i + window, ws.size - 1))
      cPair((ws(i), ws(j))) = cPair.getOrElse((ws(i), ws(j)), 0L) + 1
    val expected = cPair.toSeq.filter(_._2 >= 2L).map { case ((a, b), c) =>
      val pmi = BigDecimal(math.log(c * nt / (cUni(a).toDouble * cUni(b))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, c, pmi)
    }.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }.take(40)
    val got = TextOps.textCollocations(docs.toDF("doc_id", "text"),
        window = window, minCount = 2, k = 40)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === expected)
  }

  test("corpus_families aggregates hand-built components") {
    import spark.implicits._
    import graft.llm.Dedup
    val docs = (1L to 7L).map(i => (i, i * 10L)).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.corpusFamilies(docs, pairs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // chain {1,2,3} kept at 1 (chars of 2 and 3 dropped), pair {5,6}
    // kept at 5; singletons 4 and 7 never appear in the report
    assert(out === Seq((1L, 3L, 2L, 50L), (5L, 2L, 1L, 60L)))
  }

  test("embed_decontaminate counts hits exactly on a hand fixture") {
    import spark.implicits._
    val bench = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),   // exact copy of bench 0 → 1 hit
      (11L, Array(0.7f, 0.7f, 0.0f)),   // close to BOTH (cos ≈ .71) → 2
      (12L, Array(0.0f, 0.0f, 1.0f))    // orthogonal to both → clean
    ).toDF("vec_id", "embedding")
    val out = Ann.embedDecontaminate(corpus, bench, tau = 0.5)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(10L) === ((1L, true)))
    assert(out(11L) === ((2L, true)))
    assert(out(12L) === ((0L, false)))
    assert(out.size === 3)
  }

  test("embed_decontaminate hit counts equal ann_range pair counts") {
    val emb = Tables.embeddings(spark, sfDir)
    // ann_range: (query_id < 10) → corpus pairs at the SAME tau; its
    // pairs with vec_id ≥ 10 are exactly this operator's hits
    val expected = Ann.annRange(emb, nQueries = 10, tau = 0.3)
      .filter(col("vec_id") >= 10)
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_hits_exp"))
    val got = Ann.embedDecontaminate(emb.filter(col("vec_id") >= 10),
      emb.filter(col("vec_id") < 10), tau = 0.3)
    assert(got.count() === emb.filter(col("vec_id") >= 10).count())
    val joined = got.join(expected, Seq("vec_id"), "left")
      .filter(coalesce(col("n_hits_exp"), lit(0L)) =!= col("n_hits"))
    assert(joined.isEmpty)
  }

  test("text_tfidf ranks a hand-computed fixture and bounds the rank shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana banana cherry"),
      (3L, "banana date")).toDF("doc_id", "text")
    // df: apple 1, banana 3, cherry 1, date 1; N=3
    // idf: rare terms ln(4/2)+1 = 1.693147, banana ln(4/4)+1 = 1.0
    val out = TextOps.textTfidf(docs, k = 2)
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(out(1L).map(r => (r._2, r._3, r._4)).toSeq ===
      Seq((1, "apple", 3.3863), (2, "banana", 1.0)))
    assert(out(2L).map(r => (r._2, r._3, r._4)).toSeq ===
      Seq((1, "banana", 2.0), (2, "cherry", 1.6931)))
    assert(out(3L).map(r => (r._2, r._3, r._4)).toSeq ===
      Seq((1, "date", 1.6931), (2, "banana", 1.0)))
    // the rank window must carry the map-side partial bound
    val plan = TextOps.textTfidfPlan(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("embed_decontaminate never shuffles the corpus vectors") {
    val emb = Tables.embeddings(spark, sfDir)
    val plan = Ann.embedDecontaminate(emb.filter(col("vec_id") >= 10),
      emb.filter(col("vec_id") < 10)).queryExecution.executedPlan.toString
    // bench side broadcasts; the only exchange carries (vec_id, count)
    // partials — assert no SortMergeJoin / no shuffle of array data
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("text_perplexity_bigram equals a plain-Scala interpolated LM on random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(1031)
    val vocab = (0 until 10).map(i => s"w$i")
    // lengths 1..30: single-token docs must DROP, not crash
    val docs = (0L until 40L).map { id =>
      (id, (0 until (1 + rng.nextInt(30)))
        .map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val toks = docs.map { case (id, text) =>
      id -> text.trim.toLowerCase.split("\\s+").toSeq }
    val n = toks.map(_._2.size).sum.toDouble
    val uni = toks.flatMap(_._2).groupBy(identity).map { case (w, xs) => w -> xs.size }
    val bigs = toks.map { case (id, ws) => id -> ws.zip(ws.drop(1)) }
    val ctx = bigs.flatMap(_._2).groupBy(_._1).map { case (a, xs) => a -> xs.size }
    val bgc = bigs.flatMap(_._2).groupBy(identity).map { case (p, xs) => p -> xs.size }
    val ln2 = math.log(2.0)
    val lambda = TextOps.BigramLambda
    val expected = bigs.filter(_._2.nonEmpty).map { case (id, bs) =>
      val h = -bs.map { case (a, b) =>
        math.log(lambda * bgc((a, b)) / ctx(a).toDouble +
          (1.0 - lambda) * uni(b) / n) / ln2
      }.sum / bs.size
      (id, bs.size.toLong,
        BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sorted
    val got = TextOps.textPerplexityBigram(docs.toDF("doc_id", "text"))
      .select("doc_id", "n_bigrams", "bits_per_transition")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got === expected)
  }

  test("dsir_score equals a plain-Scala add-alpha log ratio on random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(1033)
    val vocab = (0 until 14).map(i => s"w$i")
    def mk(ids: Range, lo: Int, hi: Int) = ids.map { id =>
      (id.toLong, (0 until (1 + rng.nextInt(20)))
        .map(_ => vocab(lo + rng.nextInt(hi - lo))).mkString(" "))
    }
    // target draws from the low half of the vocab, corpus from all of
    // it — overlapping but shifted distributions, the DSIR regime
    val target = mk(0 until 6, 0, 7)
    val corpus = mk(100 until 140, 0, 14)
    def words(d: Seq[(Long, String)]) =
      d.flatMap(_._2.trim.toLowerCase.split("\\s+"))
    val rawW = words(corpus); val tgtW = words(target)
    val raw = rawW.groupBy(identity).map { case (w, xs) => w -> xs.size }
    val tgt = tgtW.groupBy(identity).map { case (w, xs) => w -> xs.size }
    val v = (rawW ++ tgtW).distinct.size.toDouble
    val a = TextOps.DsirAlpha
    val ln2 = math.log(2.0)
    val expected = corpus.map { case (id, text) =>
      val ws = text.trim.toLowerCase.split("\\s+").toSeq
      val s = ws.map { w =>
        math.log((tgt.getOrElse(w, 0) + a) / (tgtW.size + a * v)) / ln2 -
          math.log((raw(w) + a) / (rawW.size + a * v)) / ln2
      }.sum / ws.size
      (id, ws.size.toLong,
        BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sorted
    val got = TextOps.dsirScore(
        corpus.toDF("doc_id", "text"), target.toDF("doc_id", "text"))
      .select("doc_id", "n_tokens", "dsir_score")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got === expected)
  }

  test("corpus_temperature_sample: exact whole-copy rates and the epoch cap") {
    import spark.implicits._
    // 16 en / 4 de / 1 fr: sqrt ratios 1, 2, 4 → rates 1.0, 2.0, capped 3.0
    // — all integral, so replication is exact whatever the bucket says
    val docs = ((0L until 16L).map(i => (i, "en")) ++
      (16L until 20L).map(i => (i, "de")) ++ Seq((20L, "fr")))
      .toDF("doc_id", "lang")
    val out = TextOps.corpusTemperatureSample(docs)
      .groupBy("lang").agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("d"),
        max(col("copy")).as("maxc"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("en") === (("en", 16L, 16L, 0L)))
    assert(out("de") === (("de", 8L, 4L, 1L)))
    assert(out("fr") === (("fr", 3L, 1L, 2L)))
  }

  test("corpus_temperature_sample: fractional copies match the bucket exactly") {
    import spark.implicits._
    // 9 en / 4 de: rate_de = sqrt(9/4) = 1.5 → 15000 bp → every de doc
    // keeps 1 copy and gains a 2nd iff its decorrelated 1e4 bucket < 5000
    val docs = ((0L until 9L).map(i => (i, "en")) ++
      (100L until 104L).map(i => (i, "de"))).toDF("doc_id", "lang")
    val extra = TextOps.corpusTemperatureSample(docs)
      .filter(col("copy") === 1L).select("doc_id").as[Long].collect().toSet
    val expected = (100L until 104L).filter { id =>
      (((id % TextOps.SampleIdPrime) * TextOps.TempMultiplier)
        >> TextOps.SampleShift) % 10000L < 5000L
    }.toSet
    assert(extra === expected)
  }

  test("q_basket_pairs equals a plain-Scala basket count on random orders") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    // 80 orders, 1-5 distinct parts each from a 12-part catalog
    val baskets = (1L to 80L).map { ok =>
      ok -> rnd.shuffle((1L to 12L).toList).take(1 + rnd.nextInt(5))
    }
    val rows = baskets.flatMap { case (ok, ps) => ps.map(p => (ok, p)) }
    val df = rows.toDF("l_orderkey", "l_partkey")
    // reference: exact pair/marginal counts, lift via the same rounding
    val nOrders = baskets.size.toDouble
    val marg = rows.groupBy(_._2).map { case (p, xs) => p -> xs.size }
    val pairCnt = baskets.flatMap { case (_, ps) =>
      val s = ps.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.groupBy(identity).map { case (pr, xs) => pr -> xs.size.toLong }
      .filter(_._2 >= 3)
    val want = pairCnt.map { case ((a, b), n) =>
      (a, b, n, BigDecimal(n * nOrders / (marg(a).toDouble * marg(b)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(r => (-r._4, r._1, r._2)).take(10)
    val got = graft.queries.Analytics2.qBasketPairsOn(df, topK = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === want)
  }

  test("filter_agreement equals plain-Scala set algebra on random flags") {
    import spark.implicits._
    val rnd = new scala.util.Random(31337)
    val flags = (0L until 300L).map(i =>
      (i, rnd.nextBoolean(), rnd.nextBoolean(), rnd.nextBoolean()))
    val df = flags.toDF("doc_id", "fa", "fb", "fc")
    val got = TextOps.filterAgreement(df, Seq(
        "a" -> col("fa"), "b" -> col("fb"), "c" -> col("fc")))
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    def check(n1: String, n2: String, f1: ((Long, Boolean, Boolean, Boolean)) => Boolean,
              f2: ((Long, Boolean, Boolean, Boolean)) => Boolean): Unit = {
      val (s1, s2) = (flags.filter(f1).map(_._1).toSet,
        flags.filter(f2).map(_._1).toSet)
      val r = got((n1, n2))
      assert(r._3 === 300L && r._4 === s1.size && r._5 === s2.size)
      assert(r._6 === (s1 & s2).size.toLong)
      val agree = flags.count(x => f1(x) == f2(x)).toDouble / 300.0
      assert(math.abs(r._7 - math.rint(agree * 1e4) / 1e4) < 1e-9)
      val jac = if ((s1 | s2).isEmpty) 0.0
        else (s1 & s2).size.toDouble / (s1 | s2).size
      assert(math.abs(r._8 - math.rint(jac * 1e4) / 1e4) < 1e-9)
    }
    check("a", "b", _._2, _._3)
    check("a", "c", _._2, _._4)
    check("b", "c", _._3, _._4)
  }

  test("text_compressibility: repetitive text flags, diverse text doesn't") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val repetitive = "the same boilerplate sentence again and again. " * 80
    val diverse = (0 until 400)
      .map(_ => rnd.alphanumeric.take(8).mkString).mkString(" ")
    val docs = Seq((0L, repetitive), (1L, diverse), (2L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.textCompressibility(docs)
      .as[(Long, Int, Int, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // the long-range repeat compresses away; random text barely does
    assert(out(0L)._4 < 0.1 && out(0L)._5)
    assert(out(1L)._4 > 0.5 && !out(1L)._5)
    // empty doc: ratio pinned 1.0, never flagged
    assert(out(2L) === ((2L, 0, 0, 1.0, false)))
    // deflate is deterministic: a second run reproduces byte counts
    val again = TextOps.textCompressibility(docs)
      .as[(Long, Int, Int, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(again === out)
    // conservation on the real corpus: raw byte counts match length
    val real = TextOps.textCompressibilityQ(spark, sfDir)
    val docsReal = Tables.documents(spark, sfDir)
    assert(real.count() === docsReal.count())
    assert(real.filter(col("ratio") <= 0 || col("ratio") > 1.2).isEmpty)
  }

  test("text_unicode_audit: planted mojibake, invisibles and controls; tabs stay clean") {
    import spark.implicits._
    val docs = Seq(
      (0L, "clean normal text"),
      (1L, "bad � transcode � here"),
      (2L, "invisible​water‍mark﻿ end"),
      (3L, "ctlcharshere"),
      (4L, "tabs\tand\nnewlines are fine\r")
    ).toDF("doc_id", "text")
    val out = TextOps.textUnicodeAudit(docs)
      .as[(Long, Int, Int, Int, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) === ((0L, 0, 0, 0, true)))
    assert(out(1L) === ((1L, 2, 0, 0, false)))
    assert(out(2L) === ((2L, 0, 3, 0, false)))
    assert(out(3L) === ((3L, 0, 0, 2, false)))
    assert(out(4L) === ((4L, 0, 0, 0, true)))
  }

  test("corpus_sample_fixed: exact size, determinism, bottom-k append stability") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val s1 = TextOps.corpusSampleFixed(docs, k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.size === 50)
    // replayable: an independent run selects the identical membership
    val s2 = TextOps.corpusSampleFixed(docs, k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2)
    // bottom-k stability: growing the corpus only REPLACES members —
    // the bigger corpus's sample is contained in (old sample ∪ new docs)
    val extra = (0 until 200)
      .map(i => (1000000L + i, "en", "web")).toDF("doc_id", "lang", "source")
    val grown = docs.select("doc_id", "lang", "source").unionByName(extra)
    val s3 = TextOps.corpusSampleFixed(grown, k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(s3.size === 50)
    assert(s3.subsetOf(s1 ++ extra.select("doc_id").as[Long].collect()))
    // the plan takes the bounded TakeOrderedAndProject path, not a
    // global sort
    val plan = TextOps.corpusSampleFixed(docs, k = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("corpus_temperature_sample on the real corpus: every doc kept, cap holds") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextOps.corpusTemperatureSampleQ(spark, sfDir)
    assert(out.select("doc_id").distinct().count() === docs.count())
    assert(out.filter(col("copy") < 0 || col("copy") > 2).isEmpty)
    // (doc, copy) rows are unique — the stream carries no accidental dupes
    assert(out.distinct().count() === out.count())
  }
}
