package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextOps

/** Randomized brute-force cross-checks for the round-9 text operators,
  * fixed seed (the Round6PropertiesSpec pattern): generate small random
  * corpora, compute the expected result in plain Scala with the same
  * (documented) semantics, and demand the distributed operator agree
  * exactly — including the doubles, which come from identical int-derived
  * IEEE operations on both sides. */
class Round9PropertiesSpec extends AnyFunSuite with SparkFixture {

  /** Spark's `trim` strips ONLY spaces (0x20) — Java's `String.trim`
    * strips all control chars and would diverge on newline-adjacent
    * text. */
  private def sparkTrim(s: String): String =
    s.replaceAll("^ +", "").replaceAll(" +$", "")

  private def toks(text: String): Array[String] =
    sparkTrim(text.toLowerCase).split("\\s+", -1)

  test("corpus_bpe_pairs agrees with a plain-Scala count on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(9090)
    val vocab = Vector("ab", "abc", "aaa", "x", "the", "zz", "q7b", "的的")
    for (trial <- 1 to 5) {
      val docs = (0 until 30).map { i =>
        val n = 1 + rnd.nextInt(10)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val expected = docs.flatMap(d => toks(d._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .toSeq
        .filter(_._1.length >= 2)
        .flatMap { case (w, freq) =>
          (0 until w.length - 1).map(i => w.substring(i, i + 2) -> freq)
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .sortBy { case (pair, n) => (-n, pair) }
      val got = TextOps.corpusBpePairs(docs.toDF("doc_id", "text"),
          k = expected.size + 10)
        .as[(String, Long)].collect().toSeq
      assert(got === expected, s"trial $trial")
    }
  }

  test("bpe_train reproduces the hand-derived Sennrich merge sequence") {
    import spark.implicits._
    // the classic BPE teaching vocabulary: low×5, lower×2, newest×6,
    // widest×3. Hand-derived merges (ties break lexicographically):
    //   1: (e,s)  9   [ties (s,t)=9 → 'e' < 's']
    //   2: (es,t) 9
    //   3: (l,o)  7   [ties (o,w)=7 → 'l' < 'o']
    //   4: (lo,w) 7
    //   5: (e,w)  6   [ties (n,e)=(w,est)=6 → 'e' first]
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val got = TextOps.bpeTrain(docs, iters = 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L), (5, "e", "w", 6L)))
    // termination: with unlimited iters the trainer stops on its own
    // once every pair is unique-ish (count < 2), and every emitted
    // merge still carries its support count
    val full = TextOps.bpeTrain(docs, iters = 1000)
      .as[(Int, String, String, Long)].collect()
    assert(full.length < 1000 && full.forall(_._4 >= 2L))
    assert(full.map(_._1).toSeq === (1 to full.length))
    // deterministic end-to-end on the real corpus
    val a = TextOps.bpeTrain(Tables.documents(spark, sfDir))
      .as[(Int, String, String, Long)].collect().toSeq
    val b = TextOps.bpeTrain(Tables.documents(spark, sfDir))
      .as[(Int, String, String, Long)].collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("events_anomaly agrees with a plain-Scala z-score screen") {
    import spark.implicits._
    val got = graft.queries.Analytics2.eventsAnomaly(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    val rows = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "value")
      .as[(Long, Long, Double)].collect()
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (uid, es) =>
      val n = es.length
      if (n < 2) Seq.empty[(Long, Long, Double)]
      else {
        val mu = es.map(_._3).sum / n
        val sd = math.sqrt(es.map(e => (e._3 - mu) * (e._3 - mu)).sum / (n - 1))
        if (sd <= 0) Seq.empty[(Long, Long, Double)]
        else es.toSeq.flatMap { case (eid, _, v) =>
          val z = BigDecimal((v - mu) / sd)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (math.abs(z) >= 3.0) Some((eid, uid, z)) else None
        }
      }
    }.toSet
    assert(got === expected && got.nonEmpty)
  }

  test("text_gopher metrics agree with a plain-Scala evaluation on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(2929)
    val words = Vector("the", "of", "word", "x", "12ab", "#tag", "99",
      "soon...", "•item", "…")
    val bulletRe = java.util.regex.Pattern.compile("^\\s*[-*•]")
    val ellipsisRe = java.util.regex.Pattern.compile("(\\.\\.\\.|…)\\s*$")
    val symbolRe = java.util.regex.Pattern.compile("#|\\.\\.\\.|…")
    val alphaRe = java.util.regex.Pattern.compile("[a-z]")
    for (trial <- 1 to 5) {
      val docs = (0 until 40).map { i =>
        val nLines = 1 + rnd.nextInt(4)
        val text = (0 until nLines).map { _ =>
          Seq.fill(1 + rnd.nextInt(6))(words(rnd.nextInt(words.size)))
            .mkString(" ")
        }.mkString("\n")
        (i.toLong, text)
      }
      val got = TextOps.textGopher(docs.toDF("doc_id", "text"),
          minWords = 3, maxWords = 20, minStop = 1)
        .collect().map(r => r.getLong(0) -> r).toMap
      docs.foreach { case (id, text) =>
        val t = toks(text)
        val nWords = t.length.toLong
        val meanLen = t.map(_.length).sum.toDouble / nWords.toDouble
        val lines = text.split("\n", -1).filter(l => sparkTrim(l).nonEmpty)
        val nLines = math.max(lines.length.toDouble, 1.0)
        def count(re: java.util.regex.Pattern, ls: Array[String]) =
          ls.count(l => re.matcher(l).find()).toDouble
        val symbolRatio = {
          val m = symbolRe.matcher(text)
          var n = 0; while (m.find()) n += 1
          n.toDouble / nWords.toDouble
        }
        val bulletRatio = count(bulletRe, lines) / nLines
        val ellipsisRatio = count(ellipsisRe, lines) / nLines
        val alphaRatio =
          t.count(w => alphaRe.matcher(w).find()).toDouble / nWords.toDouble
        val nStop = TextOps.GopherStopwords.count(t.contains(_)).toLong
        val pass = nWords >= 3 && nWords <= 20 &&
          meanLen >= 3.0 && meanLen <= 10.0 &&
          symbolRatio < 0.1 && bulletRatio < 0.9 && ellipsisRatio < 0.3 &&
          alphaRatio > 0.8 && nStop >= 1
        val r = got(id)
        assert(r.getLong(1) === nWords, s"trial $trial doc $id n_words")
        assert(r.getDouble(2) === meanLen, s"trial $trial doc $id mean")
        assert(r.getDouble(3) === symbolRatio, s"trial $trial doc $id symbol")
        assert(r.getDouble(4) === bulletRatio, s"trial $trial doc $id bullet")
        assert(r.getDouble(5) === ellipsisRatio, s"trial $trial doc $id ellipsis")
        assert(r.getDouble(6) === alphaRatio, s"trial $trial doc $id alpha")
        assert(r.getLong(7) === nStop, s"trial $trial doc $id stop")
        assert(r.getBoolean(8) === pass, s"trial $trial doc $id pass")
      }
    }
  }
}
