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
