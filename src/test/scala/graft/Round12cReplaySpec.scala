package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized plain-Scala replays for the session-C operators whose
  * first specs were hand fixtures — the full operator recomputed in
  * plain collections on seeded random inputs, matched at the engine's
  * own 4dp edge. (The optional-depth pattern of the r11/r12 analytics
  * trios applied to the new wave.) */
class Round12cReplaySpec extends AnyFunSuite with SparkFixture {

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("vocab_overlap agrees with a plain-Scala replay on randomized " +
    "multi-source corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(90210)
    val words = (0 until 40).map(i => s"w$i")
    for (trial <- 1 to 3) {
      val docs = (1 to 30).map { i =>
        val src = s"s${rnd.nextInt(4)}"
        val text = Seq.fill(3 + rnd.nextInt(8))(
          words(rnd.nextInt(words.size))).mkString(" ")
        (src, text)
      }
      val out = graft.llm.TextOps.vocabOverlap(docs.toDF("source", "text"))
        .collect().map(r => (r.getAs[String]("source_a"),
          r.getAs[String]("source_b")) -> r).toMap
      val vocab: Map[String, Set[String]] = docs.groupBy(_._1)
        .map { case (s, ds) =>
          s -> ds.flatMap(_._2.split("\\s+")).toSet }
      val srcs = vocab.keys.toSeq.sorted
      val expectPairs = for (a <- srcs; b <- srcs if a < b) yield (a, b)
      assert(out.keySet === expectPairs.toSet, s"trial $trial")
      expectPairs.foreach { case (a, b) =>
        val (va, vb) = (vocab(a), vocab(b))
        val sh = (va intersect vb).size.toLong
        val row = out((a, b))
        assert(row.getAs[Long]("vocab_a") === va.size.toLong,
          s"trial $trial $a-$b")
        assert(row.getAs[Long]("vocab_b") === vb.size.toLong,
          s"trial $trial $a-$b")
        assert(row.getAs[Long]("shared") === sh, s"trial $trial $a-$b")
        assert(row.getAs[Double]("jaccard") ===
          r4(sh.toDouble / (va.size + vb.size - sh)), s"trial $trial")
        assert(row.getAs[Double]("containment_a") ===
          r4(sh.toDouble / va.size), s"trial $trial")
        assert(row.getAs[Double]("containment_b") ===
          r4(sh.toDouble / vb.size), s"trial $trial")
      }
    }
  }

  test("corpus_vocab_profile agrees with a plain-Scala replay on " +
    "randomized multi-source corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(31415)
    val words = (0 until 30).map(i => s"t$i")
    for (trial <- 1 to 3) {
      val docs = (1 to 25).map { _ =>
        (s"s${rnd.nextInt(3)}",
          Seq.fill(2 + rnd.nextInt(10))(
            words(rnd.nextInt(words.size))).mkString(" "))
      }
      val out = graft.llm.TextOps
        .corpusVocabProfile(docs.toDF("source", "text"))
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      docs.groupBy(_._1).foreach { case (s, ds) =>
        val toks = ds.flatMap(_._2.split("\\s+"))
        val counts = toks.groupBy(identity).view.mapValues(_.size)
        val row = out(s)
        assert(row.getAs[Long]("n_docs") === ds.size.toLong, s"t$trial $s")
        assert(row.getAs[Long]("n_tokens") === toks.size.toLong)
        assert(row.getAs[Long]("vocab") === counts.size.toLong)
        assert(row.getAs[Long]("hapax") ===
          counts.count(_._2 == 1).toLong)
        assert(row.getAs[Double]("ttr") ===
          r4(counts.size.toDouble / toks.size))
        assert(row.getAs[Double]("hapax_share") ===
          r4(counts.count(_._2 == 1).toDouble / counts.size))
        assert(row.getAs[Double]("mean_doc_tokens") ===
          r4(toks.size.toDouble / ds.size))
      }
    }
  }

  test("dedup_pair_budget agrees with a plain-Scala replay of the df " +
    "histogram on randomized corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(2718)
    val words = (0 until 12).map(i => s"k$i")
    for (trial <- 1 to 3) {
      val docs = (1 to 20).map { i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(6))(
          words(rnd.nextInt(words.size))).mkString(" "))
      }
      val out = graft.llm.Dedup.dedupPairBudget(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getAs[Int]("df_bucket") -> r).toMap
      // replay: distinct 3-gram shingles per doc → df → bit-length bins
      val df = docs.flatMap { case (id, text) =>
        val t = text.split("\\s+")
        (if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
         else Set.empty[String]).map(_ -> id)
      }.groupBy(_._1).view.mapValues(_.size.toLong).values.toSeq
      val hist = df.groupBy(d =>
        java.lang.Long.toBinaryString(d).length - 1)
      val totalPm = df.map(d => d * (d - 1) / 2).sum.toDouble
      assert(out.keySet === hist.keySet, s"trial $trial")
      val cums = hist.toSeq.sortBy(_._1)
        .scanLeft(0L) { case (a, (_, ds)) =>
          a + ds.map(d => d * (d - 1) / 2).sum }.tail
      hist.toSeq.sortBy(_._1).zip(cums).foreach {
        case ((b, ds), cumPm) =>
          val pm = ds.map(d => d * (d - 1) / 2).sum
          assert(out(b).getAs[Long]("n_shingles") === ds.size.toLong,
            s"trial $trial b=$b")
          assert(out(b).getAs[Long]("doc_slots") === ds.sum,
            s"trial $trial b=$b")
          assert(out(b).getAs[Long]("pair_mass") === pm,
            s"trial $trial b=$b")
          if (totalPm > 0) {
            assert(out(b).getAs[Double]("pair_share") === r4(pm / totalPm))
            assert(out(b).getAs[Double]("cum_pair_share") ===
              r4(cumPm / totalPm), s"trial $trial b=$b")
          }
      }
    }
  }

  test("events_concurrency agrees with a plain-Scala replay of " +
    "sessionization + interval stabbing on randomized activity") {
    import spark.implicits._
    val rnd = new scala.util.Random(55555)
    for (trial <- 1 to 3) {
      val rows = (1 to 80).map { i =>
        (i.toLong, (1 + rnd.nextInt(6)).toLong, "view", 0.0,
          rnd.nextLong(40000L))
      }
      val df = rows.toDF("event_id", "user_id", "event_type", "value",
          "tsec")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), timestamp_seconds(col("tsec")).as("ts"))
      val out = graft.queries.Analytics4.eventsConcurrencyOn(df)
        .collect().map(r => r.getAs[Long]("hour_epoch_s") -> r).toMap
      // replay: per user, split at gaps > 1800 s, then stab hours
      case class S(sh: Long, eh: Long)
      val sessions = rows.groupBy(_._2).values.flatMap { es =>
        val ts = es.map(e => (e._5, e._1)).sortBy(identity).map(_._1)
        val splits = ts.zip(ts.head +: ts.init)
          .map { case (cur, prev) => cur - prev > 1800L }
        val b = Seq.newBuilder[Seq[Long]]
        var cur = Seq.empty[Long]
        ts.zip(splits.updated(0, true)).foreach { case (t, isNew) =>
          if (isNew && cur.nonEmpty) { b += cur; cur = Seq.empty }
          cur = cur :+ t
        }
        if (cur.nonEmpty) b += cur
        b.result().map(s => S(s.min * 1000 / 3600000,
          s.max * 1000 / 3600000))
      }.toSeq
      val hours = sessions.flatMap(s => (s.sh to s.eh).map(h => (h, s)))
      val byHour = hours.groupBy(_._1)
      assert(out.keySet === byHour.keySet.map(_ * 3600L), s"trial $trial")
      byHour.foreach { case (h, ss) =>
        val row = out(h * 3600L)
        assert(row.getAs[Long]("n_active") === ss.size.toLong,
          s"trial $trial h=$h")
        assert(row.getAs[Long]("n_started") ===
          ss.count(_._2.sh == h).toLong, s"trial $trial h=$h")
        assert(row.getAs[Long]("n_ended") ===
          ss.count(_._2.eh == h).toLong, s"trial $trial h=$h")
      }
    }
  }
}
