package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.SpanDedup
import graft.operators.IntervalJoin

/** Randomized brute-force cross-checks for the round-6 operators, fixed
  * seed (same pattern as AsofJoinSpec's randomized as-of check): generate
  * small random inputs, compute the expected result in plain Scala, and
  * demand the distributed operator agree exactly. */
class Round6PropertiesSpec extends AnyFunSuite with SparkFixture {

  test("interval join agrees with a plain-Scala range scan on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      // timestamps over ~3 days at second resolution; interval lengths
      // 0–2h (including empties); bin widths that divide nothing nicely
      val horizon = 3 * 86400
      val points = (1 to 120).map { i =>
        (i.toLong, rnd.nextInt(horizon).toLong)
      }
      val ivals = (1 to 60).map { j =>
        val s = rnd.nextInt(horizon).toLong
        (j.toLong + 1000, s, s + rnd.nextInt(7200).toLong)
      }
      val expected = (for {
        (pid, t) <- points
        (iid, s, e) <- ivals
        if t >= s && t < e
      } yield (pid, iid)).toSet
      def ts(c: org.apache.spark.sql.Column) =
        org.apache.spark.sql.functions.timestamp_seconds(c)
      val l = points.toDF("pid", "t")
        .select($"pid", ts($"t").as("p_ts"))
      val r = ivals.toDF("iid", "s", "e")
        .select($"iid", ts($"s").as("i_s"), ts($"e").as("i_e"))
      val binMicros = (rnd.nextInt(3600) + 60) * 1000L * 1000L
      val got = IntervalJoin.join(l, "p_ts", r, "i_s", "i_e",
          binMicros = binMicros)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got === expected, s"trial $trial (binMicros=$binMicros)")
    }
  }

  test("span dedup agrees with a plain-Scala simulation on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(1717)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 5) {
      val chunkTokens = 2 + rnd.nextInt(3) // 2..4
      val docs = (0 until 40).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // simulation: global first-occurrence over (doc_id, chunk_ord)
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.flatMap { case (id, text) =>
        val toks = text.split(" ")
        val kept = toks.grouped(chunkTokens).map(_.mkString(" "))
          .filter(ch => seen.add(ch)).toSeq
        if (kept.isEmpty) None else Some(id -> kept.mkString(" "))
      }.toMap
      val got = SpanDedup.dedupChunks(docs.toDF("doc_id", "text"), chunkTokens)
        .as[(Long, String)].collect().toMap
      assert(got === expected, s"trial $trial (chunkTokens=$chunkTokens)")
    }
  }
}
