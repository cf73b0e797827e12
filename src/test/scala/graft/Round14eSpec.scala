package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ann

/** Round-14 wave 5: SNN edge-strength histogram (knn_edge_jaccard) —
  * worked-by-hand mutual-graph fixture plus a randomized plain-Scala
  * replay over an arbitrary injected substrate (the consumer never
  * sees embeddings when `graph` is supplied, so the fixtures drive it
  * with explicit edge frames). */
class Round14eSpec extends AnyFunSuite with SparkFixture {

  private val rnd = new Random(1418)

  private def graphDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    // inject both directions: the operator's mutual semi-join keeps
    // exactly the reciprocated pairs
    edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("vec_id", "nbr_id")
  }

  private def emptyEmb = {
    import spark.implicits._
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  }

  test("knn_edge_jaccard: triangle + pendant, worked by hand") {
    // N(1)={2,3} N(2)={1,3} N(3)={1,2,4} N(4)={3}
    val g = graphDf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    val got = Ann.knnEdgeJaccard(emptyEmb, graph = Some(g)).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toMap
    // (1,2): J=1/3 → b3; (1,3),(2,3): J=1/4 → b2; (3,4): J=0 → b0
    assert(got === Map(
      0L -> ((0.0, 1L, 0.25)),
      2L -> ((0.2, 2L, 0.5)),
      3L -> ((0.3, 1L, 0.25))))
  }

  test("knn_edge_jaccard randomized replay vs plain-Scala neighborhoods") {
    for (trial <- 1 to 3) {
      val n = 30
      val es = (for {
        a <- 1 to n; b <- (a + 1) to n
        if rnd.nextInt(6) == 0
      } yield (a.toLong, b.toLong)).toSeq
      if (es.nonEmpty) {
        val got = Ann.knnEdgeJaccard(emptyEmb, graph = Some(graphDf(es)))
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        val nbrs = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val want = es.map { case (a, b) =>
          val cmn = (nbrs(a) & nbrs(b)).size
          val j = cmn.toDouble / (nbrs(a).size + nbrs(b).size - cmn)
          math.floor(10.0 * j).toLong
        }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        assert(got === want, s"trial $trial")
      }
    }
  }
}
