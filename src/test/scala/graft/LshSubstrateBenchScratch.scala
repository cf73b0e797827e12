package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Ann

/** Scratch A/B harness for the r17 session-cached LSH substrate
  * (verdict task 2) — run with Test/runMain graft.LshSubstrateBenchScratch
  * [sfDir]. Not a spec; a profiling tool backing the BENCH_README
  * ledger, the FoldBenchScratch convention.
  *
  * Times the four `*_lsh` driver entries in BOTH shapes at the bench
  * protocol (untimed warmup + 3 timed noop writes, min reported):
  *   A = the r16 in-query build (knnGraphLsh rebuilt inside every
  *       entry — the shape the committed r16 board priced), and
  *   B = the r17 session-store shape (SparkEntry.queries as shipped,
  *       substrate built once per JVM into a SessionStores warehouse).
  * The B warmup pays the one-time store build, exactly like the
  * bench's per-query warmup does for every other store-backed entry.
  */
object LshSubstrateBenchScratch {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def minOf3(fn: => DataFrame): Double = {
    noop(fn) // untimed warmup (codegen + any one-time store build)
    (1 to 3).map { _ =>
      val t0 = System.nanoTime(); noop(fn); (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkFixture.session
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)

    // A: the r16 in-query shapes, verbatim
    def inQueryGraph() = Ann.knnGraphLsh(emb, bitsPerBand = 3)
    val oldShapes: Seq[(String, () => DataFrame)] = Seq(
      ("knn_graph_lsh", () => inQueryGraph()),
      ("knn_kcore_lsh", () => Ann.knnKcore(emb,
        graph = Some(inQueryGraph().select("vec_id", "nbr_id")))),
      ("knn_components_lsh", () => Ann.knnComponents(emb,
        graph = Some(inQueryGraph().select("vec_id", "nbr_id")))),
      ("knn_edge_jaccard_lsh", () => Ann.knnEdgeJaccard(emb,
        graph = Some(inQueryGraph().select("vec_id", "nbr_id")))))

    // B: the shipped r17 entries (session-store substrate)
    val newShapes: Seq[(String, () => DataFrame)] = Seq(
      ("knn_graph_lsh", () => Ann.knnGraphLshQ(spark, dir)),
      ("knn_kcore_lsh", () => Ann.knnKcoreLshQ(spark, dir)),
      ("knn_components_lsh", () => Ann.knnComponentsLshQ(spark, dir)),
      ("knn_edge_jaccard_lsh", () => Ann.knnEdgeJaccardLshQ(spark, dir)))

    println(s"=== A/B at $dir (min of 3 after warmup) ===")
    var totA = 0.0
    var totB = 0.0
    oldShapes.zip(newShapes).foreach { case ((name, a), (_, b)) =>
      val ta = minOf3(a())
      val tb = minOf3(b())
      totA += ta; totB += tb
      println(f"$name%-22s in-query $ta%6.2f s   session-store $tb%6.2f s")
    }
    println(f"TOTAL                  in-query $totA%6.2f s   session-store $totB%6.2f s")
    spark.stop()
  }
}
