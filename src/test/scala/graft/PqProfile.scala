package graft
import graft.llm.Ann

/** One-off PQ recall/cost sweep at sf0.01 — picks the default knobs.
  * Run: `sbt "Test/runMain graft.PqProfile"`. */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val brute = Ann.annTopK(emb, nQueries = 10, k = 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for {
      (m, ksub) <- Seq((8, 16), (8, 32), (16, 16))
      rf <- Seq(4, 8)
      iters <- Seq(2, 3)
    } {
      val t0 = System.nanoTime()
      val pq = Ann.annPqTopK(emb, nQueries = 10, k = 10, m = m, ksub = ksub,
        iters = iters, refineFactor = rf)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"=== m=$m ksub=$ksub rf=$rf iters=$iters " +
        f"recall=${(pq & brute).size.toDouble / brute.size}%.2f time=$dt%.1f s")
    }
    for ((nlist, nprobe) <- Seq((16, 4), (16, 8), (32, 8))) {
      val t0 = System.nanoTime()
      val r = Ann.annIvfPqTopK(emb, nQueries = 10, k = 10,
        nlist = nlist, nprobe = nprobe)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"=== ivfpq nlist=$nlist nprobe=$nprobe " +
        f"recall=${(r & brute).size.toDouble / brute.size}%.2f time=$dt%.1f s")
    }
    spark.stop()
  }
}
