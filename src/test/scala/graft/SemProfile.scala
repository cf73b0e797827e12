package graft

import org.apache.spark.sql.functions._

import graft.llm.Ann

/** Measurement harness for [[graft.llm.Ann.dedupSemantic]]: recall of the
  * within-cell search against brute-force cosine pairs, swept over nlist,
  * with [[graft.llm.Ann.dedupEmbed]]'s LSH as the comparator. Run:
  * `Test/runMain graft.SemProfile`.
  *
  * Measured at sf0.01 (5k vectors, dim 64): the corpus' near-dup pairs
  * all live at tau 0.4-0.5 (59 brute pairs at 0.4; ZERO above 0.6) —
  * mid-similarity territory where single-assignment cells are lossy:
  * recall 0.51 / 0.46 / 0.29 / 0.25 at nlist 4 / 8 / 16 / 32, vs LSH's
  * 0.83 with 49 pairs. SemDeDup's published regime is epsilon ~0.95
  * near-identical duplicates, which co-locate by construction (identical
  * vectors share an argmax cell at ANY clustering — LlmOpsSpec pins the
  * floor). The two operators split the similarity axis: LSH for mid-tau
  * near-dups, semantic cells for near-identical families at corpus scale
  * where even banded LSH's candidate volume hurts. */
object SemProfile {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val emb = Tables.embeddings(spark, dir)
    graft.functions.VectorFunctions.register(spark)
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", Ann.norm(col("v")))
    val brute = vecs.as("a")
      .join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(Ann.dot(col("a.v"), col("b.v"))
        / (col("a.nrm") * col("b.nrm")) >= 0.4)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .cache()
    val nb = brute.count()
    println(s"=== brute pairs tau=0.4: $nb")
    for (nl <- Seq(4, 8, 16, 32)) {
      val s = Ann.dedupSemantic(emb, nlist = nl).select("vec_a", "vec_b")
      val hit = s.join(brute, Seq("vec_a", "vec_b")).count()
      println(s"=== nlist=$nl pairs=${s.count()} recall=${hit.toDouble / nb}")
    }
    val lsh = Ann.dedupEmbed(emb).select("vec_a", "vec_b")
    val lhit = lsh.join(brute, Seq("vec_a", "vec_b")).count()
    println(s"=== lsh pairs=${lsh.count()} recall=${lhit.toDouble / nb}")
    spark.stop()
  }
}
