package graft
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** One-off measurement harness for the link_jaccard collapse decision
  * (the BENCH_README r10-s3 numbers): the 10× smoke corpus is 90%
  * exact duplicates — the regime where the cross-table inverted index
  * pays quadratic bucket work per duplicate class unless collapsed. */
object LinkProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    val docs10 = ScaleSmoke.times10(Tables.documents(spark, dir), "doc_id", 1000000L)
    val l = docs10.filter(col("doc_id") % 2 === 0)
    val r = docs10.filter(col("doc_id") % 2 === 1)
    ScaleSmoke.t("link_jaccard 25k x 25k COLLAPSED")(
      Dedup.linkJaccard(l, r)
        .write.format("noop").mode("overwrite").save())
    ScaleSmoke.t("link_jaccard 25k x 25k DIRECT")(
      Dedup.linkJaccard(l, r, collapseThreshold = 0.0)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
