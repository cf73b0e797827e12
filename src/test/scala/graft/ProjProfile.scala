package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
object ProjProfile {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, dir)
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"=== $tag min=${ts.min}%.3f")
    }
    // current = the WIDE form embedProject ships (0.37 s here); the
    // rejected exploded form is kept as the comparison arm — posexplode
    // collapses the 1024-term projection into the Generate, whose child
    // evaluation is not codegen-fused (2.25 s measured on this box)
    time("current wide embedProject")(graft.llm.Ann.embedProject(emb)
      .write.format("noop").mode("overwrite").save())
    val scale = 1.0 / math.sqrt(16.0)
    def el(i: Int): Column = element_at(col("embedding"), i + 1).cast("double")
    val arr16 = array((0 until 16).map { j =>
      (0 until 64).map(i => el(i) * lit(graft.llm.Ann.projectSign(j * 64 + i)))
        .reduce(_ + _) * lit(scale)
    }: _*)
    time("rejected: array + posexplode")(
      emb.select(col("vec_id"), arr16.as("pv"))
        .select(col("vec_id"), posexplode(col("pv")).as(Seq("p", "value")))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
