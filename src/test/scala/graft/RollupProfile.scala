package graft
import org.apache.spark.sql.functions._
object RollupProfile {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"=== $tag min=${ts.min}%.3f med=${ts.sorted(Ordering.Double.TotalOrdering)(1)}%.3f")
    }
    time("two-phase rollup")(graft.queries.Analytics2.qRollupRevenue(spark, dir)
      .write.format("noop").mode("overwrite").save())
    // the old single-pass form for comparison
    def old = Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum((col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))))
          .cast("double").as("revenue"), count(lit(1)).as("n_lines"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("revenue"), col("n_lines"))
    time("single-pass rollup")(old.write.format("noop").mode("overwrite").save())
    val a = graft.queries.Analytics2.qRollupRevenue(spark, dir)
    println("=== equal: " + (a.exceptAll(old).isEmpty && old.exceptAll(a).isEmpty))
    spark.stop()
  }
}
