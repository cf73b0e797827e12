package graft
import org.apache.spark.sql.functions._
object SespProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(graft.queries.Analytics8.eventsSessionProfile(spark, dir)) // warmup
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      noop(graft.queries.Analytics8.eventsSessionProfile(spark, dir))
      println(f"=== sesp iter $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
