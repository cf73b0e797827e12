package graft

// Scratch explain harness for the round-6 queries (not a test; run via
// `sbt "Test/runMain graft.ExplainR6 <name>"`).
object ExplainR6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.session
    val dir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.01")
    val names = args.filterNot(_.startsWith("/"))
    val sel = if (names.isEmpty) SparkEntry.queries.keySet else names.toSet
    SparkEntry.queries.filter(kv => sel(kv._1)).foreach { case (n, fn) =>
      println(s"\n================ $n ================")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
