package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries to plans/<outDir>/.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> [name1,name2,...]
  *
  * Writes plans/<outDir>/<name>_<tag>.txt for each requested query (all
  * queries when the list is omitted). Session config mirrors Bench so the
  * captured plan is the one the bench actually executes. Iterative
  * operators that checkpoint mid-query show a truncated lineage
  * (Scan ExistingRDD) past the checkpoint — that is the real executed
  * shape, not a capture artifact.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("r17")
    val tag = if (args.length > 1) args(1) else "plan"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Paths.get("plans", outDir)
    Files.createDirectories(base)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(base.resolve(s"${name}_$tag.txt"), txt)
          println(s"[plandump] $name ok (${txt.length} chars)")
        } catch { case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
