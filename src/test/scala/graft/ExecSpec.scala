package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

class ExecSpec extends AnyFunSuite with SparkFixture {

  test("materialize prefers a reliable checkpoint when a checkpoint dir is configured") {
    import spark.implicits._
    // no dir configured → localCheckpoint path (must still materialize)
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    assert(Exec.materialize(Seq(1, 2, 3).toDF("x")).count() === 3)

    val dir = tmpDir("ckpt_")
    spark.sparkContext.setCheckpointDir(dir)
    val df = Exec.materialize(Seq(1, 2, 3, 4).toDF("x"))
    assert(df.count() === 4)
    // reliable-checkpoint blocks landed under the configured dir — these
    // survive executor loss, unlike localCheckpoint's executor-local
    // blocks (ADVICE r4)
    val s = Files.walk(Paths.get(dir))
    val wrote =
      try s.iterator().asScala.exists(_.getFileName.toString.startsWith("rdd-"))
      finally s.close()
    assert(wrote, s"no rdd checkpoint dirs under $dir")
  }
}
