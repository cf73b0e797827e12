package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names, for a fast local
    // re-check of just-touched entries (the driver always runs all)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // zlib-oracle precondition probe (r17, verdict task 5): check.py's
    // injected text_compressibility oracle assumes this JVM's
    // Deflater(6, nowrap) stream is byte-identical to Python's zlib raw
    // deflate at the same parameters. Dump the JVM-side compressed
    // bytes of a FIXED fixture — compressed right here, not through the
    // operator, so a mismatch can only mean a diverging zlib build,
    // never an operator bug. check.py byte-compares and, on divergence,
    // degrades that one entry to rows-only with a NAMED recorded cause
    // instead of a mystery hash mismatch.
    val fixture =
      "graft zlib probe: the quick brown fox jumps over the lazy dog 0123456789 " * 7
    val deflater = new java.util.zip.Deflater(6, true)
    deflater.setInput(fixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    deflater.finish()
    val buf = new Array[Byte](64 * 1024)
    val bos = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      bos.write(buf, 0, n)
    }
    deflater.end()
    val b64 = java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    Files.writeString(Paths.get(s"$outDir/zlib_probe.json"),
      s"""{"fixture_repeat": 7, "deflate_b64": ${q(b64)}}""")
    spark.stop()
  }
}
