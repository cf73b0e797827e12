package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.state.{OffsetStore, SchemaHistory}

class StoresSpec extends AnyFunSuite with SparkFixture {

  test("offset store: empty load, then latest value per key wins across generations") {
    val store = new OffsetStore(tmpDir("offsets_") + "/offsets", spark)
    assert(store.load() === Map.empty)
    store.put(Map("src/0" -> "lsn:100", "src/1" -> "lsn:5"))
    store.put(Map("src/0" -> "lsn:200"))
    assert(store.load() === Map("src/0" -> "lsn:200", "src/1" -> "lsn:5"))
  }

  test("offset store: a fresh instance over the same path resumes state") {
    val path = tmpDir("offsets_resume_") + "/offsets"
    new OffsetStore(path, spark).put(Map("k" -> "v1"))
    val reopened = new OffsetStore(path, spark)
    assert(reopened.load() === Map("k" -> "v1"))
    reopened.put(Map("k" -> "v2"))
    assert(new OffsetStore(path, spark).load() === Map("k" -> "v2"))
  }

  test("offset store compacts periodically and a fresh instance resumes after it") {
    val path = tmpDir("offsets_compact_") + "/offsets"
    val store = new OffsetStore(path, spark, compactEvery = 4)
    (0 until 10).foreach(i => store.put(Map("k" -> s"v$i", s"other$i" -> "x")))
    assert(store.load()("k") === "v9")
    // compactions at seq 4 and 8 bound the file count: the dir holds the
    // seq-8 compacted generation plus the seq-9 append, not 10 files
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(path))
      .toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .count(_.startsWith("part-")) // data files only, not .crc shadows
    assert(parts <= 3, s"compaction left $parts part files")
    // resume across instances, including writes after reopening
    val reopened = new OffsetStore(path, spark, compactEvery = 4)
    assert(reopened.load()("k") === "v9")
    reopened.put(Map("k" -> "v10"))
    assert(new OffsetStore(path, spark).load()("k") === "v10")
  }

  test("schema history: exists/recover surface and order-preserving compaction") {
    // surface parity with BigquerySchemaHistory.java:127-168
    // (storageExists / exists / recoverRecords)
    val path = tmpDir("hist_compact_") + "/history"
    val hist = new SchemaHistory(path, spark, compactEvery = 3)
    assert(!hist.storageExists && !hist.exists)
    (0 until 7).foreach(i => hist.record(s"DDL $i"))
    assert(hist.storageExists && hist.exists)
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    hist.recover(seen += _)
    assert(seen.toSeq === (0 until 7).map(i => s"DDL $i"))
    // a fresh instance appends after compaction without losing order
    val reopened = new SchemaHistory(path, spark)
    reopened.record("DDL 7")
    assert(reopened.replay() === (0 to 7).map(i => s"DDL $i"))
  }

  test("schema history: replay returns entries in append order") {
    val hist = new SchemaHistory(tmpDir("hist_") + "/history", spark)
    assert(hist.replay() === Seq.empty)
    hist.record("CREATE TABLE t (a INT)")
    hist.record("ALTER TABLE t ADD COLUMN b STRING")
    hist.record("ALTER TABLE t ALTER COLUMN a DROP NOT NULL")
    assert(hist.replay() === Seq(
      "CREATE TABLE t (a INT)",
      "ALTER TABLE t ADD COLUMN b STRING",
      "ALTER TABLE t ALTER COLUMN a DROP NOT NULL"))
  }
}
