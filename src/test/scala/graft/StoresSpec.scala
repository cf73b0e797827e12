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

  test("stores tolerate a crash mid-compaction (new generation written, old not yet deleted)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // Compaction appends the merged generation BEFORE deleting superseded
    // files (ADVICE r4: overwrite-mode compaction wiped history if the
    // job died mid-write). Recreate the worst crash window by restoring
    // the superseded files after compact() — the dir then holds both the
    // old generations and the compacted one, and reads must not change.
    def partFiles(dir: String) = {
      val s = Files.list(Paths.get(dir))
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.startsWith("part-")).toSeq
      finally s.close()
    }
    def withRestore(dir: String)(body: => Unit): Unit = {
      val stash = Files.createTempDirectory("crash_stash_")
      val old = partFiles(dir)
      old.foreach(f => Files.copy(f, stash.resolve(f.getFileName),
        StandardCopyOption.REPLACE_EXISTING))
      body
      old.foreach(f => Files.copy(stash.resolve(f.getFileName), f,
        StandardCopyOption.REPLACE_EXISTING))
    }

    val oPath = tmpDir("offsets_crash_") + "/offsets"
    val store = new OffsetStore(oPath, spark, compactEvery = 1000)
    store.put(Map("k" -> "v1", "j" -> "a"))
    store.put(Map("k" -> "v2"))
    withRestore(oPath) { store.compact() }
    assert(store.load() === Map("k" -> "v2", "j" -> "a"))
    assert(new OffsetStore(oPath, spark).load() === Map("k" -> "v2", "j" -> "a"))

    val hPath = tmpDir("hist_crash_") + "/history"
    val hist = new SchemaHistory(hPath, spark, compactEvery = 1000)
    (0 until 5).foreach(i => hist.record(s"DDL $i"))
    withRestore(hPath) { hist.compact() }
    assert(hist.replay() === (0 until 5).map(i => s"DDL $i"))
    // and the next compact() cleans the duplicates up for good
    hist.compact()
    assert(hist.replay() === (0 until 5).map(i => s"DDL $i"))
    assert(new SchemaHistory(hPath, spark).replay() === (0 until 5).map(i => s"DDL $i"))
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
