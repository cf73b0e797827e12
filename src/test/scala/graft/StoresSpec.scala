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
