package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.state.{OffsetStore, SchemaHistory}

/** Offset / schema-history FILE migration (r16, verdict task 2) —
  * the reference's `bigquery.migrate-offset-file` /
  * `bigquery.migrate-history-file` one-time imports
  * (BigqueryOffsetBackingStore.java:163-185,
  * BigquerySchemaHistory.java:226-240) with load-only-if-empty
  * semantics, proven idempotent on re-run. */
class MigrationSpec extends AnyFunSuite with SparkFixture {

  /** Kafka Connect FileOffsetBackingStore fixture: a Java-serialized
    * HashMap<byte[], byte[]> of UTF-8 key/value bytes. */
  private def writeOffsetFile(path: String,
                              entries: Map[String, String]): Unit = {
    val m = new java.util.HashMap[Array[Byte], Array[Byte]]()
    entries.foreach { case (k, v) =>
      m.put(k.getBytes("UTF-8"), if (v == null) null else v.getBytes("UTF-8"))
    }
    val out = new java.io.ObjectOutputStream(
      Files.newOutputStream(Paths.get(path)))
    try out.writeObject(m) finally out.close()
  }

  test("offset migration: file HashMap lands as one generation, idempotent") {
    val dir = tmpDir("migrate_off_")
    val file = s"$dir/file.offsets"
    writeOffsetFile(file, Map(
      "[\"srv\",{\"server\":\"s1\"}]" -> "{\"lsn\":12345}",
      "[\"srv\",{\"server\":\"s2\"}]" -> "{\"lsn\":99}"))
    val store = new OffsetStore(s"$dir/offsets", spark)
    assert(store.migrateFromFile(file))
    assert(store.load() === Map(
      "[\"srv\",{\"server\":\"s1\"}]" -> "{\"lsn\":12345}",
      "[\"srv\",{\"server\":\"s2\"}]" -> "{\"lsn\":99}"))
    // idempotent: re-run is a no-op (load-only-if-empty), even with a
    // DIFFERENT file — the store is no longer empty
    writeOffsetFile(file, Map("other" -> "x"))
    assert(!store.migrateFromFile(file))
    assert(!new OffsetStore(s"$dir/offsets", spark).migrateFromFile(file))
    assert(store.load().size === 2)
  }

  test("offset migration: an empty file map migrates ONCE (marker generation)") {
    // ADVICE r16: the empty parsed map used to leave the store empty,
    // so a later call — even with a different, non-empty file — would
    // migrate again, deviating from the reference's one-shot
    // migrate-on-table-creation. The zero-row marker generation makes
    // the one-shot structural.
    val dir = tmpDir("migrate_off_empty_")
    val empty = s"$dir/empty.offsets"
    writeOffsetFile(empty, Map.empty)
    val store = new OffsetStore(s"$dir/offsets", spark)
    assert(store.migrateFromFile(empty))
    assert(store.load() === Map.empty)
    val full = s"$dir/full.offsets"
    writeOffsetFile(full, Map("k" -> "v"))
    assert(!store.migrateFromFile(full))
    assert(!new OffsetStore(s"$dir/offsets", spark).migrateFromFile(full))
    assert(store.load() === Map.empty)
    // the store still works as a store after the marker
    store.put(Map("live" -> "1"))
    assert(store.load() === Map("live" -> "1"))
  }

  test("offset migration: missing file is a warn-and-skip no-op") {
    val dir = tmpDir("migrate_off_miss_")
    val store = new OffsetStore(s"$dir/offsets", spark)
    assert(!store.migrateFromFile(s"$dir/does_not_exist"))
    assert(store.load() === Map.empty)
  }

  test("offset migration: non-empty store is never touched") {
    val dir = tmpDir("migrate_off_full_")
    val file = s"$dir/file.offsets"
    writeOffsetFile(file, Map("k" -> "from_file"))
    val store = new OffsetStore(s"$dir/offsets", spark)
    store.put(Map("k" -> "live"))
    assert(!store.migrateFromFile(file))
    assert(store.load() === Map("k" -> "live"))
  }

  test("offset migration: a serialized non-HashMap throws") {
    val dir = tmpDir("migrate_off_bad_")
    val file = s"$dir/file.offsets"
    val out = new java.io.ObjectOutputStream(
      Files.newOutputStream(Paths.get(file)))
    try out.writeObject("not a map") finally out.close()
    val store = new OffsetStore(s"$dir/offsets", spark)
    intercept[IllegalStateException](store.migrateFromFile(file))
    assert(store.load() === Map.empty)
  }

  test("offset migration: classes outside the allowlist are refused") {
    // the offset file is untrusted input — only HashMap and byte[]
    // may deserialize (the reference's SafeObjectInputStream stance);
    // any other class must be rejected BEFORE instantiation
    val dir = tmpDir("migrate_off_gadget_")
    val file = s"$dir/file.offsets"
    val evil = new java.util.ArrayList[String](); evil.add("x")
    val out = new java.io.ObjectOutputStream(
      Files.newOutputStream(Paths.get(file)))
    try out.writeObject(evil) finally out.close()
    val store = new OffsetStore(s"$dir/offsets", spark)
    intercept[java.io.InvalidClassException](store.migrateFromFile(file))
    assert(store.load() === Map.empty)
  }

  test("history migration: JSON lines in order, empty lines skipped, idempotent") {
    val dir = tmpDir("migrate_hist_")
    val file = s"$dir/history.jsonl"
    val lines = Seq(
      """{"ddl":"CREATE TABLE t (a INT)"}""",
      "",
      """{"ddl":"ALTER TABLE t ADD COLUMN b INT"}""",
      """{"ddl":"ALTER TABLE t ADD COLUMN c INT"}""",
      "")
    Files.write(Paths.get(file),
      lines.mkString("\n").getBytes("UTF-8"))
    val hist = new SchemaHistory(s"$dir/history", spark)
    assert(!hist.exists)
    assert(hist.migrateFromFile(file) === 3)
    assert(hist.exists)
    // exact original order, empty lines dropped
    assert(hist.replay() === lines.filter(_.nonEmpty))
    // idempotent: the history is non-empty now, so re-run no-ops
    assert(hist.migrateFromFile(file) === 0)
    assert(hist.replay().size === 3)
    // records APPENDED after a migration keep extending the same log
    hist.record("""{"ddl":"ALTER TABLE t DROP COLUMN c"}""")
    assert(hist.replay().size === 4)
    assert(hist.replay().last.contains("DROP COLUMN"))
  }

  test("history migration: missing file is a no-op") {
    val dir = tmpDir("migrate_hist_miss_")
    val hist = new SchemaHistory(s"$dir/history", spark)
    assert(hist.migrateFromFile(s"$dir/nope.jsonl") === 0)
    assert(!hist.exists)
  }
}
