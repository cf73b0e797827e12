package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.state.SessionStores

class SessionStoresSpec extends AnyFunSuite with SparkFixture {

  test("warehouse builds once per (kind, dir) and reuses the path") {
    var builds = 0
    val a = SessionStores.warehouse("spec_kind", "/spec/dir")(_ => builds += 1)
    val b = SessionStores.warehouse("spec_kind", "/spec/dir")(_ => builds += 1)
    assert(builds === 1)
    assert(a.warehousePath === b.warehousePath)
    // a different dir is a different store
    val c = SessionStores.warehouse("spec_kind", "/spec/other")(_ => builds += 1)
    assert(builds === 2)
    assert(c.warehousePath !== a.warehousePath)
    // reset forgets the cache: the next call rebuilds (the escape hatch
    // for sessions that regenerate data under a cached input dir)
    SessionStores.reset()
    SessionStores.warehouse("spec_kind", "/spec/dir")(_ => builds += 1)
    assert(builds === 3)
  }

  test("repeat invocations of the store-backed driver queries are stable") {
    // each pair: first call builds the session store, second reuses it —
    // results must be identical (probe doesn't mutate; re-MERGE idempotent)
    def stable(q: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Unit = {
      val first = q(spark, sfDir).collect().toSet
      val second = q(spark, sfDir).collect().toSet
      assert(first === second)
    }
    stable(graft.cdc.MergePipeline.mergePartitionedQ)
    stable(graft.llm.Dedup.dedupIncrementalQ)
    stable(graft.llm.Dedup.dedupIncrementalMinhashQ)
    stable(graft.llm.Dedup.dedupIncrementalSimhashQ)
    stable(graft.llm.Ann.dedupEmbedIncrementalQ)
    stable(graft.llm.SpanDedup.dedupChunksIncrementalQ)
  }
}
