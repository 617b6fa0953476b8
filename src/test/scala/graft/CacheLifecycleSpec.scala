package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 verdict #2: the dedup family pins cached intermediates
  * (tokenSetGroups, prefix candidates) and a localCheckpointed memo per
  * (session, sfDir). `LlmOps.unpersistAll` is the eviction seam; this spec
  * proves (a) eviction actually releases the pinned storage — both
  * CacheManager entries and the memo's checkpointed RDD blocks — and
  * (b) sweeping a SECOND sfDir then evicting leaves nothing behind, so a
  * long-lived multi-tenant session does not accumulate pinned storage per
  * corpus. Assertions are per-object (storage levels, registry counts),
  * not global block counts, so other suites sharing the session can't
  * race them.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def persistentRddCount(): Int =
    s.sparkContext.getPersistentRDDs.size

  test("unpersistAll releases dedup caches and memo checkpoint blocks") {
    // build the full memoized pipeline at sf0.001
    assert(TestSpark.q("dedup_canonical").count() > 0)
    val pinnedAfterBuild = persistentRddCount()
    assert(pinnedAfterBuild > 0, "build should have pinned storage")

    val evicted = ops.LlmOps.unpersistAll(s)
    assert(evicted >= 2,
      s"expected at least groups cache + memo checkpoint, evicted $evicted")
    // a second call finds nothing — the registries are actually drained
    assert(ops.LlmOps.unpersistAll(s) == 0)

    // the blocking unpersists must have released the blocks this module
    // pinned: strictly fewer persistent RDDs than right after the build
    assert(persistentRddCount() < pinnedAfterBuild,
      "eviction should release persistent RDD blocks")

    // queries rebuild transparently after eviction
    assert(TestSpark.q("dedup_canonical").count() > 0)
    ops.LlmOps.unpersistAll(s)
  }

  test("second sfDir sweep does not accumulate pinned storage after eviction") {
    assert(TestSpark.q("dedup_canonical").count() > 0)
    ops.LlmOps.unpersistAll(s)
    val baseline = persistentRddCount()

    // sweep a different corpus in the same session, then evict
    assert(SparkEntry.queries("dedup_canonical")(s, "/root/testdata/sf0.01")
      .count() > 0)
    assert(persistentRddCount() > baseline,
      "second corpus should pin fresh storage while in use")
    val evicted = ops.LlmOps.unpersistAll(s)
    assert(evicted >= 2)
    assert(persistentRddCount() <= baseline,
      "after eviction the second corpus must leave no pinned storage")
  }

  test("tracked cache storage level drops to NONE after eviction") {
    val groups = ops.LlmOps.tokenSetGroups(s, TestSpark.sf)
    groups.count()
    assert(groups.storageLevel != StorageLevel.NONE, "cache should be active")
    ops.LlmOps.unpersistAll(s)
    assert(groups.storageLevel == StorageLevel.NONE,
      "unpersistAll must clear the CacheManager entry for the groups plan")
  }
}
