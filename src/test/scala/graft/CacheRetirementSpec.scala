package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Shared

/** The session-cache retirement policy (round-13 verdict item 1): a
  * 207-query sweep must not accumulate dead persisted blocks across
  * queries — at sf10 that accumulation was ~55 G of scratch and the
  * single-JVM suite ENOSPC'd. Two mechanisms, both engine-level:
  * anonymous per-query transients are retired as soon as their query
  * finishes ([[Shared.retireTransients]]), and the memoized
  * cross-query families live under an LRU byte budget
  * ([[Shared.enforceBudget]]) — eviction drops the frame from the
  * memo too, so a late consumer transparently rebuilds it (visible
  * recompute, never a wrong answer). */
class CacheRetirementSpec extends AnyFunSuite {
  import TestSpark._

  test("retireTransients unpersists anonymous tracked frames") {
    val df = Shared.track(
      spark.range(0, 1000).toDF("x").persist(StorageLevel.MEMORY_AND_DISK))
    df.count()
    assert(df.storageLevel !== StorageLevel.NONE)
    Shared.retireTransients()
    // unpersist(false) is async on the block side but the storage
    // level flips synchronously
    assert(df.storageLevel === StorageLevel.NONE)
  }

  test("enforceBudget evicts LRU memo frames until under budget, " +
      "and an evicted family rebuilds on next access") {
    Shared.clear()
    // ranges differ: the cache manager matches CANONICALIZED plans
    // (aliases erased), so two identical ranges would share one cache
    // entry and unpersisting one would drop both
    val a = Shared.memoized(spark, "/cache-spec", "famA")(
      spark.range(0, 50000).toDF("x"))
    a.count()
    val b = Shared.memoized(spark, "/cache-spec", "famB")(
      spark.range(0, 60000).toDF("y"))
    b.count()
    // touch A again: B becomes the LRU frame
    assert(Shared.memoized(spark, "/cache-spec", "famA")(
      fail("famA must still be memoized")) eq a)
    def total = spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum
    val t0 = total
    assert(t0 > 0L)
    // a budget the session already exceeds by one byte: exactly the
    // LRU frame (B) must go, A must survive
    Shared.enforceBudget(spark, t0 - 1)
    assert(b.storageLevel === StorageLevel.NONE, "LRU frame not evicted")
    assert(a.storageLevel !== StorageLevel.NONE, "MRU frame wrongly evicted")
    // evicted family rebuilds: the memo no longer returns the old frame
    var rebuilt = false
    val b2 = Shared.memoized(spark, "/cache-spec", "famB") {
      rebuilt = true; spark.range(0, 10).toDF("y")
    }
    assert(rebuilt, "evicted family must rebuild on next access")
    assert(!(b2 eq b))
    // a generous budget evicts nothing
    val aBefore = a.storageLevel
    Shared.enforceBudget(spark, Long.MaxValue)
    assert(a.storageLevel === aBefore)
    Shared.clear()
  }

  test("clear drops everything: memo, stamps, and transients") {
    val m = Shared.memoized(spark, "/cache-spec2", "fam")(
      spark.range(0, 100).toDF("x"))
    m.count()
    val t = Shared.track(
      spark.range(0, 100).toDF("x").persist(StorageLevel.MEMORY_AND_DISK))
    t.count()
    Shared.clear()
    assert(m.storageLevel === StorageLevel.NONE)
    assert(t.storageLevel === StorageLevel.NONE)
  }
}
