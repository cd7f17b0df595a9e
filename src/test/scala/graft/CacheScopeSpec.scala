package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel
import graft.util.CacheScope

/** CacheScope refcounting invariants (round-5 fix): two concurrent
  * scopes persisting LOGICALLY IDENTICAL plans share one cache entry,
  * and the entry survives until the LAST holder's scope closes —
  * the unpersist race that emptied q_cooks_distance whenever its
  * Verify dump overlapped q_breusch_pagan's (both persist the same
  * daily-revenue series; Spark's CacheManager plan-matches them onto
  * one entry, so the old per-thread unconditional unpersist dropped
  * it under a sibling mid-flight query).
  */
class CacheScopeSpec extends AnyFunSuite {
  import TestSpark._

  private def plan() = {
    import spark.implicits._
    Seq(1, 2, 3, 4, 5).toDF("v").groupBy($"v" % 2 as "k")
      .count().filter($"k" >= 0)
  }

  test("plan-equal persists share one refcounted entry; last scope out unpersists") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val aHeld = new java.util.concurrent.CountDownLatch(1)
    @volatile var cachedWhileBHolds = false
    @volatile var bDf: org.apache.spark.sql.DataFrame = null

    val b = new Thread(() => {
      CacheScope.withScope {
        aHeld.await()
        bDf = CacheScope.persist(plan()) // adopts A's entry
        bDf.count()
        gate.countDown() // let A's scope close while B still holds
        Thread.sleep(200)
        cachedWhileBHolds = bDf.storageLevel != StorageLevel.NONE
      }
    })
    b.start()
    CacheScope.withScope {
      val a = CacheScope.persist(plan())
      a.count()
      aHeld.countDown()
      gate.await() // close A's scope only after B registered
    }
    b.join()
    assert(cachedWhileBHolds,
      "A's scope close must NOT unpersist the shared entry while B holds it")
    assert(bDf.storageLevel == StorageLevel.NONE,
      "the last scope out must unpersist the shared entry")
  }

  test("persist outside any scope registers nothing (caller-managed lifetime)") {
    // round-5 advice item: a scopeless persist used to create a global
    // refcounted record nothing ever drained — pinning the cache for
    // session life AND letting a later scope's close drop a cache the
    // direct caller still relied on.
    val df = CacheScope.persist(plan())
    df.count()
    assert(df.storageLevel != StorageLevel.NONE, "scopeless persist must still cache")
    try {
      // a subsequent scope persisting the SAME plan must not adopt-and-
      // own the scopeless cache: its close must leave the cache alive
      CacheScope.withScope { CacheScope.persist(plan()).count() }
      assert(df.storageLevel != StorageLevel.NONE,
        "a scope closing over a plan-equal frame must not drop the scopeless cache")
    } finally df.unpersist(true)
  }

  test("externally cached inputs pass through unregistered") {
    val ext = plan()
    ext.persist(StorageLevel.MEMORY_AND_DISK)
    ext.count()
    try {
      CacheScope.withScope {
        CacheScope.persist(ext).count()
      }
      assert(ext.storageLevel != StorageLevel.NONE,
        "a caller-managed cache must survive scope close")
    } finally ext.unpersist(true)
  }

  test("scopeless persist AFTER a live scoped entry survives that scope's close") {
    // round-6 advice item: the reverse order of the test above —
    // df.storageLevel is PLAN-keyed, so with a live scoped entry a
    // scopeless persist used to read "already cached", register
    // nothing, and silently lose its cache when the scope closed.
    // Now it takes a permanent (session-lifetime) reference on the
    // entry, the semantics scopeless persist has always promised.
    import spark.implicits._
    def p() = Seq(10, 20, 30, 40).toDF("v")
      .groupBy($"v" % 3 as "k").count().filter($"k" >= 0)
    @volatile var outside: org.apache.spark.sql.DataFrame = null
    CacheScope.withScope {
      val scoped = CacheScope.persist(p())
      scoped.count()
      // scopeless call must run with depth==0 → separate thread
      val t = new Thread(() => {
        outside = CacheScope.persist(p())
        outside.count()
      })
      t.start(); t.join()
    }
    try assert(outside.storageLevel != StorageLevel.NONE,
      "the scoped entry's close must not drop a cache a scopeless caller adopted")
    finally outside.unpersist(true)
  }
}
