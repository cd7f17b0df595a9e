package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable.ArrayBuffer

/** Scoped lifetime for operator-internal `persist`s.
  *
  * Several operators persist an intermediate (LSH signatures, range-
  * partitioned rank input, shingle tables) because the plan forks
  * above it — the persist is load-bearing for either cost (self-join
  * branches would recompute the dominant stage) or correctness
  * (repartitionByRange RESAMPLES its boundaries per branch when
  * unpinned, see Ranking). Those caches must outlive the operator
  * call (the returned DataFrame is lazy) but NOT the query: a
  * long-lived session running the whole registry (Verify runs ~125
  * queries in one SparkSession) would otherwise accumulate every
  * intermediate cache block for the life of the process.
  *
  * The registry is THREAD-local, matching how a query is driven: the
  * DataFrame is built and its action launched from one caller thread,
  * so `withScope { build; action }` unpersists exactly the blocks
  * that query pinned, after its action finished — never another
  * in-flight query's (Verify dumps 4 queries concurrently; a global
  * clear could drop a cache another query's fork is mid-way through,
  * re-triggering the boundary-resample hazard the persist pins).
  * Outside any scope, `persist` degrades to a plain `df.persist`, so
  * direct operator use (tests, notebooks) is unchanged.
  */
object CacheScope {

  private val reg = new ThreadLocal[ArrayBuffer[DataFrame]] {
    override def initialValue(): ArrayBuffer[DataFrame] = ArrayBuffer.empty
  }

  /** Persist `df` and register it with the current thread's scope.
    * Already-persisted inputs (e.g. a warmed service-mode table
    * passed straight into an operator) pass through untouched —
    * re-persisting them only emits "already cached" WARNs, and
    * registering them would wrongly unpersist the long-lived warm
    * cache when this scope closes. */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(level)
      reg.get() += df
    }
    df
  }

  /** Run `body` (build a DataFrame AND execute its action), then
    * unpersist every DataFrame `body` registered on this thread. */
  def withScope[T](body: => T): T = {
    val buf = reg.get()
    val before = buf.length
    try body
    finally {
      buf.drop(before).foreach(_.unpersist(false))
      buf.remove(before, buf.length - before)
    }
  }
}
