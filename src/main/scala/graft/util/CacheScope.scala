package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Scoped, REFCOUNTED lifetime for operator-internal `persist`s.
  *
  * Several operators persist an intermediate (LSH signatures, range-
  * partitioned rank input, shingle tables) because the plan forks
  * above it — the persist is load-bearing for either cost (self-join
  * branches would recompute the dominant stage) or correctness
  * (repartitionByRange RESAMPLES its boundaries per branch when
  * unpinned, see Ranking). Those caches must outlive the operator
  * call (the returned DataFrame is lazy) but NOT the query: a
  * long-lived session running the whole registry (Verify runs ~395
  * queries in one SparkSession) would otherwise accumulate every
  * intermediate cache block for the life of the process.
  *
  * Refcounting (round-5 fix): concurrent queries may persist
  * LOGICALLY IDENTICAL intermediates — q_ljung_box, q_cooks_distance
  * and q_breusch_pagan all persist the same daily-revenue series.
  * Spark's CacheManager plan-matches them onto ONE cache entry
  * (sameResult ignores alias names), so a naive per-thread unpersist
  * drops the shared entry while a sibling query is mid-flight
  * (measured: a concurrent Verify dump returned an EMPTY
  * q_cooks_distance whenever its scope raced q_breusch_pagan's).
  * Entries are therefore keyed by the session + the analyzed plan's
  * canonicalized form — EXACTLY CacheManager's match granularity —
  * and refcounted across threads: a scope close decrements, and only
  * the LAST scope out unpersists. A caller persisting an equal plan
  * with the SAME column names adopts the stored DataFrame; one whose
  * aliases differ keeps its own (un-persisted) DataFrame, which
  * Spark's plan-matching serves from the shared cache anyway.
  *
  * Already-persisted EXTERNAL inputs (e.g. a warmed service-mode
  * table passed straight into an operator) still pass through
  * untouched — re-persisting them only emits "already cached" WARNs,
  * and registering them would wrongly unpersist the long-lived warm
  * cache when a scope closes.
  */
object CacheScope {

  private type Key = (Int, LogicalPlan)

  private final class Entry(val owner: DataFrame) {
    var refs: Int = 0
    /** one representative DataFrame per output-name vector, so
      * same-named callers share an object and differently-aliased
      * callers are never handed columns they cannot resolve */
    val byNames: mutable.Map[Seq[String], DataFrame] = mutable.Map.empty
  }

  private val entries = new java.util.HashMap[Key, Entry]()

  private val reg = new ThreadLocal[ArrayBuffer[Key]] {
    override def initialValue(): ArrayBuffer[Key] = ArrayBuffer.empty
  }

  /** Nesting depth of withScope on this thread — persist() outside any
    * scope must NOT register (nothing would ever drain the record:
    * round-5 advice item — direct operator/test/notebook use leaked a
    * map entry and pinned the cache for session life). */
  private val depth = new ThreadLocal[Int] { override def initialValue(): Int = 0 }

  private def keyOf(df: DataFrame): Key =
    (System.identityHashCode(df.sparkSession),
      df.queryExecution.analyzed.canonicalized)

  /** Persist `df` (or adopt the live cache of a plan-equal DataFrame
    * another scope persisted) and register it with the current
    * thread's scope. */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    // No scope active: persist for the caller but register NOTHING —
    // the thread-local buffer is only drained by withScope, so a
    // record here would leak and pin the cache for session life
    // (round-5 advice item). Lifetime is the caller's to manage
    // (df.unpersist()).
    //
    // Ordering hazard (round-6 advice): if a LIVE SCOPED entry already
    // caches this plan, `df.storageLevel` reads non-NONE (Spark's
    // lookup is plan-keyed, not object-keyed), so a plain early-return
    // would hand the scopeless caller a cache that silently vanishes
    // when that scope closes. Taking a permanent reference on the
    // entry instead gives the scopeless caller the session lifetime
    // scopeless persist has always meant — the entry stays live after
    // every scope closes, exactly as if the scopeless persist had won
    // the race and run first (that order already pins for session
    // life via the pass-through branch below).
    if (depth.get() == 0) {
      entries.synchronized {
        val existing = entries.get(keyOf(df))
        if (existing != null) {
          existing.refs += 1 // never decremented: session-lifetime pin
          return existing.byNames.getOrElseUpdate(df.schema.fieldNames.toSeq, df)
        }
      }
      if (df.storageLevel == StorageLevel.NONE) df.persist(level)
      return df
    }
    val key = keyOf(df)
    val names = df.schema.fieldNames.toSeq
    entries.synchronized {
      val existing = entries.get(key)
      // ORDER MATTERS, and it is the reverse of what a naive external-
      // cache guard would do: Spark's `df.storageLevel` is PLAN-KEYED
      // (CacheManager lookup by canonicalized plan, not object), so
      // while a scoped entry is live, a sibling's FRESH plan-equal
      // DataFrame also reports a non-NONE storageLevel. Checking
      // storageLevel before the entry map would therefore bounce every
      // legitimate adoption (measured: the CacheScopeSpec refcount race
      // re-appears). A genuinely caller-managed cache persisted BEFORE
      // any scope entry exists still passes through untouched below —
      // and one persisted AFTER a plan-equal scoped entry was already a
      // CacheManager no-op ("already cached"), so the shared-entry
      // lifetime hazard lives in Spark's plan-keyed cache itself, not
      // in this refcount.
      if (existing != null) {
        existing.refs += 1
        reg.get() += key
        existing.byNames.getOrElseUpdate(names, df)
      } else if (df.storageLevel != StorageLevel.NONE) {
        df // externally cached (warm table / caller-managed): hands off
      } else {
        df.persist(level)
        val e = new Entry(df)
        e.refs = 1
        e.byNames(names) = df
        entries.put(key, e)
        reg.get() += key
        df
      }
    }
  }

  /** Run `body` (build a DataFrame AND execute its action), then
    * release every cache `body` registered on this thread; an entry is
    * actually unpersisted only when no other in-flight scope still
    * holds it. */
  def withScope[T](body: => T): T = {
    val buf = reg.get()
    val before = buf.length
    depth.set(depth.get() + 1)
    try body
    finally {
      depth.set(depth.get() - 1)
      val mine = buf.slice(before, buf.length)
      buf.remove(before, buf.length - before)
      entries.synchronized {
        mine.foreach { key =>
          val e = entries.get(key)
          if (e != null) {
            e.refs -= 1
            if (e.refs <= 0) {
              entries.remove(key)
              e.owner.unpersist(false)
            }
          }
        }
      }
    }
  }
}
