package graft.util

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame

/** One-generation cache handle for query builders that return LAZY
  * DataFrames over a `.cache()`d intermediate.
  *
  * The cache must outlive the builder call (the consumer executes the
  * returned plan later), so it cannot be unpersisted on the way out —
  * but a long-lived session invoking the builder repeatedly (Bench runs
  * each query 3×; a library consumer composes closures) would otherwise
  * accumulate a storage-memory entry per invocation. `swap` pins the
  * invariant instead: at most ONE generation is ever live — each call
  * unpersists the PREVIOUS invocation's entry (non-blocking; in-flight
  * jobs on the old plan just lose the cache and recompute).
  */
final class CacheSlot {
  private val ref = new AtomicReference[DataFrame]

  /** Register `next` (typically already `.cache()`d) as the live
    * generation, unpersisting the previous one. Returns `next`.
    *
    * The previous generation is unpersisted ONLY when its plan is not
    * equivalent to `next`'s: Spark's `unpersist` removes CacheManager
    * entries by PLAN EQUIVALENCE, so for a repeat invocation over the
    * same data (Bench's three passes, a library consumer re-calling a
    * builder) the old frame's unpersist would evict the entry the new
    * frame just registered — every invocation after the first silently
    * ran uncached. Equivalent plans share one cache entry, so keeping
    * it IS the one-generation invariant.
    */
  def swap(next: DataFrame): DataFrame = {
    Option(ref.getAndSet(next)).foreach { prev =>
      if (!prev.queryExecution.analyzed
          .sameResult(next.queryExecution.analyzed))
        prev.unpersist(blocking = false)
    }
    next
  }
}
