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
    */
  def swap(next: DataFrame): DataFrame = {
    Option(ref.getAndSet(next)).foreach(_.unpersist(blocking = false))
    next
  }
}
