package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.functions._

import graft.util.CacheSlot

/** CacheSlot's one-generation contract, including the plan-equivalence
  * hazard: Spark's `unpersist` removes CacheManager entries by PLAN
  * EQUIVALENCE, so a naive swap(prev→next) over the SAME data evicts
  * the entry `next` just registered — every invocation after the first
  * silently runs uncached (measured as q169's pair stage re-evaluating
  * its encode tree per pair: 28 s vs 0.5 s at the 10× fixture).
  */
class CacheSlotSpec extends SparkSuite {

  private def cachedInPlan(df: DataFrame): Boolean =
    df.queryExecution.withCachedData.collect {
      case i: InMemoryRelation => i
    }.nonEmpty

  private def build(): DataFrame =
    spark.range(100).select(col("id"), (col("id") * 2).as("v"))

  test("repeat swap over an equivalent plan keeps the shared cache entry") {
    val slot = new CacheSlot
    val g1 = slot.swap(build().cache())
    try {
      assert(cachedInPlan(g1), "first generation must register a cache entry")
      val g2 = slot.swap(build().cache())
      assert(cachedInPlan(g2),
        "equivalent-plan re-swap must NOT evict the just-registered entry")
    } finally {
      slot.swap(spark.range(1).toDF()).unpersist(blocking = true)
      spark.catalog.clearCache()
    }
  }

  test("swap to a different plan unpersists the previous generation") {
    val slot = new CacheSlot
    val g1 = slot.swap(build().cache())
    try {
      assert(cachedInPlan(g1))
      val other = spark.range(50).select((col("id") + 1).as("w")).cache()
      slot.swap(other)
      assert(!cachedInPlan(build()),
        "previous generation's entry must be gone after a real swap")
      assert(cachedInPlan(other), "new generation must stay cached")
    } finally {
      spark.catalog.clearCache()
    }
  }
}
