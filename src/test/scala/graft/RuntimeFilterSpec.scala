package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the row-level pruning path that
  * matters at 100 TB: a selective dim-side filter is turned into a
  * bloom filter applied to the fact scan BEFORE the join shuffle, so
  * non-matching fact rows never cross the wire. Spark's thresholds
  * (application side > 10 GB by default) target real clusters; the
  * spec lowers them to prove the INJECTION fires for our join shapes
  * and that results are unchanged.
  */
class RuntimeFilterSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = spark.conf
    val old = conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "false")
    // broadcast would bypass the runtime filter — force the shuffle
    // path the feature exists for
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderpriority") === "1-URGENT") // selective creation side
      val joined = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilterMightContain"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the filtered plan still computes the right answer
      val expected = lineitem.join(orders.hint("broadcast"),
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(joined.collect().map(_.getLong(1)).sum === expected)
    } finally {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        old.getOrElse("10GB"))
      conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
