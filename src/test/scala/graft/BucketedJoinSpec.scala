package graft

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located join: writing both sides bucketed on the join
  * key lets the sort-merge join run WITHOUT any shuffle Exchange — the
  * pre-partitioning pattern that, at cluster scale, turns every
  * fact-to-fact join on a shared key into a local merge.
  */
class BucketedJoinSpec extends SparkSuite {

  test("join of two tables bucketed on the key plans no Exchange") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // the SparkContext (and its warehouse) is shared with the suite
    // session — drop stale tables AND their managed locations up front
    val s2 = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucket-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      Seq("orders_b1", "orders_b2").foreach { t =>
        s2.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          s2.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        org.apache.commons.io.FileUtils.deleteQuietly(loc)
      }
      val orders = s2.read.parquet("/root/testdata/sf0.001/orders.parquet")
      orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b1")
      orders.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("v"))
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b2")

      val joined = s2.table("orders_b1").join(s2.table("orders_b2"), "o_custkey")
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"), physical)
      assert(!physical.contains("Exchange"),
        s"expected shuffle-free co-located join, got:\n$physical")
      // and it computes the right thing
      assert(joined.count() === orders.count())
    } finally {
      Seq("orders_b1", "orders_b2").foreach { t =>
        s2.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          s2.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        org.apache.commons.io.FileUtils.deleteQuietly(loc)
      }
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
