package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout + partition pruning: at the 100 TB
  * tier, log/event tables are laid out `.../event_type=X/date=Y/` and a
  * filtered query must read ONLY the matching directories — pruning at
  * plan time, before any file is opened. This spec pins that the
  * partition filter lands in the scan's `partitionFilters` (not the
  * post-scan Filter) and that non-matching partitions contribute zero
  * files to the read.
  */
class PartitionPruningSpec extends SparkSuite {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))

  test("filter on a partition column prunes directories at plan time") {
    val out = Files.createTempDirectory("graft-part").toString
    try {
      queries.Tables.events(spark, "/root/testdata/sf0.001")
        .withColumn("day", to_date(col("ts")))
        .write.partitionBy("event_type", "day").mode("overwrite").parquet(out)

      val pruned = spark.read.parquet(out)
        .where(col("event_type") === "error")
      val scan = scanOf(pruned)

      // the predicate is a partitionFilter, so no row-level Filter work
      assert(scan.partitionFilters.exists(_.toString.contains("event_type")),
        s"partitionFilters=${scan.partitionFilters}")
      // only the matching directory's files are selected
      val all = scanOf(spark.read.parquet(out))
      assert(pruned.count() ===
        queries.Tables.events(spark, "/root/testdata/sf0.001")
          .where(col("event_type") === "error").count())
      val allFiles = all.relation.location.inputFiles.length
      val matchFiles = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files).length
      assert(matchFiles < allFiles,
        s"expected pruning: $matchFiles of $allFiles files")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
  }

  test("partition pruning composes with data-filter pushdown") {
    val out = Files.createTempDirectory("graft-part2").toString
    try {
      queries.Tables.events(spark, "/root/testdata/sf0.001")
        .write.partitionBy("event_type").mode("overwrite").parquet(out)
      val df = spark.read.parquet(out)
        .where(col("event_type") === "purchase" && col("value") > 50.0)
        .select("event_id", "value")
      val scan = scanOf(df)
      assert(scan.partitionFilters.exists(_.toString.contains("event_type")))
      // value predicate pushes to parquet row-group stats
      assert(scan.metadata("PushedFilters").contains("GreaterThan(value,50.0)"),
        scan.metadata("PushedFilters"))
      // column pruning: only the referenced data columns are read
      assert(scan.requiredSchema.fieldNames.toSet === Set("event_id", "value"),
        scan.requiredSchema.treeString)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
  }
}
