package graft

import java.nio.file.Files

import graft.queries.PipelineOpsQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Proves the 100 TB claim behind q75: writing a table clustered by
  * the Morton/Z-order key makes a 2-D range predicate prune at the
  * parquet ROW-GROUP level, where a natural-order layout cannot.
  *
  * Method: write lineitem twice with small row groups (64 KB, so the
  * fixture spans many groups) — (a) natural order, (b)
  * repartitionByRange + sortWithinPartitions on the interleave key —
  * then apply the same 2-D box predicate to both. The parquet reader
  * skips row groups whose column min/max stats miss the predicate, so
  * the SCAN's numOutputRows (rows surviving row-group pruning +
  * pushed filters) is the pruning measurement. Same rows out either
  * way; far fewer rows READ from the clustered layout.
  */
class ZOrderLayoutSpec extends SparkSuite {

  // sf0.01 (60k rows): the 6k-row fixture fits in so few 64 KB row
  // groups that the pruning ratio sits at the assertion boundary
  private val dir = "/root/testdata/sf0.01"

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes row groups a natural layout reads") {
    val base = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qb"),
        (col("l_partkey") % 64).as("pb"))
      .withColumn("z", PipelineOpsQueries.mortonCode(col("qb"), col("pb")))
    val natural = Files.createTempDirectory("graft-zorder-nat").toString
    val zordered = Files.createTempDirectory("graft-zorder-z").toString
    try {
      // 64 KB row groups: the 6k-row fixture spans dozens of groups,
      // standing in for the thousands of row groups of a real file
      base.coalesce(1).write
        .option("parquet.block.size", 64 * 1024)
        .mode("overwrite").parquet(natural)
      base.repartitionByRange(4, col("z")).sortWithinPartitions("z")
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite").parquet(zordered)

      def box(path: String): DataFrame =
        spark.read.parquet(path)
          .where(col("qb").between(10, 13) && col("pb").between(20, 23))

      val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val (natRows, zRows) = (scanOutputRows(box(natural)), scanOutputRows(box(zordered)))
        info(s"scan rows after row-group pruning: natural=$natRows z-ordered=$zRows")
        // identical answers from both layouts
        assert(box(natural).agg(count(lit(1)), sum("l_orderkey")).collect().toSeq ===
          box(zordered).agg(count(lit(1)), sum("l_orderkey")).collect().toSeq)
        // the natural layout reads essentially everything (quantity is
        // uniform per row, so every row group's min/max spans the box);
        // the z-ordered layout must skip most row groups
        assert(zRows < natRows / 2,
          s"z-order pruning ineffective: scanned $zRows vs natural $natRows")
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    } finally {
      graft.util.FileUtils.deleteRecursively(java.nio.file.Paths.get(natural))
      graft.util.FileUtils.deleteRecursively(java.nio.file.Paths.get(zordered))
    }
  }
}
