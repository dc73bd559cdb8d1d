package graft

import java.nio.file.Files

import graft.tools.CurationPipeline
import org.apache.spark.sql.functions._

/** The composed curation funnel on sf0.001: monotone stage counts,
  * split disjointness/completeness, and the per-stage invariants
  * (quality floor holds, no duplicate canonical forms, no eval-slice
  * doc or contaminated doc in the output).
  */
class CurationPipelineSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("funnel counts are monotone and splits partition the output") {
    val out = Files.createTempDirectory("graft-curation").toString
    try {
      val f = CurationPipeline.run(spark, dir, out)
      assert(f.total > 0)
      assert(f.total >= f.langKept && f.langKept >= f.qualityKept &&
        f.qualityKept >= f.exactKept && f.exactKept >= f.nearDupKept &&
        f.nearDupKept >= f.decontaminated)
      assert(f.decontaminated === f.train + f.valN + f.test)
      assert(f.decontaminated > 0 && f.train > f.valN && f.train > f.test)

      val parts = Seq("train", "val", "test")
        .map(s => spark.read.parquet(s"$out/$s"))
      // disjoint + complete by doc_id
      val union = parts.reduce(_ union _)
      assert(union.count() === f.decontaminated)
      assert(union.select("doc_id").distinct().count() === f.decontaminated)

      // per-row invariants on the union
      assert(union.where(col("quality") < CurationPipeline.qualityFloor)
        .count() === 0)
      assert(union.where(col("doc_id") % 23 === 0).count() === 0) // eval slice out
      // no two surviving docs share a canonical form
      val canon = union.select(
        graft.functions.TextFunctions.canonicalKey(col("text")).as("k"))
      assert(canon.distinct().count() === f.decontaminated)

      // determinism: a second run reproduces the same funnel
      val out2 = Files.createTempDirectory("graft-curation2").toString
      try assert(CurationPipeline.run(spark, dir, out2) === f)
      finally graft.util.FileUtils.deleteRecursively(
        java.nio.file.Paths.get(out2))
    } finally graft.util.FileUtils.deleteRecursively(
      java.nio.file.Paths.get(out))
  }
}
