package graft

import graft.functions.{CharGramHashes, SortedIntersectCount}
import org.apache.spark.sql.functions._

/** SortedIntersectCount ≡ size(array_intersect) on sorted-distinct
  * inputs (the q26 shape), plus edge cases and codegen parity.
  */
class SortedIntersectCountSpec extends SparkSuite {

  test("matches size(array_intersect) over corpus gram-set pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 100)
      .select(col("doc_id"), array_sort(array_distinct(
        CharGramHashes(lower(col("text")), 4))).as("hs"))
    val pairs = docs.as("a")
      .join(broadcast(docs.as("b")), col("a.doc_id") < col("b.doc_id"))
    val diff = pairs.select(
      SortedIntersectCount(col("a.hs"), col("b.hs")).as("fast"),
      size(array_intersect(col("a.hs"), col("b.hs"))).cast("long").as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("empty and disjoint inputs") {
    import spark.implicits._
    val df = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 5L, 9L), Seq(5L, 9L, 11L))).toDF("a", "b")
    val got = df.select(SortedIntersectCount(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 0L, 0L, 3L, 2L))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 7L), Seq(2L, 7L, 8L))).toDF("a", "b")
    // factoryMode NO_CODEGEN forces the interpreted nullSafeEval
    // path (wholeStage=false alone still runs generated projections)
    def vals(codegen: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(SortedIntersectCount(col("a"), col("b")))
        .collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
  }
}
