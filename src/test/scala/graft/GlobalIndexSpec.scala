package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalIndexSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("matches the single-partition window row_number exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val got = ext.GlobalIndex.withGlobalIndex(docs,
      Seq(col("n_chars").desc, col("doc_id").asc), 8)
      .select(col("doc_id"), col("global_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = docs
      .withColumn("global_idx",
        row_number().over(Window.orderBy(desc("n_chars"), asc("doc_id"))) - 1)
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong)).toMap
    assert(got == want)
  }

  test("keeps the range layout: N partitions, no single-partition funnel") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = ext.GlobalIndex.withGlobalIndex(docs,
      Seq(col("doc_id").asc), 8)
    assert(out.rdd.getNumPartitions == 8)
    // more than one partition actually carries rows (the window
    // formulation would put everything in one)
    val perPart = out.groupBy(spark_partition_id().as("pid"))
      .count().collect()
    assert(perPart.count(_.getLong(1) > 0) > 1)
  }

  test("deterministic run-to-run and on a different input layout") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    def run(df: org.apache.spark.sql.DataFrame) =
      ext.GlobalIndex.withGlobalIndex(df,
        Seq(col("n_chars").desc, col("doc_id").asc), 8)
        .select("doc_id", "global_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val a = run(docs)
    val b = run(docs.repartition(13))
    assert(a == b)
  }

  test("prefix sum matches the single-partition window sum exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val got = ext.GlobalIndex.withGlobalPrefixSum(docs,
      Seq(col("n_chars").desc, col("doc_id").asc), "n_chars", 8)
      .select(col("doc_id"), col("global_cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = docs
      .withColumn("global_cum",
        sum(col("n_chars")).over(Window
          .orderBy(desc("n_chars"), asc("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == want)
  }

  test("prefix sum is layout-independent and rejects non-long weights") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    def run(df: org.apache.spark.sql.DataFrame) =
      ext.GlobalIndex.withGlobalPrefixSum(df,
        Seq(col("n_chars").desc, col("doc_id").asc), "n_chars", 8)
        .select("doc_id", "global_cum")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(docs) == run(docs.repartition(13)))
    intercept[IllegalArgumentException] {
      ext.GlobalIndex.withGlobalPrefixSum(
        docs.withColumn("w", col("n_chars").cast("int")),
        Seq(col("doc_id").asc), "w", 4)
    }
  }

  test("empty input and index-column collision") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).where(lit(false))
    val out = ext.GlobalIndex.withGlobalIndex(docs, Seq(col("doc_id").asc), 4)
    assert(out.count() == 0)
    intercept[IllegalArgumentException] {
      ext.GlobalIndex.withGlobalIndex(
        spark.read.parquet(s"$sf/documents.parquet"),
        Seq(col("doc_id").asc), 4, idxCol = "doc_id")
    }
  }
}
