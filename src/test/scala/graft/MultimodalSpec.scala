package graft

import graft.multimodal.{MediaRecord, MultimodalPipeline}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload schema, per-partition decoder
  * init, determinism of the stub decode against its expression twin
  * (q32's checksum-free subset).
  */
class MultimodalSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val records = MultimodalPipeline.toMediaRecords(docs)
  private lazy val features = MultimodalPipeline.extractFeatures(records)

  test("MediaRecord schema: payload is a true binary column") {
    val f = records.schema("payload")
    assert(f.dataType.typeName === "binary")
    assert(records.schema.fieldNames.toSeq ===
      Seq("doc_id", "payload", "width", "height", "format"))
  }

  test("payload bytes are the UTF-8 text; metadata matches q32 formulas") {
    val rec = records.where(col("doc_id") === 0).head()
    val doc = docs.where(col("doc_id") === 0).head()
    val text = doc.getAs[String]("text")
    assert(new String(rec.payload, "UTF-8") === text)
    assert(rec.width === (doc.getAs[Long]("n_chars") % 64 * 10 + 64).toInt)
  }

  test("decode stage: row counts preserved, features deterministic") {
    val n = docs.count()
    assert(features.count() === n)
    val f1 = features.orderBy("doc_id").collect()
    val f2 = MultimodalPipeline.extractFeatures(records).orderBy("doc_id").collect()
    assert(f1.map(_.checksum).toSeq === f2.map(_.checksum).toSeq)
    // byteLen == n_chars for the ASCII corpus
    val mismatch = features.join(docs, "doc_id")
      .where(col("byteLen") =!= col("n_chars")).count()
    assert(mismatch === 0)
  }

  test("decoder initialized once per partition (decoderId == partition id)") {
    val ids = features.select("decoderId").distinct().collect().map(_.getInt(0)).toSet
    assert(ids.size === records.rdd.getNumPartitions)
  }

  test("checksum matches the shared polynomial-hash definition") {
    import graft.functions.TextFunctions
    val expected = docs
      .select(col("doc_id"), TextFunctions.polyHash(col("text")).as("h"))
      .orderBy("doc_id").collect().map(_.getAs[Long]("h"))
    val got = features.orderBy("doc_id").collect().map(_.checksum)
    assert(got.toSeq === expected.toSeq)
  }

  test("featureSummary aggregates the decoded features") {
    val row = MultimodalPipeline.featureSummary(spark, sfDir).head()
    assert(row.getAs[Long]("n_media") === docs.count())
    assert(row.getAs[Long]("total_bytes") ===
      docs.agg(sum("n_chars")).head().getLong(0))
  }
}
