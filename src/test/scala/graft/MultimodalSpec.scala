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

  test("frame sampling: every stride-th fixed-size slice, bytes intact") {
    val frames = MultimodalPipeline.sampleFrames(records, frameBytes = 100, stride = 2)
    val rec = records.where(col("doc_id") === 0).head()
    val got = frames.where(col("doc_id") === 0).orderBy("frame_idx").collect()
    val expectedIdx = (0 until (rec.payload.length + 99) / 100 by 2).toSeq
    assert(got.map(_.frame_idx).toSeq === expectedIdx)
    // frame 0 is exactly the first 100 payload bytes
    assert(got.head.frame.toSeq === rec.payload.take(100).toSeq)
    // every frame is non-empty and at most frameBytes long
    assert(got.forall(f => f.frame.nonEmpty && f.frame.length <= 100))
  }

  test("frame sampling: exact-multiple and empty payloads have no phantom frame") {
    import spark.implicits._
    val rs = Seq(
      MediaRecord(1L, Array.fill[Byte](512)(7), 1, 1, "fake"),
      MediaRecord(2L, Array.empty[Byte], 1, 1, "fake")).toDS()
    val frames = MultimodalPipeline.sampleFrames(rs, frameBytes = 256, stride = 1)
      .collect().groupBy(_.doc_id)
    assert(frames(1L).map(_.frame_idx).sorted.toSeq === Seq(0, 1))
    assert(!frames.contains(2L))
  }

  test("resize stub: payload shrunk to the byte budget, schema unchanged") {
    val resized = MultimodalPipeline.resizeTo(records, targetBytes = 64)
    // nullability flags differ between a projection-derived and an
    // encoder-derived schema; names and types are the contract
    assert(resized.schema.map(f => (f.name, f.dataType)) ===
      records.schema.map(f => (f.name, f.dataType)))
    val lens = resized.collect().map(_.payload.length)
    assert(lens.forall(_ <= 64))
    // deterministic: same input -> same bytes
    val a = resized.where(col("doc_id") === 7).head().payload.toSeq
    val b = MultimodalPipeline.resizeTo(records, 64)
      .where(col("doc_id") === 7).head().payload.toSeq
    assert(a === b)
  }

  test("PPM decode: real bytes round-trip through the partition decoder") {
    import spark.implicits._
    import graft.multimodal.PpmDecoder
    // deterministic gradient rasters, one comment-bearing header
    def raster(w: Int, h: Int, seed: Int): Array[Byte] =
      Array.tabulate(3 * w * h)(i => ((i * 31 + seed * 7) % 256).toByte)
    val imgs = Seq((10L, 8, 5, None), (11L, 3, 3, Some("fixture")),
      (12L, 1, 1, None))
    val recs = imgs.map { case (id, w, h, c) =>
      MediaRecord(id, PpmDecoder.encode(w, h, raster(w, h, id.toInt), c),
        w, h, "image/x-portable-pixmap")
    }
    val feats = MultimodalPipeline.decodePpm(recs.toDS().repartition(2))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats.keySet === Set(10L, 11L, 12L))
    for ((id, w, h, _) <- imgs) {
      val f = feats(id)
      assert(f.width === w && f.height === h && f.n_pixels === w.toLong * h)
      // channel means computed directly from the fixture raster
      val rgb = raster(w, h, id.toInt)
      def mean(ch: Int) =
        rgb.indices.collect { case i if i % 3 == ch => rgb(i) & 0xff }
          .sum.toDouble / (w * h)
      assert(f.mean_r === mean(0) && f.mean_g === mean(1) && f.mean_b === mean(2))
    }
  }

  test("PPM decode: undecodable payloads drop out of the feature stream") {
    import spark.implicits._
    import graft.multimodal.PpmDecoder
    val good = PpmDecoder.encode(2, 2, Array.fill[Byte](12)(5))
    val bad = Seq(
      MediaRecord(1L, "P5\n2 2\n255\n0000".getBytes("US-ASCII"), 2, 2, "pgm"), // wrong magic
      MediaRecord(2L, good.dropRight(1), 2, 2, "ppm"), // truncated raster
      MediaRecord(3L, "P6\n2 2\n65535\n".getBytes("US-ASCII") ++
        Array.fill[Byte](24)(0), 2, 2, "ppm"), // 2-byte samples unsupported
      MediaRecord(4L, Array.empty[Byte], 0, 0, "ppm"))
    val mixed = (bad :+ MediaRecord(5L, good, 2, 2, "ppm")).toDS()
    val out = MultimodalPipeline.decodePpm(mixed).collect()
    assert(out.map(_.doc_id).toSeq === Seq(5L))
    assert(out.head.mean_r === 5.0 && out.head.n_pixels === 4L)
  }

  test("featureSummary aggregates the decoded features") {
    val row = MultimodalPipeline.featureSummary(spark, sfDir).head()
    assert(row.getAs[Long]("n_media") === docs.count())
    assert(row.getAs[Long]("total_bytes") ===
      docs.agg(sum("n_chars")).head().getLong(0))
  }
}
