package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque media bytes + typed metadata. The
  * payload is a `binary` column end-to-end — Spark never interprets it;
  * Parquet stores it as BYTE_ARRAY; only the decode stage touches the
  * bytes.
  */
case class MediaRecord(
    doc_id: Long,
    payload: Array[Byte],
    width: Int,
    height: Int,
    format: String)

/** Decoded features for one record. `decoderId` tags which partition-
  * local decoder instance produced the row (observability for the
  * once-per-partition init contract).
  */
case class MediaFeatures(
    doc_id: Long,
    byteLen: Int,
    checksum: Long,
    nFrames: Int,
    meanByte: Double,
    decoderId: Int)

/** ===== STUB DECODER =====
  * Stands in for a real image/audio/video library (libjpeg, ffmpeg, …)
  * that is NOT present in this environment. Deterministic fake: the
  * "pixels" are the payload bytes themselves. The REAL part is the
  * contract around it: expensive `open()` once per partition, streaming
  * record iteration, bounded memory per batch.
  */
final class FakeDecoder private (val decoderId: Int) {
  /** "Decode" = checksum + per-frame stats over fixed-size frames. */
  def decode(payload: Array[Byte], frameBytes: Int = 256): (Long, Int, Double) = {
    var checksum = 0L
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      checksum = (checksum * 31 + (payload(i) & 0xff)) % 2147483647L
      sum += (payload(i) & 0xff)
      i += 1
    }
    // ceil division — consistent with sampleFrames and q32
    val nFrames = (payload.length + frameBytes - 1) / frameBytes
    val meanByte = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    (checksum, nFrames, meanByte)
  }
}

object FakeDecoder {
  /** In a real pipeline this is the expensive native-library init; it
    * must run once per PARTITION, never once per row.
    */
  def open(partitionId: Int): FakeDecoder = new FakeDecoder(partitionId)
}

/** Channel stats decoded from one REAL image payload (PPM P6). */
case class PpmFeatures(
    doc_id: Long,
    width: Int,
    height: Int,
    n_pixels: Long,
    mean_r: Double,
    mean_g: Double,
    mean_b: Double,
    decoderId: Int)

/** ===== REAL DECODER (binary PPM / netpbm P6) =====
  * One genuinely decoded, dependency-free PUBLIC format, so the
  * multimodal tier parses real image bytes and not only the stub
  * contract: "P6" magic, ASCII width/height/maxval with `#` comments,
  * a single whitespace byte, then width×height raw RGB triplets
  * (maxval must be 255 — the 1-byte-per-sample variant). Same
  * once-per-partition `open()` contract as [[FakeDecoder]]; a real
  * codec library slots in here with no plumbing change.
  */
final class PpmDecoder private (val decoderId: Int) {

  /** Channel means over the raster; None for anything that is not a
    * well-formed P6 payload (wrong magic, malformed header, wide
    * maxval, truncated raster) — curation semantics: undecodable media
    * drops out of the feature stream, counted by subtraction upstream.
    */
  def decode(p: Array[Byte]): Option[PpmDecoder.PpmStats] = header(p).map {
    case (w, h, off) =>
      val n = w.toLong * h
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      val base = off
      while (i < n) {
        sr += p(base + 3 * i) & 0xff
        sg += p(base + 3 * i + 1) & 0xff
        sb += p(base + 3 * i + 2) & 0xff
        i += 1
      }
      PpmDecoder.PpmStats(w, h,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** (width, height, raster offset), or None if not valid P6. */
  private def header(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p.length < 2 || p(0) != 'P' || p(1) != '6') return None
    var pos = 2
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def skipWsAndComments(): Unit = {
      var cont = true
      while (cont && pos < p.length) {
        if (isWs(p(pos))) pos += 1
        else if (p(pos) == '#') { while (pos < p.length && p(pos) != '\n') pos += 1 }
        else cont = false
      }
    }
    def readInt(): Int = { // -1 = malformed; 1e6 cap forbids overflow
      skipWsAndComments()
      var v = 0; var any = false
      while (pos < p.length && p(pos) >= '0' && p(pos) <= '9' && v <= 1000000) {
        v = v * 10 + (p(pos) - '0'); pos += 1; any = true
      }
      if (any && v <= 1000000) v else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval != 255) return None
    // exactly ONE whitespace byte separates maxval from the raster
    // (the spec's rule — a '#' here would be raster data, not comment)
    if (pos >= p.length || !isWs(p(pos))) return None
    pos += 1
    if (p.length - pos < 3L * w * h) return None
    Some((w, h, pos))
  }
}

object PpmDecoder {
  final case class PpmStats(
      width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double)

  /** Once per PARTITION, never once per row (the FakeDecoder rule). */
  def open(partitionId: Int): PpmDecoder = new PpmDecoder(partitionId)

  /** Fixture/round-trip helper: raw RGB triplets → P6 bytes. */
  def encode(width: Int, height: Int, rgb: Array[Byte],
      comment: Option[String] = None): Array[Byte] = {
    require(rgb.length == 3 * width * height,
      s"raster must hold ${3 * width * height} bytes, got ${rgb.length}")
    val header = comment.fold(s"P6\n$width $height\n255\n")(c =>
      s"P6\n#$c\n$width $height\n255\n")
    val hb = header.getBytes("US-ASCII")
    val out = new Array[Byte](hb.length + rgb.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(rgb, 0, out, hb.length, rgb.length)
    out
  }
}

/** Multimodal plumbing: documents → binary records → partition-batched
  * feature extraction. Typed `Dataset` boundaries (encoders define the
  * schema), `mapPartitions` for the decode stage so the per-partition
  * decoder handle amortizes across rows — the same shape `mapInPandas`
  * batches give a Python pipeline.
  *
  * Scale notes: the payload column never routes through a shuffle here
  * (features are extracted before any aggregation); at 100 TB the decode
  * stage is embarrassingly parallel and the small feature rows — not the
  * media bytes — feed downstream joins/aggregations.
  */
object MultimodalPipeline {

  /** documents.parquet → MediaRecord dataset (payload = UTF-8 bytes of
    * `text`, fake metadata derived deterministically — same formulas as
    * q32).
    */
  def toMediaRecords(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 64 * 10 + 64).cast("int").as("width"),
      (col("doc_id") % 48 + 16).cast("int").as("height"),
      lit("fake/rgb8").as("format"))
      .as[MediaRecord]
  }

  /** The decode stage: one decoder per partition, streamed rows. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // real-library pattern: init once per partition, reuse across rows
      val decoder = FakeDecoder.open(org.apache.spark.TaskContext.getPartitionId())
      it.map { r =>
        val (checksum, nFrames, meanByte) = decoder.decode(r.payload)
        MediaFeatures(r.doc_id, r.payload.length, checksum, nFrames,
          meanByte, decoder.decoderId)
      }
    }
  }

  /** The REAL decode stage (PPM P6): identical shape to
    * [[extractFeatures]] — one decoder per partition, streamed rows —
    * but the bytes are genuinely parsed; undecodable payloads drop out
    * of the stream (flatMap), so `records.count - features.count` is
    * the corrupt-media count.
    */
  def decodePpm(records: Dataset[MediaRecord]): Dataset[PpmFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      val decoder = PpmDecoder.open(org.apache.spark.TaskContext.getPartitionId())
      it.flatMap { r =>
        decoder.decode(r.payload).map { s =>
          PpmFeatures(r.doc_id, s.width, s.height, s.width.toLong * s.height,
            s.meanR, s.meanG, s.meanB, decoder.decoderId)
        }
      }
    }
  }

  /** One sampled frame: fixed-size byte slice of the payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: every `stride`-th fixed-size frame as its own row
    * — the fan-out stage a video pipeline runs before per-frame
    * feature extraction. flatMap keeps it streaming (no per-record
    * materialization of all frames); downstream operators see small
    * frame rows, never the whole payload.
    */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int = 256,
      stride: Int = 4): Dataset[MediaFrame] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.flatMap { r =>
      // ceil division: an exact-multiple payload has len/frameBytes
      // frames, not one more; an empty payload has none
      val n = (r.payload.length + frameBytes - 1) / frameBytes
      (0 until n by stride).iterator.map { f =>
        val from = f * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        MediaFrame(r.doc_id, f, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** Resize STUB: nearest-neighbor downsample of the fake "pixels" to a
    * fixed byte budget (a real pipeline calls the codec's scaler here —
    * not present in this environment). Pure per-row map; the plumbing
    * being exercised is binary-in/binary-out with changed metadata.
    */
  def resizeTo(records: Dataset[MediaRecord], targetBytes: Int = 64): Dataset[MediaRecord] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.map { r =>
      val n = r.payload.length
      val out =
        if (n <= targetBytes) r.payload
        else Array.tabulate(targetBytes)(i => r.payload((i.toLong * n / targetBytes).toInt))
      r.copy(payload = out,
        width = math.max(1, r.width * out.length / math.max(1, n)),
        height = r.height)
    }
  }

  /** End-to-end: per-format feature aggregate (what a curation pipeline
    * computes before filtering).
    */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(
      toMediaRecords(spark.read.parquet(s"$dir/documents.parquet")))
    feats.groupBy()
      .agg(count(lit(1)).as("n_media"),
        sum(col("byteLen")).as("total_bytes"),
        sum(col("nFrames")).as("total_frames"),
        min(col("checksum")).as("min_checksum"),
        max(col("checksum")).as("max_checksum"))
  }
}
