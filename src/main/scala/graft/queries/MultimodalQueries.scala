package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing over an opaque binary payload (q32).
  *
  * The corpus has no real image/audio bytes, so the payload is the
  * UTF-8 encoding of `documents.text` — the POINT is the Spark-side
  * shape: a `binary` column + typed metadata struct flowing through a
  * columnar plan, with "decode" as cheap deterministic expressions
  * (byte length, content digest, frame sampling by fixed stride). The
  * real decoder stub (mapPartitions batch interface where an image
  * library would sit) lives in [[graft.multimodal.MultimodalPipeline]]
  * and is exercised by its spec — this query keeps the oracle-checkable
  * expression surface.
  */
object MultimodalQueries {

  private val frameBytes = 256
  private val frameSigBytes = 128

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_multimodal_features" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          struct((col("n_chars") % 64 * 10 + 64).as("width"),
            (col("doc_id") % 48 + 16).as("height"),
            lit("fake/rgb8").as("format")).as("meta"))
        .select(col("doc_id"),
          length(col("payload")).as("byte_len"),
          md5(col("payload")).as("content_md5"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          // ceil division — an exact-multiple payload fills its last
          // frame exactly, it doesn't start a new one
          expr(s"(length(payload) + ${frameBytes - 1}) div $frameBytes")
            .as("n_frames"),
          md5(substring(col("payload"), 1, frameSigBytes)).as("frame0_sig"))
        .orderBy("doc_id")
    }),

    // frame sampling as a relational surface: every 2nd fixed-width
    // frame as its own row with a content hash — the fan-out shape of
    // MultimodalPipeline.sampleFrames. NOTE: frames here are CHARACTER
    // slices of the text (both engines), which coincides with q32's
    // byte-based n_frames only because the corpus is ASCII; the typed
    // pipeline slices real payload bytes. Explode of a when-guarded
    // sequence; everything else scan-stage.
    "q56_frame_sample" -> ((s, dir) => {
      import graft.functions.TextFunctions.polyHash
      val nFrames = expr(
        s"(length(text) + ${frameBytes - 1}) div $frameBytes").cast("int")
      Tables(s, dir, "documents")
        .where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("text"), explode(
          when(nFrames >= 1, sequence(lit(0), nFrames - 1, lit(2)))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          length(substring_index_frame(col("text"), col("frame_idx"))).as("frame_len"),
          polyHash(substring_index_frame(col("text"), col("frame_idx"))).as("frame_hash"))
        .orderBy("doc_id", "frame_idx")
    }))

  /** Frame `i` of a text payload: chars [i*frameBytes, +frameBytes). */
  private def substring_index_frame(text: org.apache.spark.sql.Column,
      idx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substr(text, (idx * frameBytes + 1).cast("int"), lit(frameBytes))

  def oracle: Map[String, String] = Map(
    "q32_multimodal_features" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
         |  md5(text) AS content_md5,
         |  n_chars % 64 * 10 + 64 AS width,
         |  doc_id % 48 + 16 AS height,
         |  (octet_length(encode(text)) + ${frameBytes - 1}) // $frameBytes AS n_frames,
         |  md5(substring(text, 1, $frameSigBytes)) AS frame0_sig
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "q56_frame_sample" -> {
      import graft.functions.TextFunctions.sqlPolyHash
      val frame = s"substring(text, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)"
      s"""SELECT doc_id, frame_idx,
         |  length($frame) AS frame_len,
         |  ${sqlPolyHash(frame)} AS frame_hash
         |FROM (SELECT doc_id, text,
         |    unnest(range(0, (length(text) + ${frameBytes - 1}) // $frameBytes, 2))
         |      AS frame_idx
         |  FROM documents WHERE doc_id % 7 = 0)
         |ORDER BY doc_id, frame_idx""".stripMargin
    })
}
