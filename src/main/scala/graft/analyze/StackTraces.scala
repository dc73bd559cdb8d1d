package graft.analyze

import graft.parse.LogLineParser
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stack-trace continuation grouping — the first operator a log user
  * needs past template mining: the reference's parser silently DROPS
  * every non-matching line (`cassandra_log_analyzer.py:203,240-241`),
  * and in real Cassandra logs those are overwhelmingly Java stack-trace
  * continuations — the `ClassName: message` line plus tab-indented
  * `\tat ...` frames that follow an ERROR entry. This pass attaches
  * each run of unparsed lines to its preceding parsed head — a
  * gaps-and-islands pass where the island id is the running count of
  * parsed lines per node — yielding per-incident line spans and an
  * exception-class histogram.
  *
  * Scale shape: ONE shuffle onto the node grain for the two windows
  * (line numbering is assumed present; the running sum partitions by
  * node), then a grain-bounded aggregation. The window partitions by
  * node because line order is per-node in this corpus; at 100 TB the
  * identical pass runs per (node, log file) — a file boundary is an
  * island boundary by construction, so partitions stay file-sized and
  * the pass is embarrassingly parallel across files. An island is
  * bounded by the distance to the next parsed line (stack traces are
  * tens of lines), so per-group state never grows with the corpus.
  */
object StackTraces {

  /** Leading fully-qualified Throwable class of a continuation line
    * (`java.io.IOException: ...` matches; `\tat ...` frames extract
    * the empty string — both engines return '' on no-match, so the
    * per-island `max` picks the class line order-independently).
    */
  val exceptionClassRe: String =
    "^([A-Za-z_$][A-Za-z0-9_$.]*(?:Exception|Error))"

  /** Per-incident spans over a raw lines frame carrying (node,
    * line_no, line): island id, first/last line numbers, the count of
    * attached continuation frames, the parsed head's level (via the
    * REAL reference parse regex — the island key is the parse flag,
    * not any synthesis column), and the exception class extracted
    * from the island's continuation lines.
    */
  def incidents(raw: DataFrame): DataFrame = {
    val parsed = LogLineParser.parseKeepingUnmatched(
      raw.select(col("node"), col("line_no"), col("line").as("raw_line")),
      "raw_line")
    val wIsl = Window.partitionBy("node").orderBy("line_no")
    parsed
      .withColumn("island", sum(col("parsed").cast("long")).over(wIsl))
      .groupBy("node", "island")
      .agg(
        min(col("line_no")).as("first_line_no"),
        max(col("line_no")).as("last_line_no"),
        (count(lit(1)) - 1).as("n_frames"),
        max(when(col("parsed"), col("level"))).as("head_level"),
        max(when(!col("parsed"),
          regexp_extract(col("raw_line"), exceptionClassRe, 1)))
          .as("exception_class"))
  }

  /** The (node, exception_class) histogram over ERROR-headed incidents
    * carrying at least one continuation line — the "group each stack
    * trace with its parent ERROR and histogram the exception types"
    * query.
    */
  def rollup(inc: DataFrame): DataFrame =
    inc.where(col("head_level") === "ERROR" && col("n_frames") >= 1)
      .groupBy("node", "exception_class")
      .agg(count(lit(1)).as("n_incidents"),
        sum(col("n_frames")).as("n_frames_total"),
        max(col("last_line_no") - col("first_line_no") + 1).as("max_span"),
        min(col("first_line_no")).as("first_line"))
      .orderBy("node", "exception_class")
}
