package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parse of one raw Cassandra log line into the 7-field entry — the Spark
  * mapping of `parse_log_line` (`cassandra_log_analyzer.py:186-203`).
  *
  * Reference semantics pinned here:
  *  - the regex is the reference's verbatim (`cassandra_log_analyzer.py:189`);
  *    Python `re.match` anchors at the start only, so we prepend `^` for
  *    Spark's substring-matching `rlike`/`regexp_extract`.
  *  - a non-matching line is DROPPED from the parsed relation
  *    (`cassandra_log_analyzer.py:203,240-241`) — but still counts in
  *    `total_lines` (`:262`) and is still searchable (`:318-320`), so
  *    callers keep the raw DataFrame alongside (see ClusterAnalyzer).
  *  - all 7 fields stay strings, including the source line number
  *    (`cassandra_log_analyzer.py:200`).
  *
  * Everything is built-in Catalyst expressions (`regexp_extract`, `rlike`)
  * so whole-stage codegen applies and the literal pattern is compiled once
  * per task, not once per row like the reference.
  */
object LogLineParser {

  /** Verbatim reference pattern (`cassandra_log_analyzer.py:189`):
    * LEVEL [timestamp] [thread] class:line - message
    */
  val pattern: String = """(\w+)\s+\[([^\]]+)\]\s+\[([^\]]+)\]\s+([^:]+):(\d+)\s+-\s+(.*)"""

  /** Anchored form emulating Python `re.match` (match-at-start). */
  val anchored: String = "^" + pattern

  /** True when the line parses (would not be dropped). */
  def matches(line: Column): Column = line.rlike(anchored)

  private val fields: Seq[(String, Int)] =
    Seq("level" -> 1, "timestamp" -> 2, "thread" -> 3, "clazz" -> 4, "line" -> 5, "message" -> 6)

  /** The 7 parsed columns (minus `node`, which the caller already has).
    * Each is `regexp_extract(line, anchored, i)` — empty string when the
    * line does not match, so pair with [[matches]] to drop non-matches.
    */
  def parsedColumns(line: Column): Seq[Column] =
    fields.map { case (name, idx) => regexp_extract(line, anchored, idx).as(name) }

  /** Project a raw-lines DataFrame (columns incl. `node`, `value`) to the
    * parsed-entries DataFrame, dropping non-matching lines — the exact
    * relation the reference iterates at `cassandra_log_analyzer.py:239-241`.
    * Extra input columns (e.g. `line_number`) are preserved.
    */
  def parse(raw: DataFrame, lineCol: String = "value"): DataFrame = {
    val c = col(lineCol)
    raw.where(matches(c))
      .select((raw.columns.filterNot(_ == lineCol).map(col).toSeq ++ parsedColumns(c)): _*)
  }

  /** Like [[parse]] but KEEPS non-matching lines (parsed fields null) —
    * the single-scan path for summaries that must also count unparsed
    * lines (`total_lines`, `cassandra_log_analyzer.py:262`). Adds a
    * boolean `parsed` column.
    */
  def parseKeepingUnmatched(raw: DataFrame, lineCol: String = "value"): DataFrame = {
    val c = col(lineCol)
    val m = matches(c)
    val parsedCols = fields.map { case (name, idx) =>
      when(m, regexp_extract(c, anchored, idx)).as(name)
    }
    raw.select((raw.columns.map(col).toSeq ++ parsedCols :+ m.as("parsed")): _*)
  }
}
