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

  /** The 7 parsed columns (minus `node`, which the caller already has),
    * projected from ONE [[graft.functions.RegexGroups]] pass — a
    * per-field `regexp_extract` formulation would execute the regex
    * once per field per line. Null (not "") when the line does not
    * match, so pair with [[matches]] to drop non-matches.
    */
  def parsedColumns(line: Column): Seq[Column] = {
    val groups = graft.functions.RegexGroups(line, anchored)
    fields.map { case (name, idx) => element_at(groups, idx).as(name) }
  }

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
    // one regex execution per line: the groups array doubles as the
    // match flag (null = unmatched), and codegen subexpression
    // elimination shares it across the field projections
    val groups = graft.functions.RegexGroups(c, anchored)
    val parsedCols = fields.map { case (name, idx) =>
      element_at(groups, idx).as(name)
    }
    raw.select((raw.columns.map(col).toSeq ++ parsedCols
      :+ groups.isNotNull.as("parsed")): _*)
  }
}
