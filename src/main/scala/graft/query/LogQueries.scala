package graft.query

import graft.analyze.ClusterAnalyzer
import graft.ingest.LogCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The analytical tools of the reference's MCP surface, as DataFrame
  * plans over a [[LogCatalog]]. Each maps one handler of
  * `cassandra_log_analyzer.py:582-857` (SURVEY.md §2.10).
  */
object LogQueries {

  /** `search_logs` (`cassandra_log_analyzer.py:773-799` /
    * `search_pattern` `:311-327`): regex search over RAW lines (pre-parse
    * — stack traces and blanks are searchable), case-insensitive by
    * default (`(?i)` prepended, = `re.IGNORECASE`), optional node filter
    * where a missing node silently yields empty. Hits carry the 1-based
    * per-node line number and the STRIPPED line.
    *
    * Scale: the rlike predicate evaluates inside the scan stage under
    * whole-stage codegen — no shuffle at all; ordering/limit happen on
    * the (usually tiny) hit set.
    */
  def searchLogs(catalog: LogCatalog, pattern: String,
                 caseSensitive: Boolean = false,
                 nodeFilter: Option[String] = None): DataFrame = {
    val base = nodeFilter.fold(catalog.raw)(catalog.rawFor)
    val p = if (caseSensitive) pattern else "(?i)" + pattern
    // fail fast on the driver for an invalid user pattern (the reference's
    // re.search raises immediately) instead of N task failures later
    java.util.regex.Pattern.compile(p)
    base.where(col("value").rlike(p))
      .select(col("node"), col("line_number"),
        trim(col("value")).as("content"))
      .orderBy("node", "line_number")
  }

  /** Search with display cap — the first 100 hits (collected) plus the
    * total (`cassandra_log_analyzer.py:790-797`). The filtered relation
    * is cached across the pair of jobs so the regex scan over the raw
    * corpus runs ONCE (uncached, limit and count would each rescan
    * every line), then dropped.
    */
  def searchLogsCapped(catalog: LogCatalog, pattern: String,
                       caseSensitive: Boolean = false,
                       nodeFilter: Option[String] = None)
      : (Array[org.apache.spark.sql.Row], Long) = {
    val all = searchLogs(catalog, pattern, caseSensitive, nodeFilter).cache()
    try (all.limit(100).collect(), all.count())
    finally all.unpersist(blocking = false)
  }

  /** `get_errors` (`cassandra_log_analyzer.py:801-826`): error entries,
    * optionally for one node, flattened in node order, first `limit`
    * (default 50).
    */
  def getErrors(catalog: LogCatalog, nodeName: Option[String] = None,
                limit: Int = 50): DataFrame = {
    val errs = ClusterAnalyzer.errorsByNode(catalog.classified)
    nodeName.fold(errs)(n => errs.where(col("node") === n))
      .limit(limit)
  }

  /** `compare_nodes` (`cassandra_log_analyzer.py:828-842`): summary rows
    * for the requested node keys, in REQUEST order, silently skipping
    * unknown nodes (`:838`).
    */
  def compareNodes(catalog: LogCatalog, nodes: Seq[String]): DataFrame = {
    val s = ClusterAnalyzer.summary(catalog.classified)
    val order = map(nodes.zipWithIndex.flatMap { case (n, i) =>
      Seq(lit(n), lit(i))
    }: _*)
    s.where(col("node").isin(nodes: _*))
      .withColumn("__ord", element_at(order, col("node")))
      .orderBy("__ord").drop("__ord")
  }

  /** `detect_issues` (`cassandra_log_analyzer.py:844-857`):
    * recommendations filtered by severity (`"all"` keeps everything;
    * match is on lowercased severity, `:852`).
    */
  def detectIssues(catalog: LogCatalog, severity: String = "all"): DataFrame = {
    val recs = ClusterAnalyzer.recommendationsPlan(
      catalog.spark, ClusterAnalyzer.issueHistogram(catalog.classified))
    if (severity == "all") recs
    else recs.where(lower(col("severity")) === severity)
  }

  /** Per-node line numbering over an arbitrary ordered corpus — W1
    * (`enumerate(lines, 1)`, `cassandra_log_analyzer.py:319`) as a
    * window, for sources that carry their own stable order column.
    */
  def withLineNumbers(df: DataFrame, nodeCol: String, orderCol: String): DataFrame =
    df.withColumn("line_number",
      row_number().over(Window.partitionBy(nodeCol).orderBy(orderCol)))
}
