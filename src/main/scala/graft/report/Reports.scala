package graft.report

import graft.analyze.ClusterAnalyzer
import graft.ingest.LogCatalog
import graft.model.Recommendation
import graft.query.LogQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Markdown / JSON renderers — the reference's report sinks (SURVEY.md
  * §2.1 S6/S7), byte-compatible with the handler f-strings at
  * `cassandra_log_analyzer.py:747-770` (analyze), `:790-797` (search),
  * `:821-825` (errors), `:833-841` (compare), `:849-855` (issues).
  *
  * Every renderer collects an already-aggregated (tiny) DataFrame; node
  * order follows catalog insertion order = reference dict order.
  */
object Reports {

  private def emoji(severity: String): String =
    if (severity == "CRITICAL") "CRITIQUE"
    else if (severity == "HIGH") "IMPORTANT"
    else "ATTENTION" // `cassandra_log_analyzer.py:764,853`

  /** `analyze_cluster` Markdown (`cassandra_log_analyzer.py:747-767`). */
  def renderAnalysis(catalog: LogCatalog): String = {
    val classified = catalog.classified
    val summaryByNode = ClusterAnalyzer.summary(classified).collect()
      .map(r => r.getString(0) -> r).toMap
    val hist = ClusterAnalyzer.issueHistogram(classified).collect()
    val recs = ClusterAnalyzer.recommendationsFromCounts(
      hist.map(r => r.getString(0) -> r.getLong(1)).toMap)

    val sb = new StringBuilder("# Analyse du Cluster Cassandra\n\n")
    sb ++= "## Résumé par Node\n"
    catalog.nodeKeys.foreach { node =>
      summaryByNode.get(node).foreach { s =>
        sb ++= s"\n### $node\n"
        sb ++= s"- Erreurs: ${s.getLong(1)}\n"
        sb ++= s"- Warnings: ${s.getLong(2)}\n"
        sb ++= s"- Total lignes: ${s.getLong(3)}\n"
      }
    }
    sb ++= "\n## Problèmes Détectés\n"
    hist.foreach { r =>
      sb ++= s"- ${r.getString(0)}: ${r.getLong(1)} occurrences\n"
    }
    if (recs.nonEmpty) {
      sb ++= "\n## Recommandations\n"
      recs.foreach { rec =>
        sb ++= s"\n${emoji(rec.severity)} **${rec.issue}** (${rec.severity})\n"
        sb ++= s"→ ${rec.recommendation}\n"
      }
    }
    sb.result()
  }

  /** `search_logs` Markdown (`cassandra_log_analyzer.py:784-798`). */
  def renderSearch(catalog: LogCatalog, pattern: String,
                   caseSensitive: Boolean = false,
                   nodeFilter: Option[String] = None): String = {
    val (hits, total) = LogQueries.searchLogsCapped(catalog, pattern, caseSensitive, nodeFilter)
    if (total == 0) return s"Aucun résultat pour: $pattern"
    val sb = new StringBuilder(s"# Résultats de recherche: '$pattern'\n\nTotal: $total\n\n")
    hits.foreach { r =>
      sb ++= s"**${r.getString(0)}** (ligne ${r.getLong(1)})\n"
      sb ++= s"```\n${r.getString(2)}\n```\n\n"
    }
    if (total > 100) sb ++= s"\n... et ${total - 100} résultats supplémentaires"
    sb.result()
  }

  /** `get_errors` Markdown (`cassandra_log_analyzer.py:821-826`). */
  def renderErrors(catalog: LogCatalog, nodeName: Option[String] = None,
                   limit: Int = 50): String = {
    val errs = LogQueries.getErrors(catalog, nodeName, limit).collect()
    val sb = new StringBuilder(s"# Erreurs (${errs.length})\n\n")
    errs.foreach { r =>
      sb ++= s"**${r.getString(0)}** [${r.getString(2)}]\n"
      sb ++= s"```\n${r.getString(6)}\n```\n\n"
    }
    sb.result()
  }

  /** `compare_nodes` Markdown table (`cassandra_log_analyzer.py:833-841`). */
  def renderCompare(catalog: LogCatalog, nodes: Seq[String] = Seq.empty): String = {
    val requested = if (nodes.nonEmpty) nodes else catalog.nodeKeys
    val rows = LogQueries.compareNodes(catalog, requested).collect()
    val sb = new StringBuilder("# Comparaison des Nodes\n\n")
    sb ++= "| Node | Erreurs | Warnings | Lignes |\n"
    sb ++= "|------|---------|----------|--------|\n"
    rows.foreach { r =>
      sb ++= s"| ${r.getString(0)} | ${r.getLong(1)} | ${r.getLong(2)} | ${r.getLong(3)} |\n"
    }
    sb.result()
  }

  /** `detect_issues` Markdown (`cassandra_log_analyzer.py:849-855`). */
  def renderIssues(catalog: LogCatalog, severity: String = "all"): String = {
    val recs = LogQueries.detectIssues(catalog, severity).collect()
    val sb = new StringBuilder("# Problèmes Détectés\n\n")
    recs.foreach { r =>
      sb ++= s"${emoji(r.getString(0))} **${r.getString(1)}** (${r.getString(0)})\n"
      sb ++= s"→ ${r.getString(2)}\n\n"
    }
    sb.result()
  }

  /** The `cassandra://logs/analysis` JSON resource
    * (`cassandra_log_analyzer.py:360-370`) — full analysis as JSON.
    * Node/field order follows the reference's construction order.
    */
  def analysisJson(catalog: LogCatalog): String = {
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val classified = catalog.classified
    val summaryByNode = ClusterAnalyzer.summary(classified).collect()
      .map(r => r.getString(0) -> r).toMap
    val hist = ClusterAnalyzer.issueHistogram(classified).collect()
    val recs: Seq[Recommendation] = ClusterAnalyzer.recommendationsFromCounts(
      hist.map(r => r.getString(0) -> r.getLong(1)).toMap)
    val summaryJson = catalog.nodeKeys.flatMap(n => summaryByNode.get(n).map(n -> _))
      .map { case (n, s) =>
        s"${jstr(n)}: {\"errors\": ${s.getLong(1)}, \"warnings\": ${s.getLong(2)}, \"total_lines\": ${s.getLong(3)}}"
      }.mkString("{", ", ", "}")
    val histJson = hist.map(r => s"${jstr(r.getString(0))}: ${r.getLong(1)}")
      .mkString("{", ", ", "}")
    val recsJson = recs.map { rec =>
      s"{\"severity\": ${jstr(rec.severity)}, \"issue\": ${jstr(rec.issue)}, \"recommendation\": ${jstr(rec.recommendation)}}"
    }.mkString("[", ", ", "]")
    s"""{"summary": $summaryJson, "issue_counts": $histJson, "recommendations": $recsJson}"""
  }

  /** The `cassandra://logs/nodes` resource (`cassandra_log_analyzer.py:371-377`). */
  def nodesJson(catalog: LogCatalog): String = {
    val keys = catalog.nodeKeys
    keys.map(k => "\"" + k + "\"").mkString("{\"nodes\": [", ", ", s"], \"count\": ${keys.size}}")
  }
}
