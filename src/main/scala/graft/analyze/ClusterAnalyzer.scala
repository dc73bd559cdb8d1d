package graft.analyze

import graft.classify.IssueClassifier
import graft.model.Recommendation
import graft.parse.LogLineParser
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship analysis — Spark mapping of `analyze_logs`
  * (`cassandra_log_analyzer.py:219-268`) and `_generate_recommendations`
  * (`:270-309`).
  *
  * Where the reference re-parses every loaded line on every call
  * (`cassandra_log_analyzer.py:745,808,831,847`), we compute each
  * sub-result as a DataFrame over ONE cached classified relation.
  *
  * Scale notes (100 TB): [[summary]] is a single scan + single hash
  * aggregate keyed by node (map-side partial then final — the node
  * cardinality is tiny so the shuffle is negligible); [[issueHistogram]]
  * explodes at most 14 structs per line and aggregates on a 14-value key.
  * No joins, no windows, no driver-side loops anywhere in the hot path.
  */
object ClusterAnalyzer {

  /** One-pass parse + classify, KEEPING unparsed lines (`parsed=false`) so
    * `total_lines` can be counted in the same scan. Adds:
    * level/timestamp/thread/clazz/line/message, parsed, issues,
    * is_error, is_warning.
    */
  def classify(raw: DataFrame, lineCol: String = "value"): DataFrame = {
    val p = LogLineParser.parseKeepingUnmatched(raw, lineCol)
    p.withColumn("issues",
        when(col("parsed"), IssueClassifier.issues(col("message")))
          .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(graft.model.Schemas.issue))))
      .withColumn("is_error",
        col("parsed") && IssueClassifier.isError(col("level"), col("message")))
      .withColumn("is_warning",
        col("parsed") && IssueClassifier.isWarning(col("level"), col("message")))
  }

  /** Per-node summary (`analysis['summary']`,
    * `cassandra_log_analyzer.py:259-263`): errors / warnings over PARSED
    * lines (dual counting allowed), `total_lines` over ALL lines
    * including blanks and unparsed continuations (`:231,:262`).
    * One scan, one aggregate.
    */
  def summary(classified: DataFrame): DataFrame =
    classified.groupBy("node").agg(
      sum(when(col("is_error"), 1L).otherwise(0L)).as("errors"),
      sum(when(col("is_warning"), 1L).otherwise(0L)).as("warnings"),
      count(lit(1)).as("total_lines"))

  /** Global issue histogram (`analysis['issue_counts']`,
    * `cassandra_log_analyzer.py:253-254`): every (line, pattern) hit
    * contributes 1 — a line matching k patterns adds k. Sorted count
    * desc as the report does (`:757-758`), with issueType asc pinned for
    * determinism (documented deviation, SURVEY.md §7.4.3).
    */
  def issueHistogram(classified: DataFrame): DataFrame =
    classified
      .select(explode(col("issues")).as("issue"))
      .groupBy(col("issue.issueType").as("issue_type"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(desc("occurrences"), asc("issue_type"))

  /** `errors_by_node` (`cassandra_log_analyzer.py:247`): full parsed
    * entries of error lines, in (node, file order). Kept as a DataFrame —
    * not `collect_list` — so it never materializes a node's errors in one
    * task at scale.
    */
  def errorsByNode(classified: DataFrame): DataFrame =
    classified.where(col("is_error"))
      .select("node", "level", "timestamp", "thread", "clazz", "line", "message", "line_number")
      .orderBy("node", "line_number")

  /** `warnings_by_node` (`cassandra_log_analyzer.py:251`). */
  def warningsByNode(classified: DataFrame): DataFrame =
    classified.where(col("is_warning"))
      .select("node", "level", "timestamp", "thread", "clazz", "line", "message", "line_number")
      .orderBy("node", "line_number")

  /** `timeline` (`cassandra_log_analyzer.py:256-257`): parsed entries with
    * level in (ERROR, WARN), file order — computed but never rendered by
    * the reference (quirk preserved; SURVEY.md §7.4.5).
    */
  def timeline(classified: DataFrame): DataFrame =
    classified.where(col("parsed") && col("level").isin("ERROR", "WARN"))
      .select("node", "level", "timestamp", "thread", "clazz", "line", "message", "line_number")
      .orderBy("node", "line_number")

  /** The 5 threshold rules of `_generate_recommendations`
    * (`cassandra_log_analyzer.py:270-309`), verbatim: (issue key,
    * strict-greater threshold, severity, issue label, advice).
    */
  val rules: Seq[(String, Long, Recommendation)] = Seq(
    ("timeout", 10L, Recommendation("HIGH", "Timeouts fréquents",
      "Vérifier la latence réseau, augmenter les timeouts, ou optimiser les requêtes")),
    ("oom", 0L, Recommendation("CRITICAL", "Out Of Memory détecté",
      "Augmenter la heap JVM ou réduire la charge. Vérifier les fuites mémoire.")),
    ("tombstone", 5L, Recommendation("MEDIUM", "Warnings tombstone",
      "Revoir le modèle de données, ajuster gc_grace_seconds, ou augmenter tombstone_warn_threshold")),
    ("gc", 5L, Recommendation("HIGH", "Pauses GC excessives",
      "Optimiser la heap JVM, considérer G1GC, ou réduire la charge")),
    ("dropped", 10L, Recommendation("HIGH", "Messages droppés",
      "Le cluster est surchargé. Ajouter des nodes ou optimiser les requêtes.")))

  /** Driver-side recommendations from a collected histogram (≤ 14 rows —
    * always tiny regardless of data scale), in rule order like the
    * reference.
    */
  def recommendations(histogram: DataFrame): Seq[Recommendation] =
    recommendationsFromCounts(histogram.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap)

  /** The threshold rules over already-collected counts — the ONE place
    * the `count > threshold` semantics live (renderers reuse this).
    */
  def recommendationsFromCounts(counts: Map[String, Long]): Seq[Recommendation] =
    rules.collect { case (key, thr, rec) if counts.getOrElse(key, 0L) > thr => rec }

  /** In-plan variant: broadcast-join the (≤ 5 row) rules relation to the
    * histogram and filter `occurrences > threshold` — used where the
    * result must stay a DataFrame (oracle queries).
    */
  def recommendationsPlan(spark: SparkSession, histogram: DataFrame): DataFrame = {
    import spark.implicits._
    val rulesDf = rules.zipWithIndex.map { case ((key, thr, rec), i) =>
      (i, key, thr, rec.severity, rec.issue, rec.recommendation)
    }.toDF("rule_order", "issue_type", "threshold", "severity", "issue", "recommendation")
    histogram.join(broadcast(rulesDf), "issue_type")  // hint audit: scalar (5 fixed recommendation rules)
      .where(col("occurrences") > col("threshold"))
      .orderBy("rule_order")
      .select("severity", "issue", "recommendation")
  }
}
