package graft.tools

import graft.queries.LogDomainQueries
import graft.streaming.StreamingQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The log-analytics loop composed ENTIRELY from the library's
  * oracle-gated building blocks — the SIXTH composition proof (after
  * curation, vector-index, retrieval, crawl, and features), and the
  * one on the reference's own domain
  * (`/root/reference/cassandra_log_analyzer.py` parses, classifies,
  * and reports; this runs that surface PLUS the mining tier the
  * reference's roadmap only promises):
  *
  *   1. ingest + parse     (the synthesized Cassandra-style corpus
  *                          through the reference's exact parse regex
  *                          — q11)
  *   2. classify + summary (per-node dual error/warning counting —
  *                          q13, the reference's A1)
  *   3. template mining    (Drain-style digit-run masking — q183)
  *   4. parameter slots    (per-(template, slot) value stats — q187)
  *   5. slot anomaly       (recent-window values vs history envelopes
  *                          — q191)
  *   6. emergence alerting (unknown templates surfaced by the REAL
  *                          incremental engine, Append mode — q188)
  *   7. report             (Markdown digest of every stage)
  *
  * Every stage invokes the gated query REGISTRY entry itself (not a
  * re-derivation), so the pipeline run IS the gated semantics —
  * LogOpsPipelineSpec pins the artifact-level invariants on the
  * written parquet (gate parity per stage, anomaly/emergent templates
  * ⊆ the mined catalog).
  */
object LogOpsPipeline {

  case class Summary(
      totalLines: Long, parsedLines: Long, nodes: Long,
      errors: Long, warnings: Long,
      nTemplates: Long, nSlots: Long, anomalousSlots: Long,
      emergentTemplates: Long)

  private def gated(name: String)(
      spark: SparkSession, sfDir: String): DataFrame =
    (LogDomainQueries.queries ++ StreamingQueries.queries)(name)(spark, sfDir)

  /** Runs the loop over `$sfDir/events.parquet`, writes each stage's
    * artifact under `outDir`, returns the stage summary. Cost model:
    * each batch stage is one corpus scan + a template-bounded rollup
    * (log formats are finite); the emergence stage runs the real
    * micro-batch engine with a broadcast anti-probe per batch.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String): Summary = {
    // 1: ingest + parse (the q11 gate's parse-projection)
    val totalLines = LogDomainQueries.Corpus.logs(spark, sfDir).count()
    val parsedLines = gated("q11_parse_extract")(spark, sfDir).count()

    // 2: classify + per-node summary
    val summary = gated("q13_level_summary")(spark, sfDir)
    summary.write.mode("overwrite").parquet(s"$outDir/node_summary")
    val sRow = spark.read.parquet(s"$outDir/node_summary")
      .agg(count(lit(1)), sum(col("errors")), sum(col("warnings"))).head()

    // 3: template mining — the catalog artifact
    gated("q183_log_templates")(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/templates")
    val nTemplates = spark.read.parquet(s"$outDir/templates").count()

    // 4: parameter-slot stats
    gated("q187_template_params")(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/template_params")
    val nSlots = spark.read.parquet(s"$outDir/template_params").count()

    // 5: slot-anomaly screen
    gated("q191_slot_anomaly")(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/slot_anomalies")
    val anomalousSlots = spark.read.parquet(s"$outDir/slot_anomalies")
      .where(col("n_anomalous") > 0).count()

    // 6: streaming template emergence (the real incremental engine)
    gated("q188_stream_template_emergence")(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/emergent_templates")
    val emergent = spark.read.parquet(s"$outDir/emergent_templates").count()

    val s = Summary(totalLines, parsedLines, sRow.getLong(0),
      sRow.getLong(1), sRow.getLong(2), nTemplates, nSlots,
      anomalousSlots, emergent)

    // 7: the Markdown digest an operator reads
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/report.md"), renderReport(s))
    s
  }

  private def renderReport(s: Summary): String =
    s"""# Rapport LogOps
       |
       |## Ingestion
       |- Lignes: ${s.totalLines} (parsées: ${s.parsedLines})
       |- Nodes: ${s.nodes}
       |
       |## Classification
       |- Erreurs: ${s.errors}
       |- Warnings: ${s.warnings}
       |
       |## Minage de templates
       |- Templates: ${s.nTemplates}
       |- Slots de paramètres: ${s.nSlots}
       |- Slots avec anomalies: ${s.anomalousSlots}
       |- Templates émergents (streaming): ${s.emergentTemplates}
       |""".stripMargin
}
