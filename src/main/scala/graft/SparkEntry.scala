package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pushdown_agg")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ LogDomainQueries.queries ++
      TimeSeriesQueries.queries ++ TextAnalysisQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ WindowOpsQueries.queries ++
      TextRankQueries.queries ++ ExtendedOpsQueries.queries ++
      PipelineOpsQueries.queries ++ ScaleOpsQueries.queries ++
      CorpusOpsQueries.queries ++ QualityOpsQueries.queries ++
      InsightOpsQueries.queries ++ ModelOpsQueries.queries ++
      ShapeOpsQueries.queries ++ CrawlOpsQueries.queries ++
      graft.streaming.StreamingQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ LogDomainQueries.oracle ++
      TimeSeriesQueries.oracle ++ TextAnalysisQueries.oracle ++
      DedupQueries.oracle ++ SimilarityQueries.oracle ++
      MultimodalQueries.oracle ++ WindowOpsQueries.oracle ++
      TextRankQueries.oracle ++ ExtendedOpsQueries.oracle ++
      PipelineOpsQueries.oracle ++ ScaleOpsQueries.oracle ++
      CorpusOpsQueries.oracle ++ QualityOpsQueries.oracle ++
      InsightOpsQueries.oracle ++ ModelOpsQueries.oracle ++
      ShapeOpsQueries.oracle ++ CrawlOpsQueries.oracle ++
      graft.streaming.StreamingQueries.oracle
}
