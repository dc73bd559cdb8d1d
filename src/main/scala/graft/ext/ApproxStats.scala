package graft.ext

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The approximate tier (SURVEY.md §4 "100 TB extension"): sketch-based
  * answers where exact ones stop scaling. Exact `COUNT(DISTINCT)` is a
  * full shuffle of every distinct value; HLL++ is one pass, fixed
  * memory, mergeable across partitions — the difference between a
  * terabyte shuffle and a kilobyte sketch at cluster scale. Same for
  * percentile: exact needs a global sort, the sketch merges locally.
  *
  * These are NOT in the DuckDB-oracle query set on purpose — sketch
  * internals differ across engines, so cross-engine hash equality is
  * impossible by construction. Their contract is tolerance vs the exact
  * answer, pinned by ApproxStatsSpec.
  */
object ApproxStats {

  /** Near-duplicate cardinality screen: approximate distinct canonical
    * forms per source vs raw doc counts — the cheap first pass that
    * decides whether a corpus slice needs real dedup. `rsd` is HLL++
    * relative standard deviation (default 5%).
    */
  def dedupCardinality(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        approx_count_distinct(
          TextFunctions.canonicalKey(col("text")), rsd).as("approx_distinct"))
      .withColumn("approx_dup_ratio",
        lit(1.0) - col("approx_distinct").cast("double") / col("n_docs"))

  /** Distribution sketch of a numeric column per group:
    * `approx_percentile` with bounded accuracy (mergeable t-digest-like
    * summaries; no global sort).
    */
  def valueQuantiles(df: DataFrame, valueCol: String, groupCol: String,
      probabilities: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCol)
      .agg(percentile_approx(col(valueCol),
        array(probabilities.map(lit): _*), lit(accuracy)).as("quantiles"),
        count(lit(1)).as("n"))

  /** Token-vocabulary size estimate over a whole corpus — one pass,
    * no explode-shuffle of every token instance.
    */
  def approxVocabulary(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .agg(approx_count_distinct(col("tok"), rsd).as("approx_vocab"))
}
