package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-domain + semi-structured extension queries over `events`:
  * tumbling-window aggregation, JSON property extraction, and a
  * scalable as-of join (union + running last-value — O(n log n) per
  * key, no pairwise blowup, the standard large-scale formulation).
  *
  * Windowing is arithmetic epoch bucketing (identical in DuckDB),
  * not `window()` — same semantics, exact cross-engine twin, and the
  * bucket expression computes in the scan stage under codegen.
  */
object TimeSeriesQueries {

  private val dec2 = DecimalType(18, 2)
  private val bucketNs = 300000000000L // 5 minutes

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 5-min window per event_type; partial agg map-side, the
    // only shuffle is the (bucket, type) groupBy itself
    "q18_time_bucket" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("bucket", expr(s"ts_ns div $bucketNs"))
        .groupBy("bucket", "event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(dec2)).cast("double").as("sum_value"),
          (sum(col("value").cast(dec2)).cast("double") / count(lit(1))).as("avg_value"))
        .orderBy("bucket", "event_type")
    }),

    // JSON property pulled out of the props column in the scan stage
    "q19_json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("k_bucket")
    }),

    // As-of join: for each order, the latest event (ts <= o_orderdate)
    // of the matching key. Union both sides, one window pass per key:
    // scales as a single shuffle + sort, never builds candidate pairs.
    // (At cluster scale the 15-key toy mapping would be range-partition
    // + salt territory; the plan shape is the point.)
    "q20_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select((col("user_id") % 15).as("k"), col("ts_ns").as("t"),
          lit(null).cast("long").as("o_orderkey"),
          lit(0).as("is_order"), col("event_id").as("tid"))
      val ord = Tables(s, dir, "orders")
        .select((col("o_custkey") % 15).as("k"),
          (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L).as("t"),
          col("o_orderkey"), lit(1).as("is_order"),
          col("o_orderkey").as("tid"))
      val w = Window.partitionBy("k")
        .orderBy(col("t"), col("is_order"), col("tid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.unionByName(ord)
        .withColumn("last_event_ns",
          last(when(col("is_order") === 0, col("t")), ignoreNulls = true).over(w))
        .where(col("is_order") === 1)
        .select(col("o_orderkey"), col("k"), col("last_event_ns"))
        .orderBy("o_orderkey")
    }))

  def oracle: Map[String, String] = Map(
    "q18_time_bucket" ->
      s"""SELECT epoch_ns(ts) // $bucketNs AS bucket, event_type,
         |  COUNT(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
         |FROM events GROUP BY bucket, event_type
         |ORDER BY bucket, event_type""".stripMargin,
    "q19_json_extract" ->
      """SELECT k % 10 AS k_bucket, COUNT(*) AS n_events,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin,
    "q20_asof_join" ->
      """WITH u AS (
        |  SELECT user_id % 15 AS k, epoch_ns(ts) AS t,
        |         CAST(NULL AS BIGINT) AS o_orderkey, 0 AS is_order,
        |         event_id AS tid
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey % 15, epoch_ns(o_orderdate), o_orderkey, 1,
        |         o_orderkey
        |  FROM orders)
        |SELECT o_orderkey, k, last_event_ns FROM (
        |  SELECT *, last_value(CASE WHEN is_order = 0 THEN t END IGNORE NULLS)
        |    OVER (PARTITION BY k ORDER BY t, is_order, tid
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_event_ns
        |  FROM u) WHERE is_order = 1
        |ORDER BY o_orderkey""".stripMargin)
}
