package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-contract queries (`TESTDATA.md`). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its TIMESTAMP(NANOS) column (read as epoch-nanos long
    * under `spark.sql.legacy.parquet.nanosAsLong`) normalized: `ts` is a
    * proper TimestampType (µs, floor-truncated — same bucketing as
    * DuckDB's ns timestamps for any ≥µs granularity), `ts_ns` keeps the
    * exact nanos. Integer division on purpose: ~1.7e18 ns exceeds double
    * precision.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    apply(spark, dir, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
