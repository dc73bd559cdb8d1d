package graft

import java.nio.file.Files

import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Both fixture vintages of `events.ts` must normalize identically:
  * driver regenerations have shipped TIMESTAMP(NANOS) (read as
  * epoch-nanos long under `nanosAsLong` — rounds ≤9) and
  * TIMESTAMP[_NTZ] µs (round 10 on). All current testdata is µs, so
  * without this spec the legacy long path would be dead code until the
  * NEXT regeneration silently flips back to it — this pins both.
  */
class TsEncodingSpec extends SparkSuite {

  import spark.implicits._

  // one instant with sub-µs detail: 2024-01-15T10:00:01.123456789
  private val ns = 1705312801123456789L

  private def writeFixture(dir: java.nio.file.Path,
      tsCol: org.apache.spark.sql.Column): Unit =
    Seq((1L, ns, 7L, "view", 1.5, "{}"))
      .toDF("event_id", "raw_ns", "user_id", "event_type", "value", "props")
      .select(col("event_id"), tsCol.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)

  test("long-nanos and timestamp-µs fixtures normalize to the same shape") {
    val legacyDir = Files.createTempDirectory("graft-ts-legacy")
    val microsDir = Files.createTempDirectory("graft-ts-micros")
    try {
      // legacy vintage: ts IS an epoch-nanos long (what a
      // TIMESTAMP(NANOS) parquet column reads as under nanosAsLong)
      writeFixture(legacyDir, col("raw_ns"))
      // current vintage: ts is a µs timestamp (sub-µs detail gone at
      // WRITE time, exactly like the driver's generator)
      writeFixture(microsDir, timestamp_micros(expr("raw_ns div 1000")))

      val legacy = Tables.events(spark, legacyDir.toString)
        .select("event_id", "ts", "ts_ns").head()
      val micros = Tables.events(spark, microsDir.toString)
        .select("event_id", "ts", "ts_ns").head()

      // ts: identical µs-floored TimestampType instant in both
      assert(legacy.getTimestamp(1) === micros.getTimestamp(1))
      // ts_ns: exact nanos where the fixture carries them, µs·1000
      // otherwise — matching DuckDB's epoch_ns(ts) on each vintage
      assert(legacy.getLong(2) === ns)
      assert(micros.getLong(2) === (ns / 1000L) * 1000L)
      // the µs arithmetic every query buckets with must agree
      assert(legacy.getLong(2) / 1000L === micros.getLong(2) / 1000L)
    } finally {
      graft.util.FileUtils.deleteRecursively(legacyDir)
      graft.util.FileUtils.deleteRecursively(microsDir)
    }
  }

  test("tsUs column matches DuckDB's epoch_us on both encodings") {
    import org.apache.spark.sql.types._
    val us = ns / 1000L
    val fromLong = Seq(ns).toDF("ts")
      .select(Tables.tsUs(LongType).as("us")).head().getLong(0)
    val fromTs = Seq(new java.sql.Timestamp(us / 1000L)).toDF("raw")
      .select(timestamp_micros(lit(us)).as("ts"))
      .select(Tables.tsUs(TimestampType).as("us")).head().getLong(0)
    assert(fromLong === us && fromTs === us)
  }
}
