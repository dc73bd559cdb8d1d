package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Oracle-gated Structured Streaming: the windowed-count plan from
  * `LogStreams.windowedIssueCounts` run THROUGH the streaming engine
  * (micro-batch execution, state store, watermark eviction) via
  * `Trigger.AvailableNow` over the driver's parquet fixture, so the
  * DuckDB oracle hash-gates what the incremental executor actually
  * emits — not just the batch twin of the same plan.
  *
  * Watermark semantics mirrored in SQL (so Append-mode emission is part
  * of the gated contract, same constants both sides):
  *   watermark_us = floor(max(event_time)/1ms) * 1000 - delay
  *     (Spark's EventTimeStatsAccum tracks the max in whole ms);
  *   a window is emitted iff window.end <= watermark_us
  *     (WatermarkSupport.watermarkExpression uses LessThanOrEqual).
  * The final no-data micro-batch that AvailableNow runs after the data
  * batch is what advances the watermark and flushes closed windows.
  *
  * Single-batch premise: the fixture is ONE parquet file staged alone
  * into the source directory, well under the default
  * maxFilesPerTrigger, so the data arrives in exactly one micro-batch
  * and no event can be late relative to a mid-stream watermark — the
  * oracle's "all rows participate" arithmetic is therefore exact.
  *
  * Scale notes: state is (window × event_type) — bounded by the
  * watermark horizon, evicted on advance; the shuffle key spreads
  * naturally. `maxFilesPerTrigger` bounds micro-batch size under
  * backlog; a real deployment swaps `Trigger.AvailableNow` for a
  * processing-time trigger with zero plan changes.
  */
object StreamingQueries {

  private val dec2 = DecimalType(18, 2)
  private val windowUs = 300000000L // 5 minutes
  private val delayUs = 600000000L // 10-minute watermark delay

  // unique sink/checkpoint per invocation — Bench runs the query three
  // times (warmup + 2 timed) in one session
  private val runSeq = new AtomicInteger(0)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p) // stream holds a directory fd until closed
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E20 oracle-gated: per-(5-min window, event_type) counts + decimal
    // value sums, emitted by Append-mode watermark eviction.
    "q59_stream_window" -> ((s, dir) => {
      val src = Paths.get(s"$dir/events.parquet")
      // FileStreamSource requires a DIRECTORY ("Option basePath must be
      // a directory"); the driver fixture is a single parquet FILE, so
      // stage it into a temp dir first (copy, not symlink — Hadoop's
      // RawLocalFileSystem stat of symlinks is platform-dependent).
      val stage = Files.createTempDirectory("graft-q59-src")
      val ckpt = Files.createTempDirectory("graft-q59-ckpt")
      val sink = s"graft_q59_sink_${runSeq.incrementAndGet()}"
      try {
        Files.copy(src, stage.resolve("events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        // schema from a batch read (ts is epoch-nanos long under
        // nanosAsLong); readStream requires it explicitly
        val schema = s.read.parquet(src.toString).schema
        val agg = s.readStream.schema(schema).parquet(stage.toString)
          .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
          .withWatermark("event_time", "10 minutes")
          .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(dec2)).as("sv"))
          .select(unix_micros(col("window.start")).as("window_us"),
            col("event_type"), col("n_events"),
            col("sv").cast("double").as("sum_value"))
        val query = agg.writeStream.format("memory").queryName(sink)
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        // Materialize into a LocalRelation so the returned frame
        // survives the temp-view drop and dir cleanup below. The
        // result is tiny by construction: one row per closed
        // (5-minute window × event_type).
        val out = s.table(sink).orderBy("window_us", "event_type")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        s.catalog.dropTempView(sink)
        deleteRecursively(ckpt)
        deleteRecursively(stage)
      }
    }),

    // E20 streaming dedup, oracle-gated: dropDuplicates over
    // (user_id, event_type) run through the incremental engine — the
    // streaming state store sees every key, Append emits each key's
    // first arrival. The output is ONLY the key columns, so the result
    // is the distinct key set regardless of which physical row won the
    // race — the determinism contract a streaming dedup must offer
    // (non-key columns of "the first row" are arrival-order-dependent
    // by definition). Oracle: plain SELECT DISTINCT.
    "q69_stream_dedup" -> ((s, dir) => {
      val src = Paths.get(s"$dir/events.parquet")
      val stage = Files.createTempDirectory("graft-q69-src")
      val ckpt = Files.createTempDirectory("graft-q69-ckpt")
      val sink = s"graft_q69_sink_${runSeq.incrementAndGet()}"
      try {
        Files.copy(src, stage.resolve("events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val schema = s.read.parquet(src.toString).schema
        val dedup = s.readStream.schema(schema).parquet(stage.toString)
          .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
          .withWatermark("event_time", "10 minutes")
          .dropDuplicates("user_id", "event_type")
          .select(col("user_id"), col("event_type"))
        val query = dedup.writeStream.format("memory").queryName(sink)
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        val out = s.table(sink).orderBy("user_id", "event_type")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        s.catalog.dropTempView(sink)
        deleteRecursively(ckpt)
        deleteRecursively(stage)
      }
    }))

  def oracle: Map[String, String] = Map(
    // Same window arithmetic + the Append-mode emission predicate: the
    // watermark is the ms-floored max event time minus the delay, and
    // only windows whose END has passed it are in the output.
    "q59_stream_window" ->
      s"""WITH e AS (SELECT (epoch_us(ts) // $windowUs) * $windowUs AS window_us,
         |                  event_type, value FROM events),
         |wm AS (SELECT MAX(epoch_ms(ts)) * 1000 - $delayUs AS w FROM events)
         |SELECT window_us, event_type, COUNT(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM e WHERE window_us + $windowUs <= (SELECT w FROM wm)
         |GROUP BY window_us, event_type
         |ORDER BY window_us, event_type""".stripMargin,
    "q69_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin)
}
