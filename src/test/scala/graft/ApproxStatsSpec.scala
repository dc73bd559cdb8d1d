package graft

import graft.ext.ApproxStats
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Approximate tier: sketches land within their accuracy contract of
  * the exact answers on the real corpus.
  */
class ApproxStatsSpec extends SparkSuite {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
  private lazy val events = spark.read
    .parquet("/root/testdata/sf0.01/events.parquet")

  test("dedupCardinality within 3*rsd of exact distinct per source") {
    val exact = docs.groupBy("source")
      .agg(countDistinct(TextFunctions.canonicalKey(col("text"))).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ApproxStats.dedupCardinality(docs).collect().foreach { r =>
      val e = exact(r.getString(0)).toDouble
      val a = r.getAs[Long]("approx_distinct").toDouble
      assert(math.abs(a - e) <= math.max(2.0, 3 * 0.05 * e),
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("valueQuantiles: sketch median within 2% of exact median") {
    val approx = ApproxStats.valueQuantiles(events, "value", "event_type")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    val exact = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, m) =>
      assert(math.abs(approx(k) - m) <= 0.02 * math.abs(m) + 1e-9,
        s"$k: approx ${approx(k)} vs exact $m")
    }
  }

  test("approxVocabulary close to the exact distinct-token count") {
    val exact = docs.select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0).toDouble
    val approx = ApproxStats.approxVocabulary(docs).head().getLong(0).toDouble
    assert(math.abs(approx - exact) <= math.max(2.0, 0.15 * exact))
  }
}
