package graft

import graft.functions.KMinValues
import org.apache.spark.sql.functions._

/** The KMV custom TypedImperativeAggregate: sketch equals the brute
  * force k-smallest-distinct on any partitioning (merge correctness),
  * state stays bounded, serde round-trips, estimator is sane.
  */
class KMinValuesSpec extends SparkSuite {

  import spark.implicits._

  private val k = 8

  test("sketch == brute-force k smallest distinct, any partitioning") {
    val values = Seq.tabulate(5000)(i => (i * 2654435761L) % 100003L)
    val expected = values.distinct.sorted.take(k)
    for (parts <- Seq(1, 3, 13)) {
      val got = values.toDF("v").repartition(parts)
        .agg(KMinValues(col("v"), k).as("sk"))
        .head().getSeq[Long](0)
      assert(got.toSeq === expected, s"parts=$parts")
    }
  }

  test("duplicates collapse; fewer than k distinct yields them all, sorted") {
    val got = Seq(5L, 3L, 5L, 3L, 9L, 9L, 1L).toDF("v")
      .repartition(4)
      .agg(KMinValues(col("v"), k).as("sk"))
      .head().getSeq[Long](0)
    assert(got.toSeq === Seq(1L, 3L, 5L, 9L))
  }

  test("nulls are ignored and grouped sketches stay per-group") {
    val df = Seq((1, Some(10L)), (1, None), (1, Some(7L)),
      (2, Some(3L)), (2, Some(3L))).toDF("g", "v")
    val rows = df.groupBy("g").agg(KMinValues(col("v"), k).as("sk"))
      .orderBy("g").collect()
    assert(rows(0).getSeq[Long](1).toSeq === Seq(7L, 10L))
    assert(rows(1).getSeq[Long](1).toSeq === Seq(3L))
  }

  test("serde round-trip preserves the buffer") {
    val agg = graft.functions.KMinValues(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), k)
    val buf = agg.createAggregationBuffer()
    Seq(42L, 7L, 42L, 99L, 1L).foreach { v =>
      val b2 = agg.createAggregationBuffer(); b2.add(v); agg.merge(buf, b2)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back === buf)
  }

  test("k_min_values is callable through the SQL registry") {
    Seq(5L, 3L, 5L, 9L, 1L).toDF("v").createOrReplaceTempView("kmv_t")
    val got = spark.sql("SELECT k_min_values(v, 3) AS sk FROM kmv_t")
      .head().getSeq[Long](0)
    assert(got.toSeq === Seq(1L, 3L, 5L))
    // all values are odd → one group, sketch = the 2 smallest distinct
    val grouped = spark.sql(
      """SELECT v % 2 AS g, k_min_values(v, 2) AS sk
        |FROM kmv_t GROUP BY v % 2""".stripMargin).collect()
    assert(grouped.length === 1)
    assert(grouped(0).getSeq[Long](1).toSeq === Seq(1L, 3L))
  }

  test("integral inputs cast up; non-numeric inputs fail analysis") {
    Seq(5L, 3L, 5L, 9L, 1L).toDF("v").createOrReplaceTempView("kmv_t2")
    val got = spark.sql("SELECT k_min_values(CAST(v AS INT), 2) FROM kmv_t2")
      .head().getSeq[Long](0)
    assert(got.toSeq === Seq(1L, 3L))
    val err = intercept[Exception] {
      spark.sql("SELECT k_min_values(CAST(v AS STRING), 2) FROM kmv_t2").collect()
    }
    assert(err.getMessage.contains("BIGINT"))
  }

  test("KMV estimate lands within 3 standard errors of exact distinct") {
    // KMV standard error ~ 1/sqrt(k-2); use the fixture's user ids
    val kk = 32
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.01")
    // spread hash (see TextFunctions.spreadHash): raw polyHash of
    // short id strings is small-valued, not uniform over [0, P)
    val h = graft.functions.TextFunctions.spreadHash(
      col("user_id").cast("string"))
    val row = events.agg(
      countDistinct(col("user_id")).as("exact"),
      KMinValues(h, kk).as("sk")).head()
    val exact = row.getLong(0).toDouble
    val sk = row.getSeq[Long](1)
    assert(sk.length === kk) // far more distinct users than k
    val est = (kk - 1).toDouble * graft.functions.TextFunctions.P.toDouble /
      sk.last.toDouble
    val se = 1.0 / math.sqrt((kk - 2).toDouble)
    assert(math.abs(est - exact) / exact <= 3 * se,
      s"estimate $est vs exact $exact")
  }
}
