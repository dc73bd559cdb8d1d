package graft

import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSuite {
  import spark.implicits._

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(functions.MisraGries(col("item"), k).as("s"))
      .collect().head.getMap[String, Long](0).toMap

  test("exact when distinct items fit in k counters") {
    val df = (1 to 1000).map(i => s"i${i % 7}").toDF("item")
    val got = sketchOf(df.repartition(5), 16)
    val want = (0 until 7).map(j => s"i$j" ->
      (1 to 1000).count(_ % 7 == j).toLong).toMap
    assert(got == want)
  }

  test("guarantees hold on a skewed stream under any partitioning") {
    // 3 hot items (20%) + long cold tail, like the q95 construction
    val items = (1 to 5000).map { i =>
      if (i % 100 < 60) s"hot${i % 3}" else s"cold${i % 89}"
    }
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = items.size.toLong
    for (parts <- Seq(1, 4, 13); k <- Seq(8, 16)) {
      val got = sketchOf(items.toDF("item").repartition(parts), k)
      assert(got.size <= k)
      for ((item, est) <- got) {
        val t = exact.getOrElse(item, 0L)
        assert(est <= t, s"overcount for $item at parts=$parts k=$k")
        assert((t - est) * (k + 1) <= n,
          s"undercount bound broken for $item at parts=$parts k=$k")
      }
      // every guaranteed-heavy item must be tracked
      for ((item, t) <- exact if t * (k + 1) > n)
        assert(got.contains(item),
          s"heavy item $item missing at parts=$parts k=$k")
    }
  }

  test("nulls are skipped; non-string input fails analysis") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("item")
    assert(sketchOf(df, 4) == Map("a" -> 2L, "b" -> 1L))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L, 2L).toDF("x")
        .agg(functions.MisraGries(col("x"), 4)).collect()
    }
    assert(err.getMessage.contains("STRING"))
  }

  test("reachable from raw SQL through the session registry") {
    Seq("a", "b", "a").toDF("item").createOrReplaceTempView("mg_smoke")
    val m = spark.sql("SELECT misra_gries(item, 4) AS s FROM mg_smoke")
      .collect().head.getMap[String, Long](0).toMap
    assert(m == Map("a" -> 2L, "b" -> 1L))
  }

  test("serialize/deserialize round-trips the counter state") {
    val agg = functions.MisraGries(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("item")), 8)
    val buf = agg.createAggregationBuffer()
    Seq("a", "b", "a", "c", "a").foreach(buf.add(_))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.counts == buf.counts)
  }
}
