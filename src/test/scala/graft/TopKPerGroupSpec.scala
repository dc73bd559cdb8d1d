package graft

import graft.plans.{TopK, TopKStrategy}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom TopKPerGroup operator: result parity with the window
  * row_number formulation, the two-phase partial/final physical shape,
  * and shuffle-volume behavior (only k rows per group per partition
  * reach the exchange).
  */
class TopKPerGroupSpec extends SparkSuite {

  private lazy val orders = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")
    .select("o_custkey", "o_orderkey", "o_totalprice")

  /** Final physical plan with the AQE wrapper peeled off. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("matches the window row_number formulation on the corpus") {
    for (k <- Seq(1, 3)) {
      val custom = TopK.perGroup(orders, Seq("o_custkey"),
        Seq("o_totalprice" -> true, "o_orderkey" -> false), k)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val reference = orders.withColumn("rn", row_number().over(w))
        .where(col("rn") <= k).drop("rn")
      assert(custom.exceptAll(reference).count() === 0, s"k=$k extra rows")
      assert(reference.exceptAll(custom).count() === 0, s"k=$k missing rows")
    }
  }

  test("plans as partial + final exec with one exchange between them") {
    val df = TopK.perGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 2)
    df.collect() // force AQE final plan
    // AQE nests the stages, so assert on the rendered plan: partial
    // below the hash exchange on the group key, final above it
    val ps = finalPlan(df).toString
    assert(ps.contains("TopKPerGroup (partial)"), ps)
    assert(ps.contains("TopKPerGroup (final)"), ps)
    assert(ps.contains("Exchange hashpartitioning(o_custkey"), ps)
    assert(ps.indexOf("TopKPerGroup (final)") <
      ps.indexOf("Exchange hashpartitioning"), ps)
    assert(ps.indexOf("Exchange hashpartitioning") <
      ps.indexOf("TopKPerGroup (partial)"), ps)
  }

  test("result is bounded by k rows per group on a multi-partition input") {
    val over = TopK.perGroup(orders.repartition(4), Seq("o_custkey"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 2)
      .groupBy("o_custkey").count().where(col("count") > 2)
    assert(over.count() === 0)
  }

  test("floating-point group keys and empty group lists are rejected") {
    val e1 = intercept[IllegalArgumentException] {
      TopK.perGroup(orders, Seq("o_totalprice"), Seq("o_orderkey" -> false), 1)
    }
    assert(e1.getMessage.contains("floating-point"))
    val e2 = intercept[IllegalArgumentException] {
      TopK.perGroup(orders, Seq.empty, Seq("o_orderkey" -> false), 1)
    }
    assert(e2.getMessage.contains("at least one group column"))
  }

  test("k larger than any group returns everything") {
    val df = TopK.perGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 1000000)
    assert(df.count() === orders.count())
  }

  test("partial phase flushes under a tiny budget without changing results") {
    // o_orderkey is (near-)unique → every row is its own group: the
    // worst case for the partial heap map. A 4-row budget forces a
    // flush every few input rows; the final phase must still merge the
    // repeated partials exactly.
    spark.conf.set(TopKStrategy.flushRowsKey, "4")
    try {
      val custom = TopK.perGroup(orders.repartition(4), Seq("o_orderkey"),
        Seq("o_totalprice" -> true, "o_custkey" -> false), 2)
      val w = Window.partitionBy("o_orderkey")
        .orderBy(col("o_totalprice").desc, col("o_custkey").asc)
      val reference = orders.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2).drop("rn")
      assert(custom.exceptAll(reference).count() === 0, "extra rows")
      assert(reference.exceptAll(custom).count() === 0, "missing rows")
    } finally spark.conf.unset(TopKStrategy.flushRowsKey)
  }

  test("operator metrics report combine ratio, groups, and budget flushes") {
    import graft.plans.{TopKFinalExec, TopKPartialExec}
    // AQE wraps executed stages in QueryStageExec nodes that
    // plan.collect does not traverse — run this test's plans static
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val nGroups = orders.select("o_custkey").distinct().count()
      val df = TopK.perGroup(orders, Seq("o_custkey"),
        Seq("o_totalprice" -> true, "o_orderkey" -> false), 2)
      // collect() executes df's OWN plan instance — count() would build
      // and execute a different one, leaving these metrics untouched
      val expected = df.collect().length
      val plan = finalPlan(df)
      val partial = plan.collect { case p: TopKPartialExec => p }.head
      val fin = plan.collect { case f: TopKFinalExec => f }.head
      assert(partial.metrics("numInputRows").value === orders.count())
      // map-side combine: partial output strictly below input, final
      // output = query result, group count = distinct keys
      assert(partial.metrics("numOutputRows").value < orders.count())
      assert(partial.metrics("numFlushes").value === 0) // default budget never trips
      assert(fin.metrics("numOutputRows").value === expected)
      assert(fin.metrics("numGroups").value === nGroups)
      // a 4-row budget MUST record flushes on the same data
      spark.conf.set(TopKStrategy.flushRowsKey, "4")
      try {
        val df2 = TopK.perGroup(orders, Seq("o_custkey"),
          Seq("o_totalprice" -> true, "o_orderkey" -> false), 2)
        df2.collect()
        val p2 = finalPlan(df2).collect { case p: TopKPartialExec => p }.head
        assert(p2.metrics("numFlushes").value > 0)
      } finally spark.conf.unset(TopKStrategy.flushRowsKey)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("final phase is sort-based: a spill-safe Sort sits between the exchange and the final exec") {
    val df = TopK.perGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 2)
    df.collect()
    val ps = finalPlan(df).toString
    val fin = ps.indexOf("TopKPerGroup (final)")
    val sort = ps.indexOf("Sort ")
    val ex = ps.indexOf("Exchange hashpartitioning")
    assert(fin >= 0 && sort >= 0 && ex >= 0, ps)
    assert(fin < sort && sort < ex,
      s"expected final < Sort < Exchange in:\n$ps")
  }
}
