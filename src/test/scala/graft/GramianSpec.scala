package graft

import graft.functions.Gramian
import org.apache.spark.sql.functions._

/** The Gramian custom TypedImperativeAggregate: moment matrix equals
  * the brute-force double loop on any partitioning (merge
  * correctness), serde round-trips, grouped aggregation stays
  * per-group, ragged input fails fast.
  */
class GramianSpec extends SparkSuite {

  import spark.implicits._

  private val vecs: Seq[Seq[Long]] = Seq.tabulate(97) { r =>
    Seq.tabulate(5)(c => ((r * 31 + c * 17) % 23) - 11L)
  }

  private def brute(vs: Seq[Seq[Long]]): Map[(Int, Int), Long] = {
    val d = vs.head.length
    (for { i <- 0 until d; j <- i until d } yield
      (i, j) -> vs.map(v => v(i) * v(j)).sum).toMap
  }

  test("moment matrix == brute-force double loop, any partitioning") {
    val expected = brute(vecs)
    for (parts <- Seq(1, 3, 13)) {
      val got = vecs.toDF("m").repartition(parts)
        .agg(Gramian(col("m")).as("g"))
        .select(inline(col("g")))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
        .toMap
      assert(got === expected, s"parts=$parts")
    }
  }

  test("grouped moments stay per-group; null rows are skipped") {
    val df = Seq(
      (1, Some(Seq(2L, 3L))), (1, None), (1, Some(Seq(-1L, 4L))),
      (2, Some(Seq(10L, 0L)))).toDF("g", "m")
    val rows = df.groupBy("g").agg(Gramian(col("m")).as("g2"))
      .select(col("g"), inline(col("g2")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    // group 1: [2,3] and [-1,4] -> s00=4+1, s01=6-4, s11=9+16
    assert(rows((1, 0, 0)) === 5L)
    assert(rows((1, 0, 1)) === 2L)
    assert(rows((1, 1, 1)) === 25L)
    assert(rows((2, 0, 0)) === 100L)
    assert(rows((2, 0, 1)) === 0L)
    assert(rows((2, 1, 1)) === 0L)
  }

  test("serde round-trips through an empty and a filled buffer") {
    val agg = Gramian(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    val empty = agg.deserialize(agg.serialize(agg.createAggregationBuffer()))
    assert(empty === agg.createAggregationBuffer())
    val buf = agg.createAggregationBuffer()
    buf.add(org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(3L, -2L, 7L)))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back === buf)
    assert(back.cells((0, 2)) === 21L) // 3 * 7
    // merging the round-tripped state doubles every cell
    back.merge(buf)
    assert(back.cells === buf.cells.map { case (k, v) => k -> v * 2 })
  }

  test("ragged vectors fail fast instead of silently mis-shaping") {
    val e = intercept[Exception] {
      Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("m").repartition(1)
        .agg(Gramian(col("m")).as("g")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("gramian")), s"got: ${msgs(e)}")
  }
}
