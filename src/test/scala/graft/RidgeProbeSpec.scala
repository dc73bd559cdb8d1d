package graft

import graft.functions.Gramian
import org.apache.spark.sql.functions._

/** RidgeProbe: the moment-matrix solve recovers planted coefficients
  * exactly (up to quantization), the moment-derived MSE matches a
  * direct residual computation, and the embeddings fit beats the
  * mean-only baseline.
  */
class RidgeProbeSpec extends SparkSuite {

  import spark.implicits._

  private val micro = 1000000L

  /** Build the q148-shaped moment frame for (features, y) rows. */
  private def moments(data: Seq[(Seq[Double], Double)]) =
    data.toDF("x", "y")
      .select(concat(
        expr(s"transform(x, v -> cast(floor(v * $micro) as bigint))"),
        array(lit(1L)),
        array(expr(s"cast(floor(y) as bigint)"))).as("m"))
      .agg(Gramian(col("m")).as("g"))
      .select(inline(col("g")))
      .select(col("i").as("dim_i"), col("j").as("dim_j"),
        col("v").as("s_micro"))

  test("recovers planted integer-valued linear coefficients") {
    // y = 3*x0 - 2*x1 + 5, x on a micro-exact grid, y integral so the
    // label quantization (floor) is lossless
    val data = for (i <- 0 until 40; j <- 0 until 3) yield {
      val x0 = i.toDouble; val x1 = (i % 7 + j).toDouble
      (Seq(x0, x1), 3.0 * x0 - 2.0 * x1 + 5.0)
    }
    val m = graft.ext.RidgeProbe.train(moments(data))
    assert(math.abs(m.weights(0) - 3.0) < 1e-6)
    assert(math.abs(m.weights(1) + 2.0) < 1e-6)
    assert(math.abs(m.intercept - 5.0) < 1e-4)
    assert(m.trainMse < 1e-9, s"noise-free fit must be exact: ${m.trainMse}")
    // prediction surface agrees
    assert(math.abs(m.predict(Array(10.0, 4.0)) - 27.0) < 1e-4)
  }

  test("ridge lambda shrinks weights and rescues a singular system") {
    // perfectly collinear features: unregularized normal equations are
    // singular, ridge must solve and split weight between the copies
    val data = (0 until 60).map { i =>
      (Seq(i.toDouble, i.toDouble), 4.0 * i)
    }
    intercept[IllegalArgumentException] {
      graft.ext.RidgeProbe.train(moments(data))
    }
    val m = graft.ext.RidgeProbe.train(moments(data), lambda = 1e-3)
    assert(math.abs(m.weights(0) + m.weights(1) - 4.0) < 1e-2,
      s"collinear weights must sum to the true slope: ${m.weights.toSeq}")
  }

  test("embeddings probe from the gated q148 moments beats the mean baseline") {
    val m = graft.ext.RidgeProbe.train(
      graft.queries.ModelOpsQueries.queries("q148_gramian")(
        spark, "/root/testdata/sf0.001"))
    assert(m.weights.length === 64)
    assert(m.targetVar > 0.0)
    assert(m.trainMse <= m.targetVar,
      s"probe (${m.trainMse}) must not lose to the mean (${m.targetVar})")
    // moment-derived MSE == direct residual MSE over the corpus
    val rows = graft.queries.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("embedding"), col("label").cast("double")).collect()
      .map(r => (r.getSeq[Float](0).toArray, r.getDouble(1)))
    val direct = rows.map { case (x, y) =>
      // the probe was fit on floor-micro-quantized features — evaluate
      // on the same quantized values to compare like with like
      val xq = x.map(v => math.floor(v.toDouble * micro) / micro.toDouble)
      val e = m.predict(xq) - y
      e * e
    }.sum / rows.length
    assert(math.abs(m.trainMse - direct) < 1e-8 * (1.0 + direct),
      s"moment mse ${m.trainMse} vs direct $direct")
  }
}
