package graft.ext

import org.apache.spark.sql.DataFrame

/** Ridge-regression linear probe fit from the q148 augmented moment
  * matrix — the consumer that turns the one-pass Gramian into a model
  * artifact. The cluster's ONLY job is the 2,211-row moment frame
  * (one scan, fixed state — see [[graft.functions.Gramian]]); the
  * solve is a (d+1)×(d+1) driver-side Gaussian elimination, and even
  * the training error comes from the moments:
  *
  *   mse = (yᵀy − 2wᵀ(Xᵀy) + wᵀ(XᵀX)w) / n
  *
  * so fitting never re-touches the corpus. This is the standard
  * sufficient-statistics decomposition of least squares: at 100 TB
  * the fit costs one scan + a 66×66 solve, and refreshing it under
  * new data is moment ADDITION (the Gramian merge), not a refit scan.
  *
  * Layout contract (q148): moment rows (dim_i, dim_j, s_micro) over
  * the augmented vector [x_micro.., 1, y] — dims 0..d-1 are the
  * feature micro-units, dim d the intercept-1, dim d+1 the target.
  * De-quantization divides each cell by its dims' scales (1e6 for
  * features, 1 otherwise), keeping every value exact until the final
  * double solve.
  */
object RidgeProbe {

  /** @param weights     per-feature coefficients (de-quantized units)
    * @param intercept   bias term (fit unpenalized)
    * @param trainMse    mean squared error on the fitted corpus,
    *                    derived from the moments alone
    * @param targetVar   Var(y) from the same moments — the mean-only
    *                    baseline MSE the probe must beat to carry signal
    */
  case class Model(
      weights: Array[Double],
      intercept: Double,
      trainMse: Double,
      targetVar: Double) {
    def predict(x: Array[Double]): Double = {
      var s = intercept
      var i = 0
      while (i < weights.length) { s += weights(i) * x(i); i += 1 }
      s
    }
  }

  /** Fit from a q148-shaped frame. `micro` must match the query's
    * feature quantization (1e6); `lambda` penalizes feature weights
    * only, never the intercept.
    */
  def train(moments: DataFrame, micro: Long = 1000000L,
      lambda: Double = 0.0): Model = {
    val rows = moments.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val nAug = rows.keys.map(_._2).max + 1 // d features + intercept + y
    val d = nAug - 2
    require(d >= 1, s"moment matrix too small: $nAug dims")
    def scale(i: Int): Double = if (i < d) micro.toDouble else 1.0
    def m(i: Int, j: Int): Double = {
      val v = if (i <= j) rows((i, j)) else rows((j, i))
      v.toDouble / (scale(i) * scale(j))
    }
    val n = m(d, d) // (intercept, intercept) = row count
    require(n > 0, "empty corpus")
    // A = [X 1]ᵀ[X 1] + λ·diag(1..1, 0), b = [X 1]ᵀ y
    val k = d + 1
    val a = Array.tabulate(k, k)((i, j) =>
      m(i, j) + (if (i == j && i < d) lambda else 0.0))
    val b = Array.tabulate(k)(i => m(i, d + 1))
    val w = solve(a, b) // NOTE: solve consumes a and b in place
    // moment-derived error: yᵀy − 2wᵀb + wᵀAw over n, from FRESH
    // penalty-free moments (the solve destroyed its inputs)
    val aw = Array.tabulate(k)(i =>
      (0 until k).map(j => m(i, j) * w(j)).sum)
    val sse = m(d + 1, d + 1) -
      2.0 * (0 until k).map(i => w(i) * m(i, d + 1)).sum +
      (0 until k).map(i => w(i) * aw(i)).sum
    val meanY = m(d, d + 1) / n
    val varY = m(d + 1, d + 1) / n - meanY * meanY
    Model(w.take(d), w(d), math.max(sse, 0.0) / n, varY)
  }

  /** In-place Gaussian elimination with partial pivoting. */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val k = b.length
    for (col <- 0 until k) {
      var p = col
      for (r <- col + 1 until k)
        if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r
      require(math.abs(a(p)(col)) > 1e-12,
        s"singular normal equations at column $col — add ridge lambda")
      if (p != col) { val t = a(p); a(p) = a(col); a(col) = t
        val tb = b(p); b(p) = b(col); b(col) = tb }
      for (r <- col + 1 until k) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          for (c <- col until k) a(r)(c) -= f * a(col)(c)
          b(r) -= f * b(col)
        }
      }
    }
    val w = new Array[Double](k)
    for (col <- k - 1 to 0 by -1) {
      var s = b(col)
      for (c <- col + 1 until k) s -= a(col)(c) * w(c)
      w(col) = s / a(col)(col)
    }
    w
  }
}
