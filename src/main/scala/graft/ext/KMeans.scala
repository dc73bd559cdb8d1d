package graft.ext

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding corpus in cosine
  * geometry — the codebook-refresh loop behind the IVF index (q37) and
  * the oracle-gated single step (q78, which pins one iteration's exact
  * arithmetic; this utility iterates the same assignment expression to
  * convergence).
  *
  * Scale shape per iteration: the codebook is k×dim driver-side
  * literals, so ASSIGNMENT is a pure map over the corpus (zero
  * shuffle); the UPDATE is one aggregation onto k·dim keys fed by
  * map-side partial sums; only the k×dim codebook and the k-vector
  * inertia ever reach the driver. Nothing grows with corpus size on
  * the driver — the loop is safe at any SF.
  *
  * Determinism note: the double sums in the mean/inertia aggregations
  * are order-sensitive (this is a training utility, not an
  * oracle-gated query — q78 shows the exact-quantized formulation);
  * empty cells keep their previous centroid.
  */
object KMeans {

  /** @param centroids final codebook, row i = centroid of cell i
    * @param inertia   Σ(1 − cosine-to-assigned-centroid) measured under
    *                  each iteration's codebook BEFORE its update —
    *                  non-increasing modulo float noise
    * @param cells     (id, cell) assignment under the FINAL codebook
    *                  (cached; caller unpersists when done)
    */
  case class Result(
      centroids: Array[Array[Double]],
      inertia: Seq[Double],
      cells: DataFrame)

  /** One Lloyd iteration + the monitoring inertia, both computed from
    * a single cached assignment frame.
    */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Result = {
    require(k >= 1 && iters >= 1)
    val base = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val dim = base.select(size(col("v"))).head().getInt(0)
    // deterministic init: the k lowest-id vectors
    var centroids: Array[Array[Double]] = base.orderBy("id").limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    def assign(): DataFrame = {
      val codebook = centroids.zipWithIndex.map { case (c, i) =>
        (i.toLong, c, c.map(x => x * x).sum)
      }.toSeq
      val best = bestCell(col("v"), norm2(col("v")), codebook)
      base.select(col("id"), col("v"),
        (-best.getField("nid")).as("cell"),
        best.getField("c").as("cos"))
    }
    val inertia = Seq.newBuilder[Double]
    for (_ <- 0 until iters) {
      val assigned = assign().cache()
      inertia += assigned.agg(sum(lit(1.0) - col("cos"))).head().getDouble(0)
      // update: per-(cell, dim) mean — one shuffle onto k·dim keys
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cell", "d").agg(avg(col("x")).as("m"))
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        if (means.contains((i.toLong, 0)))
          Array.tabulate(dim)(d => means((i.toLong, d)))
        else old // empty cell: keep previous centroid
      }
      assigned.unpersist(blocking = false)
    }
    // one extra assignment pass so cells match the RETURNED codebook —
    // the in-loop frame reflects the pre-update centroids. Cache AFTER
    // the projection: Dataset.unpersist only releases a cache entry
    // whose plan sameResults the dataset itself, so caching the 4-col
    // frame and returning a select() of it would leak the entry.
    Result(centroids, inertia.result(),
      assign().select(col("id"), col("cell")).cache())
  }
}
