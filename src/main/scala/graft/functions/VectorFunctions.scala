package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives (cosine similarity, random-hyperplane LSH)
  * with exact DuckDB SQL twins.
  *
  * Exactness strategy: every reduction is an explicit LEFT fold over the
  * element index — Spark `aggregate(zip_with(...))` and DuckDB
  * `list_reduce(list_prepend(0.0, list_transform(range ...)))` add terms
  * in the same order, and IEEE-754 double arithmetic is deterministic, so
  * both engines produce bit-identical doubles (verified by the driver's
  * hash compare). Floats are widened to double before any arithmetic
  * (exact). Everything is built-in HOF expressions — no UDFs, plans stay
  * prunable.
  */
object VectorFunctions {

  /** Σ a_i * b_i as a left fold of double products — implemented by the
    * codegen'd [[DotProduct]] custom Expression (same summation order,
    * bit-identical results; the HOF formulation below is the spec's
    * reference).
    */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Built-in-only formulation (interpreted) — same values as [[dot]]. */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)

  /** DuckDB twin (1-based element access; `dim` is the fixed vector
    * width — testdata embeddings are 64-wide).
    */
  def sqlDot(a: String, b: String, dim: Int = 64): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE))), " +
      s"(s, v) -> s + v)"

  /** Squared L2 norm (same fold). */
  def norm2(a: Column): Column = dot(a, a)
  def sqlNorm2(a: String, dim: Int = 64): String = sqlDot(a, a, dim)

  /** cosine(a, b) given precomputed squared norms — expression shape
    * `dot / (sqrt(na2) * sqrt(nb2))` must match the SQL twin exactly.
    */
  def cosineFrom(dotC: Column, na2: Column, nb2: Column): Column =
    dotC / (sqrt(na2) * sqrt(nb2))

  def sqlCosineFrom(dot: String, na2: String, nb2: String): String =
    s"($dot / (sqrt($na2) * sqrt($nb2)))"

  /** Best (cosine, id) over a driver-side codebook as ONE projection
    * expression — the shuffle-free cell assignment shared by the IVF
    * index (q37), the gated k-means step (q78) and the KMeans trainer:
    * a lexicographic `array_max` over `struct(cosine, -id)` gives the
    * argmax with a (cosine DESC, id ASC) tiebreak, evaluating each
    * centroid cosine exactly once per row. Extract the winning id as
    * `-result.getField("nid")` and its cosine as `.getField("c")`.
    */
  def bestCell(emb: Column, n2: Column,
      cents: Seq[(Long, Array[Double], Double)]): Column =
    array_max(array(cents.map { case (cId, ce, cn2) =>
      struct(
        cosineFrom(dot(emb, array(ce.map(lit(_)): _*)), n2, lit(cn2)).as("c"),
        lit(-cId).as("nid"))
    }: _*))

  // ------------------------------------------------------------------
  // Random-hyperplane LSH (signed projections → bucket id)
  // ------------------------------------------------------------------

  val lshPlanes = 8
  val lshDim = 64

  /** Deterministic pseudo-random plane coefficients in [-32768, 32767]:
    * integer-valued, so the signed projection is exact in both engines
    * (integer coefficient × exact double element, left-fold sum).
    */
  val planeCoef: IndexedSeq[IndexedSeq[Long]] = {
    val raw = TextFunctions.lcg(lshPlanes * lshDim, seed = 7654321L)
    (0 until lshPlanes).map { j =>
      (0 until lshDim).map(i => raw(j * lshDim + i) % 65536L - 32768L)
    }
  }

  /** Signed projection of `a` onto plane j: Σ a_i * c_{j,i}. */
  def planeProjection(a: Column, j: Int): Column =
    DotProduct(a, array(planeCoef(j).map(c => lit(c.toDouble)): _*))

  def sqlPlaneProjection(a: String, j: Int): String = {
    val coefs = planeCoef(j).mkString("[", ",", "]")
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${lshDim + 1}), " +
      s"i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST(($coefs)[CAST(i AS INT)] AS DOUBLE))), " +
      s"(s, v) -> s + v)"
  }

  /** LSH bucket id: sign bit per plane, packed to 0..2^planes-1. */
  def lshBucket(a: Column): Column =
    (0 until lshPlanes).map { j =>
      when(planeProjection(a, j) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def sqlLshBucket(a: String): String =
    (0 until lshPlanes).map { j =>
      s"CASE WHEN ${sqlPlaneProjection(a, j)} > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString("(", " + ", ")")
}
