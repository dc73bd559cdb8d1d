package graft

/** Round-12 compressed-tier cross-checks, independent of the DuckDB
  * twins (the PqSpec convention — a from-scratch plain-Scala
  * re-implementation must reproduce the gated frames row-for-row, so
  * the Spark expression tree and the SQL twin cannot share a bug):
  *
  *  - q249 binary quantization: sign-bit packing + XOR/popcount
  *    hamming re-done with loops over the raw floats; per-probe top-5
  *    by (hamming ASC, vec_id ASC) must match the bqTop frame exactly.
  *  - q250/q251 recall evals: exact-cosine top-5 recomputed with the
  *    same left-fold double arithmetic in plain Scala, recall counted
  *    by hand against the tier lists, rows compared exactly.
  */
class BinaryQuantSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val K = 5
  private val MrlDims = 16

  /** (vec_id → raw float components) for the whole fixture. */
  private lazy val vecs: Map[Long, Array[Float]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap

  private lazy val probeIds: Seq[Long] =
    vecs.keys.filter(id => id % 61 == 0 && id < 2000L).toSeq.sorted

  /** Sign-disagreement count over the first `d` dims — the hamming
    * distance the packed-word XOR must equal.
    */
  private def ham(a: Array[Float], b: Array[Float], d: Int): Long =
    (0 until d).count(i => (a(i) >= 0f) != (b(i) >= 0f)).toLong

  /** Left-fold double cosine over the first `d` dims (the DotProduct
    * summation order).
    */
  private def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < d) {
      dp += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  private def exactTop(p: Long, d: Int): Seq[Long] =
    vecs.keys.filter(_ != p).toSeq
      .map(id => (id, cos(vecs(p), vecs(id), d)))
      .sortBy { case (id, c) => (-c, id) }
      .take(K).map(_._1)

  private def bqTopIds(p: Long): Seq[(Long, Long)] =
    vecs.keys.filter(_ != p).toSeq
      .map(id => (id, ham(vecs(p), vecs(id), 64)))
      .sortBy { case (id, h) => (h, id) }
      .take(K)

  test("q249: packed XOR+popcount hamming top-k == per-dim sign loop") {
    val got = queries.SimilarityQueries.bqTop(spark, dir)
      .orderBy("probe_id", "rn")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val want = probeIds.flatMap { p =>
      bqTopIds(p).map { case (id, h) => (p, id, h) }
    }
    assert(got === want)
  }

  private def recallRows(tier: Long => Seq[Long]): Seq[(Long, Long, Long)] =
    probeIds.map { p =>
      val ex = exactTop(p, 64)
      val hits = ex.count(tier(p).toSet).toLong
      (p, ex.size.toLong, hits)
    }

  test("q250: BQ recall eval rows == hand-counted hits") {
    val got = SparkEntry.queries("q250_bq_recall")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq
    val want0 = recallRows(p => bqTopIds(p).map(_._1))
    val tot = want0.map(_._3).sum
    val overall = tot * 1000 / (want0.size.toLong * K)
    val want = want0.map { case (p, ke, h) =>
      (p, ke, h, h * 1000 / K, overall)
    }
    assert(got === want)
  }

  private val RerankR = 20

  /** Hamming top-r shortlist re-scored by exact cosine, cut to top-K —
    * the independent cascade oracle.
    */
  private def rerankIds(p: Long): Seq[Long] =
    vecs.keys.filter(_ != p).toSeq
      .map(id => (id, ham(vecs(p), vecs(id), 64)))
      .sortBy { case (id, h) => (h, id) }
      .take(RerankR)
      .map { case (id, _) => (id, cos(vecs(p), vecs(id), 64)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(K).map(_._1)

  test("q254: BQ-shortlist exact re-rank == independent cascade") {
    val got = SparkEntry.queries("q254_bq_rerank")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val want = probeIds.flatMap(p => rerankIds(p).map(id => (p, id)))
    assert(got === want)
  }

  test("q255: re-rank recall dominates raw BQ recall on every probe") {
    val rows = SparkEntry.queries("q255_bq_rerank_recall")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rerank = r.getAs[Long]("n_hits_rerank")
      val bq = r.getAs[Long]("n_hits_bq")
      assert(rerank >= bq, s"probe ${r.getLong(0)}: rerank $rerank < bq $bq")
    }
    // and the counts match the independent implementations
    val want = probeIds.map { p =>
      val ex = exactTop(p, 64).toSet
      (p, rerankIds(p).count(ex).toLong,
        bqTopIds(p).map(_._1).count(ex).toLong)
    }
    val got = rows.map(r => (r.getLong(0),
      r.getAs[Long]("n_hits_rerank"), r.getAs[Long]("n_hits_bq"))).toSeq
    assert(got === want)
  }

  /** Plain-Scala MMR greedy (λ = 0.5) over the exact top-r shortlist
    * — the independent q257 oracle. Same formula tree: step 1 = max
    * rel; step i = argmax (rel − max sim to selected) · 0.5, vec_id
    * tiebreaks throughout.
    */
  private def mmrIds(p: Long): Seq[Long] = {
    val cands = vecs.keys.filter(_ != p).toSeq
      .map(id => (id, cos(vecs(p), vecs(id), 64)))
      .sortBy { case (id, c) => (-c, id) }
      .take(RerankR)
    val rel = cands.toMap
    var sel = List(cands.head._1)
    var rem = cands.map(_._1).filterNot(_ == sel.head)
    for (_ <- 2 to K) {
      val pick = rem.map { id =>
        val ms = sel.map(s => cos(vecs(id), vecs(s), 64)).max
        (id, (rel(id) - ms) * 0.5)
      }.sortBy { case (id, m) => (-m, id) }.head._1
      sel = sel :+ pick
      rem = rem.filterNot(_ == pick)
    }
    sel
  }

  test("q257: MMR greedy selection == independent plain-Scala recursion") {
    val got = SparkEntry.queries("q257_mmr_rerank")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
      .toSeq
    val want = probeIds.flatMap { p =>
      mmrIds(p).zipWithIndex.map { case (id, i) => (p, i + 1, id) }
    }
    assert(got === want)
  }

  test("q251: matryoshka recall eval rows == hand-counted hits") {
    val got = SparkEntry.queries("q251_mrl_recall")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq
    val want0 = recallRows(p => exactTop(p, MrlDims))
    val tot = want0.map(_._3).sum
    val overall = tot * 1000 / (want0.size.toLong * K)
    val want = want0.map { case (p, ke, h) =>
      (p, ke, h, h * 1000 / K, overall)
    }
    assert(got === want)
  }
}
