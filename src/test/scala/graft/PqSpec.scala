package graft

import org.apache.spark.sql.Row

/** Round-11 operator cross-checks, independent of the DuckDB twins:
  *
  *  - q168/q169 product quantization: a from-scratch Scala
  *    re-implementation of the milli-quantized encode (argmin codeword
  *    per subspace, dist-then-index tiebreak) and of the ADC distance
  *    must reproduce the Spark results row-for-row — so the gate's SQL
  *    twin and the Spark expression tree cannot share a common bug.
  *  - q172 keep-first chunk dedup: exactly one keeper per distinct
  *    chunk hash, and per-doc kept counts never exceed chunk counts.
  *  - q170/q171 corpus-mix screens: structural invariants (pair
  *    ordering, permille bounds, isqrt exactness on the emitted rows).
  */
class PqSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private val M = 8
  private val Sub = 8
  private val codebookIds = Seq(1L, 3L, 8L, 21L)

  private def milli(v: Float): Long = math.floor(v.toDouble * 1000).toLong

  /** (vec_id → milli components) for the whole fixture. */
  private lazy val vecs: Map[Long, Array[Long]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(milli).toArray)
      .toMap

  private lazy val codebook: Array[Array[Long]] =
    codebookIds.sorted.map(vecs(_)).toArray

  private def subDist(x: Array[Long], cw: Array[Long], m: Int): Long = {
    var d = 0L
    var i = m * Sub
    while (i < (m + 1) * Sub) {
      val t = x(i) - cw(i); d += t * t; i += 1
    }
    d
  }

  /** (codes, qerr) by direct argmin — the independent encode oracle. */
  private def encode(x: Array[Long]): (Array[Int], Long) = {
    var qerr = 0L
    val codes = Array.tabulate(M) { m =>
      var bc = 0
      var bd = subDist(x, codebook(0), m)
      var c = 1
      while (c < codebook.length) {
        val d = subDist(x, codebook(c), m)
        if (d < bd) { bd = d; bc = c }
        c += 1
      }
      qerr += bd
      bc
    }
    (codes, qerr)
  }

  test("q168: Spark PQ encode matches the from-scratch Scala argmin") {
    val got = SparkEntry.queries("q168_pq_encode")(spark, dir).collect()
    assert(got.length === vecs.size)
    for (r <- got) {
      val id = r.getLong(0)
      val (codes, qerr) = encode(vecs(id))
      val packed = codes.zipWithIndex.map { case (c, m) => c.toLong << (2 * m) }.sum
      assert(r.getLong(1) === packed, s"packed code drifted for vec $id")
      assert(r.getLong(2) === qerr, s"qerr drifted for vec $id")
    }
  }

  test("q169: ADC top-k matches brute-force over the Scala codes") {
    val probes = vecs.keys.filter(id => id % 61 == 0 && id < 2000L).toSeq.sorted
    val codes = vecs.map { case (id, x) => id -> encode(x)._1 }
    val expected = probes.flatMap { p =>
      val px = vecs(p)
      val scored = vecs.keys.filter(_ != p).toSeq.map { v =>
        val adc = (0 until M).map(m => subDist(px, codebook(codes(v)(m)), m)).sum
        (v, adc)
      }.sortBy { case (v, adc) => (adc, v) }.take(5)
      scored.zipWithIndex.map { case ((v, adc), i) => Row(p, v, adc, i + 1) }
    }
    val got = SparkEntry.queries("q169_pq_adc_topk")(spark, dir).collect()
    assert(got.length === expected.length)
    for ((g, e) <- got.zip(expected))
      assert(g === e, s"ADC row drifted: got $g expected $e")
  }

  test("q184/q185: recall is monotone in nprobe, and nprobe=K is the full ADC scan") {
    // (a) the judge-mandated monotonicity gate, THROUGH the shared
    // definition (pqRecallFrame drives ivfPqTopN at both endpoints):
    // widening the probe's cell set must not lose OVERALL recall on
    // the fixture. Per-probe recall is deliberately NOT asserted — a
    // true neighbor can be displaced from the top-k by closer-in-ADC
    // impostors arriving from newly scanned cells; the aggregate is
    // the number a deployment tunes on.
    def overall(nprobe: Int): Long =
      graft.queries.SimilarityQueries.pqRecallFrame(spark, dir, nprobe)
        .select("overall_recall_permille").head().getLong(0)
    val r1 = overall(1)
    val r4 = overall(4)
    assert(r4 >= r1, s"recall@5 must be monotone: nprobe=4 -> $r4 < nprobe=1 -> $r1")
    assert(r1 > 0L, "nprobe=1 recall must be nonzero on the fixture")

    // (b) the exhaustive-routing theorem: with nprobe = #cells every
    // cell is scanned, so the IVF-PQ ranking must equal q169's full
    // ADC top-k row-for-row (same codes, same distances, same
    // tiebreak) — pinning that the router only ever PRUNES, never
    // rescores.
    val full = graft.queries.SimilarityQueries.ivfPqTopN(spark, dir, 8)
      .select("probe_id", "vec_id", "adc_dist", "rn")
      .orderBy("probe_id", "rn").collect()
    val adc = SparkEntry.queries("q169_pq_adc_topk")(spark, dir).collect()
    assert(full.length === adc.length)
    for ((f, a) <- full.zip(adc))
      assert(f === a, s"nprobe=8 IVF-PQ drifted from the full ADC scan: $f vs $a")
  }

  test("q193/q194: multi-probe LSH recall dominates single-bucket PER PROBE") {
    // unlike the ADC case (approximate scores — aggregate-only
    // monotonicity), LSH candidates are ranked by TRUE cosine, so a
    // candidate-superset can only improve each probe's top-k overlap
    // with the exact list: any hit displaced from the widened top-k is
    // displaced by a higher-cosine vector, which is itself in the
    // exact top-k. This is a theorem, so it pins PER PROBE.
    def hits(name: String): Map[Long, Long] =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val single = hits("q131_ann_recall")
    val multi = hits("q194_multiprobe_recall")
    assert(single.keySet === multi.keySet)
    for ((p, h1) <- single)
      assert(multi(p) >= h1,
        s"probe $p lost recall under multi-probe: ${multi(p)} < $h1")
    assert(multi.values.sum > single.values.sum,
      "multi-probe must strictly improve total recall on the fixture")
  }

  test("q229/q230: exact re-rank dominates plain ADC PER PROBE") {
    // like the multi-probe LSH case (and unlike widening nprobe under
    // approximate scores), this is a theorem: the shortlist is the ADC
    // ranking truncated at r >= k, so it CONTAINS the ADC top-k; and
    // re-ranking by the true cosine keeps every exact-top-k member
    // present in the shortlist (any member outranks any non-member
    // under the exact total order). So per probe:
    //   hits(rerank@k) = |shortlist ∩ exact_topk| >= hits(adc@k).
    val rows = SparkEntry.queries("q230_rerank_recall")(spark, dir).collect()
    for (r <- rows) {
      val rr = r.getLong(2); val adc = r.getLong(3)
      assert(rr >= adc,
        s"probe ${r.getLong(0)} lost recall under re-rank: $rr < $adc")
    }
    assert(rows.map(_.getLong(2)).sum > rows.map(_.getLong(3)).sum,
      "re-rank must strictly improve total recall on the fixture")

    // and the re-ranked list is drawn from the shortlist: every q229
    // row appears in the nprobe-routed ADC ranking within rank r
    val rrIds = SparkEntry.queries("q229_pq_rerank")(spark, dir)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val slIds = graft.queries.SimilarityQueries
      .ivfPqTopN(spark, dir, 4, topN = 20)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rrIds.subsetOf(slIds),
      "re-ranked results must come from the ADC shortlist")
  }

  test("q172: exactly one keeper per distinct chunk hash") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val out = SparkEntry.queries("q172_chunk_dedup_keepfirst")(spark, dir)
      .collect()
    val totalKept = out.map(_.getLong(2)).sum
    // distinct chunk hashes, recomputed independently of the query
    val w = 8
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val nDistinct = docs
      .select(explode(transform(
        sequence(lit(0), expr(s"(size(toks) + ${w - 1}) div $w").cast("int") - 1),
        c => concat_ws(" ", slice(col("toks"), c * w + 1, lit(w))))).as("c"))
      .select(polyHash(col("c")).as("h")).distinct().count()
    assert(totalKept === nDistinct,
      "keep-first must keep exactly one occurrence per distinct chunk")
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)),
      "kept count exceeded chunk count")
  }

  test("q170/q171: pair ordering and permille bounds hold; isqrt is exact") {
    val ov = SparkEntry.queries("q170_source_overlap")(spark, dir).collect()
    assert(ov.nonEmpty, "fixture must contain cross-source duplicates")
    for (r <- ov) {
      assert(r.getString(0) < r.getString(1), "pairs must be ordered src_a < src_b")
      assert(r.getLong(2) >= 1L && r.getLong(5) <= 1000L)
    }
    val mw = SparkEntry.queries("q171_mixture_weights")(spark, dir).collect()
    val wSum = mw.map(_.getLong(5)).sum
    assert(wSum <= 1000L && wSum > 1000L - mw.length,
      s"floor-permille weights must sum to 1000 minus rounding: $wSum")
    for (r <- mw) {
      val n = r.getLong(2); val s = r.getLong(3)
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s is not exact")
    }
  }
}
