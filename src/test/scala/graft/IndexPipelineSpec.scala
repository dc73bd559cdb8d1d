package graft

import graft.tools.IndexPipeline

/** The composed ANN index-serving pipeline on sf0.001: the zero-config
  * run must REPRODUCE the oracle-gated q180/q185 recall numbers (the
  * pipeline's stages are the gated shared frames — this is the pin
  * that keeps them so), the q181 refresh loop must actually reduce the
  * encode's total quantization error (Lloyd), and the fully-trained
  * run must stay structurally sane.
  */
class IndexPipelineSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("zero-config pipeline reproduces the gated q180/q185 recall exactly") {
    val r = IndexPipeline.run(spark, dir,
      kmeansIters = 0, refreshRounds = 0, nprobes = Seq(1, 4))
    def gated(name: String): Long =
      SparkEntry.queries(name)(spark, dir)
        .select("overall_recall_permille").head().getLong(0)
    assert(r.recallByNprobe.toMap.apply(1) === gated("q180_pq_recall"),
      "pipeline nprobe=1 recall drifted from the q180 gate")
    assert(r.recallByNprobe.toMap.apply(4) === gated("q185_pq_recall_nprobe"),
      "pipeline nprobe=4 recall drifted from the q185 gate")
    // the other two eval faces reproduce their gates too (both gated
    // at nprobe = ivfNprobe = 4)
    val mrrGate = SparkEntry.queries("q208_ann_mrr")(spark, dir)
      .select("mrr_micro").head().getLong(0)
    assert(r.mrrByNprobe.toMap.apply(4) === mrrGate,
      "pipeline nprobe=4 MRR drifted from the q208 gate")
    val ndcgGate = SparkEntry.queries("q215_ann_ndcg")(spark, dir)
      .select("mean_ndcg_permille").head().getLong(0)
    assert(r.ndcgByNprobe.toMap.apply(4) === ndcgGate,
      "pipeline nprobe=4 nDCG drifted from the q215 gate")
    assert(r.kmeansInertia.isEmpty && r.qerrByRound.isEmpty)
  }

  test("codebook refresh reduces total quantization error (Lloyd)") {
    val r = IndexPipeline.run(spark, dir,
      kmeansIters = 0, refreshRounds = 2, nprobes = Seq(1))
    // round 1 must strictly improve on the id-drawn seed codebook
    // (the whole point of the refresh job); round 2 must not regress
    // (deterministic on the fixture — integer-floored means make
    // strict Lloyd monotonicity a theorem only in exact arithmetic)
    assert(r.qerrByRound.head < r.qerrInit,
      s"refresh round 1 did not improve qerr: ${r.qerrInit} -> ${r.qerrByRound.head}")
    assert(r.qerrByRound(1) <= r.qerrByRound.head,
      s"refresh round 2 regressed qerr: ${r.qerrByRound.mkString(" -> ")}")
  }

  test("training centroids shrinks residual-PQ quantization error (the IVFADC precondition)") {
    // q197's scaladoc claims IVFADC pays off once centroids are
    // trained so residual norms shrink — make that measurable: the
    // residual tier's total qerr under KMeans-trained centroids must
    // be below the id-drawn default's on the fixture.
    import graft.queries.{SimilarityQueries, Tables}
    val km = graft.ext.KMeans.train(Tables(spark, dir, "embeddings"),
      "vec_id", "embedding", k = 8, iters = 2)
    km.cells.unpersist(blocking = false)
    val trained = km.centroids.zipWithIndex.map { case (c, i) =>
      (i.toLong, c, c.map(x => x * x).sum)
    }.toSeq
    val qDefault = SimilarityQueries.resPqTotalQerr(spark, dir)
    val qTrained = SimilarityQueries.resPqTotalQerr(spark, dir, Some(trained))
    info(s"residual qerr: id-drawn $qDefault -> trained $qTrained")
    assert(qTrained < qDefault,
      s"trained centroids must shrink residual qerr: $qTrained >= $qDefault")
  }

  test("trained-centroid + refreshed-codebook pipeline is structurally sane") {
    val r = IndexPipeline.run(spark, dir,
      kmeansIters = 2, refreshRounds = 1, nprobes = Seq(1, 8))
    assert(r.kmeansInertia.size === 2)
    assert(r.kmeansInertia(1) <= r.kmeansInertia(0) + 1e-9,
      "IVF Lloyd inertia must not increase")
    for ((np, rec) <- r.recallByNprobe)
      assert(rec >= 0L && rec <= 1000L, s"recall permille out of range at nprobe=$np: $rec")
    // better artifacts must not collapse the index: the trained
    // nprobe=1 recall on this fixture beats the untrained gate value
    val gatedR1 = SparkEntry.queries("q180_pq_recall")(spark, dir)
      .select("overall_recall_permille").head().getLong(0)
    assert(r.recallByNprobe.toMap.apply(1) >= gatedR1,
      "trained pipeline lost recall vs the untrained gate on the fixture")
  }
}
