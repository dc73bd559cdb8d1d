package graft

import graft.ext.KMeans

/** The KMeans trainer (ext/KMeans) on the sf0.001 embedding fixture:
  * Lloyd monotonicity, assignment completeness, determinism across
  * runs, and empty-cell survival.
  */
class KMeansSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("inertia is non-increasing across Lloyd iterations") {
    val r = KMeans.train(emb, "vec_id", "embedding", k = 4, iters = 4)
    assert(r.inertia.size === 4)
    for (Seq(a, b) <- r.inertia.sliding(2))
      assert(b <= a + 1e-9, s"inertia rose: ${r.inertia}")
    r.cells.unpersist()
  }

  test("every vector is assigned to exactly one in-range cell") {
    val r = KMeans.train(emb, "vec_id", "embedding", k = 4, iters = 2)
    val n = emb.count()
    assert(r.cells.count() === n)
    assert(r.cells.select("id").distinct().count() === n)
    val cellIds = r.cells.select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cellIds.subsetOf((0L until 4L).toSet))
    assert(r.centroids.length === 4 && r.centroids.forall(_.length === 64))
    r.cells.unpersist()
  }

  test("training is deterministic run-to-run") {
    val a = KMeans.train(emb, "vec_id", "embedding", k = 3, iters = 2)
    val b = KMeans.train(emb, "vec_id", "embedding", k = 3, iters = 2)
    // same parallelism + same plan → same fold order → identical
    // doubles on this fixture (cross-RUN determinism; cross-PARTITIONING
    // determinism is what q78's quantized formulation adds)
    assert(a.inertia === b.inertia)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
    a.cells.unpersist(); b.cells.unpersist()
  }
}
