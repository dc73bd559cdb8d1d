package graft

import graft.queries.PipelineOpsQueries
import org.apache.spark.sql.functions._

/** Invariant tests for the round-6 governance/layout tier (q73-q78) on
  * the sf0.001 fixture — properties the DuckDB hash gate can't express
  * directly (interval contiguity, quantization error bounds, Morton
  * bit-exactness vs a reference implementation).
  */
class PipelineOpsSpec extends SparkSuite {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def run(q: String) =
    PipelineOpsQueries.queries(q)(spark, dir)

  // reference Morton interleave (bit i of a → 2i, bit i of b → 2i+1)
  private def mortonRef(a: Long, b: Long): Long =
    (0 until 6).map(i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("q75 z-ranges partition the 2-D domain into tight boxes") {
    val rows = run("q75_zorder_layout").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (zr, minQ, maxQ, minP, maxP) = (r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      // every (q, p) cell of the box that z-codes into this range must
      // round-trip: z_range = morton(q, p) / 64 — the zone map is a
      // superset bound, and the CORNERS must land inside the range
      assert(mortonRef(minQ, minP) / 64 === zr)
      assert(mortonRef(maxQ, maxP) / 64 === zr)
      // a z-range covers a 64-code tile: an 8×8 box in bit-space
      assert(maxQ - minQ <= 7 && maxP - minP <= 7)
    }
  }

  test("q256 PIT join never leaks the future and lands inside the q74 interval") {
    // the feature-store correctness property the hash gate states only
    // implicitly: every probe's attached version must be VALID at the
    // probe instant under q74's own intervals — valid_from <= t and
    // (valid_to is null or t < valid_to)
    val scd2 = run("q74_scd2").collect().map { r =>
      (r.getLong(0), r.getInt(1)) ->
        (r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
          r.getString(2))
    }.toMap
    val pit = PipelineOpsQueries.queries("q256_pit_join")(spark, dir)
      .collect()
    assert(pit.nonEmpty)
    pit.foreach { r =>
      val (user, t, typ, ver) = (r.getLong(0), r.getLong(2),
        r.getString(3), r.getInt(4))
      val (from, to, attr) = scd2((user, ver))
      assert(from <= t, s"user $user: version $ver starts after probe $t")
      assert(to.forall(t < _), s"user $user: probe $t sees expired version $ver")
      assert(attr === typ, s"user $user: attribute mismatch at version $ver")
    }
  }

  test("q74 SCD2 intervals are contiguous, versioned, one current per user") {
    val hist = run("q74_scd2").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
      .groupBy(_._1)
    assert(hist.nonEmpty)
    for ((_, rows) <- hist) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      assert(sorted.count(_._5) === 1 && sorted.last._5)
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray))
        assert(a._4.contains(b._3)) // valid_to == next valid_from
      assert(sorted.last._4.isEmpty)
    }
  }

  test("q76 flags exactly the buckets beyond mean + 2 sigma") {
    val flagged = run("q76_anomaly_buckets").collect()
    assert(flagged.nonEmpty)
    // recompute stats driver-side from the raw events
    val buckets = graft.queries.Tables.events(spark, dir)
      .select(col("event_type"), expr("(ts_ns div 1000) div 3600000000").as("b"))
      .groupBy("event_type", "b").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = buckets.groupBy(_._1)
    val expect = byType.toSeq.flatMap { case (t, bs) =>
      val n = bs.length.toDouble
      val sx = bs.map(_._3).sum.toDouble
      val sxx = bs.map(c => c._3 * c._3).sum.toDouble
      val mean = sx / n
      val sigma = math.sqrt(n * sxx - sx * sx) / n
      bs.filter(_._3.toDouble > mean + 2.0 * sigma)
        .map(b => (t, b._2 * 3600000000L))
    }.toSet
    assert(flagged.map(r => (r.getString(0), r.getLong(1))).toSet === expect)
  }

  test("q78 recomputed centroids: consistent membership, bounded quant error") {
    val rows = run("q78_kmeans_step").collect()
    assert(rows.length === 8 * 64)
    val byCell = rows.groupBy(_.getLong(0))
    assert(byCell.keySet === (Set(1L, 3L, 8L, 21L, 55L, 144L, 233L, 377L)))
    val corpusN = spark.read.parquet(s"$dir/embeddings.parquet").count()
    for ((_, dims) <- byCell) {
      assert(dims.length === 64)
      // one membership count per cell, repeated across its 64 dims
      assert(dims.map(_.getLong(2)).distinct.length === 1)
    }
    assert(byCell.values.map(_.head.getLong(2)).sum === corpusN)
    val cells = rows.map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cells.size === 8 * 64)
  }

  test("q73 never reports a test doc as contaminated train doc") {
    val out = run("q73_contamination").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getLong(0) % 23 != 0L) // train side excludes the test slice
      assert(r.getLong(2) >= r.getLong(3)) // total >= max
      assert(r.getLong(4) % 23 === 0L) // reported partner IS a test doc
    }
  }

  test("q153 pruning is sound: every matching row lives in a touched-file count") {
    val out = run("q153_zonemap_skip").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val rows = graft.queries.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("long"),
        col("l_partkey") % 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def morton(a: Long, b: Long): Long =
      (0 until 6).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val probes = for (i <- 0 until 3; j <- 0 until 3) yield
      (i * 3 + j, 5L + 10 * i, 14L + 10 * i, 16L * j, 15L + 16 * j)
    for ((pid, qlo, qhi, plo, phi) <- probes;
         (layout, fileOf) <- Seq(
           "insertion" -> ((r: (Long, Long, Long)) => r._1 / 512),
           "zorder" -> ((r: (Long, Long, Long)) => morton(r._2, r._3) / 64))) {
      val matching = rows.filter(r =>
        r._2 >= qlo && r._2 <= qhi && r._3 >= plo && r._3 <= phi)
      val neededFiles = matching.map(fileOf).distinct
      val (nFiles, touched, rowsTotal, scanned) = out((layout, pid))
      // soundness: the touched set must cover every file holding a match
      assert(touched >= neededFiles.length.toLong, s"$layout probe $pid")
      // scanned rows bound the true matches and never exceed the corpus
      assert(scanned >= matching.length.toLong && scanned <= rowsTotal,
        s"$layout probe $pid rows")
      assert(nFiles === rows.map(fileOf).distinct.length.toLong,
        s"$layout file count")
    }
    // the audit's point: z-order prunes, insertion order cannot
    val zTouched = probes.map(p => out(("zorder", p._1))._2).max
    val zFiles = out(("zorder", 0))._1
    assert(zTouched < zFiles, "z-order must skip files for 2-D probes")
  }

  test("q77 BM25 ranks at most 3 terms per doc, scores positive and ordered") {
    val out = run("q77_bm25").collect()
      .map(r => (r.getLong(0), r.getDouble(4), r.getInt(5)))
    assert(out.nonEmpty)
    for ((_, rows) <- out.groupBy(_._1)) {
      val sorted = rows.sortBy(_._3)
      assert(sorted.length <= 3)
      assert(sorted.map(_._3).toSeq === (1 to sorted.length))
      // linear idf (N-df+0.5)/(df+0.5) is strictly positive (df <= N),
      // unlike log-idf — so every BM25 score here must be > 0
      assert(sorted.forall(_._2 > 0))
      assert(sorted.toSeq.sliding(2).forall {
        case Seq(a, b) => a._2 >= b._2
        case _ => true
      })
    }
  }
}
