package graft

import org.apache.spark.sql.functions._

import graft.queries.{ShapeOpsQueries, Tables}

/** Independent cross-checks for the data-shape tier — the DuckDB
  * oracle gates the values; these assert the SEMANTICS against
  * brute-force formulations the queries avoid at scale (the naive CMS
  * grid, the O(n²) dominance scan, scalar interpolation, direct char
  * histograms), so a refactor that kept both engines wrong-in-the-
  * same-way would still fail here.
  */
class ShapeOpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private val P = graft.functions.TextFunctions.P
  private val cmsRaw = graft.functions.TextFunctions.lcg(8, seed = 777L)
  private val cmsA = cmsRaw.take(4).map(_ % (P - 2) + 1)
  private val cmsB = cmsRaw.drop(4).map(_ % P)

  test("q142: estimates == a directly-built CMS grid, and never under") {
    val out = ShapeOpsQueries.queries("q142_cms_estimate")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val counts = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // build the 4×64 grid the straightforward way
    val grid = Array.fill(4, 64)(0L)
    for ((u, n) <- counts; j <- 0 until 4)
      grid(j)(((cmsA(j) * u + cmsB(j)) % P % 64).toInt) += n
    for ((u, n) <- counts if u < 20) {
      val est = (0 until 4)
        .map(j => grid(j)(((cmsA(j) * u + cmsB(j)) % P % 64).toInt)).min
      assert(out(u) === ((n, est, est - n)), s"user $u")
      assert(est >= n, s"CMS must never underestimate (user $u)")
    }
    assert(out.keySet === counts.keySet.filter(_ < 20))
  }

  test("q143: frontier == O(n²) dominance scan, and is a true chain") {
    val out = ShapeOpsQueries.queries("q143_pareto_frontier")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = d.filter { a =>
      !d.exists(b => b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3))
    }.sortBy(r => (r._2, r._1))
    assert(out.toSeq === expected.toSeq)
    // frontier invariant: a chain — strictly increasing token counts
    // along strictly increasing length, except exact duplicate points
    // (neither dominates the other, both stay)
    val byChars = out.map(r => (r._2, r._3)).toSeq
    assert(byChars.sliding(2).forall {
      case Seq((c1, t1), (c2, t2)) =>
        (c1 == c2 && t1 == t2) || (c1 < c2 && t1 < t2)
      case _ => true
    }, "frontier must be a chain up to duplicate points")
  }

  test("q144: filled series == scalar interpolation; long gaps stay open") {
    val out = ShapeOpsQueries.queries("q144_gap_fill")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    val present = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("datediff(to_date(ts), DATE'1970-01-01')").cast("long").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = scala.collection.mutable.Map[(Long, Long), (Long, Boolean)]()
    for (((u, day), n) <- present) expected((u, day)) = (n, false)
    for ((u, days) <- present.keys.groupBy(_._1)) {
      val sorted = days.map(_._2).toSeq.sorted
      for (Seq(d1, d2) <- sorted.sliding(2) if d2 - d1 > 1 && d2 - d1 <= 8) {
        val (n1, n2) = (present((u, d1)), present((u, d2)))
        for (fd <- d1 + 1 until d2)
          expected((u, fd)) =
            ((n1 * (d2 - fd) + n2 * (fd - d1)) / (d2 - d1), true)
      }
    }
    assert(out === expected.toMap)
    // interpolated values sit within the endpoints' range
    for (((u, day), (n, interp)) <- out if interp) {
      val neigh = present.keys.filter(_._1 == u).map(_._2)
      val lo = neigh.filter(_ < day).max
      val hi = neigh.filter(_ > day).min
      val (nLo, nHi) = (present((u, lo)), present((u, hi)))
      assert(n >= math.min(nLo, nHi) - 1 && n <= math.max(nLo, nHi),
        s"interpolation out of range at ($u, $day)")
    }
  }

  test("q145: collision ppm == direct char-histogram computation") {
    val out = ShapeOpsQueries.queries("q145_char_collision")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789 .,".toSet
    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def ppm(text: String): Long = {
      val hist = text.filter(alpha).groupBy(identity).map(_._2.length.toLong)
      val total = hist.sum
      if (total == 0) 0L else hist.map(x => x * x).sum * 1000000L / (total * total)
    }
    for ((src, rows) <- docs.groupBy(_._1)) {
      val ppms = rows.map(r => ppm(r._2))
      assert(out(src) === ((rows.length.toLong, ppms.sum / rows.length, ppms.max)),
        s"source $src")
    }
  }
}
