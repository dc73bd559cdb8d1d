package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** The q157 operator contract: seeding star-alternation with a prior
  * star forest (1) reproduces the from-scratch labels over
  * old ∪ delta edges exactly, and (2) converges in rounds bounded by
  * the merge depth the DELTA induces — not by the prior graph's size
  * or original diameter. That second property is what makes a daily
  * label refresh ∝ delta at 100 TB: the expensive shape was paid once
  * when the prior forest was built.
  */
class IncrementalCCSpec extends SparkSuite {

  import spark.implicits._

  private def df(edges: Seq[(Long, Long)]) = edges.toDF("doc_a", "doc_b")

  private def labelMap(edges: Seq[(Long, Long)],
      delta: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val prior = DedupQueries.componentLabels(df(edges))
    val (labels, rounds) =
      DedupQueries.incrementalComponentLabelsWithRounds(prior, df(delta))
    (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("incremental equals from-scratch on old ∪ delta") {
    val old = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L), (21L, 22L))
    val delta = Seq((2L, 10L), (30L, 31L)) // merge two comps + a new one
    val (inc, _) = labelMap(old, delta)
    val scratch = DedupQueries.componentLabels(df(old ++ delta))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === scratch)
    assert(inc(11L) === 0L && inc(22L) === 20L && inc(31L) === 30L)
  }

  test("a no-op delta confirms in one round — prior shape is never re-paid") {
    // the prior graph is a 64-chain (diameter 63, the expensive shape);
    // once collapsed to a star forest, a delta touching NOTHING must
    // terminate immediately: the seed edges are already the fixpoint
    val chain = (0L until 63L).map(i => (i, i + 1))
    val (labels, rounds) = labelMap(chain, Seq((100L, 101L)))
    assert(labels === ((0L to 63L).map(_ -> 0L) ++
      Seq(100L -> 100L, 101L -> 100L)).toMap)
    assert(rounds <= 2,
      s"no-op delta must confirm without re-walking the chain, got $rounds")
  }

  test("rounds scale with delta-induced merge depth, not prior corpus size") {
    // prior: 16 disjoint stars (already depth-1 after clustering); the
    // delta stitches all 16 into one component with a chain through
    // their peripheries — the worst delta shape. Rounds must stay
    // O(log² 16): single digits, independent of how many stars exist.
    val stars = (0 until 16).flatMap { s =>
      val base = s * 100L
      (1L to 5L).map(i => (base, base + i))
    }
    val stitch = (0 until 15).map(s => (s * 100L + 1, (s + 1) * 100L + 2))
    val (labels, rounds) = labelMap(stars, stitch)
    assert(labels.values.toSet === Set(0L), "all stars must merge under 0")
    assert(labels.size === 16 * 6)
    assert(rounds <= 6,
      s"expected O(log²) rounds in merged-component count, got $rounds")
  }
}
