package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.CrawlOpsQueries

/** Synthetic pinning spec for the graph tier (the TsEncodingSpec /
  * StreamDedupTtlSpec convention): the walk/recursion semantics are
  * proven on CONSTRUCTED graphs where the right answer is a theorem,
  * independently of the fixture gates that hash the same definitions
  * against DuckDB. Every frame goes through the SAME private[graft]
  * entry points the gated queries execute (pagerankFrom / hitsFrom /
  * lpaFrom), so a semantics regression fails here with a named
  * invariant instead of an opaque hash mismatch.
  */
class GraphSpec extends SparkSuite {

  private def edges(rows: (Long, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("src", "dst", "w")
  }

  test("PageRank conserves mass up to div truncation, never exceeds it") {
    // skewed weights + a source-only node (3): upper bound is exact
    // (every div truncates down), lower bound loses < 1 micro-unit per
    // host/edge per iteration
    val out = CrawlOpsQueries.pagerankFrom(
      edges((0, 1, 5), (1, 2, 3), (2, 0, 2), (1, 0, 1), (3, 1, 7)))
    val total = out.agg(sum(col("rank_micro"))).head().getLong(0)
    assert(total <= 1000000L, s"mass created: $total")
    assert(total >= 990000L, s"truncation lost too much: $total")
    // the source-only node holds exactly its teleport share: no
    // in-links ⇒ inflow 0 ⇒ rank = tele = 1e6·15 div (100·4)
    val sink = out.where(col("host_id") === 3)
      .select(col("rank_micro")).head().getLong(0)
    assert(sink === 1000000L * 15 / (100 * 4))
  }

  test("PageRank on a uniform ring is stationary: equal ranks, zero delta") {
    val out = CrawlOpsQueries.pagerankFrom(
      edges((0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1))).collect()
    assert(out.map(_.getAs[Long]("rank_micro")).toSet === Set(250000L))
    assert(out.map(_.getAs[Long]("delta_micro")).toSet === Set(0L))
  }

  test("TrustRank gives exactly zero to hosts unreachable from the seeds") {
    // two components: seeds at {0} in A = {0, 1}; B = {2, 3} has no
    // path from A, so no teleport mass and no inflow ever reaches it
    val out = CrawlOpsQueries.pagerankFrom(
      edges((0, 1, 1), (1, 0, 1), (2, 3, 1), (3, 2, 1)),
      Some((
        expr("CASE WHEN h = 0 THEN 150000L ELSE 0L END"),
        expr("CASE WHEN h = 0 THEN 1000000L ELSE 0L END"))))
    val byHost = out.collect()
      .map(r => r.getAs[Long]("host_id") -> r.getAs[Long]("rank_micro"))
      .toMap
    assert(byHost(2L) === 0L && byHost(3L) === 0L,
      "rank leaked into the unreachable component")
    assert(byHost(0L) > 0L && byHost(1L) > 0L)
  }

  test("HITS on a star: all hub mass at the center, authority split over leaves") {
    val out = CrawlOpsQueries.hitsFrom(
      edges((0, 1, 1), (0, 2, 1), (0, 3, 1))).collect()
    val a = out.map(r =>
      r.getAs[Long]("host_id") -> r.getAs[Long]("authority_micro")).toMap
    val h = out.map(r =>
      r.getAs[Long]("host_id") -> r.getAs[Long]("hub_micro")).toMap
    assert(a(0L) === 0L, "the no-in-link center gained authority")
    assert(Set(a(1L), a(2L), a(3L)) === Set(1000000L / 3),
      "leaf authorities are not an equal split")
    assert(h(0L) === 1000000L, "the center does not hold all hub mass")
    assert(h(1L) === 0L && h(2L) === 0L && h(3L) === 0L)
  }

  test("LPA resolves two disconnected triangles into two communities") {
    val out = CrawlOpsQueries.lpaFrom(
      edges((0, 1, 1), (1, 2, 1), (2, 0, 1),
        (10, 11, 1), (11, 12, 1), (12, 10, 1))).collect()
    assert(out.map(_.getAs[Long]("community")).toSet === Set(0L, 10L))
    assert(out.map(_.getAs[Long]("n_hosts")).toSet === Set(3L))
    // two identical cliques: symmetric contributions, positive fleet Q
    assert(out.map(_.getAs[Long]("contribution_micro")).toSet.size === 1)
    val q = out.head.getAs[Long]("modularity_micro")
    assert(q > 0L, s"two clean cliques must score positive modularity, got $q")
    // exact: each community holds half the weight — e_c/2m = 1/2,
    // (deg_c/2m)² = 1/4, Q = 2·(1/2·1/2 − 1/4·1) ... in micro with the
    // permille device: 500000 − 500² = 250000 per community
    assert(out.head.getAs[Long]("modularity_micro") === 500000L)
  }

  test("BFS on a directed path: hop i at node i; unreachable = -1") {
    // path 0→1→…→6 uses the full bfsIters=6 budget (the bound binds
    // exactly); 10→11 is a separate component the seed never reaches;
    // the back-edge 3→0 must not shorten anything (dist 0 is final)
    val out = CrawlOpsQueries.hopDistFrom(
      edges((0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1),
        (5, 6, 1), (3, 0, 1), (10, 11, 1)), Seq(0L)).collect()
    val hops = out.map(r =>
      r.getAs[Long]("host_id") -> r.getAs[Long]("hops")).toMap
    (0 to 6).foreach(i => assert(hops(i.toLong) === i.toLong,
      s"node $i at wrong depth ${hops(i.toLong)}"))
    assert(hops(10L) === -1L && hops(11L) === -1L,
      "the disconnected component must surface as -1, not be dropped")
  }

  test("multi-source BFS takes the min over seeds") {
    // seeds 0 and 4 on a path 0→1→2→3→4→5: node 3 is 3 hops from
    // seed 0; node 5 is 1 hop from seed 4, not 5 from seed 0
    val out = CrawlOpsQueries.hopDistFrom(
      edges((0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)),
      Seq(0L, 4L)).collect()
    val hops = out.map(r =>
      r.getAs[Long]("host_id") -> r.getAs[Long]("hops")).toMap
    assert(hops(3L) === 3L)
    assert(hops(4L) === 0L)
    assert(hops(5L) === 1L)
  }
}
