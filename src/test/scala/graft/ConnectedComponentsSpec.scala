package graft

import scala.util.Random

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Property tests for the distributed min-label propagation behind
  * q64: on generated graphs (chains, stars, cliques, random sparse),
  * the DataFrame fixpoint must equal an in-memory union-find.
  */
class ConnectedComponentsSpec extends SparkSuite {

  import spark.implicits._

  /** Reference labels: union-find with path compression, label = min
    * id per component, restricted to nodes that appear in an edge.
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def sparkLabels(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DedupQueries.componentLabels(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, star, clique, two components") {
    val chain = (0L until 9L).map(i => (i, i + 1)) // diameter 9: many rounds
    val star = (1L to 6L).map(i => (0L, i))
    val clique = for (a <- 0L until 4L; b <- (a + 1) until 4L) yield (a, b)
    val two = Seq((0L, 1L), (1L, 2L), (10L, 11L))
    for (g <- Seq(chain, star, clique, two))
      assert(sparkLabels(g) === unionFind(g))
  }

  test("random sparse graphs match union-find") {
    val rnd = new Random(42)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(45)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      assert(sparkLabels(edges) === unionFind(edges))
    }
  }

  test("round count is log-bounded, not diameter-bounded") {
    // a 64-node chain has diameter 63: min-label propagation needs ~63
    // rounds, large-star/small-star hooks subtrees and must converge in
    // O(log²) — single digits here. This pins the 100 TB property: a
    // chain-shaped dup cluster must not cost diameter-many shuffles.
    val chain = (0L until 63L).map(i => (i, i + 1))
    val (labels, rounds) = DedupQueries.componentLabelsWithRounds(
      chain.toDF("doc_a", "doc_b"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L to 63L).map(_ -> 0L).toMap)
    assert(rounds <= 10, s"expected O(log) rounds on a 64-chain, got $rounds")
  }

  test("labels are component minima and cluster sizes add up") {
    val edges = Seq((5L, 3L), (3L, 8L), (20L, 21L), (7L, 5L))
    val labels = sparkLabels(edges)
    assert(labels(5L) === 3L && labels(8L) === 3L && labels(7L) === 3L)
    assert(labels(20L) === 20L && labels(21L) === 20L)
    assert(labels.size === 6)
  }
}
