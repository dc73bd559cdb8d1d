package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The q116 prefix-filter theorem, checked as a property on random
  * universes (not just the driver fixture): for ANY two token sets with
  * Jaccard ≥ τ, the (|s| − ⌈τ·|s|⌉ + 1)-length prefixes under a shared
  * global order intersect — so the inverted-index candidate generator
  * is COMPLETE. Mirrors the exact integer prefix-length formula the
  * query uses (`ceil` over doubles, rare-first (df, token) order).
  */
class PrefixFilterSpec extends AnyFunSuite {

  private val tau = 0.8

  private def prefixLen(sz: Int): Int =
    sz - math.ceil(sz * tau).toLong.toInt + 1

  test("prefix filter is complete for Jaccard >= tau on random universes") {
    val rnd = new Random(42)
    for (trial <- 1 to 200) {
      val vocabSize = 5 + rnd.nextInt(40)
      val vocab = (0 until vocabSize).map(i => f"w$i%03d_$trial")
      val nDocs = 3 + rnd.nextInt(20)
      val docs = (0 until nDocs).map { _ =>
        val sz = 1 + rnd.nextInt(vocabSize)
        rnd.shuffle(vocab).take(sz).toSet
      }
      // global rare-first order: (df, token), exactly as q116 sorts
      val df = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val order = Ordering.by[(Int, String), (Int, String)](identity)
      def prefix(s: Set[String]): Set[String] =
        s.toSeq.map(t => (df(t), t)).sorted(order)
          .take(prefixLen(s.size)).map(_._2).toSet
      for {
        i <- docs.indices; j <- docs.indices if i < j
        a = docs(i); b = docs(j)
        jac = a.intersect(b).size.toDouble / a.union(b).size
        if jac >= tau
      } assert(prefix(a).intersect(prefix(b)).nonEmpty,
        s"trial $trial: qualifying pair (jac=$jac) missed by prefix filter\n" +
          s"a=$a\nb=$b\npa=${prefix(a)}\npb=${prefix(b)}")
    }
  }
}
