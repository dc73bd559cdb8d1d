package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BPE tokenizer training at corpus scale: ONE Spark scan builds the
  * word-frequency histogram (vocab-bounded — the heavy-tailed word
  * relation is small at any corpus size), and the classic merge loop
  * (Sennrich et al. 2016, the public BPE construction) runs driver-side
  * on that compressed relation. The corpus is never re-scanned per
  * merge — the naive formulation re-tokenizes the corpus every
  * iteration, which at 100 TB is `numMerges` full scans; here it is
  * exactly one, and the iteration cost is O(vocab · word length)
  * however big the corpus.
  *
  * Determinism: pair selection is max by (count, then pair
  * lexicographically ascending) — the same tie order as the gated
  * q125 first-merge statistics, which BpeTrainerSpec pins merge #1
  * against (two independent code paths, one contract).
  */
object BpeTrainer {

  /** @param merges ordered merge rules (a, b) → a+b
    * @param wordCount distinct words the histogram held
    */
  case class Model(merges: Seq[(String, String)], wordCount: Int) {
    /** Apply the learned merges to one word (greedy, in merge order —
      * the standard BPE encode). Symbols concatenate back to the word.
      */
    def encode(word: String): Seq[String] = {
      var syms = word.map(_.toString).toVector
      for ((a, b) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b
            i += 2
          } else {
            out += syms(i)
            i += 1
          }
        }
        syms = out.result()
      }
      syms
    }
  }

  def train(docs: DataFrame, textCol: String, numMerges: Int): Model = {
    // the ONE corpus pass: token occurrences → (word, count)
    val hist: Array[(Vector[String], Long)] = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1)))
    var words = hist
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      // pair counts weighted by word frequency, every adjacent position
      // (q125's convention — overlaps count)
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        pairs(k) = pairs.getOrElse(k, 0L) + c
      }
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
              out += best._1 + best._2
              i += 2
            } else {
              out += syms(i)
              i += 1
            }
          }
          (out.result(), c)
        }
        m += 1
      }
    }
    Model(merges.result(), hist.length)
  }
}
