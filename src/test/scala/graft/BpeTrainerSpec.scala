package graft

import graft.ext.BpeTrainer
import org.apache.spark.sql.functions._

/** BpeTrainer: the textbook merge sequence on the classic corpus, the
  * encode/concat identity, and merge #1 pinned against the GATED q125
  * first-merge pair statistics — two independent code paths
  * (driver-side histogram loop vs the distributed pair aggregate) must
  * elect the same first merge.
  */
class BpeTrainerSpec extends SparkSuite {

  import spark.implicits._

  test("classic Sennrich corpus yields the textbook merge order") {
    // low×5 lower×2 newest×6 widest×3 — (e,s)=9 then (es,t)=9 then (l,o)=7
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val m = BpeTrainer.train(Seq(text).toDF("text"), "text", 3)
    assert(m.merges === Seq(("e", "s"), ("es", "t"), ("l", "o")))
    assert(m.wordCount === 4)
    assert(m.encode("lowest") === Seq("lo", "w", "est"))
    assert(m.encode("newest") === Seq("n", "e", "w", "est"))
  }

  test("encode concatenates back to the word; merges stop when exhausted") {
    val m = BpeTrainer.train(Seq("aa aa ab").toDF("text"), "text", 50)
    // tiny corpus: merge count bounded by available pairs, no spin
    assert(m.merges.nonEmpty && m.merges.length < 50)
    for (w <- Seq("aa", "ab", "aaab", "zzz"))
      assert(m.encode(w).mkString === w, s"encode must preserve '$w'")
  }

  test("merge #1 equals the gated q125 top pair on the fixture corpus") {
    val dir = "/root/testdata/sf0.001"
    val m = BpeTrainer.train(
      graft.queries.Tables(spark, dir, "documents"), "text", 1)
    val top = graft.queries.InsightOpsQueries.queries("q125_bpe_pairs")(
      spark, dir).head()
    assert(m.merges.head._1 + m.merges.head._2 === top.getString(0),
      "trainer and the distributed pair statistics disagree on merge #1")
  }
}
