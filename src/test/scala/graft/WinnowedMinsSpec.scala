package graft

import graft.functions.{CharGramHashes, WinnowedMins}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** WinnowedMins (monotone-deque sliding minima) ≡ the HOF
  * array_min(slice) formulation, on the corpus and on generated arrays.
  */
class WinnowedMinsSpec extends SparkSuite {

  private def hofMins(arr: org.apache.spark.sql.Column, w: Int) =
    when(size(arr) >= w,
      transform(sequence(lit(1), size(arr) - (w - 1)),
        i => array_min(slice(arr, i, lit(w)))))
      .otherwise(array().cast("array<long>"))

  test("matches the HOF formulation over corpus gram hashes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (w <- Seq(1, 4, 9)) {
      val hs = CharGramHashes(col("text"), 8)
      val diff = docs.select(
        WinnowedMins(hs, w).as("a"), hofMins(hs, w).as("b"))
        .where(col("a") =!= col("b"))
      assert(diff.count() === 0, s"w=$w")
    }
  }

  test("matches a brute-force model on random arrays") {
    import spark.implicits._
    val arrGen = Gen.listOf(Gen.choose(-100L, 100L))
    val inputs = (0 until 200).flatMap(i =>
      arrGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    def model(a: Seq[Long], w: Int): Seq[Long] =
      if (a.length < w) Seq.empty else a.sliding(w).map(_.min).toSeq
    for (w <- Seq(1, 3, 7)) {
      val got = inputs.toDF("a").select(WinnowedMins(col("a"), w))
        .collect().map(_.getSeq[Long](0).toSeq)
      assert(got.toSeq === inputs.map(model(_, w)), s"w=$w")
    }
  }

  test("short input yields empty; codegen and interpreted agree") {
    import spark.implicits._
    val df = Seq(Seq(5L, 1L, 4L), Seq.empty[Long]).toDF("a")
    // factoryMode NO_CODEGEN forces the interpreted nullSafeEval
    // path (wholeStage=false alone still runs generated projections)
    def vals(codegen: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(WinnowedMins(col("a"), 4))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === Seq(Seq.empty, Seq.empty))
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
  }
}
