package graft

import graft.functions.{CharGramHashes, TextFunctions}
import org.apache.spark.sql.functions._

/** CharGramHashes custom Expression ≡ polyHash-of-substr HOF formulation
  * on the real corpus, plus short-input and codegen parity.
  */
class CharGramHashesSpec extends SparkSuite {

  private def referenceGrams(n: Int) = transform(
    sequence(lit(1), length(col("text")) - (n - 1)),
    i => TextFunctions.polyHash(substr(col("text"), i, lit(n))))

  test("matches polyHash over substr grams on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(length(col("text")) >= 8)
    for (n <- Seq(4, 8)) {
      val diff = docs.select(
        CharGramHashes(col("text"), n).as("a"), referenceGrams(n).as("b"))
        .where(col("a") =!= col("b"))
      assert(diff.count() === 0, s"n=$n")
    }
  }

  test("matches on lowercased text (the q26 shape)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(length(col("text")) >= 4)
    val reference = transform(
      sequence(lit(1), length(col("text")) - 3),
      i => TextFunctions.polyHash(substr(lower(col("text")), i, lit(4))))
    val diff = docs.select(
      CharGramHashes(lower(col("text")), 4).as("a"), reference.as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() === 0)
  }

  test("strings shorter than n yield an empty array (min/max null)") {
    import spark.implicits._
    val df = Seq("abc", "", "abcdefg").toDF("text")
    val rows = df.select(
      size(CharGramHashes(col("text"), 8)).as("sz"),
      array_min(CharGramHashes(col("text"), 8)).as("mn")).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 0, 0))
    assert(rows.forall(_.isNullAt(1)))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "ab").toDF("text")
    // factoryMode NO_CODEGEN forces the interpreted nullSafeEval
    // path (wholeStage=false alone still runs generated projections)
    def vals(codegen: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(CharGramHashes(col("text"), 4))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
  }
}
