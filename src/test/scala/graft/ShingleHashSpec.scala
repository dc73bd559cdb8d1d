package graft

import graft.functions.{ShingleHash, TextFunctions}
import org.apache.spark.sql.functions._

/** ShingleHash custom Expression ≡ hash-of-materialized-shingle-strings
  * on the real corpus, plus short-input and codegen parity.
  */
class ShingleHashSpec extends SparkSuite {

  test("matches polyHash over concat_ws shingles on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextFunctions.tokens(col("text"))
    val reference = transform(
      TextFunctions.wordShinglesFromTokens(toks),
      s => TextFunctions.polyHash(s))
    val diff = docs.select(
      ShingleHash(toks, 3).as("a"), reference.as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() === 0)
  }

  test("fewer than n tokens yields an empty array") {
    import spark.implicits._
    val df = Seq("one two", "", "single").toDF("text")
    val rows = df.select(size(
      ShingleHash(TextFunctions.tokens(col("text")), 3))).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 0, 0))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps").toDF("text")
    def vals(codegen: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(ShingleHash(TextFunctions.tokens(col("text")), 3))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
  }
}
