package graft

import graft.functions.CharClassCounts
import org.apache.spark.sql.functions._

/** CharClassCounts custom Expression ≡ the built-in 39×replace()
  * formulation it replaced, under both codegen and interpreted eval.
  */
class CharClassCountsSpec extends SparkSuite {

  private val builtin = expr(
    s"transform(split('${CharClassCounts.alphabet}', ''), " +
      "c -> CAST(length(s) - length(replace(s, c, '')) AS BIGINT))")

  test("custom expression matches the replace() formulation") {
    import spark.implicits._
    val df = (Seq("", "a", "hello, world.", "a1 b2 c3", ",,..  ",
      "UPPER and λ non-ascii é", "x" * 600)
      ++ Seq.tabulate(50)(i => s"doc $i body, with words $i.")).toDF("s")
    val diff = df.where(
      CharClassCounts(col("s")) =!= builtin).count()
    assert(diff === 0)
  }

  test("matches on the real documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumnRenamed("text", "s")
    val diff = docs.where(CharClassCounts(col("s")) =!= builtin).count()
    assert(diff === 0)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("hello, world.", "aaa bbb").toDF("s")
    def vals(codegen: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(CharClassCounts(col("s"))).collect()
        .map(_.getSeq[Long](0).toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
    // pinned: "aaa bbb" → a=3, b=3, space=1, everything else 0
    val counts = vals("CODEGEN_ONLY")(1)
    assert(counts(0) === 3 && counts(1) === 3 &&
      counts(CharClassCounts.alphabet.indexOf(' ')) === 1 &&
      counts.sum === 7)
  }
}
