package graft

import graft.functions.{PolyHash, TextFunctions}
import org.apache.spark.sql.functions._

/** PolyHash custom Expression ≡ the built-in HOF fold it replaced,
  * under both codegen and interpreted eval.
  */
class PolyHashSpec extends SparkSuite {

  test("custom expression matches the built-in fold on fixture texts") {
    import spark.implicits._
    val df = (Seq("", "a", "hello world", "the quick brown fox", "x" * 600)
      ++ Seq.tabulate(50)(i => s"doc $i body with words $i")).toDF("s")
    val diff = df.where(
      PolyHash(col("s")) =!= TextFunctions.polyHashBuiltin(col("s"))).count()
    assert(diff === 0)
  }

  test("matches on the real documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.where(
      PolyHash(col("text")) =!= TextFunctions.polyHashBuiltin(col("text"))).count()
    assert(diff === 0)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("hello world", "abc").toDF("s")
    def vals(codegen: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(PolyHash(col("s"))).collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
    assert(vals("CODEGEN_ONLY").head === 1835087470L) // pinned cross-engine value
  }
}
