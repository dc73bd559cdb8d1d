package graft

import graft.functions.NfcNormalize
import org.apache.spark.sql.functions._

/** NfcNormalize custom Expression: canonical composition per UAX #15,
  * agreeing with DuckDB's nfc_normalize (the q232 oracle recomputes the
  * normalization independently and the gate hashes the agreement).
  * All non-ASCII content is written as \\u escapes so decomposed vs
  * composed forms are unambiguous in source.
  */
class NfcNormalizeSpec extends SparkSuite {

  test("composes decomposed sequences; leaves NFC text alone") {
    import spark.implicits._
    val rows = Seq(
      ("Café", "Café"), // e + combining acute -> e-acute
      ("nöl", "nöl"), // o + combining diaeresis -> o-umlaut
      ("Å", "Å"), // A + combining ring -> A-ring
      ("Café", "Café"), // already composed: unchanged
      ("plain ascii 42", "plain ascii 42"),
      ("", ""))
    val got = rows.map(_._1).toDF("s")
      .select(NfcNormalize(col("s"))).collect().map(_.getString(0))
    assert(got.toSeq === rows.map(_._2))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("Café nöl", "abc").toDF("s")
    def vals(codegen: String): Seq[String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(NfcNormalize(col("s"))).collect().map(_.getString(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
    assert(vals("CODEGEN_ONLY").head === "Caf\u00e9 n\u00f6l")
  }

  test("idempotent, and a no-op on the ASCII fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val changed = docs.where(
      NfcNormalize(col("text")) =!= col("text")).count()
    assert(changed === 0, "fixture text is ASCII — NFC must not touch it")
    import spark.implicits._
    val once = Seq("CaféÅ").toDF("s")
      .select(NfcNormalize(col("s")).as("n"))
    val twice = once.select(NfcNormalize(col("n"))).head().getString(0)
    assert(twice === once.head().getString(0))
  }

  test("registered in the SQL surface as nfc_normalize") {
    import spark.implicits._
    Seq("Café").toDF("s").createOrReplaceTempView("nfc_probe")
    val got = spark.sql("SELECT nfc_normalize(s) AS n FROM nfc_probe")
      .head().getString(0)
    assert(got === "Caf\u00e9")
  }
}
