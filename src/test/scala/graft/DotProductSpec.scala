package graft

import graft.functions.{DotProduct, VectorFunctions}
import org.apache.spark.sql.functions._

/** DotProduct custom Expression ≡ the HOF left fold, bit-for-bit, on
  * the real float embeddings (summation order is load-bearing for
  * cross-engine hash equality).
  */
class DotProductSpec extends SparkSuite {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("matches the built-in fold bit-for-bit on real embeddings") {
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .where(col("a.vec_id") < 20 && col("b.vec_id") < 20)
    val diff = pairs.where(
      DotProduct(col("a.embedding"), col("b.embedding")) =!=
        VectorFunctions.dotBuiltin(col("a.embedding"), col("b.embedding")))
    assert(diff.count() === 0)
  }

  test("codegen and interpreted paths agree") {
    def vals(codegen: String): Seq[Double] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try emb.where(col("vec_id") < 10)
        .select(DotProduct(col("embedding"), col("embedding")))
        .orderBy(col("vec_id"))
        .collect().map(_.getDouble(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
  }

  test("null on length mismatch (zip_with padding parity)") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    assert(df.select(DotProduct(col("a"), col("b"))).head().isNullAt(0))
  }

  test("null ELEMENT propagates to null (HOF parity), both eval paths") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](1.0f, 2.0f)))
      .toDF("a", "b")
    def vals(mode: String): Seq[Option[Double]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(DotProduct(col("a"), col("b")).as("d"),
        VectorFunctions.dotBuiltin(col("a"), col("b")).as("ref"))
        .collect().map { r =>
          assert(r.isNullAt(0) === r.isNullAt(1), "custom vs HOF null drift")
          if (r.isNullAt(0)) None else Some(r.getDouble(0))
        }.toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === Seq(None, Some(5.0)))
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
  }
}
