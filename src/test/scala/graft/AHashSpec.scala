package graft

import graft.functions.AHash62
import graft.multimodal.PpmDecoder
import org.apache.spark.sql.functions._

/** AHash62 perceptual hash: hand-computable fixtures, behavior on real
  * decoded raster bytes (PpmDecoder P6 round-trip), and codegen parity.
  */
class AHashSpec extends SparkSuite {

  test("half-dark / half-bright payload sets exactly the bright half's bits") {
    // 124 bytes: first 62 are 0, last 62 are 200 → cells are exactly
    // 2 bytes each, global mean 100; cells 0..30 (all-zero) < mean,
    // cells 31..61 >= mean
    val p = Array.fill[Byte](62)(0) ++ Array.fill[Byte](62)(200.toByte)
    val h = AHash62.hash(p)
    val expected = (31 until 62).foldLeft(0L)((acc, c) => acc | (1L << c))
    assert(h === expected)
  }

  test("uniform payload sets every non-empty cell bit; empty payload is 0") {
    // all-equal bytes: every cell mean == global mean → every bit with
    // a non-empty cell is set; with n >= 62 that is all 62
    val u = Array.fill[Byte](124)(7)
    assert(java.lang.Long.bitCount(AHash62.hash(u)) === 62)
    assert(AHash62.hash(Array.emptyByteArray) === 0L)
    // n < 62: only the non-empty cells can set bits
    assert(java.lang.Long.bitCount(AHash62.hash(Array.fill[Byte](10)(7))) === 10)
  }

  test("near-identical PPM rasters land within hamming 3; dissimilar far apart") {
    // a real decoded-media payload: P6 images built by PpmDecoder.encode
    // (header + interleaved RGB grid). A few brightened pixels move few
    // cell means; an inverted image moves almost all of them.
    val w = 31; val h = 8
    val base = Array.tabulate[Byte](3 * w * h)(i => ((i * 7) % 200).toByte)
    val nearDup = base.clone()
    var i = 0
    while (i < 6) { nearDup(i * 97) = (nearDup(i * 97) + 3).toByte; i += 1 }
    val inverted = base.map(b => (255 - (b & 0xff)).toByte)
    val hb = AHash62.hash(PpmDecoder.encode(w, h, base))
    val hn = AHash62.hash(PpmDecoder.encode(w, h, nearDup))
    val hi = AHash62.hash(PpmDecoder.encode(w, h, inverted))
    assert(java.lang.Long.bitCount(hb ^ hn) <= 3,
      "a few-pixel brightening must stay within the near-dup band")
    assert(java.lang.Long.bitCount(hb ^ hi) > 20,
      "an inverted raster must not read as a near-dup")
  }

  test("expression matches the static helper on the corpus payloads") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaExpr = docs
      .select(col("doc_id"), AHash62(encode(col("text"), "UTF-8")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> AHash62.hash(r.getString(1).getBytes("UTF-8")))
      .toMap
    assert(viaExpr === direct)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "", "zzzz").toDF("text")
    def vals(codegen: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(AHash62(encode(col("text"), "UTF-8")))
        .collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
  }
}
