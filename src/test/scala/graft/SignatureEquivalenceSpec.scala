package graft

import graft.functions.TextFunctions._
import graft.functions.ShingleHash
import org.apache.spark.sql.functions._

/** The per-row HOF signature APIs (minhash/simhash over a hash-set
  * column) compute exactly what the production explode+aggregate path
  * in DedupQueries computes — pinned here so both public forms stay
  * oracle-equivalent.
  */
class SignatureEquivalenceSpec extends SparkSuite {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private lazy val withHashes = docs.select(col("doc_id"),
    array_distinct(ShingleHash(tokens(col("text")), 3)).as("hs"))
    .where(size(col("hs")) > 0)
    .cache()

  test("HOF minhash == groupBy-min over the exploded relation") {
    val hof = withHashes.select(col("doc_id") +:
      (0 until minhashK).map(k => minhash(col("hs"), k).as(s"mh$k")): _*)
    val exploded = withHashes.select(col("doc_id"), explode(col("hs")).as("h"))
    val aggs = (0 until minhashK).map(k =>
      min((col("h") * minhashA(k) + minhashB(k)) % P).as(s"mh$k"))
    val agg = exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    assert(hof.exceptAll(agg).count() === 0)
    assert(agg.exceptAll(hof).count() === 0)
  }

  test("HOF simhash == per-bit majority aggregates") {
    val hof = withHashes.select(col("doc_id"), simhash(col("hs")).as("sh"))
    val exploded = withHashes.select(col("doc_id"), explode(col("hs")).as("h"))
    val bitAggs = count(lit(1)).as("n") +:
      (0 until simhashBits).map(b =>
        sum(simhashFeatureBit(col("h"), b)).as(s"c$b"))
    val agg = exploded.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"),
        (0 until simhashBits).map(b =>
          when(col(s"c$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sh"))
    assert(hof.exceptAll(agg).count() === 0)
    assert(agg.exceptAll(hof).count() === 0)
  }

  test("MinHashSig expression == HOF minhash per position") {
    import graft.functions.MinHashSig
    val diff = withHashes.select(
      MinHashSig(col("hs")).as("a"),
      array((0 until minhashK).map(k => minhash(col("hs"), k)): _*).as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() === 0)
  }

  test("SimHashPack expression == HOF simhash") {
    import graft.functions.SimHashPack
    val diff = withHashes.select(
      SimHashPack(col("hs")).as("a"), simhash(col("hs")).as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() === 0)
  }

  test("shingleHashesFromTokens (HOF) == ShingleHash + distinct") {
    val toks = tokens(col("text"))
    val diff = docs.select(
      shingleHashesFromTokens(toks).as("a"),
      array_distinct(ShingleHash(toks, 3)).as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() === 0)
  }
}
