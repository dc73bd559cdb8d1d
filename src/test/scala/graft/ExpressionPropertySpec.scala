package graft

import graft.functions.{CharGramHashes, SortedIntersectCount, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-2 expressions: generated inputs, model
  * implementations in plain Scala as the oracle.
  */
class ExpressionPropertySpec extends SparkSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("CharGramHashes == per-position polynomial model on random strings") {
    import spark.implicits._
    val strGen = for {
      len <- Gen.choose(0, 40)
      cs <- Gen.listOfN(len, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', ',', 'é', 'ß')))
    } yield cs.mkString
    val inputs = sample(strGen, 300)
    def model(s: String, n: Int): Seq[Long] =
      if (s.length < n) Seq.empty
      else (0 to s.length - n).map { i =>
        s.substring(i, i + n).foldLeft(0L)((h, c) => (h * 31 + c) % TextFunctions.P)
      }
    for (n <- Seq(2, 4, 8)) {
      val got = inputs.toDF("s")
        .select(CharGramHashes(col("s"), n))
        .collect().map(_.getSeq[Long](0).toSeq)
      assert(got.toSeq === inputs.map(model(_, n)), s"n=$n")
    }
  }

  test("SortedIntersectCount == set-intersection model on random arrays") {
    import spark.implicits._
    val arrGen = Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)
    val pairs = sample(Gen.zip(arrGen, arrGen), 300)
    val got = pairs.toDF("a", "b")
      .select(SortedIntersectCount(col("a"), col("b")))
      .collect().map(_.getLong(0))
    val want = pairs.map { case (a, b) => a.toSet.intersect(b.toSet).size.toLong }
    assert(got.toSeq === want)
  }

  test("simhash pigeonhole: pairs at hamming <= 3 always share a chunk") {
    // structural property of the 62-bit/4-chunk split, checked over
    // random fingerprints perturbed by <= 3 bit flips
    val fpGen = for {
      base <- Gen.choose(Long.MinValue, Long.MaxValue).map(_ & ((1L << 62) - 1))
      nFlips <- Gen.choose(0, 3)
      bits <- Gen.listOfN(nFlips, Gen.choose(0, 61))
    } yield (base, bits.foldLeft(base)((v, b) => v ^ (1L << b)))
    sample(fpGen, 500).foreach { case (a, b) =>
      val shares = (0 until TextFunctions.simhashChunks).exists { c =>
        ((a >> (16 * c)) & 0xffffL) == ((b >> (16 * c)) & 0xffffL)
      }
      assert(shares, s"no shared chunk for $a / $b")
    }
  }

  test("AHash62 is brightness-shift invariant on random payloads") {
    // the defining aHash property: adding a constant c to every pixel
    // shifts cell means and the global mean equally, so every
    // comparison cellSum·n >= total·len is unchanged —
    // (cellSum + c·len)·n − (total + c·n)·len = cellSum·n − total·len
    val payloadGen = for {
      len <- Gen.choose(0, 300)
      bytes <- Gen.listOfN(len, Gen.choose(0, 200))
      shift <- Gen.choose(0, 55) // stays within 0..255, no wraparound
    } yield (bytes.map(_.toByte).toArray,
      bytes.map(b => (b + shift).toByte).toArray)
    sample(payloadGen, 300).foreach { case (p, shifted) =>
      assert(graft.functions.AHash62.hash(p) ===
        graft.functions.AHash62.hash(shifted))
    }
  }

  test("BpeEncodeIds == Model.encode under RANDOM merge tables (incl. a == b)") {
    // stronger than the corpus-vocab pin: arbitrary rule tables,
    // including the a == b self-merge case the fixed codec forbids —
    // the expression implements the true sequential greedy scan, so it
    // must agree with the driver-side reference on any ruleset
    import graft.ext.BpeTrainer
    val symGen = Gen.oneOf("a", "b", "c", "ab", "bc", "aa")
    val mergesGen = Gen.listOfN(4, Gen.zip(symGen, symGen))
      // distinct outputs keep the id mapping well-defined
      .map(_.distinctBy { case (a, b) => a + b })
    val wordGen = Gen.choose(0, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    sample(Gen.zip(mergesGen, Gen.listOfN(20, wordGen)), 60)
      .foreach { case (merges, words) =>
        val model = BpeTrainer.Model(merges, 0)
        val rank = merges.zipWithIndex
          .map { case ((a, b), r) => (a + b) -> (128 + r).toLong }.toMap
        import org.apache.spark.sql.graft.ColumnBridge
        import spark.implicits._
        val got = words.toDF("w")
          .select(ColumnBridge.column(graft.functions.BpeEncodeIds(
            ColumnBridge.expression(array(col("w"))), merges)))
          .collect().map(_.getSeq[Long](0).toSeq)
        val want = words.map(w => model.encode(w).map(s =>
          if (s.length == 1) s.charAt(0).toLong else rank(s)))
        assert(got.toSeq === want, s"merges=$merges")
      }
  }

  test("q179's isqrt∘isqrt(n³) == floor(n^(3/4)) up to the 2^20 saturation cap") {
    // the double-sqrt-seed ±1 correction must stay exact even where
    // n³ (up to 2^60) loses bits in the double cast — the gate only
    // exercises small counts, so the boundary is pinned here against
    // BigInt arithmetic
    import spark.implicits._
    // the PRODUCTION expression (shared helper) — a q179 edit cannot
    // silently unpin this property
    def isq(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      graft.queries.CorpusOpsQueries.isqrtExact(x)
    def bigIsqrt(x: BigInt): BigInt = {
      if (x < 2) x
      else {
        var lo = BigInt(1); var hi = x
        while (lo < hi) {
          val mid = (lo + hi + 1) / 2
          if (mid * mid <= x) lo = mid else hi = mid - 1
        }
        lo
      }
    }
    val cap = 1L << 20
    val ns = (Seq(1L, 2L, 3L, 7L, 100L, 1023L, 1024L, 65535L, 65536L,
      cap - 1, cap) ++
      (1 to 200).map(i => (i.toLong * 2654435761L) % cap + 1)).distinct
    val got = ns.toDF("n")
      .select(col("n"), isq(isq(col("n") * col("n") * col("n"))).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (n <- ns) {
      val want = bigIsqrt(bigIsqrt(BigInt(n) * n * n)).toLong
      assert(got(n) == want, s"n=$n: got ${got(n)}, want $want")
    }
  }
}
