package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text primitives for the training-data-pipeline extension
  * tier (dedup / language-ID / quality / fingerprinting), each with an
  * exact DuckDB SQL twin generated FROM THE SAME CONSTANTS so the driver's
  * oracle compare can hash-match bit-for-bit.
  *
  * Design rules for cross-engine exactness:
  *  - all hashes are integer arithmetic mod P = 2^31-1 (no engine-native
  *    hash functions — Spark murmur3 != DuckDB hash);
  *  - every fold is an explicit LEFT fold (Spark `aggregate`, DuckDB
  *    `list_reduce` over a 0-prepended list) so even double-typed folds
  *    evaluate in the same order;
  *  - token/shingle definitions are shared strings/regexes.
  *
  * All of this stays in Spark built-in expressions (higher-order
  * functions), so plans keep column pruning + predicate pushdown; nothing
  * here is a UDF (SURVEY.md §2.9).
  */
object TextFunctions {

  /** Modulus for all polynomial hashes: 2^31-1 (Mersenne prime). Keeps
    * every intermediate product below 2^62 (fits BIGINT in both engines).
    */
  val P: Long = 2147483647L

  val tokenSplitRegex = "[^a-z]+"

  // ------------------------------------------------------------------
  // Tokens & shingles
  // ------------------------------------------------------------------

  /** Lowercased letter-run tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), tokenSplitRegex), t => t =!= "")

  def sqlTokens(text: String): String =
    s"list_filter(string_split_regex(lower($text), '$tokenSplitRegex'), t -> t <> '')"

  /** Canonical-form key for exact dedup: md5 of the sorted distinct token
    * set. Collapses docs that are word-order permutations / repetitions of
    * the same vocabulary (the only duplicate structure in the corpus).
    */
  def canonicalKey(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  def sqlCanonicalKey(text: String): String =
    s"md5(array_to_string(list_sort(list_distinct(${sqlTokens(text)})), ' '))"

  /** Word n-shingles in sequence order (repeats kept): the near-dup unit.
    * Docs with < n tokens get an empty shingle set.
    *
    * NOTE for hot paths: pass a MATERIALIZED token column (e.g. behind a
    * cache/shuffle boundary) — if `toks` is itself an expression tree,
    * Catalyst inlines it into the lambda and re-evaluates the tokenizer
    * once per shingle.
    */
  def wordShinglesFromTokens(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  def wordShingles(text: Column, n: Int = 3): Column =
    wordShinglesFromTokens(tokens(text), n)

  def sqlWordShingles(text: String, n: Int = 3): String = {
    val toks = sqlTokens(text)
    s"""CASE WHEN len($toks) >= $n
       | THEN list_transform(range(1, len($toks) - ${n - 2}),
       |   i -> array_to_string(($toks)[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' '))
       | ELSE [] END""".stripMargin.replaceAll("\n", "")
  }

  // ------------------------------------------------------------------
  // Polynomial hash (the one hash both engines compute identically)
  // ------------------------------------------------------------------

  /** h = fold(chars) of (h*31 + codepoint) mod P — a classic polynomial
    * rolling hash. Implemented by the codegen'd [[PolyHash]] custom
    * Expression (one Java loop per value); the pure-built-in HOF
    * formulation it replaced is kept for the equivalence spec.
    */
  def polyHash(s: Column): Column = PolyHash(s)

  /** The built-in-only formulation (interpreted lambda fold) — same
    * values as [[polyHash]]; retained as the spec's reference.
    */
  def polyHashBuiltin(s: Column): Column =
    aggregate(transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L), (h, c) => (h * 31 + c) % P)

  def sqlPolyHash(v: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($v, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % $P)"

  /** The q22 quality score as a reusable Column (fixed double tree:
    * length saturation, distinct ratio, punctuation penalty, stopword
    * density — equal weights). Shared by the q22 gated query and the
    * CurationPipeline's quality-floor stage.
    */
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(tokens(text), text)

  /** [[qualityScore]] over a PRE-MATERIALIZED token column. The scoring
    * tree references the token array four times, and higher-order
    * lambdas block codegen subexpression elimination — with
    * `tokens(text)` inlined, the regex tokenizer runs 4× per row (q22
    * measured 7.5 s at the 10× fixture). Aliasing the array in an inner
    * projection evaluates it once: CollapseProject keeps a non-cheap
    * alias that is referenced more than once.
    */
  def qualityScoreFromTokens(toks: Column, text: Column): Column = {
    val nTok = size(toks).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    val punct = length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double")
    val nChars = length(text).cast("double")
    val stopHits = size(filter(toks, t => t.isin(enStopwords: _*))).cast("double")
    // token-free text (digits/punct only, or empty) must score 0.0, not
    // 0.0/0.0 = NaN: under Spark's NaN-greater-than-everything ordering
    // a NaN score would PASS any quality floor. nTok > 0 implies at
    // least one letter, so nChars > 0 is covered by the same guard.
    when(nTok > 0,
      least(lit(1.0), nTok / 100.0) * 0.25 +
        (nDistinct / nTok) * 0.25 +
        (lit(1.0) - punct / nChars) * 0.25 +
        least(lit(1.0), (stopHits / nTok) * 4.0) * 0.25)
      .otherwise(lit(0.0))
  }

  /** [[qualityScore]] rendered for DuckDB — the SAME fixed double tree
    * (shared by the q22 gate and q105's curriculum ordering).
    */
  def sqlQualityScore(text: String): String = {
    val toks = sqlTokens(text)
    val stopList = enStopwords.map(w => s"'$w'").mkString(",")
    val punct = s"CAST(length(regexp_replace($text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
    s"""CASE WHEN len($toks) > 0 THEN
       |    least(1.0, CAST(len($toks) AS DOUBLE) / 100.0) * 0.25
       |    + (CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE)) * 0.25
       |    + (1.0 - $punct / CAST(length($text) AS DOUBLE)) * 0.25
       |    + least(1.0, (CAST(len(list_filter($toks, t -> list_contains([$stopList], t))) AS DOUBLE)
       |         / CAST(len($toks) AS DOUBLE)) * 4.0) * 0.25
       |  ELSE 0.0 END""".stripMargin
  }

  /** Uniform-spread hash of an arbitrary string: polyHash composed
    * with the first MinHash affine permutation. Raw polyHash of a
    * SHORT string never wraps the modulus (its value is bounded by
    * ~31^len), so it is far from uniform over [0, P) — estimators that
    * assume uniformity (KMV's (k-1)·H/h_k, q86) need this spread form.
    * a < P and polyHash < P keep the product under 2^62 (no overflow).
    */
  def spreadHash(s: Column): Column =
    (lit(minhashA.head) * PolyHash(s) + lit(minhashB.head)) % P

  def sqlSpreadHash(v: String): String =
    s"(${minhashA.head} * ${sqlPolyHash(v)} + ${minhashB.head}) % $P"

  /** [[spreadHash]] for a value that is ALREADY an integer: the same
    * first MinHash affine permutation applied to `x mod P` directly —
    * three integer ops per value instead of rendering the number to a
    * string and folding a polynomial hash over its digits (that
    * allocation-per-row was q87's hot path: 3 hashes × every fact row).
    * `a < P` and `pmod < P` keep the product under 2^62.
    */
  def spreadHashLong(x: Column): Column =
    (lit(minhashA.head) * pmod(x, lit(P)) + lit(minhashB.head)) % P

  def sqlSpreadHashLong(v: String): String =
    s"(${minhashA.head} * ((($v) % $P + $P) % $P) + ${minhashB.head}) % $P"

  /** Distinct shingle-hash set per doc — input to MinHash and SimHash. */
  def shingleHashes(text: Column): Column =
    array_distinct(transform(wordShingles(text), s => polyHash(s)))

  /** [[shingleHashes]] over a materialized token column (hot path). */
  def shingleHashesFromTokens(toks: Column): Column =
    array_distinct(transform(wordShinglesFromTokens(toks), s => polyHash(s)))

  def sqlShingleHashes(text: String): String =
    s"list_distinct(list_transform(${sqlWordShingles(text)}, s -> ${sqlPolyHash("s")}))"

  // ------------------------------------------------------------------
  // MinHash (k independent affine permutations over shingle hashes)
  // ------------------------------------------------------------------

  /** Deterministic parameter stream: glibc-style LCG, fixed seed. (No
    * runtime randomness — the DuckDB twin embeds the same literals.)
    */
  def lcg(n: Int, seed: Long = 1234567L): Seq[Long] = {
    var x = seed
    Seq.fill(n) { x = (1103515245L * x + 12345L) % (1L << 31); x }
  }

  val minhashK = 16
  /** Bands of r=2 rows → 8 bands (tuned on the fixture corpus: catches
    * the ~25 true near-dup pairs at sf0.01 with ~28 candidates).
    */
  val minhashBandRows = 2
  val minhashBands: Int = minhashK / minhashBandRows

  private val lcgRaw = lcg(2 * minhashK)
  val minhashA: Seq[Long] = lcgRaw.take(minhashK).map(_ % (P - 2) + 1)
  val minhashB: Seq[Long] = lcgRaw.drop(minhashK).map(_ % P)

  /** k-th minhash of a distinct-hash set: min of (a*x + b) mod P. */
  def minhash(hashes: Column, k: Int): Column =
    array_min(transform(hashes, x => (x * minhashA(k) + minhashB(k)) % P))

  def sqlMinhash(hashes: String, k: Int): String =
    s"list_min(list_transform($hashes, x -> (x * ${minhashA(k)} + ${minhashB(k)}) % $P))"

  // ------------------------------------------------------------------
  // SimHash (62-bit: two 31-bit feature planes over the shingle-hash
  // set — the published near-dup config is a 64-bit fingerprint with
  // Hamming <= 3, Manku/Jain/Sarma WWW'07)
  // ------------------------------------------------------------------

  val simhashBits = 62
  /** 4 chunks of 16 bits (top chunk 14): by pigeonhole, any pair at
    * Hamming distance <= 3 shares at least one identical chunk, so an
    * equi-join on (chunkIdx, chunkValue) is a COMPLETE candidate
    * generator. 16-bit chunk keys spread N docs over 65k buckets per
    * chunk — candidate pairs stay ∝ true near-dups instead of
    * ∝ N²/2^8 (the failure mode of byte-wide chunks at cluster scale).
    */
  val simhashChunkBits = 16
  val simhashChunks = 4
  val simhashMaxHamming = 3

  /** Second feature plane: an independent affine remap of each shingle
    * hash supplies bits 31..61 (one 31-bit polynomial hash can't feed
    * 62 fingerprint bits on its own).
    */
  private val lcgExt = lcg(2 * minhashK + 2)
  val simhashA2: Long = lcgExt(2 * minhashK) % (P - 2) + 1
  val simhashB2: Long = lcgExt(2 * minhashK + 1) % P

  /** Feature bit b (0..61) of one shingle hash. */
  def simhashFeatureBit(h: Column, b: Int): Column =
    if (b < 31) shiftright(h, b).bitwiseAND(1)
    else shiftright((h * simhashA2 + simhashB2) % P, b - 31).bitwiseAND(1)

  /** Per-bit majority vote over the hash set, packed to a long. */
  def simhash(hashes: Column): Column = {
    val bits = (0 until simhashBits).map { b =>
      val bitSum = aggregate(hashes, lit(0L),
        (s, h) => s + (simhashFeatureBit(h, b) * 2 - 1))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  def sqlSimhash(hashes: String): String = {
    def featureBit(b: Int): String =
      if (b < 31) s"((h >> $b) & 1)"
      else s"((((h * $simhashA2 + $simhashB2) % $P) >> ${b - 31}) & 1)"
    val bits = (0 until simhashBits).map { b =>
      s"CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform($hashes, h -> ${featureBit(b)} * 2 - 1)), " +
        s"(s, v) -> s + v) > 0 THEN ${1L << b} ELSE 0 END"
    }
    bits.mkString("(", " + ", ")")
  }

  /** Chunk c of a simhash (16 bits; top chunk 14). */
  def simhashChunk(sh: Column, c: Int): Column =
    shiftright(sh, simhashChunkBits * c).bitwiseAND((1 << simhashChunkBits) - 1)

  def sqlSimhashChunk(sh: String, c: Int): String =
    s"(($sh >> ${simhashChunkBits * c}) & ${(1 << simhashChunkBits) - 1})"

  // ------------------------------------------------------------------
  // Language ID (stopword-hit heuristic) + quality + fingerprints
  // ------------------------------------------------------------------

  /** Tiny per-language stopword profiles; priority order breaks ties. */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von"),
    "fr" -> Seq("le", "les", "des", "et", "une", "dans"))

  /** Predicted language: argmax stopword hits (distinct-token ∩ profile),
    * ties to profile order, all-zero → 'und'.
    */
  def langId(text: Column): Column = {
    val dtoks = array_distinct(tokens(text))
    val scores = stopwordProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(dtoks, array(words.map(lit): _*)))
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
  }

  def sqlLangId(text: String): String = {
    val dtoks = s"list_distinct(${sqlTokens(text)})"
    def score(words: Seq[String]) =
      s"len(list_intersect($dtoks, [${words.map(w => s"'$w'").mkString(",")}]))"
    val scores = stopwordProfiles.map { case (lang, words) => lang -> score(words) }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    // mirror of the foldRight: first profile hitting the max wins
    scores.reverse.foldLeft("'und'") { case (acc, (lang, s)) =>
      s"CASE WHEN $s = $best AND $best > 0 THEN '$lang' ELSE $acc END"
    }
  }

  val enStopwords: Seq[String] = stopwordProfiles.head._2

  // ------------------------------------------------------------------
  // Quality-score fragments (shared by q22 and the q58 curation funnel
  // — ONE definition generates both engines' formulations)
  // ------------------------------------------------------------------

  /** Saturating token-length score: min(1, |tokens| / 100). */
  def lengthScore(text: Column): Column =
    least(lit(1.0), size(tokens(text)).cast("double") / 100.0)

  def sqlLengthScore(text: String): String =
    s"least(1.0, CAST(len(${sqlTokens(text)}) AS DOUBLE) / 100.0)"

  /** Fraction of characters that are punctuation (not [a-z0-9 ]). */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double") /
      length(text).cast("double")

  def sqlPunctRatio(text: String): String =
    s"(CAST(length(regexp_replace($text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)" +
      s" / CAST(length($text) AS DOUBLE))"
}
