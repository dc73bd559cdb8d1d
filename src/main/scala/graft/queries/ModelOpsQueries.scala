package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-modeling / incremental-ops tier: the statistics a language-model
  * data pipeline derives FROM the corpus to steer itself —
  *
  *  - q133 unigram-LM familiarity: per-source mean token probability
  *    under the corpus's own unigram distribution (the "is this source
  *    in-distribution?" signal; log-free so it is exactly reproducible)
  *  - q134 Markov transition matrix over per-user event sequences (the
  *    behavioral LM: P(next event | event), integer permille)
  *  - q135 Kneser-Ney continuation counts: distinct-left-context types
  *    per token — the KN-smoothing numerator tokenizer/LM training needs
  *  - q136 snapshot drift report: even/odd doc_id halves compared per
  *    source in ONE conditional-aggregate pass (the q58 shape)
  *  - q137 KMV join-cardinality estimation: pairwise distinct-user
  *    intersection estimates between event types from mergeable sketches,
  *    gated bit-for-bit against the exact intersection
  *  - q138 incremental dedup: a fixed delta batch screened against the
  *    established LSH index — dedup cost ∝ delta, never a re-cluster of
  *    the whole corpus
  *
  * Every query is oracle-gated. Doubles appear only as a final fixed
  * formula tree over exact BIGINT sums (q133/q137) or as 16ths of a
  * MinHash signature (q138) — both engines produce identical bits.
  */
object ModelOpsQueries {
  // one-generation cache handle (see CacheSlot)
  private val lastSt = new graft.util.CacheSlot

  /** q134: sequence-order tiebreak is (ts_ns, event_id) — total, stable. */
  private val transitionPermille = 1000L

  /** q135: head of the continuation table; the distinct-bigram relation
    * it aggregates is vocab²-bounded regardless of corpus size.
    */
  private val knTopK = 30

  /** q136: drift compares the even/odd doc_id halves — a deterministic,
    * layout-independent A/B split with no batch-boundary parameter.
    */
  private val meanMicro = 1000000L

  /** q137: sketch size. Same k as q86 so the estimator constants match. */
  private val kmvK = 32

  /** q138: the delta batch is a FIXED doc_id window — incremental dedup
    * screens the newest micro-batch, so its cost must be O(delta), not
    * O(corpus); 400..500 exists at every driver SF.
    */
  // shared with DedupQueries' q157 (incremental CC over the same
  // batch) and StreamingQueries' q158 (the same screen through the
  // incremental engine)
  private[graft] val deltaLo = 400L
  private[graft] val deltaHi = 500L

  /** q139: sorted-neighborhood window and the Fellegi-Sunter-style
    * integer agreement/disagreement weights (log-likelihood-ratio
    * shaped: strong evidence counts more than weak, disagreement on a
    * discriminative field costs more than on a noisy one).
    */
  private val fsWindow = 8
  private val fsSourceW = (8L, -2L)
  private val fsLangW = (6L, -6L)
  private val fsLenW = (4L, -4L)
  private val fsJacW = (20L, -2L)
  private val fsThreshold = 20L

  /** q140: tokenizer vocabulary size (top-V corpus tokens). */
  private val vocabV = 1000

  /** q141: embedding micro-quantization scale — float positions become
    * exact BIGINTs so every sum is order-independent (the q78 k-means
    * device), keeping the centroid math hash-gateable.
    */
  private val embMicro = 1000000L
  /** q216: the vector table's contract dimension (the fixed-width dot
    * in `VectorFunctions.sqlDot` assumes it too).
    */
  private val embDim = 64

  /** q155: milli-units, not micro — the diversity identity squares the
    * per-dim SUM (s_d ≤ n·quant), so micro at n = 5e4 rows/label would
    * push s_d² past int64; milli keeps exactness to ~1e7 rows/label.
    */
  private val embMilli = 1000L

  /** q147: fixed n_chars split-threshold candidates (the doc-length
    * domain is 48..553 at every fixture SF). Integer micro-unit Gini is
    * exact while total corpus count stays ≤ ~3e9 (n² must fit int64);
    * past that the same plan keeps the exact BIGINT counts and moves
    * only the final impurity ratio to double.
    */
  private val giniThresholds = Seq(100L, 150L, 200L, 250L, 300L, 350L, 400L, 450L, 500L)

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** q148's augmented-moment construction — the [x_micro.., 1, label]
    * vector folded through the Gramian TypedImperativeAggregate into
    * upper-triangle (i, j, v) cells. ONE definition for the q148 gate,
    * q240's incremental maintenance (cells SUM-merge by (i, j) —
    * associativity ⇒ merged ≡ from-scratch exactly), and q241's
    * streaming ingest, so the maintained moment matrix can't drift
    * from its gated from-scratch twin.
    */
  private[graft] def momentCells(df: DataFrame): DataFrame =
    df.select(concat(
        expr(s"transform(embedding, v -> cast(floor(cast(v as double) * $embMicro) as bigint))"),
        array(lit(1L)),
        array(col("label").cast("long"))).as("m"))
      .agg(graft.functions.Gramian(col("m")).as("g"))
      .select(inline(col("g")))

  /** The q148 output shape over a cell frame. */
  private[graft] def momentReport(cells: DataFrame): DataFrame =
    cells.select(col("i").as("dim_i"), col("j").as("dim_j"),
        col("v").as("s_micro"))
      .orderBy("dim_i", "dim_j")

  /** q238's iteration count — a literal in both engines' plans. */
  private val pcaIters = 4

  /** q238's scaled-Gramian cache — at most one generation live
    * (CacheSlot): the ONE corpus-scale operation is the moment-matrix
    * aggregation; all `pcaIters` iterations read the cached ≤d²-row
    * relation, the graph tier's device applied to linear algebra.
    */
  private val lastGram = new graft.util.CacheSlot

  /** The power-iteration core — (cached scaled Gramian frame, final
    * iterate, previous iterate) — ONE definition for the q238 gate and
    * q239's whitening step, so the component the whitener subtracts is
    * exactly the gated one. The corpus is touched once (the raw
    * embedding Gramian, NOT q148's augmented one); each d-row iterate
    * materializes to a LOCAL relation (the q78 centroid-fetch
    * convention — a bounded model-sized collect per step; without it
    * Catalyst re-optimizes the exponentially nesting per-iteration
    * lineage, measured 24 s → 10 s for 64-row algebra).
    */
  private[graft] def pcaPower(
      s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val gram = Tables(s, dir, "embeddings")
      .select(expr(("transform(embedding, v -> " +
        s"cast(floor(cast(v as double) * $embMicro) as bigint))")).as("m"))
      .agg(graft.functions.Gramian(col("m")).as("g"))
      .select(inline(col("g")))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("v"))
    val full = gram.select(col("i"), col("j"), col("v"))
      .unionByName(gram.where(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("v")))
    val scaled = lastGram.swap(
      full.join(broadcast(full.agg(max(abs(col("v"))).as("gmax"))))  // hint audit: scalar (one-row max-|cell|)
        .select(col("i"), col("j"), expr("v * 1000 div gmax").as("g"))
        // one partition for the cached ≤d²-row model: every iteration
        // job is then a single task instead of 32-partition
        // micro-stages — pure fixed-overhead removal, no data path
        // change (the corpus-scale Gramian agg above is unaffected)
        .coalesce(1)
        .cache())
    def local(df: DataFrame): DataFrame = {
      val rows = df.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    }
    var v = local(scaled.select(col("i").as("dim")).distinct()
      .withColumn("x", lit(1000000L)))
    var prev = v
    for (_ <- 1 to pcaIters) {
      prev = v
      val w = scaled
        .join(broadcast(v.select(col("dim").as("j"), col("x"))),  // hint audit: value-domain-bounded (<= d-row iterate vector)
          Seq("j"))
        .groupBy("i").agg(sum(expr("g * x")).as("w"))
      v = local(w
        .join(broadcast(w.agg(max(abs(col("w"))).as("wmax"))))  // hint audit: scalar (one-row max-|component|)
        .select(col("i").as("dim"), expr("w * 1000000 div wmax").as("x")))
    }
    (scaled, v, prev)
  }

  /** q262/q263 temporal cut: train ends at 60% of the observed time
    * range (lo + (hi−lo)·3 div 5 — exact integer µs, the q119-family
    * device), and q262's embargo extends 5% further (·13 div 20).
    * Purged/embargoed temporal splits are standard leakage hygiene for
    * time-ordered data (López de Prado, "Advances in Financial Machine
    * Learning", 2018 — public).
    */
  private val cutNum = 3L
  private val cutDen = 5L
  private val embargoNum = 13L
  private val embargoDen = 20L

  /** The q262 split audit — ONE definition for the gate and
    * tools/FeaturePipeline (the pipeline's split-discipline stage).
    */
  private[graft] def embargoSplitFrame(
      s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("ts_ns div 1000").as("us"))
    val b = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val tagged = ev.crossJoin(broadcast(b))  // hint audit: scalar (one-row time bounds)
      .withColumn("split",
        when(col("us") < expr(s"lo + (hi - lo) * $cutNum div $cutDen"),
          lit("train"))
          .when(col("us") <
            expr(s"lo + (hi - lo) * $embargoNum div $embargoDen"),
            lit("embargo"))
          .otherwise(lit("test")))
    val per = tagged.groupBy("split")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("us")).as("min_us"), max(col("us")).as("max_us"))
    val overlap = tagged.where(col("split") === "train")
      .select("user_id").distinct()
      .join(tagged.where(col("split") === "test")
        .select("user_id").distinct(), Seq("user_id"))
      .agg(count(lit(1)).as("overlap_users"))
    per.crossJoin(broadcast(overlap))  // hint audit: scalar (one-row overlap count)
      .orderBy("split")
  }

  /** The q263 held-out-time eval — ONE definition for the gate and
    * tools/FeaturePipeline (the pipeline's model-scoring stage).
    */
  private[graft] def nextEventEvalFrame(
      s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type"), expr("ts_ns div 1000").as("us"))
    val pairs = ev
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val b = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val tagged = pairs.crossJoin(broadcast(b))  // hint audit: scalar (one-row time bounds)
      .withColumn("cut", expr(s"lo + (hi - lo) * $cutNum div $cutDen"))
    val train = tagged.where(col("us") < col("cut"))
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val model = graft.plans.TopK.perGroup(train, Seq("from_type"),
      Seq("n" -> true, "to_type" -> false), 1)
      .select(col("from_type"), col("to_type").as("predicted"))
    val test = tagged.where(col("us") >= col("cut"))
      .select(col("event_type").as("from_type"), col("to_type"))
    val all = Window.partitionBy()
    test.join(broadcast(model), Seq("from_type"), "left")  // hint audit: value-domain-bounded (<= |event types| model rows)
      .groupBy("from_type")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("to_type") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"),
        min(col("predicted")).as("predicted"))
      .withColumn("acc_permille", expr("n_correct * 1000 div n_test"))
      .withColumn("tot_c", sum(col("n_correct")).over(all))
      .withColumn("tot_n", sum(col("n_test")).over(all))
      .withColumn("overall_acc_permille",
        expr("tot_c * 1000 div tot_n"))
      .drop("tot_c", "tot_n")
      .orderBy("from_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Embargoed temporal split audit: every event lands in train
    // (before the 60% cut), embargo (the next 5% band — excluded from
    // BOTH sides so boundary-adjacent rows can't leak labels), or
    // test. The audit reports each split's row/user counts and time
    // range plus the train∩test user overlap — the group-leakage
    // number a reviewer reads next to the time split (users spanning
    // both sides are expected in behavioral data; the column prices
    // it). One scan + one bounded agg; the overlap is a distinct-user
    // semi-join, keys ∝ users.
    "q262_embargo_split" -> ((s, dir) => embargoSplitFrame(s, dir)),

    // Next-event prediction eval — the behavioral LM (q134) actually
    // SCORED: the transition matrix trains on pairs whose from-event
    // precedes the 60% cut, predicts per from-type the argmax next
    // type (count DESC, type ASC — deterministic), and is evaluated
    // on the post-cut pairs: per-type and overall top-1 accuracy in
    // exact permille. The eval twin every "which sequence model?"
    // decision reads — q134 gives the distribution, this prices its
    // point prediction on held-out time. Train agg ≤ |types|² rows;
    // the model is a ≤|types|-row broadcast back onto the test pairs.
    "q263_next_event_eval" -> ((s, dir) => nextEventEvalFrame(s, dir)),

    // Top principal component via power iteration (von Mises–Pollaczek
    // 1929; the standard first step of corpus-embedding diagnostics —
    // the dominant direction is what whitening removes and what
    // all-but-the-top-PC similarity corrections like Arora et al.'s
    // SIF subtract). The corpus is touched ONCE: q148's Gramian
    // TypedImperativeAggregate folds the d×d moment matrix in micro
    // units with fixed per-partition state; the upper triangle mirrors
    // to the full matrix, rescales to permille of max|cell| (the
    // shared overflow contract: |g| ≤ 1000 keeps every downstream
    // product inside BIGINT — g·x ≤ 1000·1e6·d, the Rayleigh numerator
    // ≤ 4e18 at d = 64), and `pcaIters` rounds of v' = G·v — each
    // renormalized to max|component| = 1e6, the division-free-of-sqrt
    // integer normalization — run entirely on the cached ≤d²-row
    // relation. Output per dim: the loading, its last-iteration
    // movement (the convergence go/no-go, q231's delta_micro
    // convention), and the Rayleigh quotient num/den — the eigenvalue
    // estimate in scaled-Gramian units — as exact integers both
    // engines reproduce bit-for-bit.
    "q238_pca_power" -> ((s, dir) => {
      val (scaled, v, prev) = pcaPower(s, dir)
      val rayleigh = scaled
        .join(broadcast(v.select(col("dim").as("i"), col("x").as("xi"))),  // hint audit: value-domain-bounded (<= d-row iterate vector)
          Seq("i"))
        .join(broadcast(v.select(col("dim").as("j"), col("x").as("xj"))),  // hint audit: value-domain-bounded (<= d-row iterate vector)
          Seq("j"))
        .agg(sum(expr("g * xi * xj")).as("rayleigh_num"))
        .join(broadcast(v.agg(sum(expr("x * x")).as("rayleigh_den"))))  // hint audit: scalar (one-row norm)
      v.join(broadcast(prev.select(col("dim"), col("x").as("xp"))),  // hint audit: value-domain-bounded (<= d-row iterate vector)
          Seq("dim"))
        .join(broadcast(rayleigh))  // hint audit: scalar (one-row Rayleigh pair)
        .select(col("dim"), col("x").as("loading_micro"),
          (col("x") - col("xp")).as("delta_micro"),
          col("rayleigh_num"), col("rayleigh_den"))
        .orderBy("dim")
    }),

    // Whitening residual — the ACTING step of q238 (the E161
    // measure→act convention): remove each vector's projection onto
    // the gated top component (Arora et al.'s "all-but-the-top" /
    // SIF correction — the dominant direction carries corpus-wide
    // frequency signal, not meaning, and subtracting it is the
    // standard cheap similarity fix). The component comes from the
    // SAME pcaPower the q238 gate executes, collected as a d-row
    // literal and FOLDED into one scan-stage HOF chain (the PQ
    // codebook literal-folding convention): per vector the projection
    // coefficient in exact milli units, the residual array, and both
    // norms — no explode, no join, the corpus touched once. Per
    // label: total norm² before/after and the reduction permille —
    // how much of each label's energy lived in the dominant
    // direction. All integer: c_milli = (m·v)·1000 div (v·v),
    // r_i = m_i − (c_milli·v_i) div 1000, norms div 1e6 per vector
    // (the shared truncation contract; every product bounded in
    // BIGINT at d = 64).
    "q239_whitening_residual" -> ((s, dir) => {
      val (_, vFrame, _) = pcaPower(s, dir)
      // d-row model fetch (the q78 centroid-fetch convention)
      val vlit = vFrame.orderBy("dim").collect().map(_.getLong(1))
      val den = vlit.map(x => x * x).sum
      val vArr = array(vlit.map(lit(_)).toSeq: _*)
      Tables(s, dir, "embeddings")
        .select(col("label"),
          expr(("transform(embedding, v -> " +
            s"cast(floor(cast(v as double) * $embMicro) as bigint))")).as("m"))
        .withColumn("vl", vArr)
        .withColumn("c_milli",
          expr("aggregate(zip_with(m, vl, (a, b) -> a * b), 0L, " +
            s"(acc, e) -> acc + e) * 1000 div ${den}L"))
        .withColumn("r",
          expr("zip_with(m, vl, (a, b) -> a - (c_milli * b) div 1000)"))
        .withColumn("x2",
          expr("aggregate(m, 0L, (acc, e) -> acc + e * e) div 1000000"))
        .withColumn("r2",
          expr("aggregate(r, 0L, (acc, e) -> acc + e * e) div 1000000"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("x2")).as("tot_norm2"),
          sum(col("r2")).as("tot_resid2"))
        .withColumn("reduction_permille",
          expr("(tot_norm2 - tot_resid2) * 1000 div tot_norm2"))
        .orderBy("label")
    }),

    // Incremental moment-matrix maintenance — the E124/E148 delta
    // convention applied to the linear-algebra tier: the delta
    // embedding batch folds its OWN Gramian (cost ∝ delta, fixed
    // per-partition state), and the (i, j) cells SUM-merge with the
    // persisted matrix — associativity makes incremental ≡
    // from-scratch EXACTLY, so a daily batch updates XᵀX without
    // rescanning the corpus and q148's downstream consumers (the
    // ridge probe, q238's iteration) never know the difference.
    // Oracle = q148's twin VERBATIM over the full corpus, hash-proven.
    "q240_delta_gramian" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      def inDelta(c: org.apache.spark.sql.Column) =
        c >= deltaLo && c < deltaHi
      momentReport(
        momentCells(e.where(!inDelta(col("vec_id"))))
          .unionByName(momentCells(e.where(inDelta(col("vec_id")))))
          .groupBy("i", "j").agg(sum(col("v")).as("v")))
    }),

    // Unigram-LM familiarity per source: Σ mentions(t)·corpus_count(t)
    // / (n_tokens(source) · N) — the mean probability the corpus
    // unigram LM assigns to this source's tokens. High = boilerplate /
    // in-distribution text, low = novel vocabulary; pipelines use it to
    // spot sources drifting away from (or collapsing into) the corpus
    // distribution. Deliberately log-free: the score is ONE double
    // division over exact BIGINT sums, so it is bit-reproducible
    // cross-engine, where a Σ log p formulation would be neither
    // order-independent nor engine-stable. Shape: one token explode
    // feeding ONE (source, token) aggregate; corpus token counts derive
    // from that same compressed relation (rows ∝ vocab × sources, not
    // corpus), rejoined on the token key it is already partitioned by.
    "q133_token_familiarity" -> ((s, dir) => {
      val st = lastSt.swap(docs(s, dir)
        .select(col("source"), explode(tokens(col("text"))).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("n"))
        .cache())
      val ct = st.groupBy("t").agg(sum(col("n")).as("c"))
      val totals = ct.agg(sum(col("c")).as("total_tokens"))
      st.join(ct, "t")
        .groupBy("source").agg(
          sum(col("n")).as("n_tokens"),
          sum(col("n") * col("c")).as("weight"))
        .crossJoin(broadcast(totals))  // hint audit: scalar (one-row totals)
        .select(col("source"), col("n_tokens"),
          (col("weight").cast("double") /
            (col("n_tokens").cast("double") * col("total_tokens").cast("double")))
            .as("familiarity"))
        .orderBy("source")
    }),

    // Markov transition matrix over per-user event sequences: count of
    // each (event_type → next event_type) step and its row-probability
    // (permille, integer). One shuffle+sort per user for the lead();
    // the matrix regroup and its row-total window run over ≤|types|²
    // rows. The behavioral analogue of a bigram LM — funnels (q47) and
    // CEP patterns (q117) pin specific paths, this gives the full
    // conditional distribution.
    "q134_markov_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      val m = Tables.events(s, dir)
        .select(col("user_id"), col("ts_ns"), col("event_id"),
          col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val row = Window.partitionBy("from_type")
      m.withColumn("row_total", sum(col("n")).over(row))
        .select(col("from_type"), col("to_type"), col("n"),
          expr(s"n * $transitionPermille div row_total").as("p_permille"))
        .orderBy("from_type", "to_type")
    }),

    // Kneser-Ney continuation counts: for each token w, the number of
    // DISTINCT left contexts it follows (N1+(·w)) and its continuation
    // probability against the total distinct-bigram-type count —
    // "how many different contexts license w", the KN-smoothing
    // numerator that separates versatile words from ones frequent only
    // inside a fixed phrase. One corpus shuffle builds the distinct
    // bigram-TYPE relation (map-side distinct partials); the
    // continuation regroup runs on rows ∝ bigram types and the head is
    // a bounded-heap TakeOrdered, never a global sort.
    "q135_kn_continuation" -> ((s, dir) => {
      // tokens materialized in an inner projection BEFORE shingling —
      // an inlined tokenizer re-runs once per shingle (the q124
      // lesson: 5.1 s -> ~1 s at sf0.1); per-doc array_distinct then
      // thins the explode before the corpus-wide distinct shuffle
      val bgd = docs(s, dir)
        .select(tokens(col("text")).as("toks"))
        .select(explode(array_distinct(
          wordShinglesFromTokens(col("toks"), 2))).as("bg"))
        .distinct()
      val cont = bgd
        .select(element_at(split(col("bg"), " "), 2).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n_contexts"))
      val tot = bgd.agg(count(lit(1)).as("bigram_types"))
      cont.crossJoin(broadcast(tot))  // hint audit: scalar (one-row total)
        .select(col("token"), col("n_contexts"),
          expr("n_contexts * 1000 div bigram_types").as("p_cont_permille"))
        .orderBy(desc("n_contexts"), asc("token")).limit(knTopK)
    }),

    // Snapshot drift report: per source, two deterministic hash-halves
    // of the docs compared on volume and mean length — the A/B
    // self-check a stats pipeline runs before trusting a new snapshot
    // (a healthy source has near-identical halves; a skewed one was
    // sampled or truncated mid-ingest). The split is the q57
    // content-hash-draw philosophy — a PARITY split degenerates here
    // because the fixture stripes doc_ids across sources (id ≡ source
    // mod |sources|), exactly the id-assignment coupling a hash split
    // is immune to. ONE conditional aggregate over one scan (the q58
    // shape): no self-join, no second pass. Integer micro/permille
    // arithmetic throughout.
    "q136_drift_report" -> ((s, dir) => {
      val even = pmod(spreadHashLong(col("doc_id")), lit(2L)) === 0
      docs(s, dir).groupBy("source").agg(
        sum(when(even, 1L).otherwise(0L)).as("n_even"),
        sum(when(!even, 1L).otherwise(0L)).as("n_odd"),
        sum(when(even, col("n_chars")).otherwise(0L)).as("s_even"),
        sum(when(!even, col("n_chars")).otherwise(0L)).as("s_odd"))
        .select(col("source"), col("n_even"), col("n_odd"),
          expr(s"CASE WHEN n_even > 0 THEN s_even * $meanMicro div n_even END")
            .as("mean_chars_even_micro"),
          expr(s"CASE WHEN n_odd > 0 THEN s_odd * $meanMicro div n_odd END")
            .as("mean_chars_odd_micro"))
        .withColumn("drift_permille", expr(
          """CASE WHEN mean_chars_even_micro > 0 THEN
            |  abs(mean_chars_even_micro - mean_chars_odd_micro) * 1000
            |    div mean_chars_even_micro END""".stripMargin))
        .orderBy("source")
    }),

    // KMV join-cardinality estimation: for every event-type pair, the
    // estimated distinct-user overlap |A∩B| from the per-type KMV
    // sketches via inclusion-exclusion — est(A) + est(B) − est(A∪B),
    // where the union sketch is the k-min of the two sketches' union
    // (exactly the q111 merge property). This is what a planner uses to
    // size a join (or a pipeline to pick dedup scope) WITHOUT a second
    // scan: one pass builds ≤|types| sketches; everything pairwise runs
    // on k-long arrays. Gated bit-for-bit: sketches, estimator, and the
    // exact intersection (via the q129 per-user item-set shape) all
    // reproduce in DuckDB.
    "q137_kmv_intersect" -> ((s, dir) => {
      val k = kmvK
      val h = spreadHashLong(col("user_id"))
      def est(sk: org.apache.spark.sql.Column) =
        when(size(sk) >= k,
          (lit((k - 1).toDouble) * lit(P.toDouble)) /
            element_at(sk, k).cast("double"))
          .otherwise(size(sk).cast("double"))
      val per = Tables.events(s, dir)
        .groupBy("event_type")
        .agg(graft.functions.KMinValues(h, k).as("sk"))
      val pairs = per.as("a")
        .join(per.as("b"), col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          col("a.sk").as("ska"), col("b.sk").as("skb"))
        .withColumn("sku", slice(
          array_sort(array_distinct(concat(col("ska"), col("skb")))), 1, k))
      // exact overlap from per-user item sets: one shuffle onto user_id,
      // pair fan-out ≤ (items per user)² in-projection (the q129 shape)
      val exact = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(array_sort(collect_set(col("event_type"))).as("items"))
        .select(explode(expr(
          """flatten(transform(items, (x, i) ->
            |  transform(slice(items, i + 2, size(items)),
            |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
        .agg(count(lit(1)).as("exact_common"))
      pairs.join(exact, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"),
          coalesce(col("exact_common"), lit(0L)).as("exact_common"),
          est(col("ska")).as("est_a"), est(col("skb")).as("est_b"),
          greatest(lit(0.0),
            est(col("ska")) + est(col("skb")) - est(col("sku")))
            .as("est_common"))
        .orderBy("type_a", "type_b")
    }),

    // Incremental dedup: the newest batch (a fixed doc_id window)
    // screened against the established corpus LSH index. Signatures are
    // the one-pass codegen MinHashSig map; the delta's band keys
    // BROADCAST against the index's banded buckets, so the index side
    // is one scan with NO shuffle and the pair work is ∝ the delta's
    // true near-dups — the shape that lets a 100 TB corpus absorb a
    // daily batch without re-clustering itself. Emits one row per delta
    // doc: its best index match (highest signature estimate, min id on
    // ties) or NULLs if novel.
    "q138_delta_dedup" -> ((s, dir) => {
      val sig = docs(s, dir)
        .select(col("doc_id"), array_distinct(
          graft.functions.ShingleHash(tokens(col("text")), 3)).as("hs"))
        .select(col("doc_id"),
          graft.functions.MinHashSig(col("hs")).as("sig"))
        .where(col("sig").isNotNull)
      val bandStructs = (0 until minhashBands).map { b =>
        struct(lit(b).as("band"),
          element_at(col("sig"), b * minhashBandRows + 1).as("h1"),
          element_at(col("sig"), b * minhashBandRows + 2).as("h2"))
      }
      def bands(df: DataFrame) = df
        .select(col("doc_id"), col("sig"), explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("sig"),
          col("bk.band"), col("bk.h1"), col("bk.h2"))
      val isDelta = col("doc_id") >= deltaLo && col("doc_id") < deltaHi
      val delta = bands(sig.where(isDelta))
      val index = bands(sig.where(!isDelta))
      val cand = index.as("i")
        .join(broadcast(delta.as("d")),  // hint audit: delta-bounded (the arriving batch, ~ delta x bands)
          col("i.band") === col("d.band") && col("i.h1") === col("d.h1") &&
            col("i.h2") === col("d.h2"))
        .select(col("d.doc_id").as("doc_id"),
          col("i.doc_id").as("match_id"),
          col("d.sig").as("sd"), col("i.sig").as("si"))
        .distinct()
        .select(col("doc_id"), col("match_id"),
          size(filter(zip_with(col("sd"), col("si"), (x, y) => x === y),
            b => b)).cast("long").as("m"))
      // tie-break as ONE integer score (higher estimate, then lower id):
      // m is 0..16 and ids stay far below the 1e7 scale, so the score is
      // collision-free and identical in both engines — no struct-compare
      // semantics to align
      val best = cand
        .withColumn("score", col("m") * lit(10000000L) - col("match_id"))
        .groupBy("doc_id")
        .agg(max_by(col("match_id"), col("score")).as("best_match"),
          (max_by(col("m"), col("score")).cast("double") / minhashK)
            .as("best_est"),
          count(lit(1)).as("n_candidates"))
      sig.where(isDelta).select(col("doc_id"))
        .join(broadcast(best), Seq("doc_id"), "left")  // hint audit: delta-bounded (per-delta-doc best match)
        .select(col("doc_id"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          col("best_match"), col("best_est"))
        .orderBy("doc_id")
    }),

    // Record-linkage scoring (Fellegi-Sunter shape): sorted-neighborhood
    // blocking on (n_chars, doc_id) — O(n·w) pairs via the two-phase
    // GlobalIndex positional join, the q115 device — then each pair
    // scored by integer agreement weights over source / lang / length
    // band / token-set Jaccard, keeping pairs past the match threshold.
    // The blocking bounds pair fan-out; the scoring is in-projection
    // set arithmetic on the records the join already carries. All
    // weights integer, so the score is exact cross-engine.
    "q139_linkage_score" -> ((s, dir) => {
      val rec = docs(s, dir)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
          array_sort(array_distinct(tokens(col("text")))).as("ts"))
      val idx = graft.ext.GlobalIndex.withGlobalIndex(rec,
        Seq(col("n_chars").asc, col("doc_id").asc), 32, "idx")
      def side(sfx: String) = idx.select(
        col("doc_id").as(s"doc_$sfx"), col("source").as(s"source_$sfx"),
        col("lang").as(s"lang_$sfx"), col("n_chars").as(s"len_$sfx"),
        col("ts").as(s"ts_$sfx"), col("idx"))
      val probes = side("a")
        .select(col("*"), explode(sequence(lit(1), lit(fsWindow))).as("off"))
        .withColumn("idx", col("idx") + col("off")).drop("off")
      val pairs = probes.join(side("b"), "idx")
      val inter = size(array_intersect(col("ts_a"), col("ts_b"))).cast("long")
      val uni = size(col("ts_a")).cast("long") + size(col("ts_b")).cast("long")
      def w(cond: org.apache.spark.sql.Column, weights: (Long, Long)) =
        when(cond, lit(weights._1)).otherwise(lit(weights._2))
      pairs
        .withColumn("same_source", col("source_a") === col("source_b"))
        .withColumn("same_lang", col("lang_a") === col("lang_b"))
        .withColumn("len_close",
          abs(col("len_a") - col("len_b")) * 20 <= greatest(col("len_a"), col("len_b")))
        .withColumn("jac_high", inter * 2 >= uni - inter)
        .withColumn("score",
          w(col("same_source"), fsSourceW) + w(col("same_lang"), fsLangW) +
            w(col("len_close"), fsLenW) + w(col("jac_high"), fsJacW))
        .where(col("score") >= fsThreshold)
        .select(col("doc_a"), col("doc_b"), col("same_source"),
          col("same_lang"), col("len_close"), col("jac_high"), col("score"))
        .orderBy("doc_a", "doc_b")
    }),

    // Tokenizer vocabulary coverage: fix the vocab at the corpus's
    // top-V tokens, then report each source's out-of-vocabulary rate —
    // the "will the tokenizer fragment this source?" check run before
    // training. ONE token explode feeds one (source, token) aggregate;
    // corpus totals, the top-V cut (bounded-heap TakeOrdered, no global
    // sort), and the OOV flags all run on the compressed vocab-sized
    // relation, with the V-row vocab broadcast.
    "q140_vocab_coverage" -> ((s, dir) => {
      val st = docs(s, dir)
        .select(col("source"), explode(tokens(col("text"))).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("n"))
      val tot = st.groupBy("t").agg(sum(col("n")).as("c"))
      val vocab = tot.orderBy(desc("c"), asc("t")).limit(vocabV)
        .select(col("t"), lit(true).as("in_vocab"))
      st.join(broadcast(vocab), Seq("t"), "left")  // hint audit: dimension-bounded (top-V vocab)
        .groupBy("source").agg(
          sum(col("n")).as("n_tokens"),
          sum(when(col("in_vocab").isNull, col("n")).otherwise(0L))
            .as("oov_mentions"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
            .as("oov_types"))
        .withColumn("oov_permille",
          expr("oov_mentions * 1000 div n_tokens"))
        .orderBy("source")
    }),

    // Embedding centroid drift: per-label centroid vs the global
    // centroid in L1 (Manhattan) distance — the "did this slice of the
    // embedding space move?" monitor for re-clustering/re-indexing
    // decisions. Positions are micro-quantized to BIGINT at the scan
    // (the q78 k-means device), so all sums are exact and
    // order-independent; the global centroid derives from the per-label
    // sums (never a second scan) and joins back as a 64-row broadcast.
    // Decision-stump split selection (the single CART step): every
    // candidate split — one per source value, one per fixed n_chars
    // threshold — scored by weighted Gini impurity of the lang label,
    // in exact integer micro-units. The corpus compresses to
    // (source, lang) and (n_chars, lang) count relations FIRST (one
    // shuffle each, both value-domain-bounded), so candidate scoring is
    // arithmetic over tiny frames; the right-branch class sums need no
    // complement join — right_ss = T2 − 2·Σ(tot_c·c) + Σc² from the
    // left branch's own rows plus two broadcast scalars (N, T2).
    "q147_gini_split" -> ((s, dir) => {
      val d = docs(s, dir).select(col("source"), col("lang"), col("n_chars"))
      val sl = d.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      val nl = d.groupBy("n_chars", "lang").agg(count(lit(1)).as("c"))
      val tot = sl.groupBy("lang").agg(sum(col("c")).as("tot_c"))
      val scal = tot.agg(sum(col("tot_c")).as("n_total"),
        sum(col("tot_c") * col("tot_c")).as("t2"))
      val thr = giniThresholds.map(t => s"($t)").mkString(", ")
      val thrDf = s.sql(s"SELECT t FROM VALUES $thr AS v(t)")
      val srcCand = sl.select(
        concat(lit("source="), col("source")).as("split_id"),
        col("lang"), col("c"))
      val thrCand = nl.join(broadcast(thrDf), col("n_chars") <= col("t"))  // hint audit: scalar (literal threshold VALUES)
        .groupBy("t", "lang").agg(sum(col("c")).as("c"))
        .select(concat(lit("n_chars<="), col("t")).as("split_id"),
          col("lang"), col("c"))
      srcCand.unionByName(thrCand)
        .join(broadcast(tot), "lang")  // hint audit: dimension-bounded (per-lang totals)
        .groupBy("split_id").agg(
          sum(col("c")).as("ln"),
          sum(col("c") * col("c")).as("lss"),
          sum(col("tot_c") * col("c")).as("cross"))
        .crossJoin(broadcast(scal))  // hint audit: scalar (one-row (N, T2))
        .select(col("split_id"), col("ln").as("n_left"),
          (col("n_total") - col("ln")).as("n_right"),
          expr("""CASE WHEN ln > 0 THEN (ln * ln - lss) * 1000000L div (ln * ln)
                  ELSE 0L END""").as("gl"),
          expr("""CASE WHEN n_total - ln > 0 THEN
                    ((n_total - ln) * (n_total - ln)
                      - (t2 - 2 * cross + lss)) * 1000000L
                      div ((n_total - ln) * (n_total - ln))
                  ELSE 0L END""").as("gr"),
          col("n_total"))
        .select(col("split_id"), col("n_left"), col("n_right"),
          expr("(n_left * gl + n_right * gr) div n_total")
            .as("gini_micro"))
        .orderBy("gini_micro", "split_id")
    }),

    // One-pass exact normal equations: the moment matrix of the
    // augmented vector [x_micro.., 1, label] — XᵀX, column sums, row
    // count, Xᵀy and yᵀy in a single scan with FIXED per-partition
    // state (d(d+1)/2 longs), via the custom Gramian
    // TypedImperativeAggregate. The declarative posexplode² formulation
    // would fan every row out ×2,211 before the shuffle; here the
    // shuffle moves one 17 KB state per partition. Everything a ridge
    // probe fit needs leaves the cluster in 2,211 exact integer rows.
    "q148_gramian" -> ((s, dir) =>
      momentReport(momentCells(Tables(s, dir, "embeddings")))),

    // Skip-gram association (PMI lift): co-occurrence statistics for
    // embedding/word-vector training — pairs at gap 1 and gap 2 over
    // the token stream, scored by observed/expected lift
    // n_xy·N / (n_x·n_y). Pair construction is scan-stage array
    // arithmetic (no self-join), both count relations are map-side-
    // combining shuffles bounded by pair/vocab cardinality. The unigram
    // rejoins are deliberately UNHINTED: at gate scale the vocab is a
    // few thousand rows and the size-stats planner (or AQE at runtime)
    // picks broadcast on its own; at production vocab (~1e7 tokens ×
    // string keys, past the broadcast threshold) the same plan flips to
    // a shuffle equi-join on the token key — an explicit broadcast()
    // hint would pin the driver-materializing plan at ANY vocab size
    // (Spark honors hints unconditionally). Both regimes are pinned in
    // PlanShapeSpec. Only the one-row corpus-total attach keeps its
    // hint (a scalar is broadcast-safe by construction). The lift is
    // one double formula over exact BIGINT counts (the q133 log-free
    // device) — identical trees, identical bits.
    "q152_skipgram_pmi" -> ((s, dir) => {
      val minPair = 5L
      def skipPairs(tk: org.apache.spark.sql.Column) =
        when(size(tk) > 2,
          transform(sequence(lit(1), size(tk) - 2),
            i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 2))))
          .otherwise(array().cast("array<string>"))
      val d = docs(s, dir).select(tokens(col("text")).as("tk"))
      val grams = d.select(explode(concat(
          wordShinglesFromTokens(col("tk"), 2),
          skipPairs(col("tk")))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n_xy"))
        .where(col("n_xy") >= minPair)
      val uni = d.select(explode(col("tk")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("n_t"))
      grams
        .select(col("pair"), col("n_xy"),
          split(col("pair"), " ").getItem(0).as("x"),
          split(col("pair"), " ").getItem(1).as("y"))
        .join(uni.select(col("t").as("x"), col("n_t").as("n_x")), "x")
        .join(uni.select(col("t").as("y"), col("n_t").as("n_y")), "y")
        .join(broadcast(uni.agg(sum(col("n_t")).as("n_tokens"))))  // hint audit: scalar (one-row corpus token total)
        .select(col("pair"), col("n_xy"), col("n_x"), col("n_y"),
          (col("n_xy").cast("double") * col("n_tokens").cast("double") /
            (col("n_x").cast("double") * col("n_y").cast("double")))
            .as("lift"))
        .orderBy(desc("lift"), col("pair"))
    }),

    // Embedding diversity / mode-collapse metric: mean pairwise squared
    // distance within each label — computed WITHOUT any pair join via
    // the moment identity  Σᵢⱼ‖xᵢ−xⱼ‖² = 2n·Σ‖x‖² − 2‖Σx‖², so one
    // posexplode → (label, dim) aggregate carries everything (per-dim
    // sums and square-sums) and the per-label rollup is over 64 rows.
    // Milli-unit quantization (not micro) keeps s_d² inside int64 —
    // the quantization IS the tolerance, explicit and engine-exact,
    // never a float summation. The n² pair space exists in neither
    // engine.
    "q155_embedding_diversity" -> ((s, dir) => {
      val perDim = Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("label"), col("dim"),
          floor(col("v").cast("double") * embMilli).cast("long").as("m"))
        .groupBy("label", "dim")
        .agg(sum(col("m")).as("s"), sum(col("m") * col("m")).as("s2"),
          count(lit(1)).as("n"))
      perDim.groupBy("label")
        .agg(max(col("n")).as("n_vecs"),
          sum(col("s2")).as("trace_s2"),
          sum(col("s") * col("s")).as("q"))
        .select(col("label"), col("n_vecs"),
          expr("(2 * n_vecs * trace_s2 - 2 * q) div (n_vecs * n_vecs)")
            .as("mean_pair_dist2_milli2"),
          expr("trace_s2 div n_vecs").as("mean_norm2_milli2"))
        .orderBy("label")
    }),

    "q141_centroid_drift" -> ((s, dir) => {
      val per = Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("label"), col("dim"),
          floor(col("v").cast("double") * embMicro).cast("long").as("m"))
        .groupBy("label", "dim")
        .agg(sum(col("m")).as("s"), count(lit(1)).as("n"))
      val glob = per.groupBy("dim")
        .agg(sum(col("s")).as("gs"), sum(col("n")).as("gn"))
        .select(col("dim"), expr("gs div gn").as("g"))
      per.select(col("label"), col("dim"), expr("s div n").as("c"),
          col("n"))
        .join(broadcast(glob), "dim")  // hint audit: dimension-bounded (per-dim calibration frame, 64 rows)
        .groupBy("label").agg(
          max(col("n")).as("n_vecs"),
          sum(abs(col("c") - col("g"))).as("l1_drift_micro"))
        .orderBy("label")
    }),

    // EMBEDDING-TIER validation rules — q112's Deequ-style ingest
    // screen applied to the vector table before any index build
    // (a single NaN vector silently poisons cosine rankings; a
    // zero-norm vector divides by zero in every cosine; a dimension
    // mismatch breaks the fixed-width dot): per label, dimension
    // conformance, NaN presence, zero-norm count, and the squared-norm
    // envelope in exact milli units (floor(‖x‖²·1000) — the fixed
    // tree both engines share). One scan, label-bounded agg.
    "q216_embedding_audit" -> ((s, dir) => {
      import graft.functions.VectorFunctions.norm2
      Tables(s, dir, "embeddings")
        .select(col("label"),
          (size(col("embedding")) === embDim).cast("long").as("dim_ok"),
          exists(col("embedding"), x => isnan(x)).cast("long").as("has_nan"),
          floor(norm2(col("embedding")) * 1000).cast("long").as("nm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("dim_ok")).as("n_dim_ok"),
          sum(col("has_nan")).as("n_nan"),
          sum(when(col("nm") === 0L, 1L).otherwise(0L)).as("n_zero"),
          min(col("nm")).as("min_norm2_milli"),
          max(col("nm")).as("max_norm2_milli"),
          sum(col("nm")).as("sum_norm2_milli"))
        .withColumn("avg_norm2_milli", expr("sum_norm2_milli div n_vecs"))
        .orderBy("label")
    }))

  /** q238's oracle: the power iteration unrolled as a CTE chain,
    * mirroring the Spark side's integer contract step for step (full
    * matrix computed directly — ≡ the mirrored upper triangle).
    */
  /** The shared power-iteration CTE chain (through `v$pcaIters` and
    * `den`), mirroring [[pcaPower]]'s integer contract step for step
    * (full matrix computed directly — ≡ the mirrored upper triangle);
    * q238's and q239's oracles both build on it, exactly as the Spark
    * side shares [[pcaPower]].
    */
  private def sqlPcaChain: String = {
    val steps = (1 to pcaIters).map { i =>
      s"""w$i AS (SELECT gs.gi AS dim, CAST(SUM(gs.g * p.x) AS BIGINT) AS w
         |  FROM gs JOIN v${i - 1} p ON p.dim = gs.gj GROUP BY 1),
         |m$i AS (SELECT CAST(MAX(abs(w)) AS BIGINT) AS wm FROM w$i),
         |v$i AS (SELECT dim, w * 1000000 // (SELECT wm FROM m$i) AS x
         |  FROM w$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id, label,
       |    list_transform(range(1, len(embedding) + 1),
       |      k -> CAST(floor(CAST(embedding[CAST(k AS INT)] AS DOUBLE)
       |        * $embMicro) AS BIGINT)) AS m
       |    FROM embeddings),
       |d AS (SELECT CAST(MAX(len(m)) AS BIGINT) AS nd FROM q),
       |i AS (SELECT unnest(range(0, (SELECT nd FROM d))) AS di),
       |j AS (SELECT unnest(range(0, (SELECT nd FROM d))) AS dj),
       |gram AS (SELECT CAST(i.di AS BIGINT) AS gi, CAST(j.dj AS BIGINT) AS gj,
       |    CAST(SUM(q.m[CAST(i.di + 1 AS INT)]
       |      * q.m[CAST(j.dj + 1 AS INT)]) AS BIGINT) AS v
       |  FROM q, i, j GROUP BY 1, 2),
       |gmax AS (SELECT CAST(MAX(abs(v)) AS BIGINT) AS g FROM gram),
       |gs AS (SELECT gi, gj, v * 1000 // (SELECT g FROM gmax) AS g
       |  FROM gram),
       |v0 AS (SELECT DISTINCT gi AS dim, CAST(1000000 AS BIGINT) AS x
       |  FROM gs),
       |$steps,
       |den AS (SELECT CAST(SUM(x * x) AS BIGINT) AS dd FROM v$pcaIters)""".stripMargin
  }

  /** q148's oracle — also q240's, VERBATIM (incremental ≡
    * from-scratch).
    */
  private def sqlGramian: String =
    s"""WITH q AS (SELECT list_append(list_append(
       |        list_transform(range(1, len(embedding) + 1),
       |          k -> CAST(floor(CAST(embedding[CAST(k AS INT)] AS DOUBLE)
       |            * $embMicro) AS BIGINT)),
       |        CAST(1 AS BIGINT)), CAST(label AS BIGINT)) AS m
       |      FROM embeddings),
       |d AS (SELECT CAST(MAX(len(m)) AS BIGINT) AS nd FROM q),
       |i AS (SELECT unnest(range(0, (SELECT nd FROM d))) AS di),
       |j AS (SELECT unnest(range(0, (SELECT nd FROM d))) AS dj)
       |SELECT CAST(i.di AS INT) AS dim_i, CAST(j.dj AS INT) AS dim_j,
       |  CAST(SUM(q.m[CAST(i.di + 1 AS INT)]
       |    * q.m[CAST(j.dj + 1 AS INT)]) AS BIGINT) AS s_micro
       |FROM q, i, j WHERE j.dj >= i.di
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def sqlPcaPower: String =
    s"""$sqlPcaChain,
       |num AS (SELECT CAST(SUM(gs.g * a.x * b.x) AS BIGINT) AS n
       |  FROM gs JOIN v$pcaIters a ON a.dim = gs.gi
       |  JOIN v$pcaIters b ON b.dim = gs.gj)
       |SELECT f.dim, f.x AS loading_micro, f.x - p.x AS delta_micro,
       |  (SELECT n FROM num) AS rayleigh_num,
       |  (SELECT dd FROM den) AS rayleigh_den
       |FROM v$pcaIters f JOIN v${pcaIters - 1} p ON p.dim = f.dim
       |ORDER BY f.dim""".stripMargin

  /** q239's oracle: the chain's component applied back to every
    * vector — projection coefficient, residual, both norms, label
    * rollup — each truncation mirrored.
    */
  private def sqlWhitening: String =
    s"""$sqlPcaChain,
       |e2 AS (SELECT vec_id, label, CAST(k - 1 AS BIGINT) AS dim,
       |    m[CAST(k AS INT)] AS mm
       |  FROM q, unnest(range(1, len(m) + 1)) AS u(k)),
       |pr AS (SELECT e2.vec_id,
       |    CAST(SUM(e2.mm * v.x) AS BIGINT) * 1000
       |      // (SELECT dd FROM den) AS c
       |  FROM e2 JOIN v$pcaIters v ON v.dim = e2.dim GROUP BY e2.vec_id),
       |r AS (SELECT e2.vec_id, e2.label, e2.dim,
       |    e2.mm - (pr.c * v.x) // 1000 AS rr
       |  FROM e2 JOIN pr ON pr.vec_id = e2.vec_id
       |  JOIN v$pcaIters v ON v.dim = e2.dim),
       |nx AS (SELECT vec_id, label,
       |    CAST(SUM(mm * mm) AS BIGINT) // 1000000 AS x2
       |  FROM e2 GROUP BY 1, 2),
       |nr AS (SELECT vec_id, CAST(SUM(rr * rr) AS BIGINT) // 1000000 AS r2
       |  FROM r GROUP BY 1),
       |lb AS (SELECT nx.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |    CAST(SUM(nx.x2) AS BIGINT) AS tot_norm2,
       |    CAST(SUM(nr.r2) AS BIGINT) AS tot_resid2
       |  FROM nx JOIN nr ON nr.vec_id = nx.vec_id GROUP BY nx.label)
       |SELECT label, n_vecs, tot_norm2, tot_resid2,
       |  (tot_norm2 - tot_resid2) * 1000 // tot_norm2
       |    AS reduction_permille
       |FROM lb ORDER BY label""".stripMargin

  def oracle: Map[String, String] = Map(
    "q262_embargo_split" ->
      s"""WITH tl AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         |b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM tl),
         |tg AS (SELECT user_id, us,
         |    CASE WHEN us < lo + (hi - lo) * $cutNum // $cutDen
         |           THEN 'train'
         |         WHEN us < lo + (hi - lo) * $embargoNum // $embargoDen
         |           THEN 'embargo'
         |         ELSE 'test' END AS split
         |  FROM tl, b),
         |per AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         |    MIN(us) AS min_us, MAX(us) AS max_us
         |  FROM tg GROUP BY 1),
         |ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS overlap_users FROM
         |  (SELECT DISTINCT user_id FROM tg WHERE split = 'train') a
         |  JOIN (SELECT DISTINCT user_id FROM tg WHERE split = 'test') t
         |    USING (user_id))
         |SELECT per.*, ov.overlap_users FROM per, ov
         |ORDER BY split""".stripMargin,
    "q263_next_event_eval" ->
      s"""WITH ev AS (SELECT user_id, event_id, event_type,
         |    epoch_ns(ts) AS ts_ns, epoch_us(ts) AS us FROM events),
         |pr AS (SELECT user_id, event_type, us,
         |    LEAD(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts_ns, event_id) AS to_type
         |  FROM ev),
         |p2 AS (SELECT * FROM pr WHERE to_type IS NOT NULL),
         |b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev),
         |tg AS (SELECT p2.*, lo + (hi - lo) * $cutNum // $cutDen AS cut
         |       FROM p2, b),
         |tr AS (SELECT event_type AS from_type, to_type,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tg WHERE us < cut GROUP BY 1, 2),
         |md AS (SELECT from_type, to_type AS predicted FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY from_type
         |      ORDER BY n DESC, to_type) AS rn FROM tr) WHERE rn = 1),
         |te AS (SELECT event_type AS from_type, to_type FROM tg
         |       WHERE us >= cut),
         |h AS (SELECT te.from_type, CAST(COUNT(*) AS BIGINT) AS n_test,
         |    CAST(SUM(CASE WHEN te.to_type = md.predicted
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |    MIN(md.predicted) AS predicted
         |  FROM te LEFT JOIN md USING (from_type) GROUP BY te.from_type)
         |SELECT from_type, n_test, n_correct, predicted,
         |  n_correct * 1000 // n_test AS acc_permille,
         |  CAST(SUM(n_correct) OVER () * 1000 // SUM(n_test) OVER ()
         |    AS BIGINT) AS overall_acc_permille
         |FROM h ORDER BY from_type""".stripMargin,
    "q238_pca_power" -> sqlPcaPower,
    "q239_whitening_residual" -> sqlWhitening,
    "q216_embedding_audit" ->
      s"""WITH m AS (SELECT label,
         |    CASE WHEN len(embedding) = $embDim THEN 1 ELSE 0 END AS dim_ok,
         |    CASE WHEN len(list_filter(embedding, x -> isnan(x))) > 0
         |      THEN 1 ELSE 0 END AS has_nan,
         |    CAST(floor((${graft.functions.VectorFunctions.sqlNorm2("embedding")})
         |      * 1000) AS BIGINT) AS nm
         |  FROM embeddings)
         |SELECT label, COUNT(*) AS n_vecs,
         |  CAST(SUM(dim_ok) AS BIGINT) AS n_dim_ok,
         |  CAST(SUM(has_nan) AS BIGINT) AS n_nan,
         |  CAST(SUM(CASE WHEN nm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  MIN(nm) AS min_norm2_milli, MAX(nm) AS max_norm2_milli,
         |  CAST(SUM(nm) AS BIGINT) AS sum_norm2_milli,
         |  CAST(SUM(nm) AS BIGINT) // COUNT(*) AS avg_norm2_milli
         |FROM m GROUP BY label ORDER BY label""".stripMargin,
    "q133_token_familiarity" ->
      s"""WITH st AS (SELECT source, unnest(${sqlTokens("text")}) AS t
         |      FROM documents),
         |sc AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS n
         |       FROM st GROUP BY 1, 2),
         |ct AS (SELECT t, CAST(SUM(n) AS BIGINT) AS c FROM sc GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_tokens FROM ct)
         |SELECT sc.source, CAST(SUM(sc.n) AS BIGINT) AS n_tokens,
         |  CAST(SUM(sc.n * ct.c) AS DOUBLE) /
         |    (CAST(SUM(sc.n) AS DOUBLE) * CAST(MAX(tot.total_tokens) AS DOUBLE))
         |    AS familiarity
         |FROM sc JOIN ct USING (t), tot
         |GROUP BY sc.source ORDER BY sc.source""".stripMargin,
    "q134_markov_transitions" ->
      s"""WITH seq AS (SELECT event_type AS from_type,
         |        LEAD(event_type) OVER (PARTITION BY user_id
         |          ORDER BY epoch_ns(ts), event_id) AS to_type
         |      FROM events),
         |m AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
         |      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
         |SELECT from_type, to_type, n,
         |  CAST(n * $transitionPermille //
         |    SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_permille
         |FROM m ORDER BY from_type, to_type""".stripMargin,
    "q135_kn_continuation" ->
      s"""WITH bgd AS (SELECT DISTINCT
         |        unnest(${sqlWordShingles("text", 2)}) AS bg
         |      FROM documents),
         |cont AS (SELECT string_split(bg, ' ')[2] AS token,
         |        CAST(COUNT(*) AS BIGINT) AS n_contexts
         |      FROM bgd GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS bigram_types FROM bgd)
         |SELECT token, n_contexts,
         |  CAST(n_contexts * 1000 // bigram_types AS BIGINT) AS p_cont_permille
         |FROM cont, tot
         |ORDER BY n_contexts DESC, token LIMIT $knTopK""".stripMargin,
    "q136_drift_report" ->
      s"""WITH h AS (SELECT source, n_chars,
         |    (${sqlSpreadHashLong("doc_id")}) % 2 = 0 AS even
         |  FROM documents),
         |a AS (SELECT source,
         |    CAST(SUM(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_even,
         |    CAST(SUM(CASE WHEN NOT even THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_odd,
         |    CAST(SUM(CASE WHEN even THEN n_chars ELSE 0 END)
         |      AS BIGINT) AS s_even,
         |    CAST(SUM(CASE WHEN NOT even THEN n_chars ELSE 0 END)
         |      AS BIGINT) AS s_odd
         |  FROM h GROUP BY source),
         |b AS (SELECT source, n_even, n_odd,
         |    CASE WHEN n_even > 0 THEN s_even * $meanMicro // n_even END
         |      AS mean_chars_even_micro,
         |    CASE WHEN n_odd > 0 THEN s_odd * $meanMicro // n_odd END
         |      AS mean_chars_odd_micro
         |  FROM a)
         |SELECT *,
         |  CASE WHEN mean_chars_even_micro > 0 THEN
         |    abs(mean_chars_even_micro - mean_chars_odd_micro) * 1000
         |      // mean_chars_even_micro END AS drift_permille
         |FROM b ORDER BY source""".stripMargin,
    "q137_kmv_intersect" -> {
      val k = kmvK
      val h = sqlSpreadHashLong("user_id")
      def est(sk: String) =
        s"""CASE WHEN len($sk) >= $k
           |  THEN (${(k - 1).toDouble} * ${P.toDouble}) / CAST($sk[$k] AS DOUBLE)
           |  ELSE CAST(len($sk) AS DOUBLE) END""".stripMargin
      s"""WITH hs AS (SELECT event_type, $h AS h FROM events),
         |per AS (SELECT event_type,
         |        list_sort(list_distinct(list(h)))[:$k] AS sk
         |      FROM hs GROUP BY event_type),
         |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |        a.sk AS ska, b.sk AS skb,
         |        list_sort(list_distinct(a.sk || b.sk))[:$k] AS sku
         |      FROM per a JOIN per b ON a.event_type < b.event_type),
         |ue AS (SELECT DISTINCT user_id, event_type FROM events),
         |ex AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |        CAST(COUNT(*) AS BIGINT) AS exact_common
         |      FROM ue a JOIN ue b ON b.user_id = a.user_id
         |        AND a.event_type < b.event_type
         |      GROUP BY 1, 2)
         |SELECT pr.type_a, pr.type_b,
         |  COALESCE(ex.exact_common, 0) AS exact_common,
         |  ${est("ska")} AS est_a, ${est("skb")} AS est_b,
         |  greatest(0.0, ${est("ska")} + ${est("skb")} - ${est("sku")})
         |    AS est_common
         |FROM pr LEFT JOIN ex ON ex.type_a = pr.type_a AND ex.type_b = pr.type_b
         |ORDER BY pr.type_a, pr.type_b""".stripMargin
    },
    "q138_delta_dedup" -> {
      val sigList = (0 until minhashK).map(k => sqlMinhash("hs", k))
        .mkString("[", ",\n    ", "]")
      s"""WITH hashes AS (SELECT doc_id, ${sqlShingleHashes("text")} AS hs
         |      FROM documents),
         |sig AS (SELECT doc_id, $sigList AS sig FROM hashes
         |        WHERE len(hs) > 0),
         |bands AS (
         |  SELECT doc_id, sig, CAST(i AS INT) AS band,
         |    sig[CAST($minhashBandRows * i + 1 AS INT)] AS h1,
         |    sig[CAST($minhashBandRows * i + 2 AS INT)] AS h2
         |  FROM sig, range(0, $minhashBands) r(i)),
         |cand AS (
         |  SELECT DISTINCT d.doc_id AS doc_id, i.doc_id AS match_id,
         |    d.sig AS sd, i.sig AS si
         |  FROM bands d JOIN bands i
         |    ON i.band = d.band AND i.h1 = d.h1 AND i.h2 = d.h2
         |    AND d.doc_id >= $deltaLo AND d.doc_id < $deltaHi
         |    AND (i.doc_id < $deltaLo OR i.doc_id >= $deltaHi)),
         |est AS (
         |  SELECT doc_id, match_id,
         |    CAST(len(list_filter(range(1, ${minhashK + 1}),
         |      i -> sd[CAST(i AS INT)] = si[CAST(i AS INT)])) AS BIGINT) AS m
         |  FROM cand),
         |best AS (
         |  SELECT doc_id,
         |    arg_max(match_id, m * 10000000 - match_id) AS best_match,
         |    CAST(arg_max(m, m * 10000000 - match_id) AS DOUBLE)
         |      / $minhashK AS best_est,
         |    CAST(COUNT(*) AS BIGINT) AS n_candidates
         |  FROM est GROUP BY doc_id)
         |SELECT s.doc_id, COALESCE(b.n_candidates, 0) AS n_candidates,
         |  b.best_match, b.best_est
         |FROM sig s LEFT JOIN best b ON b.doc_id = s.doc_id
         |WHERE s.doc_id >= $deltaLo AND s.doc_id < $deltaHi
         |ORDER BY s.doc_id""".stripMargin
    },
    "q139_linkage_score" ->
      s"""WITH rec AS (SELECT doc_id, source, lang, n_chars,
         |        list_sort(list_distinct(${sqlTokens("text")})) AS ts,
         |        CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1
         |          AS BIGINT) AS idx
         |      FROM documents),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |        a.source = b.source AS same_source,
         |        a.lang = b.lang AS same_lang,
         |        abs(a.n_chars - b.n_chars) * 20
         |          <= greatest(a.n_chars, b.n_chars) AS len_close,
         |        CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) * 2
         |          >= CAST(len(a.ts) + len(b.ts)
         |               - len(list_intersect(a.ts, b.ts)) AS BIGINT)
         |          AS jac_high
         |      FROM rec a JOIN rec b
         |        ON b.idx BETWEEN a.idx + 1 AND a.idx + $fsWindow),
         |sc AS (SELECT *,
         |    CAST(CASE WHEN same_source THEN ${fsSourceW._1} ELSE ${fsSourceW._2} END
         |      + CASE WHEN same_lang THEN ${fsLangW._1} ELSE ${fsLangW._2} END
         |      + CASE WHEN len_close THEN ${fsLenW._1} ELSE ${fsLenW._2} END
         |      + CASE WHEN jac_high THEN ${fsJacW._1} ELSE ${fsJacW._2} END
         |      AS BIGINT) AS score
         |  FROM pr)
         |SELECT doc_a, doc_b, same_source, same_lang, len_close, jac_high,
         |  score
         |FROM sc WHERE score >= $fsThreshold
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q140_vocab_coverage" ->
      s"""WITH st AS (SELECT source, unnest(${sqlTokens("text")}) AS t
         |      FROM documents),
         |sc AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS n
         |       FROM st GROUP BY 1, 2),
         |tot AS (SELECT t, CAST(SUM(n) AS BIGINT) AS c FROM sc GROUP BY 1),
         |vocab AS (SELECT t FROM tot ORDER BY c DESC, t LIMIT $vocabV)
         |SELECT sc.source, CAST(SUM(sc.n) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN vocab.t IS NULL THEN sc.n ELSE 0 END) AS BIGINT)
         |    AS oov_mentions,
         |  CAST(SUM(CASE WHEN vocab.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS oov_types,
         |  CAST(SUM(CASE WHEN vocab.t IS NULL THEN sc.n ELSE 0 END) * 1000
         |    // SUM(sc.n) AS BIGINT) AS oov_permille
         |FROM sc LEFT JOIN vocab ON vocab.t = sc.t
         |GROUP BY sc.source ORDER BY sc.source""".stripMargin,
    "q147_gini_split" -> {
      val thr = giniThresholds.map(t => s"($t)").mkString(", ")
      s"""WITH sl AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
         |      FROM documents GROUP BY 1, 2),
         |nl AS (SELECT n_chars, lang, CAST(COUNT(*) AS BIGINT) AS c
         |      FROM documents GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot_c
         |      FROM sl GROUP BY 1),
         |scal AS (SELECT CAST(SUM(tot_c) AS BIGINT) AS n_total,
         |        CAST(SUM(tot_c * tot_c) AS BIGINT) AS t2 FROM tot),
         |cand AS (
         |  SELECT 'source=' || source AS split_id, lang, c FROM sl
         |  UNION ALL
         |  SELECT 'n_chars<=' || CAST(v.t AS VARCHAR) AS split_id, lang,
         |    CAST(SUM(c) AS BIGINT) AS c
         |  FROM nl JOIN (VALUES $thr) AS v(t) ON nl.n_chars <= v.t
         |  GROUP BY v.t, lang),
         |agg AS (SELECT split_id, CAST(SUM(cand.c) AS BIGINT) AS ln,
         |        CAST(SUM(cand.c * cand.c) AS BIGINT) AS lss,
         |        CAST(SUM(tot.tot_c * cand.c) AS BIGINT) AS crs
         |      FROM cand JOIN tot USING (lang) GROUP BY 1),
         |g AS (SELECT split_id, ln, n_total,
         |        CASE WHEN ln > 0 THEN
         |          (ln * ln - lss) * 1000000 // (ln * ln) ELSE 0 END AS gl,
         |        CASE WHEN n_total - ln > 0 THEN
         |          ((n_total - ln) * (n_total - ln) - (t2 - 2 * crs + lss))
         |            * 1000000 // ((n_total - ln) * (n_total - ln))
         |          ELSE 0 END AS gr
         |      FROM agg CROSS JOIN scal)
         |SELECT split_id, ln AS n_left,
         |  n_total - ln AS n_right,
         |  CAST((ln * gl + (n_total - ln) * gr) // n_total AS BIGINT)
         |    AS gini_micro
         |FROM g ORDER BY gini_micro, split_id""".stripMargin
    },
    "q152_skipgram_pmi" ->
      s"""WITH d AS (SELECT ${sqlTokens("text")} AS tk FROM documents),
         |g AS (SELECT unnest(list_concat(
         |    CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
         |      i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 1 AS INT)])
         |      ELSE [] END,
         |    CASE WHEN len(tk) > 2 THEN list_transform(range(1, len(tk) - 1),
         |      i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 2 AS INT)])
         |      ELSE [] END)) AS pair
         |  FROM d),
         |pc AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_xy
         |      FROM g GROUP BY 1 HAVING COUNT(*) >= 5),
         |u AS (SELECT unnest(tk) AS t FROM d),
         |uc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_t FROM u GROUP BY 1),
         |n AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_tokens FROM uc)
         |SELECT pair, n_xy, ux.n_t AS n_x, uy.n_t AS n_y,
         |  CAST(n_xy AS DOUBLE) * CAST(n_tokens AS DOUBLE) /
         |    (CAST(ux.n_t AS DOUBLE) * CAST(uy.n_t AS DOUBLE)) AS lift
         |FROM pc JOIN uc ux ON ux.t = string_split(pair, ' ')[1]
         |     JOIN uc uy ON uy.t = string_split(pair, ' ')[2], n
         |ORDER BY lift DESC, pair""".stripMargin,
    "q148_gramian" -> sqlGramian,
    // q148's twin VERBATIM: incremental moment maintenance ≡
    // from-scratch (the q163↔q98 / q186↔q168 sharing applied to the
    // linear-algebra tier)
    "q240_delta_gramian" -> sqlGramian,
    "q155_embedding_diversity" ->
      s"""WITH p0 AS (SELECT label,
         |        unnest(list_transform(range(1, len(embedding) + 1),
         |          i -> struct_pack(dim := CAST(i AS INT),
         |            m := CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
         |              * $embMilli) AS BIGINT)))) AS p
         |      FROM embeddings),
         |q0 AS (SELECT label, (p).dim AS dim, (p).m AS m FROM p0),
         |per AS (SELECT label, dim, CAST(SUM(m) AS BIGINT) AS s,
         |        CAST(SUM(m * m) AS BIGINT) AS s2,
         |        CAST(COUNT(*) AS BIGINT) AS n
         |      FROM q0 GROUP BY 1, 2),
         |r AS (SELECT label, CAST(MAX(n) AS BIGINT) AS n_vecs,
         |        CAST(SUM(s2) AS BIGINT) AS trace_s2,
         |        CAST(SUM(s * s) AS BIGINT) AS q
         |      FROM per GROUP BY 1)
         |SELECT label, n_vecs,
         |  (2 * n_vecs * trace_s2 - 2 * q) // (n_vecs * n_vecs)
         |    AS mean_pair_dist2_milli2,
         |  trace_s2 // n_vecs AS mean_norm2_milli2
         |FROM r ORDER BY label""".stripMargin,
    "q141_centroid_drift" ->
      s"""WITH p0 AS (SELECT label,
         |        unnest(list_transform(range(1, len(embedding) + 1),
         |          i -> struct_pack(dim := CAST(i AS INT),
         |            m := CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
         |              * $embMicro) AS BIGINT)))) AS p
         |      FROM embeddings),
         |q AS (SELECT label, (p).dim AS dim, (p).m AS m FROM p0),
         |per AS (SELECT label, dim, CAST(SUM(m) AS BIGINT) AS s,
         |        CAST(COUNT(*) AS BIGINT) AS n
         |      FROM q GROUP BY 1, 2),
         |gc AS (SELECT dim, SUM(s) // SUM(n) AS g FROM per GROUP BY 1)
         |SELECT per.label, CAST(MAX(per.n) AS BIGINT) AS n_vecs,
         |  CAST(SUM(abs(per.s // per.n - gc.g)) AS BIGINT)
         |    AS l1_drift_micro
         |FROM per JOIN gc ON gc.dim = per.dim
         |GROUP BY per.label ORDER BY per.label""".stripMargin)
}
