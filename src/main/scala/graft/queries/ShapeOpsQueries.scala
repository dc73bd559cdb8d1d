package graft.queries

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-shape tier: distribution/layout statistics a pipeline derives
  * to reason about its own data —
  *
  *  - q142 Count-Min-Sketch frequency estimates: the classic d×w
  *    counter grid (Cormode & Muthukrishnan) built from exact per-key
  *    partials, probed for a fixed key slice and gated bit-for-bit
  *    against the exact counts (estimate AND overcount)
  *  - q143 pareto frontier (skyline): the docs no other doc beats on
  *    (shorter, more tokens) — computed on the value-domain-compressed
  *    relation, never the O(n²) dominance self-join the oracle runs
  *  - q144 gap-fill resample: per-user daily activity with missing days
  *    linearly interpolated (integer-exact weighted average), long gaps
  *    left open as structural breaks — the time-series regularizer
  *    before windowed feature extraction
  *  - q145 char-collision score: Rényi-2 collision probability of each
  *    doc's character distribution (a log-free compressibility /
  *    repetitiveness proxy), rolled up per source — all counts from
  *    fixed-alphabet replace() arithmetic, no explode
  *
  * Every query is oracle-gated and integer-exact end-to-end: sketch
  * counters, frontier coordinates, interpolated counts, and collision
  * ppm are all BIGINT arithmetic both engines reproduce bit-for-bit.
  */
object ShapeOpsQueries {

  import TextFunctions.P

  /** q142 CMS geometry: d=4 rows × w=64 buckets (256 counters — the
    * point of the sketch: fixed memory however many keys). Hash params
    * from the repo's deterministic LCG stream, distinct seed.
    */
  private val cmsW = 64L
  private val cmsRaw = TextFunctions.lcg(8, seed = 777L)
  private val cmsA: Seq[Long] = cmsRaw.take(4).map(_ % (P - 2) + 1)
  private val cmsB: Seq[Long] = cmsRaw.drop(4).map(_ % P)

  /** q142: fixed probe slice — estimates are checked for these keys.
    * (Every driver fixture has users 0..14+, so the slice is non-empty
    * and identical across SFs up to corpus growth.)
    */
  private val cmsTrack = 20L

  /** q144: gaps strictly longer than this many missing days are left
    * unfilled (a structural break, not a sampling artifact) — and the
    * cap bounds the interpolation fan-out per present row.
    */
  private val gapMax = 7L

  /** q145: the fixed counting alphabet (shared with the one-pass
    * [[graft.functions.CharClassCounts]] codegen Expression; the DuckDB
    * twin keeps the per-char replace() formulation as the oracle).
    */
  private val alphabet = graft.functions.CharClassCounts.alphabet

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** q266: the audited string columns of `documents`, lowest
    * cardinality first.
    */
  private val dictCols = Seq("lang", "source", "text")

  /** q269 clamp ranks (permille) and the cached cumulative histogram
    * (read by the bounds pass AND the report pass — one swap-guarded
    * generation, the CacheSlot discipline).
    */
  private val winsLoPermille = 10L
  private val winsHiPermille = 990L
  private val lastWinsorHist = new graft.util.CacheSlot

  /** q267: (table, primary-key expression) pairs for the manifest.
    * lineitem's composite key packs as orderkey·10 + linenumber
    * (linenumber is 1..7 in TPC-H data).
    */
  private val manifestKeys = Seq(
    "customer" -> "c_custkey",
    "orders" -> "o_orderkey",
    "lineitem" -> "(l_orderkey * 10 + l_linenumber)",
    "events" -> "event_id",
    "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  /** q267's order-independent row checksum: Σ term(pk) where term is a
    * NONLINEAR two-prime mixer — quadratic in both CRT residues
    * r1 = pk mod P1, r2 = pk mod P2:
    *   term = ((r1² + A·r1) mod P1 · 31 + (r2² + B·r2) mod P2) mod P1.
    * An affine single-mod term (the round-12 form) let any two keys
    * congruent mod P contribute identical terms, so a replication
    * error dropping one and duplicating the other passed the check;
    * here keys congruent mod P1 still differ mod P2 (the residue pair
    * is injective over the packed-key domain up to P1·P2 ≈ 1e18), and
    * the quadratic terms break affinity, so distinct keys virtually
    * never share a term (pairwise collision ~ 1/P1). Every
    * intermediate stays in BIGINT at ANY key magnitude (r² < 1.01e18,
    * A·r < 2.7e18), the final term stays < P1 — the same sum-magnitude
    * bound as before — and the sum commutes, so the checksum is
    * partitioning- and layout-independent (what a replication check
    * needs). ONE term renderer feeds both engines' plans.
    */
  /** Deterministic per-version commit timestamps (epoch millis) —
    * every manifest carries its version's `commit_ts` column so
    * timestamp-based time travel (q308) has real metadata to resolve
    * against. Staged, not wall-clock (the fixture-determinism rule):
    * strictly increasing by construction (hourly spacing dominates
    * the sub-spacing jitter), unevenly spaced so an off-by-one
    * resolution (`<` vs `<=`, wrong boundary version) shifts a gated
    * row instead of hiding in a uniform grid.
    */
  private[graft] def commitTsOf(v: Int): Long =
    1700000000000L + v.toLong * 3600000L + (v.toLong * 7919L) % 600000L

  private val manifestP = 1000000007L
  private val manifestP2 = 998244353L
  private val manifestA = 2654435761L
  private val manifestB = 2246822519L
  private[graft] def manifestTerm(pk: String): String = {
    val r1 = s"(($pk) % $manifestP)"
    val r2 = s"(($pk) % $manifestP2)"
    s"((($r1 * $r1 + $manifestA * $r1) % $manifestP) * 31 + " +
      s"(($r2 * $r2 + $manifestB * $r2) % $manifestP2)) % $manifestP"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Winsorization report — the standard robust data-cleaning step
    // (clamp at exact p1/p99) made measurable BEFORE anyone mutates
    // data: exact percentile bounds from the value histogram's
    // distributed prefix sum (ext/GlobalIndex — the corpus-scale
    // running sum, never a single-partition window over a
    // near-continuous measure), then one histogram pass counting
    // clamped rows and the before/after sums in exact integer cents.
    // ceil-rank semantics: bound = min value whose cumulative count
    // reaches ceil(n·p/1000).
    "q269_winsorize" -> ((s, dir) => {
      val hist = Tables(s, dir, "lineitem")
        .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
        .groupBy("c").agg(count(lit(1)).as("n"))
      val cum = lastWinsorHist.swap(
        graft.ext.GlobalIndex.withGlobalPrefixSum(
          hist, Seq(col("c")), "n", 32, "cum").cache())
      val tot = cum.agg(max(col("cum")).as("n_total"))
      val bounds = cum.crossJoin(broadcast(tot))  // hint audit: scalar (one-row total)
        .agg(
          min(when(col("cum") >=
            expr(s"(n_total * $winsLoPermille + 999) div 1000"),
            col("c"))).as("lo_cents"),
          min(when(col("cum") >=
            expr(s"(n_total * $winsHiPermille + 999) div 1000"),
            col("c"))).as("hi_cents"))
      cum.crossJoin(broadcast(bounds))  // hint audit: scalar (one-row clamp bounds)
        .agg(
          sum(col("n")).as("n_rows"),
          sum(when(col("c") < col("lo_cents"), col("n")).otherwise(lit(0L)))
            .as("n_clamped_lo"),
          sum(when(col("c") > col("hi_cents"), col("n")).otherwise(lit(0L)))
            .as("n_clamped_hi"),
          sum(col("c") * col("n")).as("sum_cents"),
          sum(greatest(least(col("c"), col("hi_cents")), col("lo_cents"))
            * col("n")).as("winsorized_sum_cents"),
          min(col("lo_cents")).as("lo_cents"),
          min(col("hi_cents")).as("hi_cents"))
    }),

    // Dictionary-encoding benefit audit — the parquet/ORC encoding
    // decision made measurable: per string column its cardinality,
    // plain size (Σ value lengths over all rows), and dictionary size
    // (Σ distinct-value lengths + n·ceil(log2(distinct)) index bits,
    // via the E214 bin-length device — no float logs), with the
    // recommend flag. Cost shape: one groupBy per column with keys ∝
    // that column's distinct values — exactly the pass a columnar
    // writer's encoder makes; the verdict relation is 3 rows.
    "q266_dict_audit" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      dictCols.map { cname =>
        d.groupBy(col(cname).as("v")).agg(count(lit(1)).as("c"))
          .agg(sum(col("c")).as("n_rows"),
            count(lit(1)).as("n_distinct"),
            sum(length(col("v")).cast("long") * col("c"))
              .as("plain_chars"),
            sum(length(col("v")).cast("long")).as("dict_value_chars"))
          .select(lit(cname).as("column"), col("n_rows"),
            col("n_distinct"), col("plain_chars"),
            col("dict_value_chars"))
          .withColumn("index_bits",
            length(expr("bin(n_distinct - 1)")).cast("long"))
          .withColumn("dict_chars",
            expr("dict_value_chars + (n_rows * index_bits + 7) div 8"))
          .withColumn("recommend_dict",
            (col("dict_chars") < col("plain_chars")).cast("int"))
      }.reduce(_ unionByName _).orderBy("column")
    }),

    // RLE-encoding audit — q266's sibling for the OTHER parquet
    // encoding decision: run-length encoding pays off exactly when
    // the write order clusters equal values, so the audit counts the
    // value RUNS each column has UNDER THE CURRENT ORDER (doc_id) and
    // prices RLE (per run: the value once + a 4-byte run length)
    // against plain. Run detection is the q115/q268 positional-
    // neighbor device — ONE doc_id+1 equi self-join marks run heads
    // (prev differs, or no predecessor) — never a global-order
    // window, which would single-partition the corpus. The punchline
    // the two audits make together: `lang`/`source` dict-encode well
    // ANYWHERE (q266) but RLE-encode well only if you sort by them —
    // the "sort before writing" decision, priced in exact chars.
    "q289_rle_audit" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      dictCols.map { cname =>
        val v = d.select(col("doc_id"), col(cname).as("v"))
        // unhinted: both sides are the corpus (the q115 convention)
        val heads = v.join(
          v.select((col("doc_id") + 1).as("doc_id"), col("v").as("prev")),
          Seq("doc_id"), "left")
          .withColumn("is_head",
            col("prev").isNull || col("v") =!= col("prev"))
        heads.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("v")).as("n_distinct"),
          sum(when(col("is_head"), 1L).otherwise(0L)).as("n_runs"),
          sum(length(col("v")).cast("long")).as("plain_chars"),
          sum(when(col("is_head"), length(col("v")).cast("long") + 4L)
            .otherwise(0L)).as("rle_chars"))
          .select(lit(cname).as("column"), col("n_rows"),
            col("n_distinct"), col("n_runs"), col("plain_chars"),
            col("rle_chars"))
          .withColumn("recommend_rle",
            (col("rle_chars") < col("plain_chars")).cast("int"))
      }.reduce(_ unionByName _).orderBy("column")
    }),

    // Replication / disaster-recovery manifest: per table its row
    // count and an ORDER-INDEPENDENT primary-key checksum (commuting
    // modular sum of a multiplicative hash) — the artifact a copy job
    // publishes so the receiving side can verify completeness without
    // re-reading the source. Layout-independence is the point: the
    // checksum is identical under any partitioning, file order, or
    // engine. One combining scan per table, one row out per table.
    "q267_replication_manifest" -> ((s, dir) => {
      manifestKeys.map { case (t, pk) =>
        Tables(s, dir, t).agg(
            count(lit(1)).as("n_rows"),
            sum(expr(manifestTerm(pk))).as("key_checksum"))
          .select(lit(t).as("table_name"), col("n_rows"),
            col("key_checksum"))
      }.reduce(_ unionByName _).orderBy("table_name")
    }),


    // Count-Min Sketch: exact per-key counts (ONE shuffle with map-side
    // combine — the compressed |keys|-row relation) fan out over the 4
    // hash rows, collapse onto the 256-counter grid, and the probe
    // slice reads its estimate as min-over-rows from the broadcast
    // sketch. Both probe and sketch branches hang off the SAME per-key
    // aggregate exchange, so ReuseExchange scans events once. The
    // estimate is deterministic (sums of exact partials — no
    // merge-order sensitivity), so the oracle gates it bit-for-bit,
    // overcount included.
    "q142_cms_estimate" -> ((s, dir) => {
      val ex = Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val hs = cmsA.zip(cmsB).zipWithIndex.map { case ((a, b), j) =>
        struct(lit(j).as("j"),
          ((lit(a) * col("user_id") + lit(b)) % P % cmsW).as("bucket"))
      }
      val bk = ex.select(col("user_id"), col("n"),
          explode(array(hs: _*)).as("h"))
        .select(col("user_id"), col("n"), col("h.j").as("j"),
          col("h.bucket").as("bucket"))
      val sketch = bk.groupBy("j", "bucket").agg(sum(col("n")).as("bs"))
      bk.where(col("user_id") < cmsTrack)
        .join(broadcast(sketch), Seq("j", "bucket"))  // hint audit: dimension-bounded (d x w CMS array)
        .groupBy("user_id")
        .agg(max(col("n")).as("n_exact"), min(col("bs")).as("cms_est"))
        .withColumn("overcount", col("cms_est") - col("n_exact"))
        .orderBy("user_id")
    }),

    // Pareto frontier (skyline) on (n_chars min, n_tokens max): a doc
    // survives iff no doc is shorter with at least as many tokens, or
    // equally short with strictly more. The corpus collapses to one row
    // per n_chars value FIRST (value-domain-bounded — ~500 rows at any
    // SF), the strictly-shorter running max runs on that tiny relation
    // (the one-partition window is over ~500 rows, never the corpus),
    // and the per-value thresholds broadcast back to the scan. The
    // oracle proves the same set via the O(n²) NOT EXISTS definition.
    "q143_pareto_frontier" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("n_chars"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      val comp = d.groupBy("n_chars").agg(max(col("n_tokens")).as("mt"))
      val prev = Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
      val thr = comp.withColumn("prev_mt", max(col("mt")).over(prev))
      d.join(broadcast(thr), "n_chars")  // hint audit: value-domain-bounded (per-distinct-n_chars thresholds)
        .where(col("n_tokens") === col("mt") &&
          (col("prev_mt").isNull || col("n_tokens") > col("prev_mt")))
        .select(col("doc_id"), col("n_chars"), col("n_tokens"))
        .orderBy("n_chars", "doc_id")
    }),

    // Gap-fill resample: per-user daily counts, then each gap of at
    // most gapMax missing days is filled by integer linear
    // interpolation — the weighted-average form
    // (n·(next_day−d) + next_n·(d−day)) div (next_day−day) keeps the
    // numerator non-negative, so truncation agrees cross-engine without
    // floor/negative-division hazards. One (user, day) aggregate
    // shuffle, one per-user window for the lead, and a fan-out bounded
    // by gapMax per present row. Longer gaps stay open on purpose.
    "q144_gap_fill" -> ((s, dir) => {
      val d = Tables.events(s, dir)
        .select(col("user_id"),
          expr("datediff(to_date(ts), DATE'1970-01-01')").cast("long").as("day"))
        .groupBy("user_id", "day").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id").orderBy("day")
      val nx = d
        .withColumn("next_day", lead(col("day"), 1).over(w))
        .withColumn("next_n", lead(col("n"), 1).over(w))
      val present = nx.select(col("user_id"), col("day"), col("n"),
        lit(false).as("interpolated"))
      val fills = nx
        .where(col("next_day").isNotNull &&
          col("next_day") - col("day") > 1 &&
          col("next_day") - col("day") <= gapMax + 1)
        .select(col("user_id"), col("day"), col("n"), col("next_day"),
          col("next_n"), explode(sequence(col("day") + 1,
            col("next_day") - 1)).as("fd"))
        .select(col("user_id"), col("fd").as("day"),
          expr("(n * (next_day - fd) + next_n * (fd - day)) div (next_day - day)")
            .as("n"),
          lit(true).as("interpolated"))
      present.unionByName(fills).orderBy("user_id", "day")
    }),

    // Char-collision (Rényi-2) compressibility: per doc, the collision
    // probability of its character distribution over a fixed 39-char
    // alphabet, in exact ppm — sum(c_i²)·10⁶ div total². High collision
    // = repetitive/low-entropy text; log-free so it gates bit-for-bit
    // where a Shannon-entropy double would not. The 39 per-char counts
    // come from the one-pass CharClassCounts codegen Expression (the
    // built-in 39×replace() formulation allocated 39 string copies per
    // doc — 7× slower at the 10× fixture); no explode, no shuffle
    // until the per-source rollup.
    "q145_char_collision" -> ((s, dir) => {
      val cnts = graft.functions.CharClassCounts(col("text"))
      val scored = docs(s, dir)
        .select(col("source"), col("doc_id"), cnts.as("cnts"))
        .select(col("source"), col("doc_id"),
          expr("aggregate(cnts, 0L, (a, x) -> a + CAST(x AS BIGINT) * x)").as("sumsq"),
          expr("aggregate(cnts, 0L, (a, x) -> a + x)").as("total"))
        .select(col("source"),
          expr("CASE WHEN total > 0 THEN sumsq * 1000000L div (total * total) " +
            "ELSE 0L END").as("ppm"))
      scored.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          expr("sum(ppm) div count(1)").as("avg_collision_ppm"),
          max(col("ppm")).as("max_collision_ppm"))
        .orderBy("source")
    }),

    // Schema-evolution read — the years-of-vintages reality a 100 TB
    // lake scan must absorb: files written in different eras carry
    // DIFFERENT column sets, and the reader must union them by name
    // with null back-fill (`mergeSchema`), never a rewrite of old
    // data. The gate stages two deterministic vintages of `documents`
    // (an old one carrying `lang`, a new one carrying
    // `source`/`n_chars`), reads them through one mergeSchema scan,
    // and rolls up null-aware per-lang stats; the oracle rebuilds the
    // same vintage split with CASE projections over the one canonical
    // table. The result is collected (bounded: one row per lang + the
    // null bucket) so the staging directory can be cleaned up before
    // the frame is consumed. At 100 TB mergeSchema's footer-union
    // planning is metadata-scale; the data path stays one scan.
    // Format-ingest parity — the source-format coverage gate: the SAME
    // event rows staged as JSON Lines and CSV, read back through
    // Spark's json/csv readers with the explicit schema, and
    // full-outer-joined against the parquet truth with a null-safe
    // all-column comparison. The output is (format, n_rows,
    // n_mismatch) and the oracle asserts n_mismatch = 0 with the full
    // count — any row a text-format path drops, reorders into the
    // wrong types, or rounds (doubles survive because both writers
    // emit shortest-round-trip representations) fails the hash. This
    // is the proof behind "the engine ingests parquet, JSONL, and CSV
    // with identical semantics" — at 100 TB the text formats are the
    // landing zone and parquet the canonical store, and this gate is
    // the conversion's acceptance test.
    "q246_format_ingest" -> ((s, dir) => {
      val base = Tables.events(s, dir)
        .select(col("event_id"), expr("ts_ns div 1000").as("us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q246-stage")
      try {
        base.write.mode("overwrite").json(s"$stage/jsonl")
        base.write.mode("overwrite").option("header", "true")
          .csv(s"$stage/csv")
        val schema = base.schema
        def parity(fmt: String): DataFrame = {
          val rb = fmt match {
            case "jsonl" => s.read.schema(schema).json(s"$stage/jsonl")
            case _ => s.read.schema(schema).option("header", "true")
              .csv(s"$stage/csv")
          }
          val r = rb.select(col("event_id"),
            struct(col("us"), col("user_id"), col("event_type"),
              col("value"), col("props")).as("rbrow"))
          base.select(col("event_id"),
              struct(col("us"), col("user_id"), col("event_type"),
                col("value"), col("props")).as("pqrow"))
            .join(r, Seq("event_id"), "full_outer")
            .agg(count(lit(1)).as("n_rows"),
              sum(when(!(col("pqrow") <=> col("rbrow")), 1L)
                .otherwise(0L)).as("n_mismatch"))
            .select(lit(fmt).as("format"), col("n_rows"),
              col("n_mismatch"))
        }
        val out = parity("csv").unionByName(parity("jsonl"))
          .orderBy("format")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // Corpus snapshot diff — the "what changed between crawls" report
    // that gates every incremental re-process decision (re-dedup?
    // re-embed? retrain?): two snapshot states full-outer-joined on
    // doc_id and compared BY DIGEST (md5 — at 100 TB the digests are
    // precomputed per snapshot and the diff never moves document text,
    // only 16-byte fingerprints; both engines compute md5 of the same
    // UTF-8 bytes so the comparison is cross-engine exact). Snapshots
    // are WOVEN (the piiText convention): the old state drops doc_id %
    // 13 == 7 (later-added docs) and carries a stale revision for
    // doc_id % 11 == 3; the new state drops doc_id % 17 == 5 (removed
    // docs). Per source: added / removed / changed / unchanged counts
    // and churn permille — the number a scheduler compares against its
    // re-process threshold. Plan: the full-outer join shuffles both
    // corpus-scale sides on doc_id (the designed plan — no broadcast
    // is possible or hinted); the rollup is map-side-combined into ≤
    // |sources| rows.
    "q236_corpus_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      val old = d.where(col("doc_id") % 13 =!= 7)
        .select(col("doc_id"), col("source"),
          md5(when(col("doc_id") % 11 === 3,
              concat(col("text"), lit(" (rev1)")))
            .otherwise(col("text")).cast("binary")).as("dig_old"))
      val nw = d.where(col("doc_id") % 17 =!= 5)
        .select(col("doc_id"), col("source").as("source_new"),
          md5(col("text").cast("binary")).as("dig_new"))
      old.join(nw, Seq("doc_id"), "full_outer")
        .select(
          coalesce(col("source"), col("source_new")).as("source"),
          when(col("dig_old").isNull, lit("added"))
            .when(col("dig_new").isNull, lit("removed"))
            .when(col("dig_old") =!= col("dig_new"), lit("changed"))
            .otherwise(lit("unchanged")).as("st"))
        .groupBy("source")
        .agg(
          sum(when(col("st") === "added", 1L).otherwise(0L)).as("n_added"),
          sum(when(col("st") === "removed", 1L).otherwise(0L))
            .as("n_removed"),
          sum(when(col("st") === "changed", 1L).otherwise(0L))
            .as("n_changed"),
          sum(when(col("st") === "unchanged", 1L).otherwise(0L))
            .as("n_unchanged"))
        .withColumn("churn_permille",
          expr("(n_added + n_removed + n_changed) * 1000 div " +
            "(n_added + n_removed + n_changed + n_unchanged)"))
        .orderBy("source")
    }),

    "q165_schema_evolution" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q165-vintages")
      try {
        val d = docs(s, dir)
        d.where(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), col("lang"))
          .write.mode("overwrite").parquet(s"$stage/v2019")
        d.where(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$stage/v2024")
        val merged = s.read.option("mergeSchema", "true")
          .parquet(s"$stage/v2019", s"$stage/v2024")
        val out = merged
          .groupBy(coalesce(col("lang"), lit("?")).as("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("n_chars").cast("long"), lit(0L)))
              .as("sum_chars_new"),
            sum(when(col("source").isNotNull, 1L).otherwise(0L))
              .as("n_new_vintage"))
          .orderBy("lang")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // Idempotent partition backfill — the WRITER-side lake semantics
    // (q165 is the reader side): a corrupted ingest leaves ONE source
    // partition short, and the repair job rewrites ONLY that
    // partition (dynamic partition overwrite) — never a full-table
    // truncate-and-reload. The gate stages a source-partitioned copy
    // of `documents` with one source deliberately half-dropped, runs
    // the backfill as an `overwrite` write of just that source's
    // recomputed rows under partitionOverwriteMode=dynamic, and
    // rolls up the read-back table per source. Matching the
    // canonical per-source stats proves BOTH repairs: the bad
    // partition was replaced AND every other partition survived the
    // overwrite (a static overwrite would have truncated them — the
    // gate would read back one source). At 100 TB the backfill cost
    // is ∝ the repaired partition, never the table.
    "q166_partition_backfill" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q166-table")
      val saved = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      try {
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val d = docs(s, dir)
          .select(col("doc_id"), col("n_chars"), col("source"))
        val badSource = "src3"
        // corrupted initial load: src3 lost its odd doc_ids
        d.where(col("source") =!= badSource ||
            col("doc_id") % 2 === 0)
          .write.partitionBy("source").mode("overwrite")
          .parquet(stage.toString)
        // the backfill: recompute ONLY the bad partition's rows and
        // overwrite — dynamic mode replaces just the partitions the
        // write produces
        d.where(col("source") === badSource)
          .write.partitionBy("source").mode("overwrite")
          .parquet(stage.toString)
        val out = s.read.parquet(stage.toString)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
          .orderBy("source")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally {
        saved match {
          case Some(v) =>
            s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None =>
            s.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
        rmTree(stage)
      }
    }),

    // Compaction EXECUTED — the acting half of q99's bin-packing plan
    // (q165/q166 complete the lake trio: read evolution, backfill,
    // now the small-file rewrite). Docs are assigned to q99's
    // target-sized output bins (same granule/running-sum rule, shared
    // constants), hash-repartitioned on the bin key so each bin's rows
    // land in ONE task, and rewritten `partitionBy(source, bin)` —
    // exactly one file per bin directory. The read-back gate rolls up
    // every bin from the COMPACTED table (row preservation, doc-id
    // span, byte size) and pins n_files = 1 per bin via
    // input_file_name() — the compaction property itself, not just the
    // plan. At 100 TB the rewrite cost is the data volume (one
    // shuffle on the bin key, write bandwidth); the planning join is
    // the metadata-scale (source, file_id) relation, stats-chosen.
    "q176_compaction_rewrite" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q176-compact")
      try {
        val gran = CorpusOpsQueries.fileGranule
        val tgt = CorpusOpsQueries.targetBytes
        val d = Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val files = d
          .groupBy(col("source"), expr(s"doc_id div $gran").as("file_id"))
          .agg(sum(col("n_chars")).as("bytes"))
        val w = Window.partitionBy("source").orderBy("file_id")
        val plan = files.withColumn("cum", sum(col("bytes")).over(w))
          .select(col("source"), col("file_id"),
            expr(s"(cum - bytes) div $tgt").as("bin"))
        d.withColumn("file_id", expr(s"doc_id div $gran"))
          .join(plan, Seq("source", "file_id"))
          .repartition(col("source"), col("bin"))
          .write.partitionBy("source", "bin").mode("overwrite")
          .parquet(stage.toString)
        val out = s.read.parquet(stage.toString)
          // input_file_name is per-row nondeterministic to the
          // optimizer: materialize it in a projection before the agg
          .withColumn("fname", input_file_name())
          .groupBy(col("source"), col("bin").cast("long").as("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"),
            countDistinct(col("fname")).as("n_files"))
          .orderBy("source", "bin")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // Lake TIME TRAVEL — the commit-log / snapshot face the lake trio
    // (q165 read evolution, q166 backfill, q176 compaction) was
    // missing (VERDICT r12 item #2): versioned add/remove-file
    // manifests (the delta-log pattern), with as-of(v) reads resolved
    // ENTIRELY at metadata scale — fold the ≤v manifests (adds minus
    // later removes), then read ONLY the active files. Staged commits:
    // v0 initial load (one file per granule), v1 delta append (new
    // files only), v2 a copy-on-write delete (remove f(g=0), add its
    // even-id rewrite) — the three commit kinds every delta-log table
    // sees. The gate emits per version its file count, row count,
    // char sum, and q267's order-independent key checksum — the
    // per-version integrity artifact a replication/time-travel reader
    // verifies against. The oracle CASE-reconstructs each version's
    // logical content from the staging rules; matching ALL of them
    // through real file reads proves the resolution: a wrong fold
    // (remove ignored, version boundary off by one) shifts rows,
    // checksum, or file count loudly. At 100 TB: the log is KBs
    // however large the table; as-of cost = manifest fold + reading
    // the active files — never a table scan to reconstruct history.
    "q274_lake_time_travel" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q274-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = false)
        val out = (0 to 2).map(v => lakeRollup(s, stage.toString, v))
          .reduce(_ unionByName _).orderBy("version")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // Compaction as a METADATA SWAP — the second half of the
    // commit-log contract (q176 executes a rewrite; this proves the
    // reader-facing semantics): v3 rewrites v2's 10 active files into
    // ONE compacted file and commits (remove all old, add compacted)
    // — and the as-of(2) and as-of(3) reads are CONTENT-IDENTICAL
    // (same rows, chars, key checksum; only n_files changes), read
    // through the resolved file sets, not assumed. That identity is
    // what lets a 100 TB deployment compact continuously under live
    // readers: a reader pinned to v2 and one at v3 see the same
    // table, and the swap itself touched only the manifest.
    "q275_lake_compaction_swap" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q275-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = true)
        val out = Seq(2, 3).map(v => lakeRollup(s, stage.toString, v))
          .reduce(_ unionByName _).orderBy("version")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // Lake VACUUM — the retention planner that closes the commit-log
    // lifecycle (q274 reads history, q275 swaps metadata, this
    // reclaims storage): a physical file is safe to delete iff NO
    // retained snapshot references it, i.e. it is outside the union
    // of active sets of every version ≥ the retention boundary. The
    // gate prices BOTH interesting boundaries on the compacted log
    // (v0–v3): boundary 2 (readers may still pin v2) frees only the
    // copy-on-write-replaced base file; boundary 3 (latest only)
    // frees every pre-compaction file. Emitted per boundary: the
    // deletable file count and the reclaimed rows/chars, priced by
    // reading the doomed files themselves — matching the oracle's
    // CASE-reconstruction proves the safety fold (a file wrongly
    // freed or wrongly kept shifts every number). At 100 TB the
    // decision is a pure manifest fold (O(files) driver work, the
    // same place a lake's snapshot resolution runs); only the
    // reclaim PRICING touches file contents, and a deployment would
    // take those numbers from manifest stats instead.
    "q278_lake_vacuum" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q278-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = true)
        val allAdds = (0 to 3).flatMap(v =>
          s.read.parquet(s"$stage/_log/v$v").collect()
            .collect { case r if r.getString(0) == "add" => r.getString(1) })
        val out = Seq(2, 3).map { boundary =>
          val retained = (boundary to 3)
            .flatMap(v => asOfFiles(s, stage.toString, v)).toSet
          val deletable = allAdds.filterNot(retained)
          s.read.parquet(deletable: _*)
            .agg(count(lit(1)).as("reclaim_rows"),
              sum(col("n_chars").cast("long")).as("reclaim_chars"))
            .select(lit(boundary.toLong).as("boundary"),
              lit(deletable.size.toLong).as("n_deletable"),
              col("reclaim_rows"), col("reclaim_chars"))
        }.reduce(_ unionByName _).orderBy("boundary")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // Stats-PRUNED time-travel read — manifests carry per-file
    // (min, max) key stats recorded at write time (what Delta/Iceberg
    // store as file statistics), so a predicate as-of read prunes
    // files BEFORE opening any: resolve the v2 active set from the
    // log, keep only files whose [min, max] overlaps the requested
    // key range, read those. The gate emits the active count, the
    // pruned read count, and the matching rows' count/chars/key
    // checksum; the oracle reconstructs the per-file stats and the
    // v2 content from the staging rules, so a pruning bug in either
    // direction (file skipped that held matching rows — rows drop;
    // file read that stats exclude — n_files_read shifts) fails the
    // gate. The q153 zonemap device lifted into the snapshot layer:
    // at 100 TB this is the difference between touching 4 files and
    // touching 10⁶ for a key-range restore.
    "q279_lake_pruned_read" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q279-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = false)
        val entries = (0 to 2).flatMap(v =>
          s.read.parquet(s"$stage/_log/v$v").collect()
            .map(r => (r.getString(0), r.getString(1),
              r.getLong(2), r.getLong(3))))
        val removed = entries.collect { case ("remove", p, _, _) => p }.toSet
        val active = entries.collect {
          case ("add", p, mn, mx) if !removed(p) => (p, mn, mx) }
        val pruned = active.filter { case (_, mn, mx) =>
          mn <= lakePruneHi && mx >= lakePruneLo }
        val out = s.read.parquet(pruned.map(_._1): _*)
          .where(col("doc_id").between(lakePruneLo, lakePruneHi))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
          .select(lit(2L).as("version"),
            lit(active.size.toLong).as("n_active"),
            lit(pruned.size.toLong).as("n_files_read"),
            col("n_rows"), col("sum_chars"), col("key_checksum"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // CHANGE DATA FEED between two lake versions — the incremental-
    // consumption face of the commit log (how a downstream index /
    // replica / aggregate keeps up WITHOUT rescanning the table):
    // changes(w → v) come from the file-set DIFF alone — rows of
    // files added minus rows of files removed are the inserts, the
    // reverse are the deletes, with a key anti-join netting out the
    // rows a copy-on-write rewrite carries unchanged through both
    // sides. Gated for BOTH interesting pairs: v0→v2 (a delta append
    // + a CoW delete: inserts = the delta batch, deletes = exactly
    // the odd g=0 ids the rewrite dropped) and v2→v3 (compaction:
    // ZERO changes both directions — the metadata swap is invisible
    // to a CDF consumer, the identity that lets compaction run under
    // live incremental readers). At 100 TB the cost is ∝ the files
    // the two commits touched, never the table; the anti-joins are
    // UNHINTED (both sides are touched-file row sets — corpus
    // fractions).
    "q284_lake_change_feed" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q284-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = true)
        def cdf(w: Int, v: Int): DataFrame = {
          val a = asOfFiles(s, stage.toString, w).toSet
          val b = asOfFiles(s, stage.toString, v).toSet
          // both diffs are non-empty for the staged commit kinds (a
          // CoW delete and a compaction each add AND remove files)
          val added = s.read.parquet((b -- a).toSeq: _*)
          val removed = s.read.parquet((a -- b).toSeq: _*)
          def roll(df: DataFrame, ct: String) = df
            .agg(count(lit(1)).as("n_rows"),
              sum(col("n_chars").cast("long")).as("sum_chars"),
              sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
            .select(lit(w.toLong).as("from_version"),
              lit(v.toLong).as("to_version"), lit(ct).as("change_type"),
              col("n_rows"),
              coalesce(col("sum_chars"), lit(0L)).as("sum_chars"),
              coalesce(col("key_checksum"), lit(0L)).as("key_checksum"))
          roll(added.join(removed.select("doc_id"), Seq("doc_id"),
            "left_anti"), "insert")
            .unionByName(roll(removed.join(added.select("doc_id"),
              Seq("doc_id"), "left_anti"), "delete"))
        }
        val out = cdf(0, 2).unionByName(cdf(2, 3))
          .orderBy("from_version", "change_type")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // DELETION VECTORS — the merge-on-read delete strategy proven
    // read-equivalent to copy-on-write (the strategy choice every
    // modern lake exposes): the SAME v2 delete executed both ways —
    // CoW rewrites the g=0 file without the odd ids (stageLakeLog's
    // v2, paid at WRITE time), MoR leaves the file untouched and
    // commits a deletion-vector sidecar of the dropped keys, paid at
    // READ time as one key anti-join per scan. The gate rolls up both
    // reads: rows, chars, and the key checksum must be IDENTICAL
    // (the oracle emits the same v2 content twice), which is the
    // contract that lets a writer pick per-commit — DV for a few
    // deletes in a huge file, rewrite when the vector grows — without
    // readers seeing strategy. At 100 TB: the DV sidecar is ∝ deleted
    // keys; the read-side anti-join is unhinted (a real vector can be
    // a corpus fraction).
    "q285_lake_deletion_vectors" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q285-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = false)
        val gran = lakeGranFor(docs(s, dir).count())
        // the MoR commit: no file rewrite — a sidecar of deleted keys
        docs(s, dir)
          .where(expr(s"doc_id div $gran") === 0 &&
            col("doc_id") % 3 =!= 2 && col("doc_id") % 2 === 1)
          .select("doc_id")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$stage/_dv/v2")
        def roll(df: DataFrame, strategy: String, nFiles: Long) = df
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
          .select(lit(strategy).as("strategy"),
            lit(nFiles).as("n_files"),
            col("n_rows"), col("sum_chars"), col("key_checksum"))
        val cowFiles = asOfFiles(s, stage.toString, 2)
        val cow = s.read.parquet(cowFiles: _*)
        // MoR reads v1's file set (nothing removed) minus the vector
        val morFiles = asOfFiles(s, stage.toString, 1)
        val mor = s.read.parquet(morFiles: _*)
          .join(s.read.parquet(s"$stage/_dv/v2"), Seq("doc_id"),
            "left_anti")
        val out = roll(cow, "cow", cowFiles.length.toLong)
          .unionByName(roll(mor, "mor", morFiles.length.toLong))
          .orderBy("strategy")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // CONCURRENT-WRITER COMMIT CONFLICTS — the optimistic-concurrency
    // contract every multi-job lake hits in week one (the Delta/
    // Iceberg core guarantee the single-writer lifecycle q274-q287
    // left open): a commit is a PUT-IF-ABSENT of the next version
    // manifest (an atomic rename — the manifest CAS), so two writers
    // prepared against the same snapshot cannot both win a version.
    // The loser reads ONLY the commit that beat it and decides:
    // DISJOINT footprint (pure appends, or removes the winner never
    // touched) → rebase and retry at the next version; OVERLAPPING
    // footprint (a file it removes was already removed) → abort —
    // retrying would silently undo the winner's rewrite. Staged dance
    // on the v0–v2 log, all four writers prepared at snapshot v2:
    // A appends (wins v3, attempt 1); B appends (loses v3's CAS,
    // appends never conflict, wins v4 at attempt 2); D rewrites the
    // f0r file (loses v3 and v4, both rebases disjoint, wins v5 at
    // attempt 3); E ALSO rewrites f0r (loses v3/v4/v5, and v5 removed
    // the very file E removes → abort at attempt 3). Gated per
    // writer: outcome, version, attempts, and the table rollup AS OF
    // its committed version through the real manifest fold + file
    // reads — a CAS that lets both rewrites through doubles the
    // delete, a rebase that re-resolves from the writer's stale
    // snapshot loses the interleaved appends; every such error shifts
    // a checksum. At 100 TB: the CAS is one atomic metadata op per
    // commit (exactly Delta's _delta_log put-if-absent); conflict
    // analysis reads only the manifests committed since the writer's
    // snapshot — O(files touched), never table data. E's orphaned
    // staged file is precisely what the unreferenced-file sweep
    // (q278 plans it, q291 executes it) exists to collect.
    "q290_lake_concurrent_commit" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q290-lake")
      try {
        val dataRoot = stageLakeLog(s, dir, stage.toString, withCompaction = false)
        val gran = lakeGranFor(docs(s, dir).count())
        val d = docs(s, dir)
        // each writer stages its data file BEFORE the dance — data
        // writes are invisible until a committed manifest references
        // them, so staging order cannot race
        def stageFile(name: String, df: DataFrame): (String, Long, Long) = {
          val p = s"$stage/$name"
          df.coalesce(1).write.mode("overwrite").parquet(p)
          val mm = s.read.parquet(p)
            .agg(min(col("doc_id")), max(col("doc_id"))).head()
          (p, mm.getLong(0), mm.getLong(1))
        }
        val wA = stageFile("wA", d.where(col("doc_id") % 7 === 0))
        val wB = stageFile("wB", d.where(col("doc_id") % 7 === 3))
        val f0r = d.where(expr(s"doc_id div $gran") === 0 &&
          col("doc_id") % 3 =!= 2 && col("doc_id") % 2 === 0)
        val f0rD = stageFile("f0rD", f0r.where(col("doc_id") % 5 =!= 0))
        val f0rE = stageFile("f0rE", f0r.where(col("doc_id") % 11 =!= 0))
        def add(t: (String, Long, Long)) = ("add", t._1, t._2, t._3)
        val writers = Seq(
          ("A", Seq(add(wA))),
          ("B", Seq(add(wB))),
          ("D", Seq(("remove", s"$dataRoot/f0r", -1L, -1L), add(f0rD))),
          ("E", Seq(("remove", s"$dataRoot/f0r", -1L, -1L), add(f0rE))))
        val out = writers.map { case (w, entries) =>
          val (outcome, v, attempts) =
            commitLoop(s, stage.toString, 2, entries)
          if (v >= 0)
            lakeRollup(s, stage.toString, v.toInt)
              .select(lit(w).as("writer"), lit(outcome).as("outcome"),
                col("version"), lit(attempts).as("n_attempts"),
                col("n_files"), col("n_rows"), col("sum_chars"),
                col("key_checksum"))
          else
            s.range(1).select(lit(w).as("writer"),
              lit(outcome).as("outcome"), lit(-1L).as("version"),
              lit(attempts).as("n_attempts"), lit(0L).as("n_files"),
              lit(0L).as("n_rows"), lit(0L).as("sum_chars"),
              lit(0L).as("key_checksum"))
        }.reduce(_ unionByName _).orderBy("writer")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // VACUUM EXECUTION — the act face of q278's plan (the suite's
    // measure→act convention: q85→q176, q97→q161): physically delete
    // every file outside the retention boundary's (= 3, latest only)
    // retained active sets, then PROVE both post-vacuum contracts by
    // reading: the retained snapshot as-of(3) is still hash-exact
    // (rows/chars/checksum through the real file reads — a wrongly
    // freed file would shift or fail it), and the pre-boundary
    // as-of(2) fails LOUDLY — its resolution still works (the log is
    // intact; history metadata survives vacuum exactly as in Delta)
    // but the read must surface the missing files, never return a
    // silent partial result. Gated: per probe its readability, file/
    // missing counts, and the rollup. At 100 TB the deletes are one
    // metadata-scale sweep (the doomed list is a manifest fold);
    // nothing rescans surviving data.
    "q291_lake_vacuum_exec" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q291-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = true, privateData = true)
        val allAdds = (0 to 3).flatMap(v =>
          s.read.parquet(s"$stage/_log/v$v").collect()
            .collect { case r if r.getString(0) == "add" => r.getString(1) })
        val retained = asOfFiles(s, stage.toString, 3).toSet
        allAdds.filterNot(retained)
          .foreach(p => rmTree(java.nio.file.Paths.get(p)))
        val v3 = asOfFiles(s, stage.toString, 3)
        val ok = s.read.parquet(v3: _*)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
          .select(lit("as_of_3").as("probe"), lit(true).as("readable"),
            lit(v3.length.toLong).as("n_files"), lit(0L).as("n_missing"),
            col("n_rows"), col("sum_chars"), col("key_checksum"))
        val v2 = asOfFiles(s, stage.toString, 2)
        val missing = v2.count(p =>
          !java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        // the read itself must throw (PATH_NOT_FOUND), not silently
        // skip — `readable` is MEASURED from the attempt
        val failed = scala.util.Try(
          s.read.parquet(v2: _*).agg(count(lit(1))).head()).isFailure
        val gone = s.range(1).select(lit("as_of_2").as("probe"),
          lit(!failed).as("readable"), lit(v2.length.toLong).as("n_files"),
          lit(missing.toLong).as("n_missing"), lit(0L).as("n_rows"),
          lit(0L).as("sum_chars"), lit(0L).as("key_checksum"))
        val out = gone.unionByName(ok).orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // ISOLATION LEVELS — the read-conflict half of optimistic
    // concurrency (q290 gates write-write): a REWRITE is computed
    // FROM data it read, so a concurrent APPEND into that read range
    // invalidates it under SERIALIZABLE (the rewrite derives from a
    // stale read) while WRITE-SERIALIZABLE — the Delta default —
    // admits it (appends never conflict; only write sets are
    // checked). Staged: a winner appends doc_id % 7 = 0 rows (wins
    // v3); a rewrite of the f0r file whose read-set is the g=0 key
    // range loses v3's CAS and resolves BOTH ways — under
    // WriteSerializable it rebases past the append and commits v4;
    // under Serializable the winner's manifest stats ([min,max]
    // overlapping the read range — the conflict test runs at
    // METADATA scale off the same stats q279 prunes with) abort it
    // at the first check. Gated per mode: outcome, version,
    // attempts, and the as-of rollup — an isolation check that reads
    // data files, ignores the stats, or conflates the two levels
    // shifts a row. At 100 TB this is the knob every multi-job lake
    // sets per table; the check costs one manifest read per
    // contended version.
    "q297_lake_isolation_levels" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q297-lake")
      try {
        val dataRoot = stageLakeLog(s, dir, stage.toString, withCompaction = false)
        val gran = lakeGranFor(docs(s, dir).count())
        val d = docs(s, dir)
        def stageFile(name: String, df: DataFrame): (String, Long, Long) = {
          val p = s"$stage/$name"
          df.coalesce(1).write.mode("overwrite").parquet(p)
          val mm = s.read.parquet(p)
            .agg(min(col("doc_id")), max(col("doc_id"))).head()
          (p, mm.getLong(0), mm.getLong(1))
        }
        val wApp = stageFile("wApp", d.where(col("doc_id") % 7 === 0))
        val f0r = d.where(expr(s"doc_id div $gran") === 0 &&
          col("doc_id") % 3 =!= 2 && col("doc_id") % 2 === 0)
        val f0rW = stageFile("f0rW", f0r.where(col("doc_id") % 5 =!= 0))
        val f0rS = stageFile("f0rS", f0r.where(col("doc_id") % 11 =!= 0))
        def add(t: (String, Long, Long)) = ("add", t._1, t._2, t._3)
        val rmF0r = ("remove", s"$dataRoot/f0r", -1L, -1L)
        // the rewrite's read-set: the g=0 key range it was computed from
        val readRange = (0L, gran - 1L)
        val runs = Seq(
          ("append_winner", Seq(add(wApp)), None),
          ("rewrite_write_serializable", Seq(rmF0r, add(f0rW)), None),
          ("rewrite_serializable", Seq(rmF0r, add(f0rS)), Some(readRange)))
        val out = runs.map { case (mode, entries, rr) =>
          val (outcome, v, attempts) =
            commitLoop(s, stage.toString, 2, entries, rr)
          if (v >= 0)
            lakeRollup(s, stage.toString, v.toInt)
              .select(lit(mode).as("mode"), lit(outcome).as("outcome"),
                col("version"), lit(attempts).as("n_attempts"),
                col("n_files"), col("n_rows"), col("sum_chars"),
                col("key_checksum"))
          else
            s.range(1).select(lit(mode).as("mode"),
              lit(outcome).as("outcome"), lit(-1L).as("version"),
              lit(attempts).as("n_attempts"), lit(0L).as("n_files"),
              lit(0L).as("n_rows"), lit(0L).as("sum_chars"),
              lit(0L).as("key_checksum"))
        }.reduce(_ unionByName _).orderBy("mode")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // RIGHT-TO-BE-FORGOTTEN — the governance composition every lake
    // with user data must run, end to end: (1) the takedown lands
    // FAST as a deletion vector (v3 — q285's MoR path, no file
    // rewritten), (2) hard deletion materializes it (v4 — rewrite
    // ONLY the files holding forgotten keys, remove them + retire
    // the DV; v4 reads ≡ v3 reads, gated identical), (3) vacuum at
    // boundary 4 deletes the originals, and (4) the guarantee is
    // proven AT THE BYTES: every parquet file still on disk is read
    // back — zero forgotten keys anywhere, and the disk total equals
    // exactly the retained snapshot (no orphan file lingers holding
    // the data "deleted" rows). Masking (DV) and forgetting (bytes
    // gone) are different promises; this gate prices and proves
    // both. The forget set spans two granules, so the CoW step
    // rewrites 4 files, not the table — cost ∝ touched files. At
    // 100 TB: the DV lands in seconds, the rewrite is bounded by
    // stats-located files (the q279 prune), vacuum is a manifest
    // fold; only THIS gate's final audit reads everything, which is
    // what a compliance audit does.
    "q298_lake_forget" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q298-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = false, privateData = true)
        val gran = lakeGranFor(docs(s, dir).count())
        val d = docs(s, dir)
        val inForget = (expr(s"doc_id div $gran") === 1 ||
          expr(s"doc_id div $gran") === 3) && col("doc_id") % 13 === 3
        // v3: the DV commit — the key sidecar plus a manifest entry
        // referencing it (action "dv": invisible to the add/remove
        // fold, so the active FILE set is v2's; readers apply the
        // vector at scan time)
        d.where(inForget).select("doc_id")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$stage/_dv/v3")
        require(tryCommit(s, stage.toString, 3,
          Seq(("dv", s"$stage/_dv/v3", -1L, -1L))))
        val v2Files = asOfFiles(s, stage.toString, 2)
        def rollOver(df: DataFrame, phase: String, nFiles: Long) = df
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
          .select(lit(phase).as("phase"), lit(nFiles).as("n_files"),
            col("n_rows"),
            coalesce(col("sum_chars"), lit(0L)).as("sum_chars"),
            coalesce(col("key_checksum"), lit(0L)).as("key_checksum"))
        // each phase row is materialized WHEN it happens — the later
        // vacuum deletes the very files the earlier reads scanned
        def snap(df: DataFrame): DataFrame = {
          val rows = df.collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
        }
        val dv = s.read.parquet(s"$stage/_dv/v3")
        val v3Read = s.read.parquet(v2Files: _*)
          .join(dv, Seq("doc_id"), "left_anti")
        // v4: hard deletion — rewrite ONLY the files whose key-range
        // stats overlap a forgotten-key range (the q279 prune, run
        // against the v2-active manifest entries; at the gate SFs this
        // resolves to the 4 base/delta g=1 and g=3 files, and it stays
        // correct under any fixture size or forget predicate), then
        // retire the DV
        val forgetRanges = Seq((gran, 2 * gran - 1), (3 * gran, 4 * gran - 1))
        val v2Entries = (0 to 2).flatMap(v =>
          s.read.parquet(s"$stage/_log/v$v").collect()
            .map(r => (r.getString(0), r.getString(1),
              r.getLong(2), r.getLong(3))))
        val v2Removed =
          v2Entries.collect { case ("remove", p, _, _) => p }.toSet
        val touched = v2Entries.collect {
          case ("add", p, mn, mx) if !v2Removed(p) &&
            forgetRanges.exists { case (lo, hi) => mn <= hi && mx >= lo } => p
        }
        val rewrites = touched.zipWithIndex.map { case (p, i) =>
          val rp = s"$stage/fw$i"
          s.read.parquet(p).where(!inForget)
            .coalesce(1).write.mode("overwrite").parquet(rp)
          rp
        }
        val v4Entries = touched.map(p => ("remove", p, -1L, -1L)) ++
          rewrites.map { p =>
            val mm = s.read.parquet(p)
              .agg(min(col("doc_id")), max(col("doc_id"))).head()
            ("add", p, mm.getLong(0), mm.getLong(1))
          }
        val aRow = snap(rollOver(v3Read, "a_v3_masked_read",
          v2Files.length.toLong))
        require(tryCommit(s, stage.toString, 4, v4Entries))
        val v4Files = asOfFiles(s, stage.toString, 4)
        val v4Read = s.read.parquet(v4Files: _*)
        val bRow = snap(rollOver(v4Read, "b_v4_hard_delete_read",
          v4Files.length.toLong))
        // vacuum at boundary 4: the originals (and the retired DV) go
        val retained = v4Files.toSet
        val allAdds = (0 to 4).flatMap(v =>
          s.read.parquet(s"$stage/_log/v$v").collect()
            .collect { case r if r.getString(0) == "add" => r.getString(1) })
        allAdds.filterNot(retained)
          .foreach(p => rmTree(java.nio.file.Paths.get(p)))
        rmTree(java.nio.file.Paths.get(s"$stage/_dv"))
        val postVacuum = s.read.parquet(asOfFiles(s, stage.toString, 4): _*)
        // the compliance audit: EVERY parquet file still under the
        // table root (the log excluded), read back
        val remaining = {
          val root = java.nio.file.Paths.get(stage.toString)
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          def walk(p: java.nio.file.Path): Unit = {
            if (java.nio.file.Files.isDirectory(p)) {
              if (p.getFileName.toString != "_log")
                graft.util.FileUtils.listDir(p).foreach(walk)
            } else if (p.toString.endsWith(".parquet")) acc += p.toString
          }
          walk(root)
          acc.toSeq
        }
        val disk = s.read.parquet(remaining: _*)
        aRow.unionByName(bRow)
          .unionByName(snap(rollOver(postVacuum, "c_post_vacuum_read",
            v4Files.length.toLong)))
          .unionByName(snap(rollOver(disk, "d_disk_total",
            remaining.length.toLong)))
          .unionByName(snap(rollOver(disk.where(inForget),
            "e_forgotten_residual", 0L)))
          .orderBy("phase")
      } finally rmTree(stage)
    }),

    // CDF APPLY — the CONSUMER side of q284 (that gate derives the
    // change feed; this proves a downstream replica can live off it):
    // a per-source aggregate materialized at v0 is advanced to v2 by
    // folding the CDF alone — inserts add, deletes subtract (COUNT /
    // SUM / the q267 checksum are all abelian, the property that
    // makes aggregates CDF-maintainable) — and the result must equal
    // the from-scratch as-of(2) aggregate EXACTLY (the oracle). A
    // wrong change type, a CoW-carried row not netted out, or a
    // missed file shifts a source's checksum. At 100 TB this is how
    // every downstream index/rollup keeps up: cost ∝ the files the
    // commits touched plus the aggregate's own size — the table is
    // never rescanned.
    "q299_lake_cdf_apply" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q299-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = false)
        def roll(df: DataFrame, sign: Int) = df
          .groupBy("source")
          .agg((count(lit(1)) * sign).as("n_docs"),
            (sum(col("n_chars").cast("long")) * sign).as("sum_chars"),
            (sum(expr(manifestTerm("doc_id"))) * sign).as("key_checksum"))
        // the replica's stored aggregate, materialized at v0
        val v0Agg = roll(
          s.read.parquet(asOfFiles(s, stage.toString, 0): _*), 1)
        // CDF(v0→v2) from the file-set diff (q284's construction)
        val a = asOfFiles(s, stage.toString, 0).toSet
        val b = asOfFiles(s, stage.toString, 2).toSet
        val added = s.read.parquet((b -- a).toSeq: _*)
        val removed = s.read.parquet((a -- b).toSeq: _*)
        val inserts = added.join(removed.select("doc_id"),
          Seq("doc_id"), "left_anti")
        val deletes = removed.join(added.select("doc_id"),
          Seq("doc_id"), "left_anti")
        // apply: fold the signed change rollups into the aggregate
        val out = v0Agg
          .unionByName(roll(inserts, 1)).unionByName(roll(deletes, -1))
          .groupBy("source")
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("sum_chars")).as("sum_chars"),
            sum(col("key_checksum")).as("key_checksum"))
          .orderBy("source")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // COMMIT-LOG CHECKPOINTING — the device that keeps snapshot
    // resolution O(1) however long the table lives (Delta writes a
    // checkpoint parquet every 10 commits; the round-14 lake tier's
    // asOfFiles folded v0..vN on the driver — fine at 3-6 staged
    // versions, structurally unbounded at the thousands of commits a
    // production table accumulates). Staged: the v0-v2 log plus SIX
    // more commits (v3-v8, one residue-slice append each, landed
    // through the real q290 CAS), a checkpoint of the RESOLVED
    // active set + its file stats written after every 3rd commit
    // (ckpt-v3, ckpt-v6). The checkpointed reader resolves as-of(v)
    // from the newest checkpoint ≤ v plus the manifest TAIL only.
    // Gated at three probe versions spanning the interesting cases —
    // before any checkpoint (v2: plain fold), between checkpoints
    // (v5: ckpt-v3 + 2 tail manifests), after the last (v8: ckpt-v6
    // + 2) — with the manifests-actually-read counts (the full fold
    // GROWS 3→6→9 while the checkpoint path stays at 3), a
    // Spark-side set-equality proof against the full fold, and the
    // content rollup read THROUGH the checkpoint-resolved file set:
    // a checkpoint that loses a remove, double-counts an add, or
    // drops stats shifts a row. At 100 TB: checkpoint size ∝ active
    // FILES (metadata), written incrementally off the previous
    // checkpoint — never a table scan; resolution cost is 1 + (v mod
    // cadence) manifest reads, independent of table age.
    "q301_lake_checkpoint" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q301-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = false)
        val d = docs(s, dir)
        // v3-v8: residue-slice appends (physical-row multiset
        // semantics, the q290 convention — duplicates of rows already
        // present double-count exactly as the files do). All six
        // files land in ONE partitioned write and their stats in ONE
        // metadata-sized agg (six coalesce(1) write+read-back jobs
        // made this the suite's slowest staging: 9.6 → ~5 s); the
        // six COMMITS stay sequential — that ordering is the log.
        val app = d.where(col("doc_id") % 7 <= 5)
          .withColumn("r", col("doc_id") % 7)
        app.repartition(col("r"))
          .write.partitionBy("r").mode("overwrite")
          .parquet(s"$stage/app")
        val appStats = app.groupBy("r")
          .agg(min(col("doc_id")), max(col("doc_id"))).collect()
          .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
          .toMap
        for (r <- 0 to 5) {
          val v = r + 3
          val p = s"$stage/app/r=$r"
          require(tryCommit(s, stage.toString, v,
            Seq(("add", p, appStats(r.toLong)._1, appStats(r.toLong)._2))))
          // the committer's checkpoint cadence: every 3rd version
          // snapshots the resolved active set (stats carried forward)
          // — itself resolved THROUGH the previous checkpoint, so
          // checkpointing cost never re-folds the whole log either —
          // and advances the `_last_checkpoint` pointer (Delta's O(1)
          // discovery device: readers jump straight to the newest
          // checkpoint instead of probing versions backwards)
          if (v % 3 == 0) writeCheckpoint(s, stage.toString, v)
        }
        val out = Seq(2, 5, 8).map { v =>
          val (active, nCkptReads) = ckptResolve(s, stage.toString, v)
          val matches =
            active.map(_._1).toSet ==
              fullFoldFiles(s, stage.toString, v).toSet
          s.read.parquet(active.map(_._1): _*)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("n_chars").cast("long")).as("sum_chars"),
              sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
            .select(lit(v.toLong).as("version"),
              lit((v + 1).toLong).as("n_manifests_full"),
              lit(nCkptReads).as("n_manifests_ckpt"),
              lit(matches).as("ckpt_matches_fold"),
              lit(active.size.toLong).as("n_files"),
              col("n_rows"), col("sum_chars"), col("key_checksum"))
        }.reduce(_ unionByName _).orderBy("version")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // MULTI-COLUMN FILE STATS + NON-KEY DATA SKIPPING — the round-14
    // lake manifests carried only (min, max) doc_id, so the first
    // non-key predicate a user writes got ZERO skipping; real lakes
    // record per-column min/max at write time and prune on every
    // conjunct. Staged: a source-clustered layout (cells = 4
    // source-groups × key buckets of 2 granules — clustering is what
    // MAKES non-key stats selective, the reason Z-order exists;
    // ~12-100 files at any SF), one manifest carrying THREE stat
    // pairs per file (doc_id, source, n_chars). A three-conjunct read
    // (source = 'src12' AND doc_id BETWEEN max/4 AND max/2 AND
    // n_chars >= 100) is pruned dimension by dimension and the gate
    // emits each stage's surviving-file count: the key range drops a
    // bucket, the source range drops two of four groups — INCLUDING
    // an honest lexicographic false positive ('src12' sorts inside
    // [src0, src4], so group 0 survives its stats and contributes
    // zero rows, counted in f_false_positive_files) — and the
    // n_chars conjunct drops nothing on this corpus (every cell's
    // max exceeds 100: conservative stats prune only what they can
    // prove, also measured, not hidden). The rollup reads ONLY the
    // surviving cells with the residual predicate; the oracle
    // reconstructs cells, stats (DuckDB's string MIN/MAX is the same
    // code-unit order), every overlap rule, and the content — a
    // prune wrong in either direction shifts a stage row. At 100 TB
    // this is the difference between touching 2 cells and scanning
    // the table for every dashboard filter; the stats cost one
    // metadata-sized agg per commit, exactly like the key stats.
    "q302_lake_column_skip" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q302-lake")
      try {
        val n = docs(s, dir).count()
        val kGran = 2L * lakeGranFor(n)
        val d = docs(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"),
            ((col("doc_id") % 20) / lit(5)).cast("long").as("sg"),
            (col("doc_id") / lit(kGran)).cast("long").as("kb"))
        d.repartition(col("sg"), col("kb"))
          .write.partitionBy("sg", "kb").mode("overwrite")
          .parquet(s"$stage/data")
        // the commit's per-file stats: one metadata-sized agg
        val cells = d.groupBy("sg", "kb")
          .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
            min(col("source")).as("msrc"), max(col("source")).as("xsrc"),
            min(col("n_chars")).as("mch"), max(col("n_chars")).as("xch"))
          .collect()
          .map(r => (s"$stage/data/sg=${r.getLong(0)}/kb=${r.getLong(1)}",
            r.getLong(2), r.getLong(3), r.getString(4), r.getString(5),
            r.getLong(6), r.getLong(7)))
        import s.implicits._
        cells.toSeq.map { case (p, mn, mx, ms, xs, mc, xc) =>
          ("add", p, mn, mx, ms, xs, mc, xc) }
          .toDF("action", "path", "min_id", "max_id", "min_src",
            "max_src", "min_chars", "max_chars").coalesce(1)
          .write.mode("overwrite").parquet(s"$stage/_log/v0")
        // the read's three conjuncts (bounds derived from the corpus
        // so the key prune is non-trivial at every SF)
        val maxId = docs(s, dir).agg(max(col("doc_id"))).head().getLong(0)
        val (lo, hi) = (maxId / 4, maxId / 2)
        val srcP = "src12"
        val chP = 100L
        // dimension-by-dimension pruning over the manifest (driver,
        // metadata scale — the manifest is O(files))
        val manifest = s.read.parquet(s"$stage/_log/v0").collect()
          .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
            r.getString(4), r.getString(5), r.getLong(6), r.getLong(7)))
        val keyKept = manifest.filter { case (_, mn, mx, _, _, _, _) =>
          mn <= hi && mx >= lo }
        val srcKept = keyKept.filter { case (_, _, _, ms, xs, _, _) =>
          ms <= srcP && xs >= srcP }
        val chKept = srcKept.filter { case (_, _, _, _, _, _, xc) =>
          xc >= chP }
        val matched = s.read.parquet(chKept.map(_._1): _*)
          .where(col("source") === srcP &&
            col("doc_id").between(lo, hi) && col("n_chars") >= chP)
        // contributing cells recomputed from the keys (each cell is a
        // (sg, kb) function of doc_id): false positives = survivors
        // that contribute nothing — the honest price of conservative
        // stats
        val contributing = matched
          .select(((col("doc_id") % 20) / lit(5)).cast("long"),
            (col("doc_id") / lit(kGran)).cast("long"))
          .distinct().count()
        def statRow(name: String, nFiles: Long) =
          s.range(1).select(lit(name).as("stage"),
            lit(nFiles).as("n_files"), lit(0L).as("n_rows"),
            lit(0L).as("sum_chars"), lit(0L).as("key_checksum"))
        val readRow = matched
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
          .select(lit("e_read").as("stage"),
            lit(chKept.length.toLong).as("n_files"), col("n_rows"),
            coalesce(col("sum_chars"), lit(0L)).as("sum_chars"),
            coalesce(col("key_checksum"), lit(0L)).as("key_checksum"))
        val out = statRow("a_all_files", manifest.length.toLong)
          .unionByName(statRow("b_key_pruned", keyKept.length.toLong))
          .unionByName(statRow("c_source_pruned", srcKept.length.toLong))
          .unionByName(statRow("d_chars_pruned", chKept.length.toLong))
          .unionByName(readRow)
          .unionByName(statRow("f_false_positive_files",
            chKept.length.toLong - contributing))
          .orderBy("stage")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // VACUUM RETENTION SAFETY — the concurrency contract that makes
    // q291's sweep safe to RUN while readers are live (Delta: vacuum
    // must not free a file any snapshot within the retention window
    // still references; its check is retention ≥ max reader snapshot
    // age): before deleting, the sweep intersects its doomed list
    // with each ACTIVE reader snapshot's resolved file set — pure
    // manifest work, O(files), never data. Staged on the compaction
    // log (v0-v3): a vacuum at boundary 3 against a reader pinned at
    // v2 finds every one of the reader's files doomed and REFUSES
    // (scenario a — and the reader's read afterwards is gated intact:
    // refusal preserved the bytes); the same vacuum against a reader
    // pinned at v3 finds zero conflicts and EXECUTES (scenario b —
    // the reader's post-delete read is gated hash-exact off the one
    // compacted file). A sweep that ignores the reader set, resolves
    // it from the wrong manifests, or deletes despite conflicts
    // shifts a row or kills a gated read. At 100 TB the check costs
    // one set intersection per active reader over manifest-resolved
    // paths — the cheap insurance against the most expensive failure
    // a lake has (a long query's files freed mid-read).
    "q303_lake_vacuum_retention" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q303-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = true, privateData = true)
        val retained = asOfFiles(s, stage.toString, 3).toSet
        val doomed = (0 to 3).flatMap(v =>
          s.read.parquet(s"$stage/_log/v$v").collect()
            .collect { case r if r.getString(0) == "add" => r.getString(1) })
          .filterNot(retained)
        def scenario(name: String, readerV: Int): DataFrame = {
          val readerFiles = asOfFiles(s, stage.toString, readerV)
          val doomedSet = doomed.toSet
          val conflicts = readerFiles.count(doomedSet)
          val outcome = if (conflicts > 0) "refused" else "executed"
          if (conflicts == 0)
            doomed.foreach(p => rmTree(java.nio.file.Paths.get(p)))
          // the reader's read AFTER the decision — intact on refusal,
          // intact on execution (its snapshot was conflict-free)
          s.read.parquet(readerFiles: _*)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("n_chars").cast("long")).as("sum_chars"),
              sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
            .select(lit(name).as("scenario"), lit(3L).as("boundary"),
              lit(readerV.toLong).as("reader_version"),
              lit(doomed.size.toLong).as("n_doomed"),
              lit(conflicts.toLong).as("n_conflicts"),
              lit(outcome).as("outcome"),
              lit(readerFiles.size.toLong).as("n_files"),
              col("n_rows"), col("sum_chars"), col("key_checksum"))
        }
        def snap(df: DataFrame): DataFrame = {
          val rows = df.collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
        }
        // scenario a materializes BEFORE scenario b's sweep deletes
        // the very files it read
        val a = snap(scenario("a_reader_v2", 2))
        val b = snap(scenario("b_reader_v3", 3))
        a.unionByName(b).orderBy("scenario")
      } finally rmTree(stage)
    }),

    // TIMESTAMP-BASED TIME TRAVEL — the first thing a human asks a
    // production table (`AS OF '2026-08-01'`): every manifest carries
    // its deterministic `commit_ts` (see [[commitTsOf]]), resolution
    // is max version with ts ≤ t, and the resolved version's file set
    // comes through the SHARED checkpoint-aware path (a checkpoint at
    // v3 + `_last_checkpoint`, so the after-last probe reads exactly
    // ONE manifest — n_manifests_ckpt in the gate). Probes span the
    // Delta cases: before the first commit (the error case rendered
    // as an explicit `no_snapshot_at_ts` row, not an exception),
    // exactly AT a commit's ts (inclusive bound), strictly BETWEEN
    // two commits (floor resolution — v2's content, distinguishable
    // from v3's only by n_files since v3 is the compaction swap), and
    // after the last. At 100 TB the ts index is one column over the
    // manifest listing — metadata the driver already folds; the data
    // read is the same pruned snapshot read every other gate prices.
    "q308_lake_time_travel_ts" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q308-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = true)
        // checkpoint the latest version + pointer (q301's convention)
        writeCheckpoint(s, stage.toString, 3)
        // the ts index: version -> commit_ts read off the manifests
        // themselves (Delta reads commit-file timestamps the same
        // way) — one metadata-sized read per version
        val versions = Iterator.from(0).takeWhile(v =>
          java.nio.file.Files.exists(java.nio.file.Paths.get(
            stage.toString, "_log", s"v$v"))).toSeq
        val tsIdx = versions.map(v => v ->
          s.read.parquet(s"$stage/_log/v$v")
            .select(col("commit_ts")).head().getLong(0))
        def resolveTs(t: Long): Int =
          tsIdx.filter(_._2 <= t).map(_._1).maxOption.getOrElse(-1)
        val probes = Seq(
          ("a_before_first", commitTsOf(0) - 1L),
          ("b_exact_v1", commitTsOf(1)),
          ("c_between_v2_v3", commitTsOf(3) - 1L),
          ("d_after_last", commitTsOf(3) + 86400000L))
        val out = probes.map { case (name, t) =>
          val v = resolveTs(t)
          if (v < 0)
            s.range(1).select(lit(name).as("probe"),
              lit(t).as("probe_ts"), lit(-1L).as("version"),
              lit("no_snapshot_at_ts").as("outcome"),
              lit(0L).as("n_manifests_ckpt"), lit(0L).as("n_files"),
              lit(0L).as("n_rows"), lit(0L).as("sum_chars"),
              lit(0L).as("key_checksum"))
          else {
            val (files, nReads) = ckptResolve(s, stage.toString, v)
            s.read.parquet(files.map(_._1): _*)
              .agg(count(lit(1)).as("n_rows"),
                sum(col("n_chars").cast("long")).as("sum_chars"),
                sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
              .select(lit(name).as("probe"), lit(t).as("probe_ts"),
                lit(v.toLong).as("version"),
                lit("resolved").as("outcome"),
                lit(nReads).as("n_manifests_ckpt"),
                lit(files.size.toLong).as("n_files"),
                col("n_rows"), col("sum_chars"), col("key_checksum"))
          }
        }.reduce(_ unionByName _).orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // METADATA RETENTION (log cleanup below the checkpoint) — the
    // lifecycle step that keeps the `_log` directory itself bounded:
    // q301 bounds RESOLUTION cost with checkpoints, but the manifest
    // files still accumulate forever until something deletes them
    // (Delta's logRetentionDuration). The rule gated here: once a
    // checkpoint exists at v, manifests BELOW v are subsumed and may
    // be deleted; the price is explicit — versions below the oldest
    // checkpoint become unresolvable, including BY TIMESTAMP (the ts
    // index lives in the deleted manifests). Probes: the latest
    // version resolves through the checkpoint alone (1 manifest read,
    // content exact), a version below the retention floor answers
    // with an explicit `version_unavailable` row (not an exception),
    // and a timestamp below the floor answers `ts_unavailable` — the
    // exact boundary Delta documents for AS OF under log cleanup.
    // At 100 TB: cleanup is a directory listing + unlink of v <
    // checkpoint — metadata-scale, and the reason a table's log stays
    // KBs after a million commits.
    "q312_lake_log_retention" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q312-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = true)
        writeCheckpoint(s, stage.toString, 3)
        def manifestsOnDisk(): Long =
          (0 to 3).count(v => java.nio.file.Files.exists(
            java.nio.file.Paths.get(stage.toString, "_log", s"v$v")))
            .toLong
        val before = manifestsOnDisk()
        // the cleanup: unlink every manifest below the checkpoint
        val ckptV = java.nio.file.Files.readString(java.nio.file.Paths
          .get(stage.toString, "_log", "_last_checkpoint")).trim.toInt
        (0 until ckptV).foreach(v => rmTree(java.nio.file.Paths
          .get(stage.toString, "_log", s"v$v")))
        val after = manifestsOnDisk()
        def available(v: Int): Boolean = v >= ckptV ||
          (0 to v).forall(i => java.nio.file.Files.exists(
            java.nio.file.Paths.get(stage.toString, "_log", s"v$i")))
        def row(name: String, outcome: String, v: Long,
            content: Option[(Seq[String], Long)]): DataFrame =
          content match {
            case Some((files, nReads)) =>
              s.read.parquet(files: _*)
                .agg(count(lit(1)).as("n_rows"),
                  sum(col("n_chars").cast("long")).as("sum_chars"),
                  sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
                .select(lit(name).as("probe"), lit(outcome).as("outcome"),
                  lit(v).as("version"),
                  lit(before).as("n_manifests_before"),
                  lit(after).as("n_manifests_after"),
                  lit(nReads).as("n_manifests_read"),
                  lit(files.size.toLong).as("n_files"), col("n_rows"),
                  col("sum_chars"), col("key_checksum"))
            case None =>
              s.range(1).select(lit(name).as("probe"),
                lit(outcome).as("outcome"), lit(v).as("version"),
                lit(before).as("n_manifests_before"),
                lit(after).as("n_manifests_after"),
                lit(0L).as("n_manifests_read"), lit(0L).as("n_files"),
                lit(0L).as("n_rows"), lit(0L).as("sum_chars"),
                lit(0L).as("key_checksum"))
          }
        val latest = {
          val (files, nReads) = ckptResolve(s, stage.toString, 3)
          row("a_latest_via_ckpt", "resolved", 3L,
            Some((files.map(_._1), nReads)))
        }
        val below = row("b_below_floor",
          if (available(1)) "resolved" else "version_unavailable", 1L,
          None)
        // ts probe below the floor: the ts index needs the deleted
        // manifests, so resolution must answer unavailable — checked
        // against the manifests that REMAIN (commitTsOf(3) is still
        // readable; anything below its floor is not)
        val tsFloor = s.read.parquet(s"$stage/_log/v3")
          .select(col("commit_ts")).head().getLong(0)
        val tsProbe = commitTsOf(1)
        val tsOut =
          if (tsProbe >= tsFloor) "resolved" else "ts_unavailable"
        val c = row("c_ts_below_floor", tsOut, -1L, None)
        val out = latest.unionByName(below).unionByName(c)
          .orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // PER-FILE BLOOM FILTERS in the manifest — point-lookup skipping
    // for HIGH-CARDINALITY NON-KEY equality predicates, the gap q302
    // names explicitly: min/max stats prune ranges on clustered
    // dimensions, but `WHERE url = 'x'` against an unclustered
    // high-cardinality column gets nothing from them (every file's
    // [min_url, max_url] spans the probe). The Delta/Iceberg answer:
    // at write time each file records a small bloom (here
    // max(4, granule/8) 64-bit words, two Kirsch-Mitzenmacher probes
    // off the shared [[graft.functions.PolyHash]] — both engines run
    // the identical integer arithmetic); a point lookup tests its two
    // bits per file and reads only the passing files. Gated per
    // probe (two real urls from different granules + one absent):
    // files-total → files-passing-bloom, the MEASURED false-positive
    // file count (a bloom promises no false negatives, never no
    // false positives — the gate counts them the way q302 counts its
    // lexicographic survivor), and the residual read's row/char
    // result off ONLY the passing files. At 100 TB the bloom adds
    // ~bits-per-row metadata per file and turns a needle lookup from
    // a full scan into ~(1 + fpp·files) file reads.
    "q309_lake_bloom_skip" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q309-lake")
      try {
        val d = docs(s, dir)
        val gran = lakeGranFor(d.count())
        // words-per-file ∝ rows-per-file (granule/8 longs ≈ 8 bits/row),
        // CAPPED at 64Ki words (512 KB/file — the Parquet/Delta bloom
        // ballpark) so per-file metadata stays bounded however large a
        // file's granule grows; the cap binds only above ~26M docs
        // (every gate SF and sf1 sit far below), so hashes are
        // unaffected where gated
        val mWords = math.min(65536L, math.max(4L, gran / 8L))
        val mBits = mWords * 64L
        val url = concat(lit("doc://"), col("source"), lit("/"),
          col("doc_id").cast("string"))
        val withG = d.withColumn("g", expr(s"doc_id div $gran"))
          .withColumn("url", url)
        withG.repartition(col("g"))
          .write.partitionBy("g").mode("overwrite")
          .parquet(s"$stage/data")
        // write-time bloom: h1 = polyHash(url), h2 derived (squared
        // mix), two probe bits per key; one metadata-sized aggregate
        val h1c = graft.functions.TextFunctions.polyHash(col("url"))
        val hashed = withG.select(col("g"), h1c.as("h1"))
          .withColumn("h2",
            expr(s"(h1 * h1 + $manifestA) % ${graft.functions.PolyHash.P}"))
        val bloomRows = (1 to 2).map(i =>
            hashed.select(col("g"),
              expr(s"(h1 + $i * h2) % $mBits").as("pos")))
          .reduce(_ unionByName _)
          .select(col("g"), expr("pos div 63").as("w"),
            // 63 bits per word: the sign bit is never set, so both
            // engines' checked shifts stay in range
            expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
              .as("m"))
          .groupBy("g", "w").agg(expr("bit_or(m)").as("mask"))
          .collect()  // hint audit: gate-scale collect — files × words/file is ROW-proportional (≈ rows/8 longs total, ~512 KB at sf1); a production reader tests blooms inside the distributed manifest scan (one file's ≤64Ki words per task), never a driver Map
        val bloom = bloomRows.map(r =>
          (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        val nFiles = withG.select("g").distinct().count()
        val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
        // probes: two real urls from different granules + one absent
        def urlOf(id: Long): String = d.where(col("doc_id") === id)
          .select(url).head().getString(0)
        val probes = Seq(
          ("a_hit_mid", urlOf(maxId / 2)),
          ("b_hit_low", urlOf(maxId / 5)),
          ("c_miss", "doc://void/424242"))
        val out = probes.map { case (name, pu) =>
          val h1 = s.range(1)
            .select(graft.functions.TextFunctions.polyHash(lit(pu)))
            .head().getLong(0)
          val h2 = (h1 * h1 + manifestA) % graft.functions.PolyHash.P
          val bits = (1 to 2).map(i => (h1 + i * h2) % mBits)
          val passing = (0L until nFiles).filter(g => bits.forall(b =>
            (bloom.getOrElse((g, b / 63), 0L) & (1L << (b % 63).toInt))
              != 0L)).sorted
          val found =
            if (passing.isEmpty) s.range(1)
              .select(lit(0L).as("n_rows"), lit(0L).as("sum_chars"),
                lit(0L).as("n_containing"))
            else s.read
              .parquet(passing.map(g => s"$stage/data/g=$g"): _*)
              .where(col("url") === pu)
              .agg(count(lit(1)).as("n_rows"),
                coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
                countDistinct(expr(s"doc_id div $gran"))
                  .as("n_containing"))
          found.select(lit(name).as("probe"),
            lit(nFiles).as("n_files_total"),
            lit(passing.size.toLong).as("n_files_bloom_pass"),
            (lit(passing.size.toLong) - col("n_containing"))
              .as("n_false_positive_files"),
            col("n_rows"), col("sum_chars"))
        }.reduce(_ unionByName _).orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // Z-ORDER CLUSTERING (Delta OPTIMIZE ZORDER BY / Iceberg
    // sort-order rewrite) — the layout operation that makes q302's
    // multi-column stats BITE on more than the leading dimension:
    // linear (ingest-order) files are clustered by doc_id alone, so a
    // predicate on n_chars overlaps EVERY file's [min,max] envelope
    // and stats prune nothing; rewriting the same rows into the same
    // NUMBER of files ordered by the Z-value (bit-interleave of the
    // two dimensions' 6-bit bucket ranks — both engines run the
    // identical integer arithmetic off the data maxima) gives every
    // file a bounded rectangle in (doc_id, n_chars) space, so BOTH
    // dimensions prune. Gated per (probe, layout): a 2-D
    // quarter×quarter range and an n_chars-only range, each with
    // files-total → files-passing-stats and the residual read's
    // rows/chars/checksum off ONLY the passing files — identical
    // content across layouts (stats never false-negative) with the
    // skip ratio as the measured win. At 100 TB this is the standard
    // answer to "my second filter column never prunes": one
    // data-scale rewrite (like any compaction), metadata unchanged
    // in size, every multi-dimension scan after it reads ~the
    // query's rectangle instead of the full table.
    "q320_lake_zorder" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q320-lake")
      try {
        val d = docs(s, dir).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("source"))
        val gran = lakeGranFor(d.count())
        val mm = d.agg(max(col("doc_id")), max(col("n_chars"))).head()
        val (maxId, maxCh) = (mm.getLong(0), mm.getLong(1))
        val gx = maxId / 64 + 1
        val gy = maxCh / 64 + 1
        val nf = maxId / gran + 1
        val xb = expr(s"doc_id div $gx")
        val yb = expr(s"n_chars div $gy")
        val zv = (0 until 6).map(k =>
          shiftright(xb, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k)) +
            shiftright(yb, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k + 1)))
          .reduce(_ + _)
        val laid = d
          .withColumn("lin_f", expr(s"doc_id div $gran"))
          // 4096 = 2^12, so the rank→file map is a pure integer shift
          .withColumn("zf", shiftright(zv * nf, 12))
        def layout(name: String, fcol: String): Unit =
          laid.select(col("doc_id"), col("n_chars"), col(fcol).as("f"))
            .repartition(col("f"))
            .write.partitionBy("f").mode("overwrite")
            .parquet(s"$stage/$name")
        layout("linear", "lin_f")
        layout("zorder", "zf")
        // write-time per-file stats over BOTH dimensions — the q302
        // manifest convention, one metadata-sized agg per layout
        def statsOf(fcol: String): Array[(Long, Long, Long, Long, Long)] =
          laid.groupBy(col(fcol).as("f"))
            .agg(min(col("doc_id")), max(col("doc_id")),
              min(col("n_chars")), max(col("n_chars")))
            .collect()  // hint audit: manifest-sized (one row per file)
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4)))
        val stats = Map("linear" -> statsOf("lin_f"),
          "zorder" -> statsOf("zf"))
        // probes: the 2-D rectangle and the non-leading single column
        val (lo1, hi1) = (maxId / 4, maxId / 2)
        val (lo2, hi2) = (maxCh / 4, maxCh / 2)
        val probes = Seq(
          ("a_two_dim", Some((lo1, hi1)), (lo2, hi2)),
          ("b_chars_only", None, (lo2, hi2)))
        val out = (for {
          (pname, idR, chR) <- probes
          lname <- Seq("linear", "zorder")
        } yield {
          val st = stats(lname)
          val pass = st.filter { case (_, mnI, mxI, mnC, mxC) =>
            idR.forall { case (l, h) => mxI >= l && mnI <= h } &&
              mxC >= chR._1 && mnC <= chR._2
          }.map(_._1).sorted
          val pred = idR.map { case (l, h) =>
            col("doc_id") >= l && col("doc_id") <= h }
            .getOrElse(lit(true)) &&
            col("n_chars") >= chR._1 && col("n_chars") <= chR._2
          val read =
            if (pass.isEmpty) s.range(1)
              .select(lit(0L).as("n_rows"), lit(0L).as("sum_chars"),
                lit(0L).as("key_checksum"))
            else s.read
              .parquet(pass.map(f => s"$stage/$lname/f=$f"): _*)
              .where(pred)
              .agg(count(lit(1)).as("n_rows"),
                coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
                coalesce(sum(expr(manifestTerm("doc_id"))), lit(0L))
                  .as("key_checksum"))
          read.select(lit(pname).as("probe"), lit(lname).as("layout"),
            lit(st.length.toLong).as("n_files_total"),
            lit(pass.length.toLong).as("n_files_pass"),
            col("n_rows"), col("sum_chars"), col("key_checksum"))
        }).reduce(_ unionByName _).orderBy("probe", "layout")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // MERGE INTO (stats-targeted copy-on-write upsert) — the marquee
    // lake write operation: an updates batch (scattered keys in
    // granules 1 and 3 get n_chars += 1000) plus 50 brand-new rows
    // lands as ONE commit, touching only the files that need it.
    // Delta's two-phase shape, mirrored exactly: phase 1 is METADATA
    // (candidate files = active entries whose manifest [min,max]
    // overlaps the update-key range — the same stats every read
    // prunes by); phase 2 scans ONLY the candidates for files with
    // actual matches (one distributed read, input_file_name mapped
    // back to manifest entries) and rewrites just those (CoW — the
    // new file is the old rows with updates applied, so its key
    // stats are unchanged and carry over), appends the inserts file,
    // and commits removes+adds atomically via the q290 CAS. Gated in
    // one row: the funnel (active → stats-candidates → actually
    // rewritten — strictly narrowing at every SF), the update/insert
    // row counts, and the post-merge snapshot's rows / chars / key
    // checksum / a doc_id×n_chars MIX checksum (an update applied to
    // the wrong rows keeps the sums and shifts the mix). The oracle
    // reconstructs the file funnel from the staging arithmetic and
    // the post state as a logical upsert. At 100 TB this is why
    // MERGE is affordable: write amplification ∝ files CONTAINING
    // matches (stats-bounded), not table size, and readers see one
    // atomic version flip.
    "q321_lake_merge" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q321-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = false)
        val gran = lakeGranFor(docs(s, dir).count())
        val matchedPred = expr(s"doc_id div $gran").isin(1L, 3L) &&
          col("doc_id") % 13 === 3
        val (active, _) = ckptResolve(s, stage.toString, 2)
        val snapshot = s.read.parquet(active.map(_._1): _*)
        val kmm = snapshot.where(matchedPred)
          .agg(min(col("doc_id")), max(col("doc_id")),
            count(lit(1))).head()
        val nUpd = kmm.getLong(2)
        // zero-match guard (round-17 ADVICE): a table whose rows never
        // satisfy matchedPred has null key min/max and an empty
        // candidate list — skip the rewrite phase entirely and commit
        // only the inserts, keeping the funnel columns at 0 (the
        // logical-upsert oracle's zero-update row)
        val cands =
          if (nUpd == 0L) Seq.empty[(String, Long, Long)]
          else {
            val (k0, k1) = (kmm.getLong(0), kmm.getLong(1))
            // phase 1: manifest-stats candidates
            active.filter { case (_, mn, mx) => mx >= k0 && mn <= k1 }
          }
        // phase 2: candidates that actually contain a match
        val matchedParts =
          if (cands.isEmpty) Array.empty[String]
          else s.read.parquet(cands.map(_._1): _*)
            .where(matchedPred)
            .select(input_file_name().as("f")).distinct()
            .collect().map(_.getString(0))  // hint audit: manifest-sized (one row per matched part file)
        val hits = cands.filter { case (p, _, _) =>
          matchedParts.exists(_.contains(p + "/")) }
        // CoW rewrites: all rows of each hit file, updates applied;
        // doc_id stats carry over (keys are untouched by the update)
        val chType = snapshot.schema("n_chars").dataType
        val rewriteAdds = hits.zipWithIndex.map { case ((p, mn, mx), i) =>
          val rp = s"$stage/mw$i"
          s.read.parquet(p)
            .withColumn("n_chars",
              when(matchedPred, col("n_chars") + lit(1000).cast(chType))
                .otherwise(col("n_chars")))
            .coalesce(1).write.mode("overwrite").parquet(rp)
          ("add", rp, mn, mx)
        }
        // the inserts file: 50 new ids past the snapshot maximum
        val maxId = snapshot.agg(max(col("doc_id"))).head().getLong(0)
        val ip = s"$stage/mins"
        s.range(1, 51)
          .select((lit(maxId) + col("id")).as("doc_id"),
            lit("merged").as("source"),
            (lit(100L) + (lit(maxId) + col("id")) % 97)
              .cast(chType).as("n_chars"))
          .coalesce(1).write.mode("overwrite").parquet(ip)
        require(tryCommit(s, stage.toString, 3,
          hits.map { case (p, _, _) => ("remove", p, -1L, -1L) } ++
            rewriteAdds :+ (("add", ip, maxId + 1, maxId + 50))))
        // the post-merge snapshot, resolved from the log
        val out = s.read
          .parquet(asOfFiles(s, stage.toString, 3): _*)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            sum(expr(manifestTerm("doc_id"))).as("key_checksum"),
            sum(col("doc_id") * col("n_chars").cast("long"))
              .as("mix_checksum"))
          .select(lit(active.size.toLong).as("n_files_active"),
            lit(cands.size.toLong).as("n_files_cand_stats"),
            lit(hits.size.toLong).as("n_files_rewritten"),
            lit(nUpd).as("n_rows_updated"),
            lit(50L).as("n_rows_inserted"),
            col("n_rows"), col("sum_chars"), col("key_checksum"),
            col("mix_checksum"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // PARTITION EVOLUTION — Iceberg's signature capability (spec v2
    // §partition-evolution; Hive/plain-parquet tables CANNOT do
    // this): a table's partition scheme changes mid-life WITHOUT
    // rewriting old files, because partitioning is metadata per file,
    // not directory truth. Staged: the table's original ingest lands
    // under spec A (one file per doc_id granule), then the scheme
    // EVOLVES and later ingest lands under spec B (one file per
    // source); ONE log holds both, each manifest row carrying its
    // file's partition tuple (ptype, pval) AND its key stats — the
    // dual bookkeeping real manifests keep. A reader prunes each file
    // BY ITS OWN SPEC: equality on a file's partition column prunes
    // by value, anything else falls back to min/max stats. Probes
    // price all three shapes: an id-range probe prunes spec-A to one
    // granule while spec-B files survive only if their id stats
    // overlap; a source-equality probe prunes spec-B to one file
    // while spec-A scans (granules contain every source); the
    // combined probe intersects both rules. Content is gated
    // hash-exact against the predicate applied to the full table —
    // stats never false-negative, so pruned reads lose nothing. At
    // 100 TB this is why evolution beats rewrite: the old petabytes
    // keep their layout and their pruning, the new scheme applies
    // going forward, and the planner cost is one manifest fold.
    "q332_lake_partition_evolution" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q332-lake")
      try {
        import s.implicits._
        val d = docs(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val gran = lakeGranFor(d.count())
        // spec A: the original ingest (doc_id % 3 <> 2), granule files
        val a = d.where(col("doc_id") % 3 =!= 2)
          .withColumn("g", expr(s"doc_id div $gran"))
        a.repartition(col("g"))
          .write.partitionBy("g").mode("overwrite")
          .parquet(s"$stage/specA")
        // spec B: post-evolution ingest (% 3 = 2), source files (the
        // partition column is duplicated so data files keep `source` —
        // readers of a leaf directory must still see the full row)
        val b = d.where(col("doc_id") % 3 === 2)
        b.withColumn("sp", col("source"))
          .repartition(col("sp"))
          .write.partitionBy("sp").mode("overwrite")
          .parquet(s"$stage/specB")
        // the manifest: partition tuple + key stats per file
        val aManifest = a.groupBy("g")
          .agg(min(col("doc_id")), max(col("doc_id")))
          .collect()  // hint audit: manifest-sized
          .map(r => (s"$stage/specA/g=${r.getLong(0)}", "range",
            r.getLong(0).toString, r.getLong(1), r.getLong(2)))
        val bManifest = b.groupBy("source")
          .agg(min(col("doc_id")), max(col("doc_id")))
          .collect()  // hint audit: manifest-sized
          .map(r => (s"$stage/specB/sp=${r.getString(0)}", "source",
            r.getString(0), r.getLong(1), r.getLong(2)))
        val manifest = aManifest ++ bManifest
        val (lo, hi) = (2L * gran, 2L * gran + gran / 2)
        val srcPick = d.agg(min(col("source"))).head().getString(0)
        // per-file pruning under the file's OWN spec
        def scan(idR: Option[(Long, Long)], srcEq: Option[String])
            : Seq[String] =
          manifest.filter { case (_, ptype, pval, mn, mx) =>
            val idOk = idR.forall { case (l, h) => mx >= l && mn <= h }
            val srcOk = srcEq.forall(sv =>
              ptype != "source" || pval == sv)
            idOk && srcOk
          }.map(_._1).toSeq.sorted
        def probe(name: String, idR: Option[(Long, Long)],
            srcEq: Option[String]): DataFrame = {
          val files = scan(idR, srcEq)
          val pred = idR.map { case (l, h) =>
            col("doc_id") >= l && col("doc_id") <= h }
            .getOrElse(lit(true)) &&
            srcEq.map(col("source") === _).getOrElse(lit(true))
          s.read.parquet(files: _*).where(pred)
            .agg(count(lit(1)).as("n_rows"),
              coalesce(sum(col("n_chars").cast("long")), lit(0L))
                .as("sum_chars"),
              coalesce(sum(expr(manifestTerm("doc_id"))), lit(0L))
                .as("key_checksum"))
            .select(lit(name).as("probe"),
              lit(manifest.length.toLong).as("n_files_total"),
              lit(files.size.toLong).as("n_files_scanned"),
              col("n_rows"), col("sum_chars"), col("key_checksum"))
        }
        val out = probe("a_id_range", Some((lo, hi)), None)
          .unionByName(probe("b_source_eq", None, Some(srcPick)))
          .unionByName(probe("c_combined", Some((lo, hi)), Some(srcPick)))
          .orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // CATALOG-LEVEL MULTI-TABLE SNAPSHOTS — the consistency layer
    // ABOVE single-table commits (Iceberg/Nessie catalogs; plain
    // Delta cannot express it): a fact table and its derived dim
    // update TOGETHER, and a reader resolving each table's "latest"
    // independently mid-update sees a TORN pair — fact rows the dim's
    // rollup has never heard of. The catalog fixes it: one manifest
    // maps every table to a version, writers land both table commits
    // THEN swing the catalog pointer, and a reader resolves ALL
    // tables through one catalog snapshot. Staged: table A (docs) and
    // table B (A's per-source rollup) with their own q274-style logs;
    // c0 pins (A:0, B:0), c1 pins (A:1, B:1) where A-v1 is a CoW
    // update (+1000 on one granule) and B-v1 its recomputed rollup.
    // Gated: both catalog snapshots read CONSISTENT pairs (every
    // source's A-rollup equals its B row — n_inconsistent 0), and the
    // TORN read (A latest × B stale — exactly what independent
    // per-table resolution gives) is measured: the sources owning the
    // updated granule disagree, n_inconsistent > 0 — the failure the
    // catalog exists to prevent, priced not asserted. At 100 TB the
    // catalog adds one KB-scale manifest per coordinated commit and
    // one extra pointer read per query — cross-table consistency at
    // metadata cost.
    "q330_lake_catalog_snapshot" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q330-lake")
      try {
        import s.implicits._
        val d = docs(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val gran = lakeGranFor(d.count())
        val updPred = expr(s"doc_id div $gran") === 2L
        val chType = d.schema("n_chars").dataType
        def upd(df: DataFrame): DataFrame = df.withColumn("n_chars",
          when(updPred, col("n_chars") + lit(1000).cast(chType))
            .otherwise(col("n_chars")))
        def rollup(df: DataFrame): DataFrame = df.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("long")).as("sum_chars"))
        // table data files + per-table logs (the q274 convention)
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(s"$stage/A/_log"))
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(s"$stage/B/_log"))
        d.coalesce(1).write.mode("overwrite").parquet(s"$stage/a0")
        upd(d).coalesce(1).write.mode("overwrite").parquet(s"$stage/a1")
        rollup(d).coalesce(1).write.mode("overwrite")
          .parquet(s"$stage/b0")
        rollup(upd(d)).coalesce(1).write.mode("overwrite")
          .parquet(s"$stage/b1")
        val amm = d.agg(min(col("doc_id")), max(col("doc_id"))).head()
        val (a0, a1) = (amm.getLong(0), amm.getLong(1))
        require(tryCommit(s, s"$stage/A", 0,
          Seq(("add", s"$stage/a0", a0, a1))))
        require(tryCommit(s, s"$stage/A", 1,
          Seq(("remove", s"$stage/a0", -1L, -1L),
            ("add", s"$stage/a1", a0, a1))))
        require(tryCommit(s, s"$stage/B", 0,
          Seq(("add", s"$stage/b0", -1L, -1L))))
        require(tryCommit(s, s"$stage/B", 1,
          Seq(("remove", s"$stage/b0", -1L, -1L),
            ("add", s"$stage/b1", -1L, -1L))))
        // the catalog: one manifest per catalog version mapping table
        // -> pinned version; the pointer swing IS the coordinated
        // commit's visibility point
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(s"$stage/_catalog"))
        Seq(("A", 0L), ("B", 0L)).toDF("tbl", "version").coalesce(1)
          .write.mode("overwrite").parquet(s"$stage/_catalog/c0")
        Seq(("A", 1L), ("B", 1L)).toDF("tbl", "version").coalesce(1)
          .write.mode("overwrite").parquet(s"$stage/_catalog/c1")
        def catAt(c: Int): Map[String, Int] =
          s.read.parquet(s"$stage/_catalog/c$c").collect()
            .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
        def consistency(name: String, av: Int, bv: Int): DataFrame = {
          val a = s.read.parquet(asOfFiles(s, s"$stage/A", av): _*)
          val b = s.read.parquet(asOfFiles(s, s"$stage/B", bv): _*)
          rollup(a).select(col("source"), col("n_docs").as("a_docs"),
              col("sum_chars").as("a_chars"))
            .join(b.select(col("source"), col("n_docs").as("b_docs"),
              col("sum_chars").as("b_chars")), Seq("source"))
            .agg(count(lit(1)).as("n_sources"),
              sum(when(col("a_docs") === col("b_docs") &&
                col("a_chars") === col("b_chars"), 1L).otherwise(0L))
                .as("n_consistent"),
              sum(when(col("a_docs") === col("b_docs") &&
                col("a_chars") === col("b_chars"), 0L).otherwise(1L))
                .as("n_inconsistent"),
              sum(col("a_chars")).as("sum_chars_a"),
              sum(col("b_chars")).as("sum_chars_b"))
            .select(lit(name).as("probe"), col("n_sources"),
              col("n_consistent"), col("n_inconsistent"),
              col("sum_chars_a"), col("sum_chars_b"))
        }
        val c0 = catAt(0)
        val c1 = catAt(1)
        val out = consistency("a_catalog_v0", c0("A"), c0("B"))
          .unionByName(consistency("b_catalog_v1", c1("A"), c1("B")))
          // the read the catalog prevents: per-table latest, mid-update
          .unionByName(consistency("c_torn_latest_reads", 1, 0))
          .orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // RESTORE TO VERSION — Delta's RESTORE TABLE ... TO VERSION AS
    // OF: roll the table's LATEST state back to an earlier snapshot
    // as a NEW COMMIT, not by erasing history. The restore commit's
    // entries are the set difference computed purely from manifests:
    // add back every file the target version references that the
    // current one dropped (stats carried from their ORIGINAL add
    // entries — Delta's rule that a file's stats travel with its
    // add), remove every file added since. Gated: (a) the latest
    // version reads the TARGET version's content exactly (here
    // restore-to-v1 undoes the v2 copy-on-write delete — the dropped
    // odd rows REAPPEAR, the hardest thing to fake without actually
    // re-referencing the old file), with the commit's add/remove
    // counts pinned; (b) time travel to the rolled-back-over version
    // still resolves ITS content (history preserved — restore is
    // forward motion in the log). The restore writes ZERO data files
    // — pure manifest arithmetic, the same reason it is instant on a
    // petabyte table; only a later vacuum pays anything, and q323's
    // rule protects what restore re-referenced.
    "q326_lake_restore" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q326-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = false)
        // the target snapshot's entries WITH their original stats
        val target = ckptResolve(s, stage.toString, 1)._1
        val current = asOfFiles(s, stage.toString, 2).toSet
        val targetSet = target.map(_._1).toSet
        val adds = target.filterNot(e => current(e._1))
        val removes = current.toSeq.filterNot(targetSet).sorted
        require(tryCommit(s, stage.toString, 3,
          removes.map(p => ("remove", p, -1L, -1L)) ++
            adds.map { case (p, mn, mx) => ("add", p, mn, mx) }))
        def read(name: String, v: Int, nAdds: Long,
            nRemoves: Long): DataFrame = {
          val files = asOfFiles(s, stage.toString, v)
          s.read.parquet(files: _*)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("n_chars").cast("long")).as("sum_chars"),
              sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
            .select(lit(name).as("probe"),
              lit(nAdds).as("n_restore_adds"),
              lit(nRemoves).as("n_restore_removes"),
              lit(files.size.toLong).as("n_files"),
              col("n_rows"), col("sum_chars"), col("key_checksum"))
        }
        val out = read("a_latest_restored", 3,
            adds.size.toLong, removes.size.toLong)
          .unionByName(read("b_asof_v2_preserved", 2, 0L, 0L))
          .orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // OPTIMIZE ZORDER AS A COMMITTED TABLE OPERATION — q320 stages
    // two layouts side by side and prices the pruning; a deployment
    // runs the Z-rewrite as a COMMIT (Delta's OPTIMIZE ... ZORDER
    // BY): one atomic version removes every old-layout file and adds
    // the Z-ordered files with refreshed per-file stats over BOTH
    // dimensions (doc_id in the manifest proper; n_chars rides a
    // side metadata file — q313's convention for log-carried
    // metadata), so readers see one atomic swap. Gated three ways:
    // (a) time travel to the pre-optimize version still resolves the
    // OLD layout (OPTIMIZE deletes nothing — that is vacuum's job
    // later) with the v2 content intact; (b) the latest version
    // reads the Z layout with IDENTICAL rows/chars/checksum (as-of
    // equality across the swap — a rewrite that drops or duplicates
    // a row shifts a sum); (c) the non-leading-column range probe at
    // the latest version prunes through the committed stats
    // (n_files_pass < n_files_total — the whole point of the
    // rewrite, now priced through the log rather than a staged
    // side-by-side). At 100 TB: the rewrite is one data-scale
    // shuffle the table pays ONCE, the commit is manifest-sized, and
    // every subsequent chars-range query reads ~pass/total of the
    // table instead of all of it.
    "q325_lake_optimize_zorder_commit" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q325-lake")
      try {
        import s.implicits._
        stageLakeLog(s, dir, stage.toString, withCompaction = false)
        val gran = lakeGranFor(docs(s, dir).count())
        val active = asOfFiles(s, stage.toString, 2)
        val snap0 = s.read.parquet(active: _*)
        val mm = snap0.agg(max(col("doc_id")),
          max(col("n_chars").cast("long"))).head()
        val (maxId, maxCh) = (mm.getLong(0), mm.getLong(1))
        val gx = maxId / 64 + 1
        val gy = maxCh / 64 + 1
        val nf = maxId / gran + 1
        val xb = expr(s"doc_id div $gx")
        val yb = expr(s"cast(n_chars as bigint) div $gy")
        val zv = (0 until 6).map(k =>
          shiftright(xb, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k)) +
            shiftright(yb, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k + 1)))
          .reduce(_ + _)
        // 4096 = 2^12: rank→file is a pure integer shift (q320)
        val laid = snap0.withColumn("zf", shiftright(zv * nf, 12))
        laid.repartition(col("zf"))
          .write.partitionBy("zf").mode("overwrite")
          .parquet(s"$stage/z")
        // refreshed per-file stats over BOTH dimensions
        val zstats = laid.groupBy("zf")
          .agg(min(col("doc_id")), max(col("doc_id")),
            min(col("n_chars").cast("long")),
            max(col("n_chars").cast("long")))
          .collect()  // hint audit: manifest-sized (one row per Z file)
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
        // the atomic swap: removes of the whole old layout + adds of
        // the Z files, one CAS commit
        require(tryCommit(s, stage.toString, 3,
          active.map(p => ("remove", p, -1L, -1L)) ++
            zstats.map { case (f, mnI, mxI, _, _) =>
              ("add", s"$stage/z/zf=$f", mnI, mxI) }))
        zstats.toSeq.map { case (f, _, _, mnC, mxC) =>
          (s"$stage/z/zf=$f", mnC, mxC) }
          .toDF("path", "min_chars", "max_chars").coalesce(1)
          .write.mode("overwrite").parquet(s"$stage/_log/stats-v3")
        val (lo2, hi2) = (maxCh / 4, maxCh / 2)
        def probe(name: String, files: Seq[String], pred: Column,
            nTot: Long, nPass: Long): DataFrame =
          (if (files.isEmpty) s.range(1)
            .select(lit(0L).as("n_rows"), lit(0L).as("sum_chars"),
              lit(0L).as("key_checksum"))
          else s.read.parquet(files: _*).where(pred)
            .agg(count(lit(1)).as("n_rows"),
              coalesce(sum(col("n_chars").cast("long")), lit(0L))
                .as("sum_chars"),
              coalesce(sum(expr(manifestTerm("doc_id"))), lit(0L))
                .as("key_checksum")))
            .select(lit(name).as("probe"),
              lit(nTot).as("n_files_total"),
              lit(nPass).as("n_files_pass"),
              col("n_rows"), col("sum_chars"), col("key_checksum"))
        // a: the pre-optimize version — OLD layout, content intact
        val a = probe("a_asof_v2", asOfFiles(s, stage.toString, 2),
          lit(true), active.size.toLong, active.size.toLong)
        // b: the latest — Z layout, SAME content (the swap proof)
        val latest = asOfFiles(s, stage.toString, 3)
        val b = probe("b_latest_zorder", latest, lit(true),
          latest.size.toLong, latest.size.toLong)
        // c: the non-leading-column prune through the COMMITTED stats
        val passFiles = zstats.filter { case (_, _, _, mnC, mxC) =>
          mxC >= lo2 && mnC <= hi2 }
        val c = probe("c_prune_chars",
          passFiles.map { case (f, _, _, _, _) => s"$stage/z/zf=$f" }.toSeq,
          col("n_chars").cast("long") >= lo2 &&
            col("n_chars").cast("long") <= hi2,
          latest.size.toLong, passFiles.length.toLong)
        val out = a.unionByName(b).unionByName(c).orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // MERGE INTO WITH THE DELETE ARM — the third clause real MERGE
    // ships (WHEN MATCHED AND <cond> THEN DELETE) and the shape CDC
    // apply and GDPR erasure both reduce to; q321 gates
    // update+insert only. Same two-phase stats-targeted CoW: phase 1
    // prunes candidates by manifest [min,max] over the ON-key range
    // (both arms share the ON keys, so one range covers them), phase
    // 2 rewrites only files containing a match — but the delete arm
    // changes the REWRITE'S ROW FILTER (delete-matched rows drop out
    // of the new file) and the FUNNEL ACCOUNTING (a rewritten file's
    // key stats can SHRINK, so they are recomputed from the rewrite,
    // not carried over — q321's carry-over would be wrong here; and a
    // rewrite emptied entirely commits as a bare remove). Gated in
    // one row: the funnel, the per-arm row counts
    // (updated/deleted/inserted), and the post snapshot's rows /
    // chars / key checksum / mix checksum (a delete applied to the
    // update arm's rows keeps the count and shifts both sums; an
    // update applied to a delete row resurrects it). At 100 TB the
    // cost story is q321's: write amplification ∝ files containing
    // matches, and the delete needs no tombstones — CoW IS the
    // delete.
    "q324_lake_merge_delete" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q324-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = false)
        val gran = lakeGranFor(docs(s, dir).count())
        val matchedPred = expr(s"doc_id div $gran").isin(1L, 3L) &&
          col("doc_id") % 13 === 3
        // the two matched arms: odd keys delete, even keys update
        val delPred = matchedPred && col("doc_id") % 2 === 1
        val updPred = matchedPred && col("doc_id") % 2 === 0
        val (active, _) = ckptResolve(s, stage.toString, 2)
        val snapshot = s.read.parquet(active.map(_._1): _*)
        val kmm = snapshot.where(matchedPred)
          .agg(min(col("doc_id")), max(col("doc_id")), count(lit(1)),
            count(when(delPred, lit(1))),
            count(when(updPred, lit(1)))).head()
        val nMatched = kmm.getLong(2)
        val (nDel, nUpd) = (kmm.getLong(3), kmm.getLong(4))
        val cands =
          if (nMatched == 0L) Seq.empty[(String, Long, Long)]
          else {
            val (k0, k1) = (kmm.getLong(0), kmm.getLong(1))
            active.filter { case (_, mn, mx) => mx >= k0 && mn <= k1 }
          }
        val matchedParts =
          if (cands.isEmpty) Array.empty[String]
          else s.read.parquet(cands.map(_._1): _*)
            .where(matchedPred)
            .select(input_file_name().as("f")).distinct()
            .collect().map(_.getString(0))  // hint audit: manifest-sized
        val hits = cands.filter { case (p, _, _) =>
          matchedParts.exists(_.contains(p + "/")) }
        val chType = snapshot.schema("n_chars").dataType
        // CoW rewrites: delete rows filtered OUT, update rows updated;
        // stats recomputed from the rewrite (deletes can shrink them);
        // an emptied rewrite commits as a bare remove
        val rewriteAdds = hits.zipWithIndex.flatMap { case ((p, _, _), i) =>
          val rp = s"$stage/mw$i"
          s.read.parquet(p).where(!delPred)
            .withColumn("n_chars",
              when(updPred, col("n_chars") + lit(1000).cast(chType))
                .otherwise(col("n_chars")))
            .coalesce(1).write.mode("overwrite").parquet(rp)
          val mm = s.read.parquet(rp)
            .agg(min(col("doc_id")), max(col("doc_id")),
              count(lit(1))).head()
          if (mm.getLong(2) == 0L) None
          else Some(("add", rp, mm.getLong(0), mm.getLong(1)))
        }
        val maxId = snapshot.agg(max(col("doc_id"))).head().getLong(0)
        val ip = s"$stage/mins"
        s.range(1, 51)
          .select((lit(maxId) + col("id")).as("doc_id"),
            lit("merged").as("source"),
            (lit(100L) + (lit(maxId) + col("id")) % 97)
              .cast(chType).as("n_chars"))
          .coalesce(1).write.mode("overwrite").parquet(ip)
        require(tryCommit(s, stage.toString, 3,
          hits.map { case (p, _, _) => ("remove", p, -1L, -1L) } ++
            rewriteAdds :+ (("add", ip, maxId + 1, maxId + 50))))
        val out = s.read
          .parquet(asOfFiles(s, stage.toString, 3): _*)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            sum(expr(manifestTerm("doc_id"))).as("key_checksum"),
            sum(col("doc_id") * col("n_chars").cast("long"))
              .as("mix_checksum"))
          .select(lit(active.size.toLong).as("n_files_active"),
            lit(cands.size.toLong).as("n_files_cand_stats"),
            lit(hits.size.toLong).as("n_files_rewritten"),
            lit(nUpd).as("n_rows_updated"),
            lit(nDel).as("n_rows_deleted"),
            lit(50L).as("n_rows_inserted"),
            col("n_rows"), col("sum_chars"), col("key_checksum"),
            col("mix_checksum"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // SHALLOW CLONE (zero-copy table clone) — Delta's CLONE ... SHALLOW:
    // a new table whose manifest log REFERENCES the source's data
    // files; creating it copies metadata only (the gate's clone step
    // touches the KB-scale manifests, never a data file —
    // LakeLifecycleSpec pins the data-file census across the op).
    // After the clone, the two tables DIVERGE INDEPENDENTLY: the
    // clone appends its own commit (new file under the clone's root),
    // the source appends a DIFFERENT commit, and the gate reads all
    // three states through their own logs — clone-at-clone-time ≡
    // source as-of(2), clone-latest sees only the clone's append,
    // source-latest sees only the source's (isolation both ways: a
    // clone that shares its log tail, or re-resolves through the
    // source's, picks up the wrong 50 rows and shifts two checksums).
    // At 100 TB this is how dev/test forks of petabyte tables cost
    // KBs: shared immutable data + private logs — exactly the
    // architecture this suite's own staging memoization runs on; the
    // price (vacuum on the source must now consult clone references
    // too) is q303's retention contract extended across logs.
    "q322_lake_shallow_clone" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q322-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = false)
        val cloneRoot = java.nio.file.Paths.get(stage.toString, "clone")
        // the CLONE op: metadata only — copy the source's log as of
        // v2 into the clone's own root
        java.nio.file.Files.createDirectories(cloneRoot)
        graft.util.FileUtils.copyRecursively(
          java.nio.file.Paths.get(stage.toString, "_log"),
          cloneRoot.resolve("_log"))
        val snapshot =
          s.read.parquet(asOfFiles(s, stage.toString, 2): _*)
        val chType = snapshot.schema("n_chars").dataType
        val maxId = snapshot.agg(max(col("doc_id"))).head().getLong(0)
        // divergent appends: 50 rows each, DIFFERENT id ranges
        def append(root: String, name: String, lo: Long): Unit = {
          val p = s"$root/$name"
          s.range(1, 51)
            .select((lit(lo) + col("id")).as("doc_id"),
              lit(name).as("source"),
              (lit(100L) + (lit(lo) + col("id")) % 97)
                .cast(chType).as("n_chars"))
            .coalesce(1).write.mode("overwrite").parquet(p)
          require(tryCommit(s, root, 3,
            Seq(("add", p, lo + 1, lo + 50))))
        }
        append(cloneRoot.toString, "clone_app", maxId)
        append(stage.toString, "source_app", maxId + 50)
        def read(name: String, root: String, v: Int): DataFrame = {
          val files = asOfFiles(s, root, v)
          s.read.parquet(files: _*)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("n_chars").cast("long")).as("sum_chars"),
              sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
            .select(lit(name).as("probe"),
              lit(files.size.toLong).as("n_files"),
              col("n_rows"), col("sum_chars"), col("key_checksum"))
        }
        val out =
          read("a_clone_at_clone_time", cloneRoot.toString, 2)
            .unionByName(read("b_clone_latest", cloneRoot.toString, 3))
            .unionByName(read("c_source_latest", stage.toString, 3))
            .orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // VACUUM × SHALLOW CLONE — the price q322 names but leaves
    // ungated: after a shallow clone, the SOURCE's data files are
    // referenced by a log the source's own manifests know nothing
    // about, so a source vacuum that consults only its own snapshots
    // (q303's rule) frees files the clone still reads — the exact
    // failure class q303 exists to prevent, reachable through a gated
    // op. The extended contract (Delta documents precisely this
    // hazard for shallow clones): the sweep intersects its doomed
    // list with the LATEST SNAPSHOT OF EVERY REGISTERED CLONE —
    // metadata work, O(files) per clone log. Staged on the compaction
    // log: the clone forks at v2 (metadata-only copy of manifests
    // v0..v2), the source's boundary-3 vacuum dooms every
    // pre-compaction file; scenario a — the clone's latest still
    // references all of them → every clone file conflicts → REFUSED,
    // and the clone's read afterwards is gated intact; then the clone
    // COMPACTS INTO ITS OWN ROOT (its v3 references only its private
    // file); scenario b — the re-run vacuum finds zero conflicts →
    // EXECUTES, the doomed files are actually unlinked, and BOTH
    // tables' latest reads are gated hash-exact afterwards (the
    // clone's off its private compact, the source's off its own). A
    // vacuum that skips clone logs, resolves them at the wrong
    // version, or intersects against the clone's fork point instead
    // of its latest kills a gated read. At 100 TB: one set
    // intersection per clone over manifest-resolved paths — the same
    // cheap insurance as q303, extended across logs.
    "q323_lake_vacuum_clone_safety" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q323-lake")
      try {
        // private data: this gate DELETES data files on execute
        stageLakeLog(s, dir, stage.toString, withCompaction = true,
          privateData = true)
        // shallow clone AS OF v2: metadata only — the clone's log gets
        // the source manifests up to the fork version, nothing else
        val cloneRoot = stage.resolve("clone")
        java.nio.file.Files.createDirectories(cloneRoot.resolve("_log"))
        (0 to 2).foreach(v => graft.util.FileUtils.copyRecursively(
          java.nio.file.Paths.get(stage.toString, "_log", s"v$v"),
          cloneRoot.resolve("_log").resolve(s"v$v")))
        // the source vacuum's doomed list at boundary 3 (q303's rule)
        val retained = asOfFiles(s, stage.toString, 3).toSet
        val doomed = (0 to 3).flatMap(v =>
          s.read.parquet(s"$stage/_log/v$v").collect()
            .collect { case r if r.getString(0) == "add" => r.getString(1) })
          .filterNot(retained)
        val doomedSet = doomed.toSet
        def scenario(name: String, cloneV: Int): DataFrame = {
          // clone-aware check: the clone's LATEST active set
          val cloneFiles = asOfFiles(s, cloneRoot.toString, cloneV)
          val conflicts = cloneFiles.count(doomedSet)
          val outcome = if (conflicts > 0) "refused" else "executed"
          if (conflicts == 0)
            doomed.foreach(p => rmTree(java.nio.file.Paths.get(p)))
          s.read.parquet(cloneFiles: _*)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("n_chars").cast("long")).as("sum_chars"),
              sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
            .select(lit(name).as("probe"),
              lit(doomed.size.toLong).as("n_doomed"),
              lit(cloneFiles.size.toLong).as("n_clone_files"),
              lit(conflicts.toLong).as("n_conflicts"),
              lit(outcome).as("outcome"),
              lit(cloneFiles.size.toLong).as("n_files"),
              col("n_rows"), col("sum_chars"), col("key_checksum"))
        }
        def snap(df: DataFrame): DataFrame = {
          val rows = df.collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
        }
        // a: clone pinned at its fork snapshot — every file conflicts
        val a = snap(scenario("a_refused_clone_pinned", 2))
        // the clone compacts into its OWN root: its v3 drops every
        // shared reference (the divergence that makes the vacuum safe)
        val cloneActive = asOfFiles(s, cloneRoot.toString, 2)
        val cc = cloneRoot.resolve("ccompact").toString
        s.read.parquet(cloneActive: _*).coalesce(1)
          .write.mode("overwrite").parquet(cc)
        val ccMm = s.read.parquet(cc)
          .agg(min(col("doc_id")), max(col("doc_id"))).head()
        require(tryCommit(s, cloneRoot.toString, 3,
          cloneActive.map(p => ("remove", p, -1L, -1L)) :+
            (("add", cc, ccMm.getLong(0), ccMm.getLong(1)))))
        // b: zero conflicts — the sweep actually unlinks the doomed
        // files, then the clone's latest read survives off its private
        // compact file
        val b = snap(scenario("b_executed_clone_compacted", 3))
        // c: the source's latest read survives the sweep too
        val srcFiles = asOfFiles(s, stage.toString, 3)
        val c = snap(s.read.parquet(srcFiles: _*)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars").cast("long")).as("sum_chars"),
            sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
          .select(lit("c_source_latest").as("probe"),
            lit(doomed.size.toLong).as("n_doomed"),
            lit(1L).as("n_clone_files"), lit(0L).as("n_conflicts"),
            lit("executed").as("outcome"),
            lit(srcFiles.size.toLong).as("n_files"),
            col("n_rows"), col("sum_chars"), col("key_checksum")))
        a.unionByName(b).unionByName(c).orderBy("probe")
      } finally rmTree(stage)
    }),

    // COLUMN MAPPING (rename as metadata) — the schema-evolution face
    // q72 leaves unpriced: renaming a column in a raw-parquet table
    // means rewriting every file, so real lakes store LOGICAL name →
    // PHYSICAL id mappings in the log (Delta columnMapping mode=id /
    // Iceberg field-ids) and a rename touches one metadata row.
    // Staged: files written under physical ids (col_1/col_2/col_3), a
    // per-version mapping in the log; v1 RENAMES logical n_chars →
    // char_count (no file touched — gated by the v0/v1 reads being
    // byte-identical in rows, sum, and checksum THROUGH different
    // logical names); v2 appends a post-rename file under the same
    // physical ids and the merged read stays consistent across files
    // written before and after the rename. A reader resolving names
    // positionally, rewriting files on rename, or losing the mapping
    // for old files shifts a row. At 100 TB this is the difference
    // between a rename costing one manifest row and costing a full
    // table rewrite.
    "q313_lake_column_mapping" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q313-lake")
      try {
        import s.implicits._
        val d = docs(s, dir)
        d.select(col("doc_id").as("col_1"), col("n_chars").as("col_2"),
            col("source").as("col_3"))
          .where(col("col_1") % 2 === 0)
          .coalesce(1).write.mode("overwrite").parquet(s"$stage/f0")
        d.select(col("doc_id").as("col_1"), col("n_chars").as("col_2"),
            col("source").as("col_3"))
          .where(col("col_1") % 2 === 1)
          .coalesce(1).write.mode("overwrite").parquet(s"$stage/f1")
        def writeMapping(v: Int, m: Seq[(String, String)]): Unit =
          m.toDF("logical", "physical").coalesce(1)
            .write.mode("overwrite").parquet(s"$stage/_log/schema-v$v")
        writeMapping(0, Seq(("doc_id", "col_1"), ("n_chars", "col_2"),
          ("source", "col_3")))
        // v1: the rename — ONE metadata row changes, zero files touched
        writeMapping(1, Seq(("doc_id", "col_1"),
          ("char_count", "col_2"), ("source", "col_3")))
        // v2: same mapping as v1; the snapshot gains the f1 append
        writeMapping(2, Seq(("doc_id", "col_1"),
          ("char_count", "col_2"), ("source", "col_3")))
        def readAt(v: Int, files: Seq[String]): (DataFrame, String) = {
          val mapping = s.read.parquet(s"$stage/_log/schema-v$v")
            .collect().map(r => r.getString(0) -> r.getString(1))
            .sortBy(_._1)
          val df = s.read.parquet(files: _*)
            .select(mapping.map { case (l, p) => col(p).as(l) }: _*)
          (df, mapping.map(_._1).mkString(","))
        }
        val measureOf = Map(0 -> "n_chars", 1 -> "char_count",
          2 -> "char_count")
        def row(name: String, v: Int, files: Seq[String]): DataFrame = {
          val (df, schema) = readAt(v, files)
          df.agg(count(lit(1)).as("n_rows"),
              sum(col(measureOf(v)).cast("long")).as("sum_measure"),
              sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
            .select(lit(name).as("probe"), lit(v.toLong).as("version"),
              lit(schema).as("logical_schema"),
              lit(files.size.toLong).as("n_files"), col("n_rows"),
              col("sum_measure"), col("key_checksum"))
        }
        val out = row("a_v0_original_name", 0, Seq(s"$stage/f0"))
          .unionByName(row("b_v1_renamed_same_bytes", 1,
            Seq(s"$stage/f0")))
          .unionByName(row("c_v2_merged_across_rename", 2,
            Seq(s"$stage/f0", s"$stage/f1")))
          .orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // STATS SURVIVE THE RENAME — the composition q313 × q302 that
    // makes column mapping production-safe: data-skipping stats live
    // in manifests KEYED BY PHYSICAL ID, so a rename (one metadata
    // row) must not invalidate a byte of skipping metadata. Staged:
    // key-clustered physical-id files with per-file (col_1, col_2)
    // min/max stats; the same two-conjunct read (key range + measure
    // floor) probed BEFORE the rename (logical n_chars) and AFTER it
    // (logical char_count), each resolving its predicate through its
    // version's mapping to the SAME physical stats. Gated: identical
    // per-stage surviving-file counts and identical read content
    // across the rename — a reader that keys stats by logical name,
    // or re-derives them on rename, shifts a row (and at 100 TB would
    // either rescan the table to rebuild stats or silently stop
    // skipping). The measure conjunct's (non-)pruning is emitted
    // honestly, q302's convention.
    "q314_lake_stats_survive_rename" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q314-lake")
      try {
        import s.implicits._
        val d = docs(s, dir)
        val gran = lakeGranFor(d.count())
        val phys = d.select(col("doc_id").as("col_1"),
            col("n_chars").as("col_2"), col("source").as("col_3"))
          .withColumn("g", expr(s"col_1 div $gran"))
        phys.repartition(col("g"))
          .write.partitionBy("g").mode("overwrite")
          .parquet(s"$stage/data")
        // per-file stats keyed by PHYSICAL column name — the form a
        // rename cannot touch
        val stats: Map[Long, Map[String, (Long, Long)]] =
          phys.groupBy("g")
            .agg(min(col("col_1")), max(col("col_1")),
              min(col("col_2")), max(col("col_2")))
            .collect().map(r => r.getLong(0) -> Map(
              "col_1" -> ((r.getLong(1), r.getLong(2))),
              "col_2" -> ((r.getLong(3), r.getLong(4))))).toMap
        def writeMapping(v: Int, measure: String): Unit =
          Seq(("doc_id", "col_1"), (measure, "col_2"),
            ("source", "col_3"))
            .toDF("logical", "physical").coalesce(1)
            .write.mode("overwrite").parquet(s"$stage/_log/schema-v$v")
        writeMapping(0, "n_chars")
        writeMapping(1, "char_count") // the rename — stats untouched
        val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
        val keyLo = maxId / 4
        val keyHi = maxId / 2
        val measureMin = 100L
        def probe(name: String, v: Int, measure: String): DataFrame = {
          val mapping = s.read.parquet(s"$stage/_log/schema-v$v")
            .collect().map(r => r.getString(0) -> r.getString(1)).toMap
          val keyP = mapping("doc_id")
          val mP = mapping(measure)
          val afterKey = stats.filter { case (_, st) =>
            st(keyP)._1 <= keyHi && st(keyP)._2 >= keyLo }
          val afterMeasure = afterKey.filter { case (_, st) =>
            st(mP)._2 >= measureMin }
          val files = afterMeasure.keys.toSeq.sorted
            .map(g => s"$stage/data/g=$g")
          val logical = s.read.parquet(files: _*)
            .select(mapping.toSeq.sortBy(_._1)
              .map { case (l, p) => col(p).as(l) }: _*)
          logical
            .where(col("doc_id").between(keyLo, keyHi) &&
              col(measure) >= measureMin)
            .agg(count(lit(1)).as("n_rows"),
              sum(col(measure).cast("long")).as("sum_measure"),
              sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
            .select(lit(name).as("probe"), lit(v.toLong).as("version"),
              lit(stats.size.toLong).as("n_files_total"),
              lit(afterKey.size.toLong).as("n_files_after_key"),
              lit(afterMeasure.size.toLong).as("n_files_after_measure"),
              col("n_rows"), col("sum_measure"), col("key_checksum"))
        }
        val out = probe("a_pre_rename", 0, "n_chars")
          .unionByName(probe("b_post_rename", 1, "char_count"))
          .orderBy("probe")
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally rmTree(stage)
    }),

    // VACUUM × CHECKPOINT — the interaction q301 and q303 leave
    // unpriced: checkpoints REFERENCE files, so a sweep that deletes
    // a file still listed in the LIVE checkpoint (the one
    // `_last_checkpoint` points to) leaves O(1) discovery landing on
    // metadata that names missing data. The rule gated here: vacuum
    // intersects its doomed set with the live checkpoint's references
    // and REWRITES the checkpoint at the latest version first
    // (resolved through the old one — q301's incremental rule — and
    // advancing the pointer) before deleting; a sweep whose live
    // checkpoint is already clean executes directly. Two scenarios:
    // (a) checkpoint at v2, vacuum to boundary 3 (the compaction
    // swap) — every ckpt-v2 reference is doomed, so the sweep must
    // rewrite ckpt-v3 and then delete; (b) another swap lands v4 WITH
    // its cadence checkpoint, vacuum to boundary 4 — doomed = the old
    // compacted file, absent from ckpt-v4, direct execution. Both
    // scenarios end with a gated read THROUGH the (possibly
    // rewritten) checkpoint: one manifest read, content hash-exact,
    // zero doomed references. At 100 TB the check is one set
    // intersection over two manifest-sized lists per sweep.
    "q310_lake_vacuum_ckpt" -> ((s, dir) => {
      val stage = java.nio.file.Files
        .createTempDirectory("graft-q310-lake")
      try {
        stageLakeLog(s, dir, stage.toString, withCompaction = true, privateData = true)
        def ckptFiles(): Set[String] = {
          val ptr = java.nio.file.Files.readString(java.nio.file.Paths
            .get(stage.toString, "_log", "_last_checkpoint")).trim
          s.read.parquet(s"$stage/_log/ckpt-v$ptr").collect()
            .map(_.getString(1)).toSet
        }
        def allAdds(v: Int): Seq[String] = (0 to v).flatMap(i =>
          s.read.parquet(s"$stage/_log/v$i").collect()
            .collect { case r if r.getString(0) == "add" => r.getString(1) })
        def sweep(name: String, boundary: Int): DataFrame = {
          val retained = asOfFiles(s, stage.toString, boundary).toSet
          // a real sweep lists the store: doomed = on disk, below the
          // boundary's retained set (already-freed paths don't recount)
          val doomed = allAdds(boundary).filterNot(retained).distinct
            .filter(p => java.nio.file.Files.exists(
              java.nio.file.Paths.get(p)))
          val live = ckptFiles()
          val conflicted = doomed.count(live)
          val action =
            if (conflicted > 0) {
              // rewrite-then-sweep: checkpoint the latest version
              // (through the old checkpoint), advance the pointer
              writeCheckpoint(s, stage.toString, boundary)
              "rewrote_checkpoint"
            } else "executed_direct"
          doomed.foreach(p => rmTree(java.nio.file.Paths.get(p)))
          val residue = doomed.count(ckptFiles())
          val (files, nReads) = ckptResolve(s, stage.toString, boundary)
          s.read.parquet(files.map(_._1): _*)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("n_chars").cast("long")).as("sum_chars"),
              sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
            .select(lit(name).as("scenario"),
              lit(boundary.toLong).as("boundary"),
              lit(doomed.size.toLong).as("n_doomed"),
              lit(conflicted.toLong).as("n_doomed_in_live_ckpt"),
              lit(action).as("action"),
              lit(residue.toLong).as("n_doomed_in_ckpt_after"),
              lit(nReads).as("n_manifests_ckpt"),
              lit(files.size.toLong).as("n_files"),
              col("n_rows"), col("sum_chars"), col("key_checksum"))
        }
        def snap(df: DataFrame): DataFrame = {
          val rows = df.collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
        }
        // scenario a: the committer checkpointed at v2; the v3
        // compaction swap then dooms every file ckpt-v2 references
        writeCheckpoint(s, stage.toString, 2)
        val a = snap(sweep("a_rewrite_then_sweep", 3))
        // scenario b: another swap (v4) lands WITH its cadence
        // checkpoint; the doomed old compact file is absent from it
        val compact2 = s"$stage/compact2"
        s.read.parquet(s"$stage/compact").coalesce(1)
          .write.mode("overwrite").parquet(compact2)
        val mm = s.read.parquet(compact2)
          .agg(min(col("doc_id")), max(col("doc_id"))).head()
        require(tryCommit(s, stage.toString, 4,
          Seq(("remove", s"$stage/compact", -1L, -1L),
            ("add", compact2, mm.getLong(0), mm.getLong(1)))))
        writeCheckpoint(s, stage.toString, 4)
        val b = snap(sweep("b_direct", 4))
        a.unionByName(b).orderBy("scenario")
      } finally rmTree(stage)
    }))

  /** q301's checkpointed snapshot resolution: newest checkpoint ≤ v —
    * discovered O(1) through the `_last_checkpoint` pointer when it
    * helps (Delta's device), walking back version probes only when
    * the pointer is ahead of the requested as-of (time travel BEFORE
    * the newest checkpoint) — then the manifest TAIL only. Returns
    * the active (path, min, max) entries and the number of manifest
    * files actually read (the gate's growth-vs-constant evidence).
    * Falls back to the full fold when no checkpoint exists yet.
    */
  /** Write the checkpoint of version `v` (the RESOLVED active set
    * with stats, itself resolved through the previous checkpoint so
    * checkpointing never re-folds the whole log) and advance the
    * `_last_checkpoint` pointer — the committer-cadence step q301
    * gates, shared by q308's staging and q310's rewrite-then-sweep.
    */
  private def writeCheckpoint(s: SparkSession, stage: String, v: Int): Unit = {
    import s.implicits._
    val (active, _) = ckptResolve(s, stage, v)
    active.map { case (p, mn, mx) => ("add", p, mn, mx) }
      .toDF("action", "path", "min_id", "max_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/_log/ckpt-v$v")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(stage, "_log", "_last_checkpoint"),
      v.toString)
  }

  private[graft] def ckptResolve(s: SparkSession, stage: String, v: Int)
      : (Seq[(String, Long, Long)], Long) = {
    val lastPtr = java.nio.file.Paths.get(stage, "_log", "_last_checkpoint")
    val pointed =
      if (java.nio.file.Files.exists(lastPtr))
        Some(java.nio.file.Files.readString(lastPtr).trim.toInt)
          .filter(_ <= v)
      else None
    val ckpt = pointed.orElse(
      (v to 0 by -1).find(c => java.nio.file.Files.exists(
        java.nio.file.Paths.get(stage, "_log", s"ckpt-v$c"))))
    val base: Seq[(String, Long, Long)] = ckpt.toSeq.flatMap(c =>
      s.read.parquet(s"$stage/_log/ckpt-v$c").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3))))
    val lo = ckpt.map(_ + 1).getOrElse(0)
    // ORDER-AWARE log replay (Delta's semantic): each version's
    // removes apply before its adds, and a LATER add revives a path
    // an earlier version removed — the fold RESTORE (q326) depends
    // on. For logs that never re-add a removed path (every other
    // gate's staging convention) this resolves identically to the
    // old order-blind set fold.
    val active = scala.collection.mutable.LinkedHashMap.empty[
      String, (Long, Long)]
    base.foreach { case (p, mn, mx) => active(p) = (mn, mx) }
    (lo to v).foreach { i =>
      val entries = s.read.parquet(s"$stage/_log/v$i").collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3)))
      entries.foreach { case (a, p, _, _) =>
        if (a == "remove") active.remove(p) }
      entries.foreach { case (a, p, mn, mx) =>
        if (a == "add") active(p) = (mn, mx) }
    }
    (active.toSeq.map { case (p, (mn, mx)) => (p, mn, mx) },
      (v - lo + 1).toLong + ckpt.size.toLong)
  }

  /** q274/q275 file granule floor: docs per staged lake file at the
    * gate SFs. Above ~5000 docs the granule grows with the corpus
    * ([[lakeGranFor]]) so the staged FILE COUNT stays ~50 per table —
    * real lakes size files in GBs for exactly this reason: the
    * manifest fold and the driver's file listing must grow
    * sublinearly with data. (A fixed granule made the sf1 staging
    * list 5000 directories per read — measured 13-26× at 10× data;
    * bounded-count granules restore ~linear.) Both engines derive the
    * same granule: max(100, n_docs div 50).
    */
  private val lakeGran = 100L
  private def lakeGranFor(nDocs: Long): Long =
    math.max(lakeGran, nDocs / 50L)

  /** The granule as a DuckDB scalar subquery — the oracle's twin of
    * [[lakeGranFor]].
    */
  private val sqlLakeG =
    s"(SELECT GREATEST($lakeGran, COUNT(*) // 50) FROM documents)"

  /** q279 pruned-read key range: at the gate SFs (granule 100) it
    * overlaps exactly the g=1 and g=2 base+delta files (f0r's [0, 98]
    * and g ≥ 3 are stats-excluded), so the prune is non-trivial in
    * both directions; at larger granules the oracle reconstructs the
    * same overlap rule, whatever files it selects.
    */
  private val lakePruneLo = 150L
  private val lakePruneHi = 249L

  /** The staged v2 logical content, as a predicate both engines
    * share: v2 = everything except the odd ids the copy-on-write
    * delete dropped from the g=0 base file.
    */
  private[graft] val sqlLakeV2Pred =
    s"NOT (doc_id // $sqlLakeG = 0 AND doc_id % 3 <> 2 AND doc_id % 2 = 1)"

  /** Stage the delta-log fixture for one gate. The staged content is
    * deterministic per (corpus, granule, convention), so the DATA
    * FILES are staged ONCE per host into an immutable memoized MASTER
    * (the q307 structFixtureDir device — deterministic /tmp key,
    * atomic publish) and each gate receives only a copy of the
    * manifest log `_log/` (KBs) into its own stage dir: gates append
    * commits, write checkpoints, or delete manifests in their private
    * log while reading the shared master's data files. Gates that
    * DELETE OR REWRITE DATA FILES (vacuum-exec q291, forget q298,
    * retention-sweep q303, vacuum×checkpoint q310) pass
    * `privateData = true` and stage their own full copy — mutating
    * the shared master would corrupt every other gate. Returns the
    * DATA ROOT (master or the private stage): path-constructing
    * writers (q290/q297's f0r remove entries) must name files as the
    * manifests do. Before memoization the 17 per-gate stagings were
    * ≈19% of the full-suite bench.
    */
  private[graft] def stageLakeLog(s: SparkSession, dir: String,
      stage: String, withCompaction: Boolean,
      privateData: Boolean = false): String =
    if (privateData) {
      // Private-data gates (vacuum-exec, forget, retention-sweep,
      // vacuum×checkpoint, ...) used to re-derive the whole fixture
      // with a dozen Spark jobs per invocation. The memoized master
      // holds byte-identical content (same deterministic pipeline), so
      // a filesystem copy + manifest path rewrite produces the same
      // private stage for the cost of copying ~1 MB — only the
      // manifest rewrite (KB-scale, one tiny job per version) touches
      // Spark. Measured ~2-4 s saved per private gate at sf0.1.
      val master = lakeMasterDir(s, dir, withCompaction)
      graft.util.FileUtils.copyRecursively(
        master, java.nio.file.Paths.get(stage))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(stage, "_staged_ok"))
      rewriteManifestPaths(s, java.nio.file.Paths.get(stage, "_log"),
        master.toString, stage)
      stage
    } else {
      val master = lakeMasterDir(s, dir, withCompaction)
      graft.util.FileUtils.copyRecursively(
        master.resolve("_log"), java.nio.file.Paths.get(stage, "_log"))
      master.toString
    }

  /** The memoized master: staged once under a deterministic /tmp key,
    * manifests rewritten to the final root, published atomically (a
    * concurrent stager losing the rename discards its copy).
    *
    * Cleanup policy (round-17 ADVICE): masters accumulate per
    * (corpus, granule, convention) key, content-addressed and
    * immutable — a host reclaims space by deleting any `graft-lake-*`
    * /tmp entry (the `_staged_ok` check below restages on next use
    * and fails loudly if cleaned MID-run). No in-process age-out: a
    * concurrent Verify/Bench may be mid-read on a sibling master.
    */
  private[graft] def lakeMasterDir(s: SparkSession, dir: String,
      withCompaction: Boolean): java.nio.file.Path = {
    val n = docs(s, dir).count()
    val gran = lakeGranFor(n)
    val conv = if (withCompaction) "c" else "p"
    // key on the SANITIZED FULL corpus path, not its hashCode: two
    // corpus dirs with equal (n, gran) and colliding hashCodes would
    // silently share one master's data files (round-17 ADVICE); the
    // sanitized absolute path collides only with itself
    val safeDir = java.nio.file.Paths.get(dir).toAbsolutePath.toString
      .replaceAll("[^A-Za-z0-9._-]", "-")
    val root = java.nio.file.Paths.get("/tmp",
      s"graft-lake-$n-$gran-$conv-$safeDir")
    val ok = root.resolve("_staged_ok")
    if (!java.nio.file.Files.exists(ok)) {
      // a root WITHOUT the marker is torn (a tmp cleaner removed the
      // marker or a stager died mid-publish): rebuild it rather than
      // serve partial data files
      if (java.nio.file.Files.exists(root)) rmTree(root)
      val tmp = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/tmp"), "graft-lake-stage")
      stageLakeLogInto(s, dir, tmp.toString, withCompaction)
      // the manifests were written naming tmp paths; the published
      // master must name its own root
      rewriteManifestPaths(s, tmp.resolve("_log"),
        tmp.toString, root.toString)
      java.nio.file.Files.writeString(tmp.resolve("_staged_ok"), "ok")
      try java.nio.file.Files.move(tmp, root,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileSystemException
            if java.nio.file.Files.exists(root) =>
          rmTree(tmp)
      }
    }
    // fail loudly (not with a downstream read error) if /tmp was
    // cleaned between staging and this use
    require(java.nio.file.Files.exists(ok),
      s"lake master $root invalid: _staged_ok missing (tmp cleaned?)")
    root
  }

  private def rewriteManifestPaths(s: SparkSession,
      logDir: java.nio.file.Path, from: String, to: String): Unit =
    graft.util.FileUtils.listDir(logDir)
      .filter(_.getFileName.toString.startsWith("v"))
      .foreach { mdir =>
        val side = mdir.resolveSibling(mdir.getFileName.toString + ".rw")
        s.read.parquet(mdir.toString)
          .withColumn("path", expr(s"replace(path, '$from', '$to')"))
          .coalesce(1).write.mode("overwrite").parquet(side.toString)
        rmTree(mdir)
        java.nio.file.Files.move(side, mdir)
      }

  /** The actual staging: granule-sized parquet files derived from
    * `documents` plus one manifest per version under `_log/` (rows:
    * action ∈ add|remove, path). v0: initial load = docs with
    * doc_id % 3 ≠ 2, one file per granule. v1: the % 3 = 2 delta,
    * new files only. v2: copy-on-write delete — remove base g=0, add
    * its even-id rewrite. v3 (optional): compaction — remove all
    * v2-active files, add ONE compacted file holding the SAME rows.
    * File writes are data-scale (once, like any ingest); every
    * manifest is O(files), never O(rows).
    */
  private def stageLakeLogInto(s: SparkSession, dir: String, stage: String,
      withCompaction: Boolean): Unit = {
    val gran = lakeGranFor(docs(s, dir).count())
    val d = docs(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr(s"doc_id div $gran").as("g"))
    val v0 = d.where(col("doc_id") % 3 =!= 2)
    val delta = d.where(col("doc_id") % 3 === 2)
    // repartition on the granule key so each g directory is written
    // by ONE task (one file per granule): without it every task owning
    // rows of a granule emits its own part-file — 32 × #granules tiny
    // files whose open/close overhead made the staging superlinear at
    // 10× (measured 12-24×; ~linear after)
    v0.repartition(col("g"))
      .write.partitionBy("g").mode("overwrite").parquet(s"$stage/base")
    delta.repartition(col("g"))
      .write.partitionBy("g").mode("overwrite").parquet(s"$stage/delta")
    val f0r = v0.where(col("g") === 0 && col("doc_id") % 2 === 0)
    f0r.drop("g")
      .coalesce(1).write.mode("overwrite").parquet(s"$stage/f0r")
    import s.implicits._
    // per-file (min, max) doc_id — the stats a delta-log manifest
    // records at write time so readers can prune files by predicate
    // without opening them (q279); one metadata-sized agg per commit
    def keyStats(df: DataFrame): Map[Long, (Long, Long)] =
      df.groupBy("g").agg(min(col("doc_id")), max(col("doc_id")))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val v0st = keyStats(v0)
    val dst = keyStats(delta)
    val v0gs = v0st.keys.toSeq.sorted
    val dgs = dst.keys.toSeq.sorted
    // remove entries carry no stats (only adds are ever pruned) — the
    // -1 sentinel keeps the manifest schema flat
    def writeLog(v: Int, rows: Seq[(String, String, Long, Long)]): Unit =
      rows.toDF("action", "path", "min_id", "max_id")
        .withColumn("commit_ts", lit(commitTsOf(v)))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/_log/v$v")
    def rm(p: String) = (("remove", p, -1L, -1L))
    writeLog(0, v0gs.map(g =>
      ("add", s"$stage/base/g=$g", v0st(g)._1, v0st(g)._2)))
    writeLog(1, dgs.map(g =>
      ("add", s"$stage/delta/g=$g", dst(g)._1, dst(g)._2)))
    val f0rMm = f0r.agg(min(col("doc_id")), max(col("doc_id"))).head()
    writeLog(2, Seq(rm(s"$stage/base/g=0"),
      ("add", s"$stage/f0r", f0rMm.getLong(0), f0rMm.getLong(1))))
    if (withCompaction) {
      val active = asOfFiles(s, stage, 2)
      s.read.parquet(active: _*).coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/compact")
      val cMm = s.read.parquet(s"$stage/compact")
        .agg(min(col("doc_id")), max(col("doc_id"))).head()
      writeLog(3, active.map(rm) :+
        (("add", s"$stage/compact", cMm.getLong(0), cMm.getLong(1))))
    }
  }

  /** q290's manifest CAS: put-if-absent of the version manifest via an
    * ATOMIC RENAME of a staged directory onto `_log/v<v>` — what
    * Delta's LogStore does with put-if-absent on `<v>.json`. The
    * rename either installs the whole manifest or fails because the
    * version exists; readers never see a partial manifest. The staged
    * write re-runs per attempt (a rebase re-writes its manifest).
    */
  private def tryCommit(s: SparkSession, stage: String, v: Int,
      entries: Seq[(String, String, Long, Long)]): Boolean = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(stage), s"commit-v$v-")
    try {
      val staged = tmp.resolve("m")
      entries.toDF("action", "path", "min_id", "max_id")
        .withColumn("commit_ts", lit(commitTsOf(v)))
        .coalesce(1)
        .write.mode("overwrite").parquet(staged.toString)
      val target = java.nio.file.Paths.get(stage, "_log", s"v$v")
      if (java.nio.file.Files.exists(target)) false
      else
        try {
          java.nio.file.Files.move(staged, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        } catch {
          // lost the race to a concurrent rename — the CAS failure
          case _: java.nio.file.FileSystemException
              if java.nio.file.Files.exists(target) => false
        }
    } finally rmTree(tmp)
  }

  /** One writer's optimistic commit loop, prepared at snapshot `snap`:
    * try the CAS at successive versions; on losing, read ONLY the
    * winning commit's manifest and rebase when footprints are
    * disjoint (no file this writer removes was removed by the winner
    * — appends never conflict), abort when they overlap (both removed
    * the same file: retrying would silently undo the winner's
    * rewrite). Returns (outcome, version | -1, attempts). Conflict
    * analysis cost ∝ manifests committed since the snapshot — never
    * table data.
    */
  private def commitLoop(s: SparkSession, stage: String, snap: Int,
      entries: Seq[(String, String, Long, Long)],
      readRange: Option[(Long, Long)] = None): (String, Long, Long) = {
    val myRemoves =
      entries.collect { case ("remove", p, _, _) => p }.toSet
    var v = snap + 1
    var attempts = 0L
    var res: Option[(String, Long, Long)] = None
    while (res.isEmpty) {
      attempts += 1
      if (tryCommit(s, stage, v, entries))
        res = Some(("committed", v.toLong, attempts))
      else {
        val winner = s.read.parquet(s"$stage/_log/v$v").collect()
          .map(r => (r.getString(0), r.getString(1),
            r.getLong(2), r.getLong(3)))
        val winnerRemoves =
          winner.collect { case ("remove", p, _, _) => p }.toSet
        // write-write conflict (both isolation levels): a file this
        // writer removes was already removed
        val writeConflict = (myRemoves & winnerRemoves).nonEmpty
        // read-write conflict (SERIALIZABLE only, via readRange —
        // q297): the winner changed rows in the key range this
        // writer's rewrite was computed from, so the rewrite derives
        // from a stale read. Adds are tested against their manifest
        // [min, max] stats (metadata scale); a remove carrying the
        // -1 sentinels has its [min, max] RESOLVED from the removed
        // file's original add entry (exactly Delta's rule — the add
        // that introduced a file always carries its stats), so
        // compaction/forget traffic only aborts rebases whose read
        // range it actually touched. Only a genuinely stat-less
        // file (no add entry anywhere in the log — impossible for a
        // well-formed manifest chain) stays a conservative conflict.
        // Resolution cost ∝ manifests ≤ v — metadata, never data —
        // and is paid only when a sentinel remove appears.
        lazy val addStatsByPath: Map[String, (Long, Long)] =
          (0 until v).flatMap(i =>
            s.read.parquet(s"$stage/_log/v$i").collect()
              .collect { case r if r.getString(0) == "add" =>
                r.getString(1) -> ((r.getLong(2), r.getLong(3))) })
            .toMap ++
            winner.collect { case ("add", p, mn, mx) => p -> ((mn, mx)) }
        val readConflict = readRange.exists { case (lo, hi) =>
          winner.exists {
            case ("add", _, mn, mx) => mn <= hi && mx >= lo
            case ("remove", p, mn, mx) =>
              val (rmn, rmx) =
                if (mn >= 0) (mn, mx)
                else addStatsByPath.getOrElse(p, (-1L, -1L))
              rmn < 0 || (rmn <= hi && rmx >= lo)
            case _ => false
          }
        }
        if (writeConflict || readConflict)
          res = Some(("aborted", -1L, attempts))
        else v += 1
      }
    }
    res.get
  }

  /** The as-of(v) resolution — the SHARED snapshot path every lake
    * gate goes through: delegate to [[ckptResolve]], which jumps to
    * the newest checkpoint ≤ v via `_last_checkpoint` when one exists
    * (O(1 + v mod cadence) manifest reads however old the table) and
    * falls back to the full v0..v delta-log fold otherwise. Pure
    * metadata work (the manifests are O(files)); the driver-side fold
    * is exactly where a lake's snapshot resolution runs. Both paths
    * replay the log ORDER-AWARE (a later add revives an earlier
    * remove — RESTORE's semantic, q326); staged rewrites and
    * compactions still mint fresh paths, so for them replay order is
    * immaterial.
    */
  private[graft] def asOfFiles(
      s: SparkSession, stage: String, v: Int): Seq[String] =
    ckptResolve(s, stage, v)._1.map(_._1)

  /** The reference full fold — v0..v, no checkpoint shortcut. Kept as
    * an explicitly separate implementation so q301's
    * `ckpt_matches_fold` proof compares the checkpoint path against
    * an INDEPENDENT resolution (after [[asOfFiles]] adopted
    * [[ckptResolve]], comparing them would be a self-comparison).
    */
  private def fullFoldFiles(
      s: SparkSession, stage: String, v: Int): Seq[String] = {
    val active = scala.collection.mutable.LinkedHashSet.empty[String]
    (0 to v).foreach { i =>
      val entries = s.read.parquet(s"$stage/_log/v$i").collect()
        .map(r => (r.getString(0), r.getString(1)))
      entries.foreach { case (a, p) => if (a == "remove") active -= p }
      entries.foreach { case (a, p) => if (a == "add") active += p }
    }
    active.toSeq
  }

  /** One version's gated rollup over its RESOLVED file set: row
    * count, char sum, and the q267 key checksum (the per-version
    * integrity artifact), plus the active file count.
    */
  private def lakeRollup(
      s: SparkSession, stage: String, v: Int): DataFrame = {
    val files = asOfFiles(s, stage, v)
    s.read.parquet(files: _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        sum(expr(manifestTerm("doc_id"))).as("key_checksum"))
      .select(lit(v.toLong).as("version"),
        lit(files.length.toLong).as("n_files"),
        col("n_rows"), col("sum_chars"), col("key_checksum"))
  }

  private def rmTree(p: java.nio.file.Path): Unit =
    graft.util.FileUtils.deleteRecursively(p)

  /** One version row of the q274/q275 oracle: the version's logical
    * content CASE-reconstructed from the staging rules, rolled up
    * with the same stats as [[lakeRollup]].
    */
  private def sqlLakeRow(v: Int, pred: String, nFiles: String): String =
    s"""SELECT CAST($v AS BIGINT) AS version,
       |  CAST(($nFiles) AS BIGINT) AS n_files,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
       |FROM documents WHERE $pred""".stripMargin

  private val sqlLakeF0 =
    s"SELECT COUNT(DISTINCT doc_id // $sqlLakeG) FROM documents " +
      "WHERE doc_id % 3 <> 2"
  private val sqlLakeFd =
    s"SELECT COUNT(DISTINCT doc_id // $sqlLakeG) FROM documents " +
      "WHERE doc_id % 3 = 2"

  def oracle: Map[String, String] = Map(
    "q274_lake_time_travel" ->
      s"""SELECT * FROM (
         |${sqlLakeRow(0, "doc_id % 3 <> 2", s"($sqlLakeF0)")}
         |UNION ALL
         |${sqlLakeRow(1, "TRUE", s"($sqlLakeF0) + ($sqlLakeFd)")}
         |UNION ALL
         |${sqlLakeRow(2, sqlLakeV2Pred, s"($sqlLakeF0) + ($sqlLakeFd)")}
         |) ORDER BY version""".stripMargin,
    // v3's content IS v2's (the metadata swap); only n_files drops,
    // to the single compacted file
    "q275_lake_compaction_swap" ->
      s"""SELECT * FROM (
         |${sqlLakeRow(2, sqlLakeV2Pred, s"($sqlLakeF0) + ($sqlLakeFd)")}
         |UNION ALL
         |${sqlLakeRow(3, sqlLakeV2Pred, "1")}
         |) ORDER BY version""".stripMargin,
    // boundary 2 (v2 and v3 retained): only the copy-on-write-replaced
    // base g=0 file frees; boundary 3 (latest only): every
    // pre-compaction file frees — all of base and delta plus the g=0
    // rewrite, whose physical rows the inner UNION ALL double-counts
    // exactly as the files duplicate them on disk
    "q278_lake_vacuum" ->
      s"""SELECT * FROM (
         |SELECT CAST(2 AS BIGINT) AS boundary, CAST(1 AS BIGINT) AS n_deletable,
         |  CAST(COUNT(*) AS BIGINT) AS reclaim_rows,
         |  CAST(SUM(n_chars) AS BIGINT) AS reclaim_chars
         |FROM documents WHERE doc_id // $sqlLakeG = 0 AND doc_id % 3 <> 2
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), ($sqlLakeF0) + ($sqlLakeFd) + 1,
         |  CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
         |FROM (SELECT n_chars FROM documents
         |      UNION ALL
         |      SELECT n_chars FROM documents
         |      WHERE doc_id // $sqlLakeG = 0 AND doc_id % 3 <> 2
         |        AND doc_id % 2 = 0)
         |) ORDER BY boundary""".stripMargin,
    // v0→v2: inserts = the delta batch (the CoW rewrite's carried
    // rows net out by key), deletes = the odd g=0 ids the rewrite
    // dropped; v2→v3: compaction is invisible to a CDF consumer —
    // zero changes both directions
    "q284_lake_change_feed" -> {
      def row(w: Int, v: Int, ct: String, pred: String) =
        s"""SELECT CAST($w AS BIGINT) AS from_version,
           |  CAST($v AS BIGINT) AS to_version, '$ct' AS change_type,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
           |  CAST(COALESCE(SUM(${manifestTerm("doc_id")}), 0) AS BIGINT)
           |    AS key_checksum
           |FROM documents WHERE $pred""".stripMargin
      s"""SELECT * FROM (
         |${row(0, 2, "insert", "doc_id % 3 = 2")}
         |UNION ALL
         |${row(0, 2, "delete",
          s"doc_id // $sqlLakeG = 0 AND doc_id % 3 <> 2 AND doc_id % 2 = 1")}
         |UNION ALL
         |${row(2, 3, "insert", "FALSE")}
         |UNION ALL
         |${row(2, 3, "delete", "FALSE")}
         |) ORDER BY from_version, change_type""".stripMargin
    },
    // both strategies must read the SAME v2 content — the oracle is
    // the same rollup twice; only n_files differs by construction
    // (CoW: base sans g=0 + delta + the rewrite; MoR: all base +
    // delta, vector excluded at read time)
    "q285_lake_deletion_vectors" -> {
      def row(strategy: String, nFiles: String) =
        s"""SELECT '$strategy' AS strategy,
           |  CAST(($nFiles) AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM documents WHERE $sqlLakeV2Pred""".stripMargin
      s"""SELECT * FROM (
         |${row("cow", s"($sqlLakeF0) + ($sqlLakeFd)")}
         |UNION ALL
         |${row("mor", s"($sqlLakeF0) + ($sqlLakeFd)")}
         |) ORDER BY strategy""".stripMargin
    },
    // the serialized outcome reconstructed from the staging rules:
    // v3 = v2 + A's append, v4 = v3 + B's append, v5 = v4 with the
    // f0r rows D's rewrite dropped (% 5 = 0) removed; E contributes
    // nothing (aborted). Physical-row multiset semantics throughout —
    // appended duplicates double-count exactly as the files do.
    "q290_lake_concurrent_commit" -> {
      val g0even =
        s"doc_id // $sqlLakeG = 0 AND doc_id % 3 <> 2 AND doc_id % 2 = 0"
      def row(w: String, v: Int, attempts: Int, nFiles: String,
          body: String) =
        s"""SELECT '$w' AS writer, 'committed' AS outcome,
           |  CAST($v AS BIGINT) AS version,
           |  CAST($attempts AS BIGINT) AS n_attempts,
           |  CAST(($nFiles) AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM ($body)""".stripMargin
      def sel(pred: String) =
        s"SELECT doc_id, n_chars FROM documents WHERE $pred"
      val act = s"($sqlLakeF0) + ($sqlLakeFd)"
      s"""SELECT * FROM (
         |${row("A", 3, 1, s"$act + 1",
          s"${sel(sqlLakeV2Pred)} UNION ALL ${sel("doc_id % 7 = 0")}")}
         |UNION ALL
         |${row("B", 4, 2, s"$act + 2",
          s"${sel(sqlLakeV2Pred)} UNION ALL ${sel("doc_id % 7 = 0")}" +
            s" UNION ALL ${sel("doc_id % 7 = 3")}")}
         |UNION ALL
         |${row("D", 5, 3, s"$act + 2",
          s"${sel(s"$sqlLakeV2Pred AND NOT ($g0even AND doc_id % 5 = 0)")}" +
            s" UNION ALL ${sel("doc_id % 7 = 0")}" +
            s" UNION ALL ${sel("doc_id % 7 = 3")}")}
         |UNION ALL
         |SELECT 'E', 'aborted', CAST(-1 AS BIGINT), CAST(3 AS BIGINT),
         |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         |  CAST(0 AS BIGINT)
         |) ORDER BY writer""".stripMargin
    },
    // the serialized outcomes: the append wins v3; the
    // WriteSerializable rewrite rebases past it to v4 (content = v2
    // with the f0r rows its rewrite dropped removed, plus the append);
    // the Serializable rewrite aborts on its first conflict check
    // (the append's stats overlap its read range)
    "q297_lake_isolation_levels" -> {
      val g0even =
        s"doc_id // $sqlLakeG = 0 AND doc_id % 3 <> 2 AND doc_id % 2 = 0"
      def row(mode: String, v: Int, attempts: Int, nFiles: String,
          body: String) =
        s"""SELECT '$mode' AS mode, 'committed' AS outcome,
           |  CAST($v AS BIGINT) AS version,
           |  CAST($attempts AS BIGINT) AS n_attempts,
           |  CAST(($nFiles) AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM ($body)""".stripMargin
      def sel(pred: String) =
        s"SELECT doc_id, n_chars FROM documents WHERE $pred"
      val act = s"($sqlLakeF0) + ($sqlLakeFd)"
      s"""SELECT * FROM (
         |${row("append_winner", 3, 1, s"$act + 1",
          s"${sel(sqlLakeV2Pred)} UNION ALL ${sel("doc_id % 7 = 0")}")}
         |UNION ALL
         |${row("rewrite_write_serializable", 4, 2, s"$act + 1",
          s"${sel(s"$sqlLakeV2Pred AND NOT ($g0even AND doc_id % 5 = 0)")}" +
            s" UNION ALL ${sel("doc_id % 7 = 0")}")}
         |UNION ALL
         |SELECT 'rewrite_serializable', 'aborted', CAST(-1 AS BIGINT),
         |  CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         |  CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |) ORDER BY mode""".stripMargin
    },
    // the three probe versions reconstructed from the staging rules:
    // v2 = the CoW content, v5/v8 add the committed residue slices
    // (multiset semantics); the manifest counts are structural — the
    // full fold grows with the version, the checkpoint path reads
    // exactly 3 manifests at every probe (1 checkpoint + <=2 tail, or
    // the v0-v2 fold before any checkpoint exists)
    "q301_lake_checkpoint" -> {
      def row(v: Int, nFull: Int, nCkpt: Int, nFiles: String,
          body: String) =
        s"""SELECT CAST($v AS BIGINT) AS version,
           |  CAST($nFull AS BIGINT) AS n_manifests_full,
           |  CAST($nCkpt AS BIGINT) AS n_manifests_ckpt,
           |  TRUE AS ckpt_matches_fold,
           |  CAST(($nFiles) AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM ($body)""".stripMargin
      def sel(pred: String) =
        s"SELECT doc_id, n_chars FROM documents WHERE $pred"
      val act = s"($sqlLakeF0) + ($sqlLakeFd)"
      s"""SELECT * FROM (
         |${row(2, 3, 3, act, sel(sqlLakeV2Pred))}
         |UNION ALL
         |${row(5, 6, 3, s"$act + 3",
          s"${sel(sqlLakeV2Pred)} UNION ALL ${sel("doc_id % 7 <= 2")}")}
         |UNION ALL
         |${row(8, 9, 3, s"$act + 6",
          s"${sel(sqlLakeV2Pred)} UNION ALL ${sel("doc_id % 7 <= 5")}")}
         |) ORDER BY version""".stripMargin
    },
    // cells, three stat pairs, and every overlap rule reconstructed
    // from the clustering rules; string MIN/MAX comparisons are the
    // same code-unit order in both engines, so the lexicographic
    // false positive (group 0's [src0, src4] containing 'src12')
    // reproduces exactly
    "q302_lake_column_skip" -> {
      val kg = s"(2 * $sqlLakeG)"
      s"""WITH b AS (SELECT MAX(doc_id) // 4 AS lo, MAX(doc_id) // 2 AS hi
         |    FROM documents),
         |cells AS (SELECT (doc_id % 20) // 5 AS sg, doc_id // $kg AS kb,
         |    MIN(doc_id) AS mn, MAX(doc_id) AS mx,
         |    MIN(source) AS msrc, MAX(source) AS xsrc,
         |    MAX(n_chars) AS xch
         |  FROM documents GROUP BY 1, 2),
         |kk AS (SELECT cells.* FROM cells, b WHERE mn <= hi AND mx >= lo),
         |sk AS (SELECT * FROM kk
         |  WHERE msrc <= 'src12' AND xsrc >= 'src12'),
         |ck AS (SELECT * FROM sk WHERE xch >= 100),
         |m AS (SELECT doc_id, n_chars FROM documents, b
         |  WHERE source = 'src12' AND doc_id BETWEEN lo AND hi
         |    AND n_chars >= 100),
         |contrib AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM
         |  (SELECT DISTINCT (doc_id % 20) // 5, doc_id // $kg FROM m))
         |SELECT * FROM (
         |SELECT 'a_all_files' AS stage,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS n_files,
         |  CAST(0 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS sum_chars,
         |  CAST(0 AS BIGINT) AS key_checksum
         |UNION ALL
         |SELECT 'b_key_pruned', (SELECT CAST(COUNT(*) AS BIGINT) FROM kk),
         |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |UNION ALL
         |SELECT 'c_source_pruned',
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sk),
         |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |UNION ALL
         |SELECT 'd_chars_pruned', (SELECT CAST(COUNT(*) AS BIGINT) FROM ck),
         |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |UNION ALL
         |SELECT 'e_read', (SELECT CAST(COUNT(*) AS BIGINT) FROM ck),
         |  CAST(COUNT(*) AS BIGINT),
         |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
         |  CAST(COALESCE(SUM(${manifestTerm("doc_id")}), 0) AS BIGINT)
         |FROM m
         |UNION ALL
         |SELECT 'f_false_positive_files',
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ck) - (SELECT c FROM contrib),
         |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |) ORDER BY stage""".stripMargin
    },
    // both readers see the v2 content (compaction is a metadata
    // swap); the counts are structural: boundary 3 dooms every
    // pre-compaction file (F0 + Fd + 1, q278's boundary-3 row), all
    // F0 + Fd of the v2 reader's files conflict, none of the v3
    // reader's single compacted file does
    "q303_lake_vacuum_retention" -> {
      val act = s"($sqlLakeF0) + ($sqlLakeFd)"
      def row(name: String, readerV: Int, nConf: String, outcome: String,
          nFiles: String) =
        s"""SELECT '$name' AS scenario, CAST(3 AS BIGINT) AS boundary,
           |  CAST($readerV AS BIGINT) AS reader_version,
           |  CAST(($act) + 1 AS BIGINT) AS n_doomed,
           |  CAST(($nConf) AS BIGINT) AS n_conflicts,
           |  '$outcome' AS outcome,
           |  CAST(($nFiles) AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM documents WHERE $sqlLakeV2Pred""".stripMargin
      s"""SELECT * FROM (
         |${row("a_reader_v2", 2, act, "refused", act)}
         |UNION ALL
         |${row("b_reader_v3", 3, "0", "executed", "1")}
         |) ORDER BY scenario""".stripMargin
    },
    // ts resolution floors to the newest commit at-or-before the
    // probe: b lands ON v1 (all docs, many files), c between v2 and
    // v3 resolves v2 (the CoW content), d after the last resolves the
    // compaction swap — same content as c, ONE file, and exactly one
    // manifest read (the checkpoint); a precedes every commit and is
    // the explicit error row
    "q308_lake_time_travel_ts" -> {
      val act = s"($sqlLakeF0) + ($sqlLakeFd)"
      def row(name: String, ts: Long, v: Int, nCkpt: Int,
          nFiles: String, pred: String) =
        s"""SELECT '$name' AS probe, CAST($ts AS BIGINT) AS probe_ts,
           |  CAST($v AS BIGINT) AS version, 'resolved' AS outcome,
           |  CAST($nCkpt AS BIGINT) AS n_manifests_ckpt,
           |  CAST(($nFiles) AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM documents WHERE $pred""".stripMargin
      s"""SELECT * FROM (
         |SELECT 'a_before_first' AS probe,
         |  CAST(${commitTsOf(0) - 1L} AS BIGINT) AS probe_ts,
         |  CAST(-1 AS BIGINT) AS version,
         |  'no_snapshot_at_ts' AS outcome,
         |  CAST(0 AS BIGINT) AS n_manifests_ckpt,
         |  CAST(0 AS BIGINT) AS n_files, CAST(0 AS BIGINT) AS n_rows,
         |  CAST(0 AS BIGINT) AS sum_chars,
         |  CAST(0 AS BIGINT) AS key_checksum
         |UNION ALL
         |${row("b_exact_v1", commitTsOf(1), 1, 2, act, "TRUE")}
         |UNION ALL
         |${row("c_between_v2_v3", commitTsOf(3) - 1L, 2, 3, act,
             sqlLakeV2Pred)}
         |UNION ALL
         |${row("d_after_last", commitTsOf(3) + 86400000L, 3, 1, "1",
             sqlLakeV2Pred)}
         |) ORDER BY probe""".stripMargin
    },
    // the bloom reconstruction: same granule layout, same polynomial
    // hash, same two Kirsch-Mitzenmacher probe bits, same per-file
    // bit_or fold — so the SKIP DECISIONS (which files pass, which
    // pass falsely) must agree file for file, not just the counts
    "q309_lake_bloom_skip" -> {
      val p = graft.functions.TextFunctions.P
      val sqlPoly = graft.functions.TextFunctions.sqlPolyHash _
      s"""WITH gp AS (SELECT GREATEST(100, COUNT(*) // 50) AS g,
         |    LEAST(65536, GREATEST(4, GREATEST(100, COUNT(*) // 50) // 8))
         |      * 64 AS mbits FROM documents),
         |u AS (SELECT doc_id, doc_id // gp.g AS fg,
         |    'doc://' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
         |    n_chars FROM documents, gp),
         |hx AS (SELECT fg, ${sqlPoly("url")} AS h1 FROM u),
         |h2x AS (SELECT fg, h1, (h1 * h1 + $manifestA) % $p AS h2 FROM hx),
         |pos AS (SELECT fg, (h1 + 1 * h2) % gp.mbits AS bp
         |    FROM h2x, gp
         |  UNION ALL
         |  SELECT fg, (h1 + 2 * h2) % gp.mbits FROM h2x, gp),
         |bloom AS (SELECT fg, bp // 63 AS w,
         |    BIT_OR(1::BIGINT << CAST(bp % 63 AS INT)) AS mask
         |  FROM pos GROUP BY 1, 2),
         |pr AS (
         |  SELECT 'a_hit_mid' AS probe, (SELECT url FROM u WHERE doc_id =
         |    (SELECT MAX(doc_id) // 2 FROM documents)) AS purl
         |  UNION ALL
         |  SELECT 'b_hit_low', (SELECT url FROM u WHERE doc_id =
         |    (SELECT MAX(doc_id) // 5 FROM documents))
         |  UNION ALL
         |  SELECT 'c_miss', 'doc://void/424242'),
         |ph AS (SELECT probe, purl, ${sqlPoly("purl")} AS h1 FROM pr),
         |ph2 AS (SELECT probe, purl, h1,
         |    (h1 * h1 + $manifestA) % $p AS h2 FROM ph),
         |pbits AS (SELECT DISTINCT probe, bp FROM (
         |  SELECT probe, (h1 + 1 * h2) % gp.mbits AS bp FROM ph2, gp
         |  UNION ALL
         |  SELECT probe, (h1 + 2 * h2) % gp.mbits FROM ph2, gp)),
         |pass AS (SELECT pb.probe, b.fg FROM pbits pb
         |  JOIN bloom b ON b.w = pb.bp // 63
         |    AND (b.mask & (1::BIGINT << CAST(pb.bp % 63 AS INT))) <> 0
         |  GROUP BY pb.probe, b.fg
         |  HAVING COUNT(DISTINCT pb.bp) = (SELECT COUNT(*) FROM pbits x
         |    WHERE x.probe = pb.probe)),
         |m AS (SELECT pr.probe, u.fg, COUNT(*) AS nr,
         |    SUM(u.n_chars) AS sc
         |  FROM pr JOIN u ON u.url = pr.purl GROUP BY 1, 2)
         |SELECT p.probe,
         |  (SELECT COUNT(DISTINCT fg) FROM u) AS n_files_total,
         |  CAST(COUNT(pa.fg) AS BIGINT) AS n_files_bloom_pass,
         |  CAST(COUNT(pa.fg) - COUNT(m.fg) AS BIGINT)
         |    AS n_false_positive_files,
         |  CAST(COALESCE(SUM(m.nr), 0) AS BIGINT) AS n_rows,
         |  CAST(COALESCE(SUM(m.sc), 0) AS BIGINT) AS sum_chars
         |FROM pr p
         |LEFT JOIN pass pa ON pa.probe = p.probe
         |LEFT JOIN m ON m.probe = p.probe AND m.fg = pa.fg
         |GROUP BY p.probe ORDER BY p.probe""".stripMargin
    },
    // three reads reconstructed logically: the v2 content, v2 + the
    // clone's 50-row append, v2 + the source's DIFFERENT 50-row
    // append; file counts from the staging arithmetic's per-row file
    // id (q321's vf device)
    "q322_lake_shallow_clone" -> {
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
         |  FROM documents),
         |v2 AS (SELECT * FROM d WHERE $sqlLakeV2Pred),
         |vf AS (SELECT *, CASE WHEN doc_id % 3 = 2
         |      THEN 'delta' || CAST(doc_id // $sqlLakeG AS VARCHAR)
         |      WHEN doc_id // $sqlLakeG = 0 THEN 'f0r'
         |      ELSE 'base' || CAST(doc_id // $sqlLakeG AS VARCHAR)
         |    END AS fid FROM v2),
         |nf AS (SELECT CAST(COUNT(DISTINCT fid) AS BIGINT) AS n
         |  FROM vf),
         |mi AS (SELECT MAX(doc_id) AS m FROM v2),
         |ca AS (SELECT (SELECT m FROM mi) + t.i AS doc_id,
         |    100 + ((SELECT m FROM mi) + t.i) % 97 AS n_chars
         |  FROM range(1, 51) t(i)),
         |sa AS (SELECT (SELECT m FROM mi) + 50 + t.i AS doc_id,
         |    100 + ((SELECT m FROM mi) + 50 + t.i) % 97 AS n_chars
         |  FROM range(1, 51) t(i))
         |SELECT * FROM (
         |SELECT 'a_clone_at_clone_time' AS probe,
         |  (SELECT n FROM nf) AS n_files,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT)
         |    AS key_checksum
         |FROM v2
         |UNION ALL
         |SELECT 'b_clone_latest', (SELECT n FROM nf) + 1,
         |  CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
         |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT)
         |FROM (SELECT * FROM v2 UNION ALL SELECT * FROM ca)
         |UNION ALL
         |SELECT 'c_source_latest', (SELECT n FROM nf) + 1,
         |  CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
         |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT)
         |FROM (SELECT * FROM v2 UNION ALL SELECT * FROM sa)
         |) ORDER BY probe""".stripMargin
    },
    // structural counts mirror q303's boundary-3 arithmetic: doomed =
    // all pre-compaction adds (F0 + Fd + 1), the pinned clone's
    // latest = the v2 active set (F0 + Fd files, every one doomed →
    // refused), the compacted clone and the source each resolve one
    // private file with zero conflicts → executed; all three reads
    // are the v2 logical content
    "q323_lake_vacuum_clone_safety" -> {
      val act = s"($sqlLakeF0) + ($sqlLakeFd)"
      def row(name: String, nCloneF: String, nConf: String,
          outcome: String, nFiles: String) =
        s"""SELECT '$name' AS probe,
           |  CAST(($act) + 1 AS BIGINT) AS n_doomed,
           |  CAST(($nCloneF) AS BIGINT) AS n_clone_files,
           |  CAST(($nConf) AS BIGINT) AS n_conflicts,
           |  '$outcome' AS outcome,
           |  CAST(($nFiles) AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM documents WHERE $sqlLakeV2Pred""".stripMargin
      s"""SELECT * FROM (
         |${row("a_refused_clone_pinned", act, act, "refused", act)}
         |UNION ALL
         |${row("b_executed_clone_compacted", "1", "0", "executed", "1")}
         |UNION ALL
         |${row("c_source_latest", "1", "0", "executed", "1")}
         |) ORDER BY probe""".stripMargin
    },
    // the file funnel reconstructed from the staging arithmetic (file
    // id per row: delta granule / f0r / base granule, stats = data
    // min/max per file) and the post state as a logical upsert over
    // the v2 content plus the deterministic inserts
    "q321_lake_merge" -> {
      val mt = s"(doc_id // $sqlLakeG IN (1, 3) AND doc_id % 13 = 3)"
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
         |  FROM documents),
         |v2 AS (SELECT * FROM d WHERE $sqlLakeV2Pred),
         |keys AS (SELECT doc_id FROM v2 WHERE $mt),
         |kr AS (SELECT MIN(doc_id) AS k0, MAX(doc_id) AS k1 FROM keys),
         |vf AS (SELECT *, CASE WHEN doc_id % 3 = 2
         |      THEN 'delta' || CAST(doc_id // $sqlLakeG AS VARCHAR)
         |      WHEN doc_id // $sqlLakeG = 0 THEN 'f0r'
         |      ELSE 'base' || CAST(doc_id // $sqlLakeG AS VARCHAR)
         |    END AS fid FROM v2),
         |fs AS (SELECT fid, MIN(doc_id) AS mn, MAX(doc_id) AS mx
         |  FROM vf GROUP BY 1),
         |cand AS (SELECT fid FROM fs, kr
         |  WHERE mx >= kr.k0 AND mn <= kr.k1),
         |hit AS (SELECT DISTINCT fid FROM vf WHERE $mt),
         |mi AS (SELECT MAX(doc_id) AS m FROM v2),
         |ins AS (SELECT (SELECT m FROM mi) + t.i AS doc_id,
         |    100 + ((SELECT m FROM mi) + t.i) % 97 AS n_chars
         |  FROM range(1, 51) t(i)),
         |post AS (SELECT doc_id,
         |    CASE WHEN $mt THEN n_chars + 1000 ELSE n_chars END
         |      AS n_chars
         |  FROM v2
         |  UNION ALL SELECT doc_id, n_chars FROM ins)
         |SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fs) AS n_files_active,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
         |    AS n_files_cand_stats,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hit)
         |    AS n_files_rewritten,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM keys)
         |    AS n_rows_updated,
         |  CAST(50 AS BIGINT) AS n_rows_inserted,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT)
         |    AS key_checksum,
         |  CAST(SUM(doc_id * n_chars) AS BIGINT) AS mix_checksum
         |FROM post""".stripMargin
    },
    // per-file pruning reconstructed under each file's own spec: the
    // file list from the staging arithmetic (granule files for the
    // %3<>2 slice, source files for the %3=2 slice), the same
    // value-or-stats rule, content from the raw predicate
    "q332_lake_partition_evolution" -> {
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(n_chars AS BIGINT) AS n_chars FROM documents),
         |gp AS (SELECT GREATEST(100, COUNT(*) // 50) AS g
         |  FROM documents),
         |af AS (SELECT 'range' AS ptype,
         |    CAST(doc_id // (SELECT g FROM gp) AS VARCHAR) AS pval,
         |    MIN(doc_id) AS mn, MAX(doc_id) AS mx
         |  FROM d WHERE doc_id % 3 <> 2
         |  GROUP BY doc_id // (SELECT g FROM gp)),
         |bf AS (SELECT 'source' AS ptype, source AS pval,
         |    MIN(doc_id) AS mn, MAX(doc_id) AS mx
         |  FROM d WHERE doc_id % 3 = 2 GROUP BY source),
         |mf AS (SELECT * FROM af UNION ALL SELECT * FROM bf),
         |pr AS (SELECT 'a_id_range' AS probe, TRUE AS has_id,
         |    FALSE AS has_src
         |  UNION ALL SELECT 'b_source_eq', FALSE, TRUE
         |  UNION ALL SELECT 'c_combined', TRUE, TRUE),
         |bounds AS (SELECT 2 * g AS lo, 2 * g + g // 2 AS hi,
         |    (SELECT MIN(source) FROM documents) AS sv FROM gp),
         |sc AS (SELECT pr.probe, CAST(COUNT(*) AS BIGINT) AS n_scan
         |  FROM pr, mf, bounds b
         |  WHERE (NOT pr.has_id OR (mf.mx >= b.lo AND mf.mn <= b.hi))
         |    AND (NOT pr.has_src OR mf.ptype <> 'source'
         |      OR mf.pval = b.sv)
         |  GROUP BY 1),
         |con AS (SELECT pr.probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(COALESCE(SUM(d.n_chars), 0) AS BIGINT) AS sum_chars,
         |    CAST(COALESCE(SUM(${manifestTerm("doc_id")}), 0) AS BIGINT)
         |      AS key_checksum
         |  FROM pr, d, bounds b
         |  WHERE (NOT pr.has_id OR d.doc_id BETWEEN b.lo AND b.hi)
         |    AND (NOT pr.has_src OR d.source = b.sv)
         |  GROUP BY 1)
         |SELECT pr.probe,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM mf) AS n_files_total,
         |  COALESCE(sc.n_scan, 0) AS n_files_scanned,
         |  COALESCE(con.n_rows, 0) AS n_rows,
         |  COALESCE(con.sum_chars, 0) AS sum_chars,
         |  COALESCE(con.key_checksum, 0) AS key_checksum
         |FROM pr
         |LEFT JOIN sc USING (probe)
         |LEFT JOIN con USING (probe)
         |ORDER BY pr.probe""".stripMargin
    },
    // both catalog probes compare a rollup against itself (consistent
    // by construction); the torn probe compares the updated fact
    // rollup against the stale dim — sources owning granule-2 docs
    // disagree on sum_chars (counts still match)
    "q330_lake_catalog_snapshot" -> {
      val g = s"(SELECT g FROM gp)"
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(n_chars AS BIGINT) AS n_chars FROM documents),
         |gp AS (SELECT GREATEST(100, COUNT(*) // 50) AS g
         |  FROM documents),
         |u AS (SELECT doc_id, source,
         |    CASE WHEN doc_id // $g = 2 THEN n_chars + 1000
         |      ELSE n_chars END AS n_chars FROM d),
         |s0 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(n_chars) AS BIGINT) AS c FROM d GROUP BY 1),
         |s1 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(n_chars) AS BIGINT) AS c FROM u GROUP BY 1),
         |cmp AS (SELECT s1.source,
         |    CASE WHEN s1.n = s0.n AND s1.c = s0.c THEN 1 ELSE 0 END
         |      AS ok, s1.c AS ca, s0.c AS cb
         |  FROM s1 JOIN s0 USING (source))
         |SELECT * FROM (
         |SELECT 'a_catalog_v0' AS probe,
         |  CAST(COUNT(*) AS BIGINT) AS n_sources,
         |  CAST(COUNT(*) AS BIGINT) AS n_consistent,
         |  CAST(0 AS BIGINT) AS n_inconsistent,
         |  CAST(SUM(c) AS BIGINT) AS sum_chars_a,
         |  CAST(SUM(c) AS BIGINT) AS sum_chars_b
         |FROM s0
         |UNION ALL
         |SELECT 'b_catalog_v1', CAST(COUNT(*) AS BIGINT),
         |  CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT),
         |  CAST(SUM(c) AS BIGINT), CAST(SUM(c) AS BIGINT)
         |FROM s1
         |UNION ALL
         |SELECT 'c_torn_latest_reads', CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(ok) AS BIGINT), CAST(SUM(1 - ok) AS BIGINT),
         |  CAST(SUM(ca) AS BIGINT), CAST(SUM(cb) AS BIGINT)
         |FROM cmp
         |) ORDER BY probe""".stripMargin
    },
    // a = the v1 logical content (ALL docs — the CoW-deleted odd rows
    // back) over v1's file count, with the structural commit
    // arithmetic (one add: base g=0 re-referenced; one remove: its
    // f0r rewrite); b = the v2 content, still resolvable
    "q326_lake_restore" -> {
      val act = s"($sqlLakeF0) + ($sqlLakeFd)"
      def row(name: String, nAdds: Int, nRemoves: Int, pred: String) =
        s"""SELECT '$name' AS probe,
           |  CAST($nAdds AS BIGINT) AS n_restore_adds,
           |  CAST($nRemoves AS BIGINT) AS n_restore_removes,
           |  CAST(($act) AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM documents WHERE $pred""".stripMargin
      s"""SELECT * FROM (
         |${row("a_latest_restored", 1, 1, "TRUE")}
         |UNION ALL
         |${row("b_asof_v2_preserved", 0, 0, sqlLakeV2Pred)}
         |) ORDER BY probe""".stripMargin
    },
    // the Z assignment reconstructed over the v2 snapshot (q320's
    // bucketize/interleave/shift with the snapshot's own max bounds);
    // a = v2 content over the old-layout file count (q322's fid
    // device), b = the same content over the Z file count, c = the
    // chars-range read over the two-dim stats overlap
    "q325_lake_optimize_zorder_commit" -> {
      val zvSql = "CAST(list_sum(list_transform(range(0, 6), k -> " +
        "(((xb >> CAST(k AS INT)) & 1) << CAST(2 * k AS INT)) + " +
        "(((yb >> CAST(k AS INT)) & 1) << CAST(2 * k + 1 AS INT)))) " +
        "AS BIGINT)"
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
         |  FROM documents),
         |v2 AS (SELECT * FROM d WHERE $sqlLakeV2Pred),
         |vf AS (SELECT *, CASE WHEN doc_id % 3 = 2
         |      THEN 'delta' || CAST(doc_id // $sqlLakeG AS VARCHAR)
         |      WHEN doc_id // $sqlLakeG = 0 THEN 'f0r'
         |      ELSE 'base' || CAST(doc_id // $sqlLakeG AS VARCHAR)
         |    END AS fid FROM v2),
         |mm AS (SELECT MAX(doc_id) AS mi, MAX(n_chars) AS mc,
         |    $sqlLakeG AS gran FROM v2),
         |par AS (SELECT mi // 64 + 1 AS gx, mc // 64 + 1 AS gy,
         |    mi // gran + 1 AS nf, mi, mc FROM mm),
         |b AS (SELECT v2.*, doc_id // p.gx AS xb, n_chars // p.gy AS yb
         |  FROM v2, par p),
         |z AS (SELECT *, $zvSql AS zv FROM b),
         |ff AS (SELECT *, (zv * (SELECT nf FROM par)) >> 12 AS zf
         |  FROM z),
         |zst AS (SELECT zf, MIN(n_chars) AS mnc, MAX(n_chars) AS mxc
         |  FROM ff GROUP BY 1),
         |nold AS (SELECT CAST(COUNT(DISTINCT fid) AS BIGINT) AS n
         |  FROM vf),
         |nz AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM zst),
         |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM zst, par
         |  WHERE mxc >= mc // 4 AND mnc <= mc // 2),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |    CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT)
         |      AS key_checksum FROM v2),
         |con AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
         |    CAST(COALESCE(SUM(${manifestTerm("doc_id")}), 0) AS BIGINT)
         |      AS key_checksum
         |  FROM v2, par WHERE n_chars BETWEEN mc // 4 AND mc // 2)
         |SELECT * FROM (
         |SELECT 'a_asof_v2' AS probe, (SELECT n FROM nold)
         |    AS n_files_total,
         |  (SELECT n FROM nold) AS n_files_pass,
         |  n_rows, sum_chars, key_checksum FROM tot
         |UNION ALL
         |SELECT 'b_latest_zorder', (SELECT n FROM nz),
         |  (SELECT n FROM nz), n_rows, sum_chars, key_checksum FROM tot
         |UNION ALL
         |SELECT 'c_prune_chars', (SELECT n FROM nz),
         |  (SELECT n FROM np), n_rows, sum_chars, key_checksum FROM con
         |) ORDER BY probe""".stripMargin
    },
    // q321's logical upsert extended with the delete arm: post = the
    // v2 content MINUS the delete-matched rows, updates applied to
    // the update-matched, plus the deterministic inserts; the file
    // funnel is unchanged (both arms share the ON keys, so the same
    // files are candidates and hits)
    "q324_lake_merge_delete" -> {
      val mt = s"(doc_id // $sqlLakeG IN (1, 3) AND doc_id % 13 = 3)"
      val del = s"($mt AND doc_id % 2 = 1)"
      val upd = s"($mt AND doc_id % 2 = 0)"
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
         |  FROM documents),
         |v2 AS (SELECT * FROM d WHERE $sqlLakeV2Pred),
         |keys AS (SELECT doc_id FROM v2 WHERE $mt),
         |kr AS (SELECT MIN(doc_id) AS k0, MAX(doc_id) AS k1 FROM keys),
         |vf AS (SELECT *, CASE WHEN doc_id % 3 = 2
         |      THEN 'delta' || CAST(doc_id // $sqlLakeG AS VARCHAR)
         |      WHEN doc_id // $sqlLakeG = 0 THEN 'f0r'
         |      ELSE 'base' || CAST(doc_id // $sqlLakeG AS VARCHAR)
         |    END AS fid FROM v2),
         |fs AS (SELECT fid, MIN(doc_id) AS mn, MAX(doc_id) AS mx
         |  FROM vf GROUP BY 1),
         |cand AS (SELECT fid FROM fs, kr
         |  WHERE mx >= kr.k0 AND mn <= kr.k1),
         |hit AS (SELECT DISTINCT fid FROM vf WHERE $mt),
         |mi AS (SELECT MAX(doc_id) AS m FROM v2),
         |ins AS (SELECT (SELECT m FROM mi) + t.i AS doc_id,
         |    100 + ((SELECT m FROM mi) + t.i) % 97 AS n_chars
         |  FROM range(1, 51) t(i)),
         |post AS (SELECT doc_id,
         |    CASE WHEN $upd THEN n_chars + 1000 ELSE n_chars END
         |      AS n_chars
         |  FROM v2 WHERE NOT $del
         |  UNION ALL SELECT doc_id, n_chars FROM ins)
         |SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fs) AS n_files_active,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
         |    AS n_files_cand_stats,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hit)
         |    AS n_files_rewritten,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v2 WHERE $upd)
         |    AS n_rows_updated,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v2 WHERE $del)
         |    AS n_rows_deleted,
         |  CAST(50 AS BIGINT) AS n_rows_inserted,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT)
         |    AS key_checksum,
         |  CAST(SUM(doc_id * n_chars) AS BIGINT) AS mix_checksum
         |FROM post""".stripMargin
    },
    // identical bucketization, interleave, and rank→file shift; the
    // overlap rule per (probe, layout) off per-file min/max of BOTH
    // dimensions; content from the base predicate (stats never
    // false-negative, so the pruned read equals the direct scan)
    "q320_lake_zorder" -> {
      val zvSql = "CAST(list_sum(list_transform(range(0, 6), k -> " +
        "(((xb >> CAST(k AS INT)) & 1) << CAST(2 * k AS INT)) + " +
        "(((yb >> CAST(k AS INT)) & 1) << CAST(2 * k + 1 AS INT)))) " +
        "AS BIGINT)"
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
         |  FROM documents),
         |mm AS (SELECT MAX(doc_id) AS mi, MAX(n_chars) AS mc,
         |    $sqlLakeG AS gran FROM d),
         |par AS (SELECT mi // 64 + 1 AS gx, mc // 64 + 1 AS gy,
         |    mi // gran + 1 AS nf, gran, mi, mc FROM mm),
         |b AS (SELECT d.*, doc_id // p.gx AS xb, n_chars // p.gy AS yb,
         |    doc_id // p.gran AS lin_f
         |  FROM d, par p),
         |z AS (SELECT *, $zvSql AS zv FROM b),
         |ff AS (SELECT *, (zv * (SELECT nf FROM par)) >> 12 AS zf
         |  FROM z),
         |st AS (
         |  SELECT 'linear' AS layout, lin_f AS fid,
         |    MIN(doc_id) AS mni, MAX(doc_id) AS mxi,
         |    MIN(n_chars) AS mnc, MAX(n_chars) AS mxc
         |  FROM ff GROUP BY 2
         |  UNION ALL
         |  SELECT 'zorder', zf, MIN(doc_id), MAX(doc_id),
         |    MIN(n_chars), MAX(n_chars)
         |  FROM ff GROUP BY 2),
         |pr AS (SELECT 'a_two_dim' AS probe, TRUE AS has_id
         |  UNION ALL SELECT 'b_chars_only', FALSE),
         |spine AS (SELECT probe, has_id, layout
         |  FROM pr, (SELECT DISTINCT layout FROM st) l),
         |cnt AS (SELECT layout, CAST(COUNT(*) AS BIGINT) AS nt
         |  FROM st GROUP BY 1),
         |pass AS (SELECT pr.probe, st.layout,
         |    CAST(COUNT(*) AS BIGINT) AS np
         |  FROM pr, st
         |  WHERE (NOT pr.has_id OR (st.mxi >= (SELECT mi // 4 FROM par)
         |      AND st.mni <= (SELECT mi // 2 FROM par)))
         |    AND st.mxc >= (SELECT mc // 4 FROM par)
         |    AND st.mnc <= (SELECT mc // 2 FROM par)
         |  GROUP BY 1, 2),
         |con AS (SELECT pr.probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
         |    CAST(COALESCE(SUM(${manifestTerm("doc_id")}), 0) AS BIGINT)
         |      AS key_checksum
         |  FROM pr, d
         |  WHERE (NOT pr.has_id OR (doc_id
         |      BETWEEN (SELECT mi // 4 FROM par)
         |      AND (SELECT mi // 2 FROM par)))
         |    AND n_chars BETWEEN (SELECT mc // 4 FROM par)
         |      AND (SELECT mc // 2 FROM par)
         |  GROUP BY 1)
         |SELECT s.probe, s.layout, cnt.nt AS n_files_total,
         |  COALESCE(pass.np, 0) AS n_files_pass,
         |  COALESCE(con.n_rows, 0) AS n_rows,
         |  COALESCE(con.sum_chars, 0) AS sum_chars,
         |  COALESCE(con.key_checksum, 0) AS key_checksum
         |FROM spine s
         |JOIN cnt USING (layout)
         |LEFT JOIN pass ON pass.probe = s.probe AND pass.layout = s.layout
         |LEFT JOIN con ON con.probe = s.probe
         |ORDER BY s.probe, s.layout""".stripMargin
    },
    // cleanup keeps only the checkpointed version's manifest (4 → 1);
    // the latest resolves through the checkpoint alone; below-floor
    // version and timestamp probes answer explicit unavailable rows
    "q312_lake_log_retention" -> {
      def zeroRow(name: String, outcome: String, v: Int) =
        s"""SELECT '$name' AS probe, '$outcome' AS outcome,
           |  CAST($v AS BIGINT) AS version,
           |  CAST(4 AS BIGINT) AS n_manifests_before,
           |  CAST(1 AS BIGINT) AS n_manifests_after,
           |  CAST(0 AS BIGINT) AS n_manifests_read,
           |  CAST(0 AS BIGINT) AS n_files, CAST(0 AS BIGINT) AS n_rows,
           |  CAST(0 AS BIGINT) AS sum_chars,
           |  CAST(0 AS BIGINT) AS key_checksum""".stripMargin
      s"""SELECT * FROM (
         |SELECT 'a_latest_via_ckpt' AS probe, 'resolved' AS outcome,
         |  CAST(3 AS BIGINT) AS version,
         |  CAST(4 AS BIGINT) AS n_manifests_before,
         |  CAST(1 AS BIGINT) AS n_manifests_after,
         |  CAST(1 AS BIGINT) AS n_manifests_read,
         |  CAST(1 AS BIGINT) AS n_files,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
         |FROM documents WHERE $sqlLakeV2Pred
         |UNION ALL
         |${zeroRow("b_below_floor", "version_unavailable", 1)}
         |UNION ALL
         |${zeroRow("c_ts_below_floor", "ts_unavailable", -1)}
         |) ORDER BY probe""".stripMargin
    },
    // both probes must prune and read IDENTICALLY — the oracle
    // reconstructs the per-stage surviving-granule counts and the
    // predicate content once, and emits it under both versions
    "q314_lake_stats_survive_rename" -> {
      def row(name: String, v: Int) =
        s"""SELECT '$name' AS probe, CAST($v AS BIGINT) AS version,
           |  (SELECT CAST(COUNT(DISTINCT doc_id // gg.g) AS BIGINT)
           |    FROM documents, gp gg) AS n_files_total,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM st, mx
           |    WHERE st.mn1 <= mx.m // 2 AND st.mx1 >= mx.m // 4)
           |    AS n_files_after_key,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM st, mx
           |    WHERE st.mn1 <= mx.m // 2 AND st.mx1 >= mx.m // 4
           |      AND st.mx2 >= 100) AS n_files_after_measure,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_measure,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM documents, mx
           |WHERE doc_id BETWEEN mx.m // 4 AND mx.m // 2
           |  AND n_chars >= 100""".stripMargin
      s"""WITH gp AS (SELECT GREATEST(100, COUNT(*) // 50) AS g
         |    FROM documents),
         |mx AS (SELECT MAX(doc_id) AS m FROM documents),
         |st AS (SELECT doc_id // gp.g AS fg,
         |    MIN(doc_id) AS mn1, MAX(doc_id) AS mx1,
         |    MIN(n_chars) AS mn2, MAX(n_chars) AS mx2
         |  FROM documents, gp GROUP BY 1)
         |SELECT * FROM (
         |${row("a_pre_rename", 0)}
         |UNION ALL
         |${row("b_post_rename", 1)}
         |) ORDER BY probe""".stripMargin
    },
    // the rename is metadata-only: v0 and v1 read the SAME bytes
    // through different logical names; v2 merges files written before
    // and after the rename under the id-based mapping
    "q313_lake_column_mapping" -> {
      def row(name: String, v: Int, schema: String, nFiles: Int,
          pred: String) =
        s"""SELECT '$name' AS probe, CAST($v AS BIGINT) AS version,
           |  '$schema' AS logical_schema,
           |  CAST($nFiles AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_measure,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM documents WHERE $pred""".stripMargin
      s"""SELECT * FROM (
         |${row("a_v0_original_name", 0, "doc_id,n_chars,source", 1,
             "doc_id % 2 = 0")}
         |UNION ALL
         |${row("b_v1_renamed_same_bytes", 1, "char_count,doc_id,source",
             1, "doc_id % 2 = 0")}
         |UNION ALL
         |${row("c_v2_merged_across_rename", 2,
             "char_count,doc_id,source", 2, "TRUE")}
         |) ORDER BY probe""".stripMargin
    },
    // scenario a's live checkpoint (v2) references every doomed
    // pre-compaction file except the CoW-replaced base g=0 → the
    // sweep must rewrite; scenario b's cadence checkpoint (v4) is
    // already clean → direct. Both end reads: one manifest, one
    // file, the v2 logical content
    "q310_lake_vacuum_ckpt" -> {
      val act = s"($sqlLakeF0) + ($sqlLakeFd)"
      def row(name: String, boundary: Int, nDoomed: String,
          nLive: String, action: String) =
        s"""SELECT '$name' AS scenario, CAST($boundary AS BIGINT) AS boundary,
           |  CAST(($nDoomed) AS BIGINT) AS n_doomed,
           |  CAST(($nLive) AS BIGINT) AS n_doomed_in_live_ckpt,
           |  '$action' AS action,
           |  CAST(0 AS BIGINT) AS n_doomed_in_ckpt_after,
           |  CAST(1 AS BIGINT) AS n_manifests_ckpt,
           |  CAST(1 AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
           |FROM documents WHERE $sqlLakeV2Pred""".stripMargin
      s"""SELECT * FROM (
         |${row("a_rewrite_then_sweep", 3, s"$act + 1", act,
             "rewrote_checkpoint")}
         |UNION ALL
         |${row("b_direct", 4, "1", "0", "executed_direct")}
         |) ORDER BY scenario""".stripMargin
    },
    // the incrementally-maintained aggregate must equal the
    // from-scratch as-of(2) rollup exactly
    "q299_lake_cdf_apply" ->
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
         |FROM documents WHERE $sqlLakeV2Pred
         |GROUP BY source ORDER BY source""".stripMargin,
    // phases a-d all read the SAME logical content (v2 minus the
    // forget set — masking, hard deletion, vacuum, and the disk audit
    // must agree exactly); e is the zero-residual guarantee
    "q298_lake_forget" -> {
      val forget =
        s"(doc_id // $sqlLakeG IN (1, 3) AND doc_id % 13 = 3)"
      val act = s"($sqlLakeF0) + ($sqlLakeFd)"
      def row(phase: String, nFiles: String, pred: String) =
        s"""SELECT '$phase' AS phase, CAST(($nFiles) AS BIGINT) AS n_files,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
           |  CAST(COALESCE(SUM(${manifestTerm("doc_id")}), 0) AS BIGINT)
           |    AS key_checksum
           |FROM documents WHERE $pred""".stripMargin
      val kept = s"$sqlLakeV2Pred AND NOT $forget"
      s"""SELECT * FROM (
         |${row("a_v3_masked_read", act, kept)}
         |UNION ALL
         |${row("b_v4_hard_delete_read", act, kept)}
         |UNION ALL
         |${row("c_post_vacuum_read", act, kept)}
         |UNION ALL
         |${row("d_disk_total", act, kept)}
         |UNION ALL
         |${row("e_forgotten_residual", "0", "FALSE")}
         |) ORDER BY phase""".stripMargin
    },
    // boundary 3 keeps only the compacted file: as-of(3) reads the v2
    // content from it; as-of(2)'s whole active set (all pre-compaction
    // files) is gone — unreadable, every file missing
    "q291_lake_vacuum_exec" ->
      s"""SELECT * FROM (
         |SELECT 'as_of_2' AS probe, FALSE AS readable,
         |  CAST(($sqlLakeF0) + ($sqlLakeFd) AS BIGINT) AS n_files,
         |  CAST(($sqlLakeF0) + ($sqlLakeFd) AS BIGINT) AS n_missing,
         |  CAST(0 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS sum_chars,
         |  CAST(0 AS BIGINT) AS key_checksum
         |UNION ALL
         |SELECT 'as_of_3', TRUE, CAST(1 AS BIGINT), CAST(0 AS BIGINT),
         |  CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
         |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT)
         |FROM documents WHERE $sqlLakeV2Pred
         |) ORDER BY probe""".stripMargin,
    // per-file stats reconstructed from the staging rules (base per
    // granule sans g=0, delta per granule, the g=0 even-id rewrite);
    // a file is read iff its [min, max] overlaps the probe range
    "q279_lake_pruned_read" ->
      s"""WITH fl AS (
         |  SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents
         |  WHERE doc_id % 3 <> 2 AND doc_id // $sqlLakeG <> 0
         |  GROUP BY doc_id // $sqlLakeG
         |  UNION ALL
         |  SELECT MIN(doc_id), MAX(doc_id) FROM documents
         |  WHERE doc_id % 3 = 2 GROUP BY doc_id // $sqlLakeG
         |  UNION ALL
         |  SELECT MIN(doc_id), MAX(doc_id) FROM documents
         |  WHERE doc_id // $sqlLakeG = 0 AND doc_id % 3 <> 2
         |    AND doc_id % 2 = 0)
         |SELECT CAST(2 AS BIGINT) AS version,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fl) AS n_active,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fl
         |   WHERE mn <= $lakePruneHi AND mx >= $lakePruneLo) AS n_files_read,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(SUM(${manifestTerm("doc_id")}) AS BIGINT) AS key_checksum
         |FROM documents
         |WHERE $sqlLakeV2Pred
         |  AND doc_id BETWEEN $lakePruneLo AND $lakePruneHi""".stripMargin,
    // the same run-head detection (doc_id+1 neighbor, null or changed
    // value) and the same per-run pricing as the Spark side
    "q289_rle_audit" -> dictCols.map { cname =>
      s"""SELECT '$cname' AS "column", n_rows, n_distinct, n_runs,
         |  plain_chars, rle_chars,
         |  CASE WHEN rle_chars < plain_chars THEN 1 ELSE 0 END
         |    AS recommend_rle
         |FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |        CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
         |        CAST(SUM(CASE WHEN is_head THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_runs,
         |        CAST(SUM(length(v)) AS BIGINT) AS plain_chars,
         |        CAST(SUM(CASE WHEN is_head THEN length(v) + 4 ELSE 0 END)
         |          AS BIGINT) AS rle_chars
         |      FROM (SELECT a.v, (b.v IS NULL OR a.v <> b.v) AS is_head
         |            FROM (SELECT doc_id, $cname AS v FROM documents) a
         |            LEFT JOIN (SELECT doc_id + 1 AS doc_id, $cname AS v
         |                       FROM documents) b USING (doc_id)))""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY \"column\""),
    "q266_dict_audit" -> dictCols.map { cname =>
      s"""SELECT '$cname' AS "column", n_rows, n_distinct, plain_chars,
         |  dict_value_chars,
         |  CAST(length(bin(n_distinct - 1)) AS BIGINT) AS index_bits,
         |  dict_value_chars + (n_rows * CAST(length(bin(n_distinct - 1))
         |    AS BIGINT) + 7) // 8 AS dict_chars,
         |  CASE WHEN dict_value_chars + (n_rows *
         |      CAST(length(bin(n_distinct - 1)) AS BIGINT) + 7) // 8
         |      < plain_chars THEN 1 ELSE 0 END AS recommend_dict
         |FROM (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
         |        CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |        CAST(SUM(length(v) * c) AS BIGINT) AS plain_chars,
         |        CAST(SUM(length(v)) AS BIGINT) AS dict_value_chars
         |      FROM (SELECT $cname AS v, CAST(COUNT(*) AS BIGINT) AS c
         |            FROM documents GROUP BY 1))""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY \"column\""),
    "q269_winsorize" ->
      s"""WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
         |        AS c FROM lineitem),
         |h AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY c),
         |cu AS (SELECT c, n, SUM(n) OVER (ORDER BY c
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h),
         |t AS (SELECT MAX(cum) AS n_total FROM cu),
         |bd AS (SELECT
         |    MIN(CASE WHEN cum >= (n_total * $winsLoPermille + 999) // 1000
         |      THEN c END) AS lo_cents,
         |    MIN(CASE WHEN cum >= (n_total * $winsHiPermille + 999) // 1000
         |      THEN c END) AS hi_cents
         |  FROM cu, t)
         |SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN c < lo_cents THEN n ELSE 0 END) AS BIGINT)
         |    AS n_clamped_lo,
         |  CAST(SUM(CASE WHEN c > hi_cents THEN n ELSE 0 END) AS BIGINT)
         |    AS n_clamped_hi,
         |  CAST(SUM(c * n) AS BIGINT) AS sum_cents,
         |  CAST(SUM(GREATEST(LEAST(c, hi_cents), lo_cents) * n) AS BIGINT)
         |    AS winsorized_sum_cents,
         |  MIN(lo_cents) AS lo_cents, MIN(hi_cents) AS hi_cents
         |FROM cu, bd""".stripMargin,
    "q267_replication_manifest" -> manifestKeys.map { case (t, pk) =>
      s"""SELECT '$t' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(${manifestTerm(pk)}) AS BIGINT) AS key_checksum
         |FROM $t""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY table_name"),
    "q246_format_ingest" ->
      """SELECT * FROM (
        |  SELECT 'csv' AS format, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(0 AS BIGINT) AS n_mismatch FROM events
        |  UNION ALL
        |  SELECT 'jsonl', CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT)
        |  FROM events)
        |ORDER BY format""".stripMargin,
    "q236_corpus_diff" ->
      """WITH old AS (SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 11 = 3 THEN concat(text, ' (rev1)')
        |        ELSE text END) AS dig_old
        |  FROM documents WHERE doc_id % 13 <> 7),
        |nw AS (SELECT doc_id, source AS source_new, md5(text) AS dig_new
        |  FROM documents WHERE doc_id % 17 <> 5),
        |st AS (SELECT COALESCE(old.source, nw.source_new) AS source,
        |    CASE WHEN dig_old IS NULL THEN 'added'
        |      WHEN dig_new IS NULL THEN 'removed'
        |      WHEN dig_old <> dig_new THEN 'changed'
        |      ELSE 'unchanged' END AS s
        |  FROM old FULL OUTER JOIN nw ON nw.doc_id = old.doc_id),
        |c AS (SELECT source,
        |    CAST(SUM(CASE WHEN s = 'added' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_added,
        |    CAST(SUM(CASE WHEN s = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_removed,
        |    CAST(SUM(CASE WHEN s = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_changed,
        |    CAST(SUM(CASE WHEN s = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_unchanged
        |  FROM st GROUP BY source)
        |SELECT source, n_added, n_removed, n_changed, n_unchanged,
        |  (n_added + n_removed + n_changed) * 1000
        |    // (n_added + n_removed + n_changed + n_unchanged)
        |    AS churn_permille
        |FROM c ORDER BY source""".stripMargin,
    "q142_cms_estimate" -> {
      val vals = cmsA.zip(cmsB).zipWithIndex
        .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
      s"""WITH ex AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
         |      FROM events GROUP BY 1),
         |bk AS (SELECT user_id, n, j,
         |        (ha * user_id + hb) % $P % $cmsW AS bucket
         |      FROM ex CROSS JOIN (VALUES $vals) AS hp(j, ha, hb)),
         |sk AS (SELECT j, bucket, CAST(SUM(n) AS BIGINT) AS bs
         |      FROM bk GROUP BY 1, 2)
         |SELECT bk.user_id, CAST(MAX(bk.n) AS BIGINT) AS n_exact,
         |  CAST(MIN(sk.bs) AS BIGINT) AS cms_est,
         |  CAST(MIN(sk.bs) - MAX(bk.n) AS BIGINT) AS overcount
         |FROM bk JOIN sk ON sk.j = bk.j AND sk.bucket = bk.bucket
         |WHERE bk.user_id < $cmsTrack
         |GROUP BY bk.user_id ORDER BY bk.user_id""".stripMargin
    },
    "q143_pareto_frontier" ->
      s"""WITH d AS (SELECT doc_id, n_chars,
         |        CAST(len(${TextFunctions.sqlTokens("text")}) AS BIGINT)
         |          AS n_tokens
         |      FROM documents)
         |SELECT doc_id, n_chars, n_tokens FROM d a
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM d b
         |  WHERE b.n_chars <= a.n_chars AND b.n_tokens >= a.n_tokens
         |    AND (b.n_chars < a.n_chars OR b.n_tokens > a.n_tokens))
         |ORDER BY n_chars, doc_id""".stripMargin,
    "q144_gap_fill" ->
      s"""WITH d AS (SELECT user_id,
         |        CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         |        CAST(COUNT(*) AS BIGINT) AS n
         |      FROM events GROUP BY 1, 2),
         |nx AS (SELECT user_id, day, n,
         |        LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day,
         |        LEAD(n) OVER (PARTITION BY user_id ORDER BY day) AS next_n
         |      FROM d),
         |f0 AS (SELECT user_id, day, n, next_day, next_n,
         |        unnest(range(day + 1, next_day)) AS fd
         |      FROM nx
         |      WHERE next_day IS NOT NULL AND next_day - day > 1
         |        AND next_day - day <= ${gapMax + 1}),
         |fills AS (SELECT user_id, fd AS day,
         |        CAST((n * (next_day - fd) + next_n * (fd - day))
         |          // (next_day - day) AS BIGINT) AS n,
         |        true AS interpolated
         |      FROM f0)
         |SELECT user_id, day, n, false AS interpolated FROM nx
         |UNION ALL SELECT user_id, day, n, interpolated FROM fills
         |ORDER BY user_id, day""".stripMargin,
    "q145_char_collision" ->
      s"""WITH scored AS (
         |  SELECT source,
         |    list_transform(string_split('$alphabet', ''),
         |      c -> CAST(length(text) - length(replace(text, c, '')) AS BIGINT))
         |      AS cnts
         |  FROM documents),
         |ppm AS (SELECT source,
         |    CASE WHEN list_sum(cnts) > 0 THEN
         |      CAST(list_sum(list_transform(cnts, x -> x * x)) * 1000000
         |        // (list_sum(cnts) * list_sum(cnts)) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS ppm
         |  FROM scored)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS avg_collision_ppm,
         |  CAST(MAX(ppm) AS BIGINT) AS max_collision_ppm
         |FROM ppm GROUP BY source ORDER BY source""".stripMargin,
    // the vintage split rebuilt with CASE projections over the one
    // canonical table — the mergeSchema union-by-name + null
    // back-fill must be exactly this
    "q165_schema_evolution" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN lang END AS lang,
        |    CASE WHEN doc_id % 2 = 1 THEN source END AS source,
        |    CASE WHEN doc_id % 2 = 1 THEN n_chars END AS n_chars
        |  FROM documents)
        |SELECT COALESCE(lang, '?') AS lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS sum_chars_new,
        |  CAST(SUM(CASE WHEN source IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new_vintage
        |FROM m GROUP BY 1 ORDER BY lang""".stripMargin,
    // the canonical per-source stats: matching them after the staged
    // corrupt-load + single-partition backfill proves the dynamic
    // overwrite repaired src3 AND left every other partition intact
    "q166_partition_backfill" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // q99's bin rule replayed over the canonical table; n_files = 1
    // is the compaction guarantee the rewrite must deliver per bin
    "q176_compaction_rewrite" ->
      s"""WITH f AS (SELECT source,
         |        doc_id // ${CorpusOpsQueries.fileGranule} AS file_id,
         |        CAST(SUM(n_chars) AS BIGINT) AS bytes
         |      FROM documents GROUP BY 1, 2),
         |p AS (SELECT source, file_id,
         |        CAST((SUM(bytes) OVER (PARTITION BY source
         |            ORDER BY file_id) - bytes)
         |          // ${CorpusOpsQueries.targetBytes} AS BIGINT) AS bin
         |      FROM f),
         |d AS (SELECT doc_id, d.source, n_chars, bin
         |      FROM documents d JOIN p
         |        ON p.source = d.source
         |        AND p.file_id = doc_id // ${CorpusOpsQueries.fileGranule})
         |SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
         |  CAST(1 AS BIGINT) AS n_files
         |FROM d GROUP BY 1, 2 ORDER BY source, bin""".stripMargin)
}
