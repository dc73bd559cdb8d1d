package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, ModelOpsQueries, Tables}

/** Independent cross-checks for the corpus-modeling / incremental-ops
  * tier — the DuckDB oracle gates the values; these assert the
  * SEMANTICS against brute-force formulations the queries avoid at
  * scale, so a refactor that kept both engines wrong-in-the-same-way
  * would still fail here.
  */
class ModelOpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q133: familiarity == brute-force mean token probability") {
    val out = ModelOpsQueries.queries("q133_token_familiarity")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val toks = Tables(spark, dir, "documents")
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val corpusCount = toks.groupBy(_._2).map { case (t, xs) => t -> xs.length }
    val n = toks.length.toDouble
    for ((src, rows) <- toks.groupBy(_._1)) {
      val weight = rows.map(r => corpusCount(r._2).toDouble).sum
      val expected = weight / (rows.length.toDouble * n)
      val (nTok, fam) = out(src)
      assert(nTok === rows.length.toLong, s"source $src token count")
      // brute force sums doubles in arbitrary order — compare within eps
      assert(math.abs(fam - expected) < 1e-9, s"source $src familiarity")
    }
  }

  test("q134: transition rows sum to n_events - n_users with events") {
    val out = ModelOpsQueries.queries("q134_markov_transitions")(spark, dir)
      .collect()
    val ev = Tables.events(spark, dir)
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    // every user contributes (their event count - 1) transitions
    assert(out.map(_.getLong(2)).sum === nEvents - nUsers)
    // per-row probability is the integer share of its from-type total
    val totals = out.groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(2)).sum }
    for (r <- out)
      assert(r.getLong(3) === r.getLong(2) * 1000 / totals(r.getString(0)))
  }

  test("q135: continuation counts == brute-force distinct left contexts") {
    val out = ModelOpsQueries.queries("q135_kn_continuation")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val bigrams = Tables(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions
        .wordShingles(col("text"), 2)).as("bg"))
      .collect().map(_.getString(0)).distinct
    val cont = bigrams.map(_.split(" ")).groupBy(_(1))
      .map { case (r, xs) => r -> xs.map(_(0)).distinct.length.toLong }
    val expected = cont.toSeq.sortBy { case (t, n) => (-n, t) }.take(30)
    assert(out === expected)
  }

  test("q136: drift report halves partition the corpus") {
    val out = ModelOpsQueries.queries("q136_drift_report")(spark, dir)
      .collect()
    val total = Tables(spark, dir, "documents").count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum === total)
    for (r <- out) {
      val (nE, nO) = (r.getLong(1), r.getLong(2))
      assert(nE > 0 && nO > 0)
      val mE = r.getLong(3)
      val mO = r.getLong(4)
      assert(r.getLong(5) === math.abs(mE - mO) * 1000 / mE)
    }
  }

  test("q137: intersection estimate within 30% of exact on every pair") {
    val out = ModelOpsQueries.queries("q137_kmv_intersect")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val exact = r.getLong(2).toDouble
      val est = r.getDouble(5)
      // KMV inclusion-exclusion compounds three k=32 estimators (σ ≈
      // 1/√(k−2) ≈ 18% each); 30% of the EXACT value is the loose
      // sanity band for the fixture's heavily-overlapping user sets
      assert(math.abs(est - exact) <= 0.3 * exact + 1.0,
        s"${r.getString(0)}/${r.getString(1)}: est $est vs exact $exact")
    }
  }

  test("q139: linkage scores == brute-force over the sorted neighborhood") {
    val out = ModelOpsQueries.queries("q139_linkage_score")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(6)).toMap
    val recs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        array_distinct(graft.functions.TextFunctions.tokens(col("text")))
          .as("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getSeq[String](4).toSet))
      .sortBy(r => (r._4, r._1))
    val expected = scala.collection.mutable.Map[(Long, Long), Long]()
    for (i <- recs.indices; j <- (i + 1) to math.min(i + 8, recs.size - 1)) {
      val (a, b) = (recs(i), recs(j))
      val inter = (a._5 & b._5).size
      val union = a._5.size + b._5.size - inter
      var score = 0L
      score += (if (a._2 == b._2) 8 else -2)
      score += (if (a._3 == b._3) 6 else -6)
      score += (if (math.abs(a._4 - b._4) * 20 <= math.max(a._4, b._4)) 4 else -4)
      score += (if (inter * 2 >= union) 20 else -2)
      if (score >= 20) expected((a._1, b._1)) = score
    }
    assert(out === expected.toMap)
  }

  test("q140: OOV rates == brute-force top-V vocabulary") {
    val out = ModelOpsQueries.queries("q140_vocab_coverage")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val toks = Tables(spark, dir, "documents")
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(1000).map(_._1).toSet
    for ((src, rows) <- toks.groupBy(_._1)) {
      val oov = rows.filterNot(r => vocab(r._2))
      assert(out(src) === ((rows.length.toLong, oov.length.toLong,
        oov.map(_._2).distinct.length.toLong)), s"source $src")
    }
  }

  test("q141: drift == brute-force quantized centroid distance") {
    val out = ModelOpsQueries.queries("q141_centroid_drift")(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6).toLong)))
    val dims = vecs.head._2.size
    def centroid(xs: Seq[Seq[Long]]): Seq[Long] =
      (0 until dims).map(d => {
        val s = xs.map(_(d)).sum
        s / xs.size // exact: both engines truncate toward zero
      })
    val global = centroid(vecs.map(_._2).toSeq)
    for ((label, rows) <- vecs.groupBy(_._1)) {
      val c = centroid(rows.map(_._2).toSeq)
      val l1 = (0 until dims).map(d => math.abs(c(d) - global(d))).sum
      assert(out(label) === ((rows.length.toLong, l1)), s"label $label")
    }
  }

  test("q147: gini scores == brute-force impurity over the label lists") {
    val out = ModelOpsQueries.queries("q147_gini_split")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val d = Tables(spark, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = d.length.toLong
    def gini(xs: Seq[String]): Long =
      if (xs.isEmpty) 0L
      else {
        val m = xs.length.toLong
        val ss = xs.groupBy(identity).values
          .map(g => g.length.toLong * g.length).sum
        (m * m - ss) * 1000000L / (m * m)
      }
    def weighted(pred: ((String, String, Long)) => Boolean): (Long, Long, Long) = {
      val (l, r) = d.partition(pred)
      val w = (l.length * gini(l.map(_._2).toSeq) +
        r.length * gini(r.map(_._2).toSeq)) / n
      (l.length.toLong, r.length.toLong, w)
    }
    for (src <- d.map(_._1).distinct)
      assert(out(s"source=$src") === weighted(_._1 == src), s"source=$src")
    for (t <- Seq(100L, 150L, 200L, 250L, 300L, 350L, 400L, 450L, 500L))
      assert(out(s"n_chars<=$t") === weighted(_._3 <= t), s"n_chars<=$t")
    assert(out.size === d.map(_._1).distinct.length + 9)
  }

  test("q148: augmented moment matrix carries count, label sums and Xᵀy") {
    val out = ModelOpsQueries.queries("q148_gramian")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val rows = Tables(spark, dir, "embeddings")
      .select(col("embedding"), col("label").cast("long")).collect()
      .map(r => (r.getSeq[Float](0), r.getLong(1)))
    val d = rows.head._1.length // augmented dims: d embedding + 1 + label
    assert(out.size === (d + 2) * (d + 3) / 2)
    // (intercept, intercept) cell is the row count
    assert(out((d, d)) === rows.length.toLong)
    // (intercept, label) is Σy; (label, label) is Σy²
    assert(out((d, d + 1)) === rows.map(_._2).sum)
    assert(out((d + 1, d + 1)) === rows.map(y => y._2 * y._2).sum)
    // (k, intercept) is the micro-quantized column sum; (k, label) is Xᵀy
    def q(v: Float): Long = math.floor(v.toDouble * 1000000L).toLong
    for (k <- Seq(0, d - 1)) {
      assert(out((k, d)) === rows.map(r => q(r._1(k))).sum, s"col-sum dim $k")
      assert(out((k, d + 1)) === rows.map(r => q(r._1(k)) * r._2).sum,
        s"Xᵀy dim $k")
    }
  }

  test("q155: moment identity == brute-force O(n²) pairwise distances") {
    val out = ModelOpsQueries.queries("q155_embedding_diversity")(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val rows = Tables(spark, dir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1000L).toLong).toArray))
    for ((label, group) <- rows.groupBy(_._1)) {
      val vs = group.map(_._2)
      val n = vs.length.toLong
      // the O(n²) loop the query replaces with one aggregate pass
      var total = BigInt(0)
      for (a <- vs; b <- vs)
        total += a.zip(b).map { case (x, y) => BigInt(x - y) * (x - y) }.sum
      val meanPair = (total / BigInt(n * n)).toLong
      val meanNorm = vs.map(v => v.map(x => x * x).sum).sum / n
      val (gn, gPair, gNorm) = out(label)
      assert(gn === n, s"label $label n")
      assert(gPair === meanPair, s"label $label pairwise")
      assert(gNorm === meanNorm, s"label $label norm")
    }
  }

  test("q138: delta screen agrees with the full LSH pair list") {
    val out = ModelOpsQueries.queries("q138_delta_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    // q27/q64's full candidate generator (already floored at the 0.375
    // signature estimate), restricted to (delta, index) pairs — q138
    // keeps every bucket candidate, so it must cover all of these
    val pairs = DedupQueries.lshCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def inDelta(id: Long) = id >= 400L && id < 500L
    val crossPairs = pairs.filter { case (a, b, _) => inDelta(a) ^ inDelta(b) }
    // every high-estimate cross pair from the full run must be a q138
    // candidate for its delta side (the screen misses nothing the
    // clustered path would act on)
    for ((a, b, est) <- crossPairs if est >= 0.375) {
      val (deltaId, indexId) = if (inDelta(a)) (a, b) else (b, a)
      val (nCand, best) = out(deltaId)
      assert(nCand > 0, s"delta doc $deltaId missed candidate $indexId")
      assert(best.nonEmpty)
    }
    // and the delta set is exactly the 100-doc window with a signature
    assert(out.keySet.forall(inDelta))
    assert(out.size === 100)
  }
}
