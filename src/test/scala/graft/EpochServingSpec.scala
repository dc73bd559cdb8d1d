package graft

import graft.queries.{DedupQueries, ModelOpsQueries, SimilarityQueries,
  Tables, TextAnalysisQueries}
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the epoch/serving tier (q149-q152) on
  * the sf0.001 fixture: the DuckDB oracle gates the values; these
  * re-derive the semantics with in-memory reference implementations so
  * a both-engines-wrong refactor still fails.
  */
class EpochServingSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q149: epoch shares equalize langs up to the 32x cap, rep counts exact") {
    val out = TextAnalysisQueries.queries("q149_epoch_mix")(spark, dir)
      .groupBy("lang", "doc_id").agg(count(lit(1)).as("reps"),
        max(col("rep")).as("max_rep"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // every doc's reps form the contiguous 1..reps sequence
    for (((_, id), (reps, maxRep)) <- out)
      assert(maxRep === reps, s"doc $id rep sequence has holes")
    // reference rep counts from the mixture arithmetic + the hash draw
    val draws = Tables(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        pmod(graft.functions.TextFunctions.polyHash(col("text")), lit(1000))
          .as("draw"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val counts = draws.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val maxN = counts.values.max
    for ((lang, id, draw) <- draws) {
      val rMilli = math.min(maxN * 1000L / counts(lang), 32000L)
      val expected = rMilli / 1000L + (if (draw < rMilli % 1000L) 1L else 0L)
      assert(out((lang, id))._1 === expected, s"doc $id reps")
    }
    // the big lang stays at 1x; every rarer lang is upsampled
    val perLang = out.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._1).sum).toMap
    val bigLang = counts.maxBy(_._2)._1
    assert(perLang(bigLang) === counts(bigLang), "largest lang must stay 1x")
    for ((lang, n) <- counts if lang != bigLang && n < maxN)
      assert(perLang(lang) > n, s"lang $lang was not upsampled")
  }

  test("q150: per-cluster argmax by (quality, doc_id) over the q64 components") {
    val out = DedupQueries.queries("q150_keep_best")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val labels = DedupQueries.componentLabels(
      DedupQueries.lshCandidates(spark, dir).select(col("doc_a"), col("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val quality = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = labels.groupBy(_._2).map { case (label, members) =>
      val ms = members.map(_._1)
      val best = ms.maxBy(id => (quality(id), id))
      label -> (ms.size.toLong, best, quality(best))
    }
    assert(out === expected)
    // every cluster has >= 2 members (singletons never enter the pair graph)
    assert(out.values.forall(_._1 >= 2L))
  }

  test("q151: int8 quantization error matches a pure-Scala reference") {
    val out = SimilarityQueries.queries("q151_int8_quant")(spark, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val rows = Tables(spark, dir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val micro = rows.map { case (l, v) =>
      (l, v.map(x => math.floor(x.toDouble * 1000000L).toLong))
    }
    val d = micro.head._2.length
    val scales = Array.tabulate(d)(k => micro.map(_._2(k).abs).max)
    val errs = micro.map { case (l, m) =>
      l -> m.zipWithIndex.map { case (v, k) =>
        val q8 = v.abs * 127L / scales(k)
        val deq = (if (v < 0) -1L else 1L) * (q8 * scales(k) / 127L)
        (v - deq).abs
      }
    }
    for ((label, group) <- errs.groupBy(_._1)) {
      val e = group.flatMap(_._2)
      val (n, mx, mean, ssq) = out(label)
      assert(n === e.length.toLong, s"label $label n")
      assert(mx === e.max, s"label $label max")
      assert(mean === e.sum / e.length, s"label $label mean")
      assert(ssq === e.map(x => x * x).sum, s"label $label ssq")
      // int8 with per-dim max-abs scale: error < scale/127 + 1 micro
      assert(mx <= scales.max / 127L + 1L, s"label $label error bound")
    }
  }

  test("q152: lift matches a pure-Scala skip-gram reference") {
    val out = ModelOpsQueries.queries("q152_skipgram_pmi")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val toks = Tables(spark, dir, "documents")
      .select(graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .collect().map(_.getSeq[String](0).toArray)
    val pairs = toks.flatMap { tk =>
      tk.sliding(2).filter(_.length == 2).map(w => s"${w(0)} ${w(1)}") ++
        tk.sliding(3).filter(_.length == 3).map(w => s"${w(0)} ${w(2)}")
    }
    val pairCounts = pairs.groupBy(identity).view
      .mapValues(_.length.toLong).filter(_._2 >= 5L).toMap
    val uni = toks.flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val nTok = uni.values.sum
    assert(out.keySet === pairCounts.keySet)
    for ((pair, nXy) <- pairCounts) {
      val Array(x, y) = pair.split(" ")
      val (gNxy, gNx, gNy, gLift) = out(pair)
      assert(gNxy === nXy, s"$pair n_xy")
      assert(gNx === uni(x) && gNy === uni(y), s"$pair unigram counts")
      val expected = nXy.toDouble * nTok.toDouble /
        (uni(x).toDouble * uni(y).toDouble)
      assert(math.abs(gLift - expected) < 1e-12 * expected, s"$pair lift")
    }
  }
}
