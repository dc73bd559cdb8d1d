package graft

import org.apache.spark.sql.functions._

import graft.queries.{InsightOpsQueries, Tables}

/** Independent cross-checks for the insight/retrieval tier — the
  * DuckDB oracle gates the values; these assert the SEMANTICS against
  * formulations the queries deliberately avoid at scale (brute force,
  * self-joins), so a histogram/window refactor that kept both engines
  * wrong-in-the-same-way would still fail here.
  */
class InsightOpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q122: histogram median/MAD/outliers == brute force on collected values") {
    val out = InsightOpsQueries.queries("q122_mad_outliers")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val bySource = Tables(spark, dir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    assert(out.keySet === bySource.keySet)
    for ((src, rows) <- bySource) {
      val xs = rows.map(_._2).sorted
      // lower median: the value at 1-based rank ceil(n/2)
      def lowerMedian(v: Seq[Long]): Long = v((v.size + 1) / 2 - 1)
      val med = lowerMedian(xs.toSeq)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)).sorted.toSeq)
      val outliers = xs.count(x => math.abs(x - med) > 3 * mad)
      assert(out(src) === ((xs.size.toLong, med, mad, outliers.toLong)),
        s"source $src")
    }
  }

  test("q129: set-explode pair counts == distinct self-join formulation") {
    val out = InsightOpsQueries.queries("q129_cooccurrence")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val ue = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val selfJoin = ue.select(col("user_id"), col("event_type").as("a"))
      .join(ue.select(col("user_id"), col("event_type").as("b")), "user_id")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out === selfJoin)
  }

  test("q126: fused output is consistent with its own ranks") {
    val rows = InsightOpsQueries.queries("q126_rank_fusion")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val rKw = Option(r.get(1)).map(_.asInstanceOf[Int])
      val rVec = Option(r.get(2)).map(_.asInstanceOf[Int])
      assert(rKw.nonEmpty || rVec.nonEmpty, "doc in neither ranking")
      val expected = rKw.map(k => 1000000000L / (60 + k)).getOrElse(0L) +
        rVec.map(v => 1000000000L / (60 + v)).getOrElse(0L)
      assert(r.getLong(3) === expected, s"doc ${r.get(0)}")
    }
    // fused scores are emitted highest-first
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("q124: batch novelty sums to the distinct bigram vocabulary") {
    val out = InsightOpsQueries.queries("q124_vocab_growth")(spark, dir)
      .collect()
    val vocab = Tables(spark, dir, "documents")
      .select(explode(array_distinct(
        graft.functions.TextFunctions.wordShingles(col("text"), 2))).as("bg"))
      .agg(countDistinct(col("bg"))).head().getLong(0)
    assert(out.map(_.getLong(2)).sum === vocab)  // Σ new == |vocab|
    assert(out.last.getLong(3) === vocab)        // final cumulative
    // cumulative column is the running sum of the novelty column
    assert(out.map(_.getLong(3)).toSeq ===
      out.map(_.getLong(2)).scanLeft(0L)(_ + _).tail.toSeq)
  }
}
