package graft

import org.apache.spark.sql.functions._

/** q224's content-defined chunking: the shift-resistance property that
  * motivates CDC over fixed windows (Muthitacharoen et al., SOSP 2001)
  * — an edit re-fingerprints only the chunks it touches.
  */
class CdcSpec extends SparkSuite {

  private def chunkFps(docs: Seq[(Long, Seq[String])]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    graft.queries.DedupQueries.cdcChunks(docs.toDF("doc_id", "toks"))
      .orderBy("doc_id", "chunk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)))
      .groupBy(_._1).map { case (d, rows) => d -> rows.map(_._2).toSeq }
  }

  private val base = ("key agg row scan slow fast table value part hash " +
    "merge batch line sort window the a spark").split(" ").toSeq

  test("a prefix insertion preserves every chunk past the first boundary") {
    val fps = chunkFps(Seq(1L -> base, 2L -> ("inserted" +: base)))
    val (orig, edited) = (fps(1L), fps(2L))
    // all original chunks except the first (the only one whose content
    // the insertion touched) must reappear verbatim in the edited doc
    assert(orig.tail.forall(edited.contains),
      s"shifted chunks lost: orig=$orig edited=$edited")
    // and the shared suffix is in fact most of the doc
    assert(orig.tail.nonEmpty)
  }

  /** Boundary-ness of a token under q224's rule, via the same Spark
    * expressions (spreadHash % cdcMod == 0).
    */
  private def isBoundary(tokens: Seq[String]): Seq[Boolean] = {
    import spark.implicits._
    tokens.toDF("w")
      .select((graft.functions.TextFunctions.spreadHash(col("w")) % 8 === 0)
        .as("b"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  test("a mid-document edit touches only the edited chunk's fingerprint") {
    // pick a position whose ORIGINAL token is not a boundary, and a
    // replacement that is not one either — then the edit is interior
    // to one chunk and exactly one fingerprint may change (if either
    // were a boundary, chunks would legitimately merge/split — that is
    // CDC working, not failing, but it is not what this test pins)
    val bounds = isBoundary(base)
    val p = bounds.indexWhere(!_)
    val replacement = Seq("changed", "altered", "edited")
      .find(t => !isBoundary(Seq(t)).head).get
    val edited = base.updated(p, replacement)
    val fps = chunkFps(Seq(1L -> base, 2L -> edited))
    val diff = fps(1L).toSet.diff(fps(2L).toSet)
    assert(diff.size === 1, s"edit bled across chunks: $diff (pos=$p)")
  }

  test("identical passages at different offsets share chunk fingerprints") {
    // the cross-doc dedup property: doc 2 embeds doc 1's content after
    // an unrelated preamble of different length
    val fps = chunkFps(Seq(
      1L -> base,
      2L -> (Seq("zz", "yy", "xx") ++ base)))
    assert(fps(1L).tail.forall(fps(2L).contains))
  }
}
