package graft

import graft.tools.RetrievalPipeline
import org.apache.spark.sql.functions._

/** The composed retrieval-serving pipeline on sf0.001: index-serving
  * parity (the conjunctive answer from the sharded index must equal a
  * direct corpus screen — q110's proof at chunk grain), provenance
  * round-trip (each answer re-slices from its source doc to exactly
  * the indexed tokens), and ranking sanity.
  */
class RetrievalPipelineSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("dup", "spark")

  test("conjunctive index answer equals the direct chunk screen") {
    import graft.functions.TextFunctions._
    val chunkTable = RetrievalPipeline.chunks(spark, dir).cache()
    try {
      val index = graft.queries.CorpusOpsQueries.shardedIndex(
        chunkTable.select(col("chunk_uid").as("doc_id"), col("text")))
        .select(col("term"), col("shard"), col("postings"))
      val viaIndex = RetrievalPipeline.conjunctiveQuery(index, terms)
        .collect().map(_.getLong(0)).sorted
      val direct = chunkTable
        .where(terms.map(t => array_contains(tokens(col("text")), t))
          .reduce(_ && _))
        .select("chunk_uid").collect().map(_.getLong(0)).sorted
      assert(viaIndex.nonEmpty, "fixture must contain conjunctive matches")
      assert(viaIndex.toSeq === direct.toSeq,
        "index-served conjunctive answer drifted from the direct screen")
    } finally chunkTable.unpersist(blocking = false)
  }

  test("answers carry exact provenance and sane BM25 ranking") {
    import graft.functions.TextFunctions._
    val answers = RetrievalPipeline.run(spark, dir, terms, topK = 5)
    assert(answers.nonEmpty)
    assert(answers.map(_.rank) === (1 to answers.size))
    assert(answers.map(_.score) === answers.map(_.score).sorted.reverse,
      "scores must be non-increasing in rank")
    // provenance round-trip: re-slicing the source doc at
    // (start_tok, W) must reproduce a chunk containing every query
    // term (the chunk the index matched)
    val docIds = answers.map(_.docId)
    val toksByDoc = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id").isin(docIds: _*))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for (a <- answers) {
      val sliced = toksByDoc(a.docId)
        .slice(a.startTok.toInt, a.startTok.toInt + RetrievalPipeline.chunkW)
      for (t <- terms)
        assert(sliced.contains(t),
          s"answer doc=${a.docId} chunk=${a.chunkId} lost term '$t' on re-slice")
    }
  }
}
