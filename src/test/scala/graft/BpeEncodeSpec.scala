package graft

import graft.ext.BpeTrainer
import graft.functions.{BpeCodec, BpeEncodeIds, TextFunctions}
import org.apache.spark.sql.functions._

/** BpeEncodeIds custom Expression: hand-computed fixture, greedy-scan
  * equivalence with BpeTrainer.Model.encode on the real corpus vocab,
  * and codegen parity.
  */
class BpeEncodeSpec extends SparkSuite {

  private def mergedId(sym: String): Long =
    BpeCodec.idBase + BpeCodec.merges.indexWhere { case (a, b) => a + b == sym }

  test("hand-computed fixture encodes exactly") {
    import spark.implicits._
    // "the"      → t|h|e → (t,h)=th → (th,e)=the           → [the]
    // "thinking" → (t,h)=th, (i,n)×2=in,in → (in,g)=ing    → [th,in,k,ing]
    // "and"      → (a,n)=an → (an,d)=and                   → [and]
    // "stone"    → (o,n)=on, (s,t)=st                      → [st,on,e]
    // "zzz"      → no rule matches                         → [z,z,z]
    val expected = Seq(
      Seq(mergedId("the")),
      Seq(mergedId("th"), mergedId("in"), 'k'.toLong, mergedId("ing")),
      Seq(mergedId("and")),
      Seq(mergedId("st"), mergedId("on"), 'e'.toLong),
      Seq('z'.toLong, 'z'.toLong, 'z'.toLong))
    // NOTE "thinking": after (t,h) the symbols are th|i|n|k|i|n|g; rule
    // (i,n) merges BOTH occurrences in one pass; (in,g) then merges the
    // final in|g. (th,e) never fires (no e).
    val got = Seq("the", "thinking", "and", "stone", "zzz").toDF("w")
      .select(BpeEncodeIds(array(col("w"))).as("ids"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(got === expected)
  }

  test("per-doc ids are the concatenation of per-token encodes") {
    import spark.implicits._
    val both = Seq(("the stone", "the", "stone")).toDF("d", "w1", "w2")
      .select(
        BpeEncodeIds(TextFunctions.tokens(col("d"))).as("doc"),
        concat(BpeEncodeIds(array(col("w1"))),
          BpeEncodeIds(array(col("w2")))).as("cat"))
      .collect().head
    assert(both.getSeq[Long](0) === both.getSeq[Long](1))
  }

  test("empty token array encodes to an empty id array") {
    import spark.implicits._
    val n = Seq("1234 !!").toDF("text")
      .select(size(BpeEncodeIds(TextFunctions.tokens(col("text")))))
      .collect().head.getInt(0)
    assert(n === 0)
  }

  test("expression ≡ BpeTrainer.Model.encode over the corpus vocabulary") {
    // the driver-side reference encoder applies the same ranked greedy
    // passes; ids derive from the symbols it emits — two independent
    // code paths, one contract, checked on every distinct corpus word
    val model = BpeTrainer.Model(BpeCodec.merges, 0)
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
    // the synthetic corpus draws from a small fixed vocabulary (~31
    // words at sf0.001) — every one of them goes through both encoders
    assert(words.length > 20)
    val got = {
      import spark.implicits._
      words.toSeq.toDF("w")
        .select(col("w"), BpeEncodeIds(array(col("w"))).as("ids"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    }
    for (w <- words) {
      val expected = model.encode(w).map { s =>
        if (s.length == 1) s.charAt(0).toLong else mergedId(s)
      }
      assert(got(w) === expected, s"word '$w'")
    }
  }

  test("the expression encodes with CORPUS-TRAINED merges too (trainer → encoder loop)") {
    // BpeEncodeIds takes any ranked merge table — the production loop
    // is train once (vocab-bounded) then encode the corpus with the
    // learned rules; ids here are idBase + trained-rule rank
    import org.apache.spark.sql.graft.ColumnBridge
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = BpeTrainer.train(docs, "text", numMerges = 8)
    assert(model.merges.nonEmpty)
    val trainedRank = model.merges.zipWithIndex
      .map { case ((a, b), r) => (a + b) -> (BpeCodec.idBase + r).toLong }.toMap
    val got = docs.limit(50)
      .select(col("doc_id"), ColumnBridge.column(graft.functions.BpeEncodeIds(
        ColumnBridge.expression(TextFunctions.tokens(col("text"))),
        model.merges)).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val texts = docs.limit(50).select(col("doc_id"), col("text")).collect()
    for (r <- texts) {
      val toks = r.getString(1).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val expected = toks.toSeq.flatMap(w => model.encode(w)).map { s =>
        if (s.length == 1) s.charAt(0).toLong else trainedRank(s)
      }
      assert(got(r.getLong(0)) === expected, s"doc ${r.getLong(0)}")
    }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq("the thinking ostrich and a stone undergo turning").toDF("text")
    def vals(codegen: String): Seq[Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(BpeEncodeIds(TextFunctions.tokens(col("text"))))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
  }
}
