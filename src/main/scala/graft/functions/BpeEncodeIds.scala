package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fixed ranked BPE merge table shared by the Spark encoder
  * ([[BpeEncodeIds]]) and its DuckDB twin (the q159 oracle renders the
  * SAME rules as an unrolled CTE chain — the TextFunctions rule: one
  * set of constants generates both engines' formulations).
  *
  * In production the merges come from [[graft.ext.BpeTrainer]] (train
  * once, vocab-bounded) and reach the executors as a tiny broadcast
  * inside the Expression — the table is ranked and applied IN ORDER,
  * the standard greedy BPE encode (Sennrich et al. 2016, public).
  *
  * Two structural invariants, `require`d below:
  *  - every rule has `a != b` (as strings). Within one rule's pass a
  *    match at position i and i+1 would need s(i+1) = b = a, so under
  *    a != b match positions are never adjacent and the greedy
  *    left-to-right scan ≡ "merge every matching position" — the
  *    locally-testable form the SQL twin evaluates. (The Spark
  *    encoder implements the true sequential scan and so stays
  *    correct for arbitrary rules; the invariant is what makes the
  *    cross-engine proof airtight.)
  *  - merged outputs are pairwise distinct and multi-char, so
  *    token id = 128 + rule rank is well-defined and disjoint from
  *    the single-char id space (tokens are [a-z]+ → ids 97..122).
  */
object BpeCodec {
  /** 16 chained rules over the letter-run token charset; later rules
    * consume earlier outputs ((t,h) → (th,e), (a,n) → (an,d), ...).
    */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "o" -> "n", "e" -> "r", "r" -> "e", "a" -> "t",
    "e" -> "n", "n" -> "d", "s" -> "t", "e" -> "s",
    "o" -> "r", "an" -> "d", "in" -> "g", "o" -> "u")

  require(merges.forall { case (a, b) => a != b },
    "every merge rule needs a != b (adjacency-free match positions)")
  require(merges.map { case (a, b) => a + b }.distinct.size == merges.size,
    "merged outputs must be pairwise distinct (id = 128 + rank)")
  require(merges.forall { case (a, b) => (a + b).length > 1 },
    "merged outputs must be multi-char (disjoint from the char id space)")

  /** Token id of a merged symbol: 128 + rule rank (chars are 97..122). */
  val idBase = 128
}

/** Greedy BPE encode of a token array to token ids, as ONE codegen'd
  * scan-stage pass — the corpus-scale tokenization step the trained
  * merge table implies (the [[graft.ext.BpeTrainer]] trainer computes
  * the merges; this applies them to every document with no shuffle).
  * Per token: split to chars, apply each ranked merge rule in order as
  * a greedy left-to-right pass (identical to `BpeTrainer.Model.encode`,
  * pinned by spec), emit ids in sequence order; per doc: token encodes
  * concatenate. Single-char symbol → its codepoint; merged symbol →
  * `BpeCodec.idBase + rank` of the rule that produced it.
  */
case class BpeEncodeIds(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  private lazy val ma: Array[String] = merges.map(_._1).toArray
  private lazy val mb: Array[String] = merges.map(_._2).toArray

  override def nullSafeEval(input: Any): Any =
    BpeEncodeIds.encode(input.asInstanceOf[ArrayData], ma, mb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val maRef = ctx.addReferenceObj("bpeMa", ma, "java.lang.String[]")
    val mbRef = ctx.addReferenceObj("bpeMb", mb, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.BpeEncodeIds.encode($input, $maRef, $mbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

object BpeEncodeIds {

  /** Shared by interpreted eval and generated code. */
  def encode(tokens: ArrayData, ma: Array[String], mb: Array[String]): ArrayData = {
    val nTok = tokens.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var t = 0
    while (t < nTok) {
      val w = tokens.getUTF8String(t).toString
      var len = w.length
      val sym = new Array[String](len)
      val id = new Array[Long](len)
      var i = 0
      while (i < len) {
        sym(i) = String.valueOf(w.charAt(i))
        id(i) = w.charAt(i).toLong
        i += 1
      }
      var r = 0
      while (r < ma.length) {
        val a = ma(r)
        val b = mb(r)
        // greedy left-to-right pass for rule r, compacted in place
        var outN = 0
        i = 0
        while (i < len) {
          if (i + 1 < len && sym(i) == a && sym(i + 1) == b) {
            sym(outN) = a + b
            id(outN) = BpeCodec.idBase + r
            i += 2
          } else {
            sym(outN) = sym(i)
            id(outN) = id(i)
            i += 1
          }
          outN += 1
        }
        len = outN
        r += 1
      }
      i = 0
      while (i < len) { out += id(i); i += 1 }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(tokens: Column): Column =
    ColumnBridge.column(
      BpeEncodeIds(ColumnBridge.expression(tokens), BpeCodec.merges))
}
