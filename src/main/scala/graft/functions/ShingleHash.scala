package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-n-shingle polynomial hashes straight from a token array:
  * element i = `PolyHash(tokens[i] + " " + ... + tokens[i+n-1])`,
  * computed WITHOUT materializing the shingle strings — the hash folds
  * over each token's chars and a synthetic space between tokens.
  *
  * Semantically identical to
  * `transform(wordShinglesFromTokens(toks), s => polyHash(s))`
  * (pinned by spec); docs with fewer than n tokens yield an empty
  * array. Replaces the dominant interpreted cost of the MinHash/SimHash
  * pipelines (per-shingle `slice` + `concat_ws` allocation).
  */
case class ShingleHash(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash"

  override def nullSafeEval(input: Any): Any =
    ShingleHash.hashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.ShingleHash.hashes($input, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  private val P = TextFunctions.P

  /** Shared by interpreted eval and generated code. */
  def hashes(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      toks(i) = tokens.getUTF8String(i).toString
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = 0L
      var j = i
      while (j < i + n) {
        val t = toks(j)
        var c = 0
        while (c < t.length) {
          h = (h * 31 + t.charAt(c)) % P
          c += 1
        }
        if (j < i + n - 1) h = (h * 31 + ' ') % P
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(tokens), n))
}
