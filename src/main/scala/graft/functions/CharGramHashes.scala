package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial hashes of every character n-gram of a string:
  * element i = `PolyHash(s.substring(i, i + n))`, one pass over the
  * string — strings shorter than n yield an empty array.
  *
  * Why custom (SURVEY.md §2.9): the built-in formulation
  * (`transform(sequence(1, length-n+1), i => polyHash(substr(s, i, n)))`)
  * materializes a substring per position and re-walks the byte prefix
  * for each `substr` — O(len²) per value with per-gram allocation. This
  * is one tight loop, no allocation beyond the output array, and
  * codegen-friendly. Values are pinned equal to the HOF formulation by
  * spec; the DuckDB twin stays `sqlPolyHash(substring(...))` over a
  * positions range.
  *
  * Used by q26 (4-gram Jaccard: grams join as longs, not strings — an
  * 8-byte shuffle key instead of a heap string) and q24 (8-gram
  * winnowing anchors).
  */
case class CharGramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "gram width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    CharGramHashes.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.CharGramHashes.hashes($input, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

object CharGramHashes {
  private val P = TextFunctions.P

  /** Shared by interpreted eval and generated code. */
  def hashes(s: UTF8String, n: Int): GenericArrayData = {
    val str = s.toString
    val m = str.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = i
      while (j < i + n) {
        h = (h * 31 + str.charAt(j)) % P
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(CharGramHashes(ColumnBridge.expression(c), n))
}
