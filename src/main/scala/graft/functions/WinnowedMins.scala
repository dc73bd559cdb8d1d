package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sliding-window minima of a long array: element i =
  * `min(a[i], ..., a[i+w-1])` — the winnowing pass of document
  * fingerprinting (Schleimer/Wilkerson/Aiken, SIGMOD'03): applied to
  * positional k-gram hashes, the distinct window minima form a
  * position-robust fingerprint set with guaranteed match coverage.
  *
  * Arrays shorter than w yield an empty array. One monotone-deque pass,
  * O(n) regardless of window size; the HOF formulation
  * (`transform(sequence, i => array_min(slice(a, i, w)))`) walks
  * interpreted lambdas and allocates a slice per window.
  */
case class WinnowedMins(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowed_mins"

  override def nullSafeEval(input: Any): Any =
    WinnowedMins.mins(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.WinnowedMins.mins($input, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowedMins =
    copy(child = newChild)
}

object WinnowedMins {

  /** Shared by interpreted eval and generated code. Monotone deque of
    * candidate indices: head is the current window's minimum.
    */
  def mins(a: ArrayData, w: Int): GenericArrayData = {
    val n = a.numElements()
    val m = n - w + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    val deque = new Array[Int](n) // indices, increasing values
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = a.getLong(deque(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, w: Int): Column =
    ColumnBridge.column(WinnowedMins(ColumnBridge.expression(c), w))
}
