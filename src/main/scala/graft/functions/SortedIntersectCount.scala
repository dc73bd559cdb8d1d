package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Count of common elements of two SORTED DISTINCT arrays (BIGINT or
  * STRING elements) — one merge pass, no allocation.
  *
  * This is the set-overlap verification kernel of the dedup tier: given
  * candidate pairs (from an LSH/band generator at scale, or a bounded
  * slice in the exact tier), `intersect / (|a| + |b| - intersect)` is
  * the exact Jaccard. The built-in (`size(array_intersect(a, b))`)
  * builds a hash set and an output array per pair; this is a codegen'd
  * two-pointer walk. The STRING variant lets exact-verify paths count
  * string equality directly, keeping hash collisions out of bit-exact
  * gates (binary UTF-8 compare matches Spark's and DuckDB's default
  * string sort order, so `array_sort` / `list_sort` feed it directly).
  *
  * Inputs MUST be sorted ascending with no duplicates (the q26 shape:
  * `array_sort(array_distinct(...))`); behavior on unsorted input is
  * unspecified.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  private lazy val isString: Boolean = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    if (isString)
      SortedIntersectCount.countStr(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    else
      SortedIntersectCount.count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isString) "countStr" else "count"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.$fn($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Shared by interpreted eval and generated code. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** STRING-element walk: binary UTF-8 compare (UTF8String ordering,
    * identical to the unsorted-codepoint order array_sort uses).
    */
  def countStr(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
