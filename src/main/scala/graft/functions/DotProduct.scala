package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Left-fold double dot product of two numeric arrays:
  * `s_0 = 0; s_i = s_{i-1} + a_i * b_i` — the same summation ORDER as
  * the `aggregate(zip_with(...))` built-in formulation and the DuckDB
  * `list_reduce` twin, so results stay bit-identical across all three
  * (IEEE-754 is deterministic given order).
  *
  * Why custom (SURVEY.md §2.9): the HOF formulation allocates a zipped
  * array and walks interpreted lambdas per element — the dominant cost
  * of the similarity queries. This is one fused loop over the two
  * ArrayDatas, codegen-friendly, no allocation.
  *
  * Returns null if either input is null or lengths differ (the HOF
  * formulation's null-propagation on zip_with padding).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // null on length mismatch even when both inputs are non-nullable
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(
        s"dot_product needs array<float|double>, got array<$t>")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val af = elemIsFloat(left)
    val bf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      // null element → null result, matching the HOF formulation's
      // null propagation (zip_with product of a null is null, the
      // aggregate sum of a null is null)
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    // ctx.freshName for EVERY local: several DotProducts can fuse into
    // one codegen scope (e.g. the q37 centroid argmax evaluates 8 in a
    // single CreateArray), and fixed names make Janino reject the
    // function with "Redefinition of local variable".
    val s = ctx.freshName("dotSum")
    val n = ctx.freshName("dotLen")
    val nullElem = ctx.freshName("dotNullElem")
    val i = ctx.freshName("dotIdx")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  int $n = $a.numElements();
         |  boolean $nullElem = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $nullElem = true; break; }
         |    $s += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |  }
         |  if ($nullElem) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
