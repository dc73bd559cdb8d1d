package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-character occurrence counts of a FIXED alphabet in one pass —
  * `charClassCounts(text)(i)` = how often `alphabet(i)` occurs in
  * `text`.
  *
  * Why custom (SURVEY.md §2.9): the built-in formulation
  * (`transform(split(alpha,''), c -> length(s) - length(replace(s,c)))`)
  * rescans the string once per alphabet char and ALLOCATES a fresh
  * string per `replace` — 39 copies of every document per row (q145's
  * hot path: 8.2 s at the 10× fixture). This expression walks the
  * UTF-16 units once, bumping a counter per char through a 128-slot
  * direct-index table, and participates in whole-stage codegen. Chars
  * outside the alphabet (or ≥ U+0080) are ignored — exactly the
  * built-in formulation's semantics for an ASCII alphabet, and the
  * DuckDB twin keeps the replace() formulation as the oracle.
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "char_class_counts"

  override def nullSafeEval(input: Any): Any =
    CharClassCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.CharClassCounts.counts($input);")

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}

object CharClassCounts {

  /** The q145 counting alphabet. A fixed engine constant (like the
    * MinHash parameter stream): the SQL twin embeds the same literal.
    */
  val alphabet: String = "abcdefghijklmnopqrstuvwxyz0123456789 .,"

  /** slot(c) = index into [[alphabet]], or -1. Direct-index table —
    * no per-char branching beyond the bounds check.
    */
  private val slot: Array[Int] = {
    val t = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  /** Shared by interpreted eval and generated code. */
  def counts(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new Array[Long](alphabet.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i).toInt
      if (c < 128) {
        val k = slot(c)
        if (k >= 0) out(k) += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(CharClassCounts(ColumnBridge.expression(c)))
}
