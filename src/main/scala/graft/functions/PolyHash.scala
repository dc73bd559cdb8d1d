package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial string hash `fold(chars)((h, c) => (h*31 + c) mod P)`,
  * P = 2^31-1 — the cross-engine hash of TextFunctions, as a custom
  * Catalyst Expression.
  *
  * Why custom (SURVEY.md §2.9): the built-in formulation
  * (`aggregate(transform(split(s,''), ascii), ...)`) allocates an array
  * of one-char strings and walks an interpreted lambda chain per
  * character — microseconds per value. This expression is one tight
  * Java loop over UTF-16 units, participates in whole-stage codegen,
  * and computes the SAME value (chars are code units; identical to
  * DuckDB's per-character ascii() for BMP text — the corpus is ASCII).
  *
  * Used on the dedup hot path (shingle hashing feeds MinHash/SimHash
  * over millions of shingles); the DuckDB oracle twin stays
  * TextFunctions.sqlPolyHash.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.PolyHash.hash($input);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val P: Long = TextFunctions.P

  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * 31 + str.charAt(i)) % P
      i += 1
    }
    h
  }

  def apply(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
}
