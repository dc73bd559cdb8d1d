package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a custom
  * Catalyst Expression — Spark ships no normalization builtin, and a
  * Scala UDF would break whole-stage codegen on what is by nature a
  * full-corpus scan-stage screen.
  *
  * `java.text.Normalizer` (JDK, public API) implements the same
  * Unicode canonical-composition algorithm (UAX #15) as DuckDB's
  * `nfc_normalize` (utf8proc), so the DuckDB oracle twin can recompute
  * the normalization exactly; cross-engine agreement on the woven
  * fixture sequences is what the q232 gate hashes.
  *
  * The fast path costs one `isNormalized` check (a table lookup per
  * char for already-NFC text — the overwhelming case in a real corpus)
  * and allocates only when composition actually changes the string.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($input);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
