package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 62-bit average-hash (aHash — the classic perceptual fingerprint:
  * partition the pixel stream into a fixed grid, bit c = cell mean ≥
  * global mean) over an opaque BINARY payload column, as one codegen'd
  * scan-stage pass. 62 cells so the fingerprint drops straight into
  * the SimHash infrastructure: the same 4×16-bit pigeonhole chunk keys
  * (complete for hamming ≤ 3) and `bit_count(xor)` verify as q28.
  *
  * The "pixels" are the payload bytes themselves — for a decoded
  * raster (e.g. [[graft.multimodal.PpmDecoder]] P6 output) that is the
  * interleaved RGB grid; for the corpus fixture payload (UTF-8 text
  * bytes, ASCII by convention — see q56's note) it is the byte stream
  * the DuckDB twin can recompute via `ascii()`. All-integer
  * arithmetic: bit c = cellSum·n ≥ totalSum·cellLen (exact cross-engine
  * mean comparison with no division), cell bounds ⌊c·n/62⌋ —
  * brightness-shift-robust the way aHash is, byte-position-robust the
  * way a mean is.
  */
case class AHash62(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ahash62 needs a binary payload, got ${child.dataType}")
  override def prettyName: String = "ahash62"

  override def nullSafeEval(input: Any): Any =
    AHash62.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.AHash62.hash($input);")

  override protected def withNewChildInternal(newChild: Expression): AHash62 =
    copy(child = newChild)
}

object AHash62 {
  val cells = 62

  /** Shared by interpreted eval and generated code. */
  def hash(p: Array[Byte]): Long = {
    val n = p.length.toLong
    if (n == 0) return 0L
    var total = 0L
    var i = 0
    while (i < p.length) { total += (p(i) & 0xff); i += 1 }
    var h = 0L
    var c = 0
    while (c < cells) {
      val lo = (c * n / cells).toInt
      val hi = ((c + 1) * n / cells).toInt
      if (hi > lo) {
        var cs = 0L
        i = lo
        while (i < hi) { cs += (p(i) & 0xff); i += 1 }
        // cell mean >= global mean, exactly: cs/len >= total/n
        if (cs * n >= total * (hi - lo)) h |= 1L << c
      }
      c += 1
    }
    h
  }

  def apply(payload: Column): Column =
    ColumnBridge.column(AHash62(ColumnBridge.expression(payload)))
}
