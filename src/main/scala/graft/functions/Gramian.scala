package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Packed upper-triangle moment accumulator: cell (i, j), i ≤ j, lives
  * at `i*d - i*(i-1)/2 + (j-i)`. Dimension is locked by the first row;
  * a mismatched row fails fast (ragged vectors are corrupt input for a
  * moment matrix, not data to skip).
  */
final class GramianBuffer {
  private[functions] var d: Int = -1
  private[functions] var s: Array[Long] = null

  private def init(dim: Int): Unit = {
    d = dim
    s = new Array[Long](dim * (dim + 1) / 2)
  }

  def add(m: ArrayData): Unit = {
    val n = m.numElements()
    if (d < 0) init(n)
    else require(n == d, s"gramian: vector of dim $n after dim $d")
    var i = 0
    var base = 0
    while (i < n) {
      val mi = m.getLong(i)
      var j = i
      while (j < n) {
        s(base + j - i) += mi * m.getLong(j)
        j += 1
      }
      base += n - i
      i += 1
    }
  }

  def merge(o: GramianBuffer): Unit = {
    if (o.d < 0) return
    if (d < 0) init(o.d)
    else require(o.d == d, s"gramian: merging dim ${o.d} into dim $d")
    var i = 0
    while (i < s.length) { s(i) += o.s(i); i += 1 }
  }

  /** cells as a plain map — spec/inspection surface */
  def cells: Map[(Int, Int), Long] =
    if (d < 0) Map.empty
    else {
      var k = 0
      val b = Map.newBuilder[(Int, Int), Long]
      for (i <- 0 until d; j <- i until d) { b += ((i, j) -> s(k)); k += 1 }
      b.result()
    }

  override def equals(o: Any): Boolean = o match {
    case b: GramianBuffer =>
      b.d == d && (d < 0 || java.util.Arrays.equals(b.s, s))
    case _ => false
  }
  override def hashCode: Int =
    31 * d + (if (d < 0) 0 else java.util.Arrays.hashCode(s))
}

/** One-pass exact moment matrix (Gramian, XᵀX) over quantized integer
  * vectors, as a [[TypedImperativeAggregate]] — the normal-equations
  * primitive for fitting linear probes/regressions on an embedding
  * column at corpus scale.
  *
  * The declarative formulation (posexplode × posexplode, then a
  * (dim_i, dim_j) aggregate) fans every row out ×d(d+1)/2 — 2,080
  * shuffle-input rows per document at d=64 — before the shuffle can
  * combine anything. Here the fan-out never exists: each partition
  * folds its rows into ONE fixed d(d+1)/2-long state (16.6 KB at
  * d=64), and the shuffle moves exactly one state per partition.
  * Merge is elementwise add — associative and commutative, so
  * map-side partials apply and any merge order yields the same state
  * bit-for-bit (integer sums; the float formulation would be
  * order-dependent).
  *
  * Input contract: a BIGINT array, the caller's quantization of the
  * float vector (micro-units for embedding dims; the caller may append
  * an intercept-1 and a raw label dim to get the full augmented-moment
  * matrix [X 1 y]ᵀ[X 1 y] — XᵀX, column sums, row count, Xᵀy, yᵀy —
  * in the same single pass). Integer headroom: |q| ≤ 1e6 micro-units
  * gives per-row products ≤ 1e12, so sums stay exact to ~9e6 rows per
  * matrix; past that, quantize to milli-units (1e3) — same plan, the
  * tolerance moves into the quantization where it is explicit and
  * engine-independent, never into float summation order.
  */
case class Gramian(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramianBuffer] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gramian requires ARRAY<BIGINT> input, got ${t.sql}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): GramianBuffer = new GramianBuffer

  override def update(buf: GramianBuffer, input: InternalRow): GramianBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: GramianBuffer, other: GramianBuffer): GramianBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: GramianBuffer): Any = {
    if (buf.d < 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](buf.s.length)
    var i = 0
    var k = 0
    while (i < buf.d) {
      var j = i
      while (j < buf.d) {
        out(k) = new GenericInternalRow(
          Array[Any](i, j, buf.s(k)))
        j += 1
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  // d is serialized verbatim — including 0 — so a buffer that has
  // locked dimension 0 (a zero-length vector was seen) stays distinct
  // from the uninitialized sentinel -1; otherwise a later merge with a
  // nonzero-dim partial would silently pass the ragged-input check.
  override def serialize(buf: GramianBuffer): Array[Byte] = {
    if (buf.d < 0) {
      val bb = ByteBuffer.allocate(4); bb.putInt(-1); return bb.array()
    }
    val bb = ByteBuffer.allocate(4 + 8 * buf.s.length)
    bb.putInt(buf.d)
    var i = 0
    while (i < buf.s.length) { bb.putLong(buf.s(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramianBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val buf = new GramianBuffer
    if (d >= 0) {
      buf.d = d
      buf.s = new Array[Long](d * (d + 1) / 2)
      var i = 0
      while (i < buf.s.length) { buf.s(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Gramian =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Gramian =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Gramian =
    copy(child = newChildren.head)

  override def prettyName: String = "gramian"
}

object Gramian {
  def apply(c: Column): Column =
    ColumnBridge.column(
      Gramian(ColumnBridge.expression(c)).toAggregateExpression())
}
