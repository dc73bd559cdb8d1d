package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch as a custom
  * [[TypedImperativeAggregate]] — §7.3 tier (b) on the AGGREGATE side
  * (the scalar tier is the codegen Expressions; the whole-operator
  * tier is TopKPerGroup).
  *
  * State is the k smallest DISTINCT hash values seen (a bounded
  * TreeSet: O(k) memory per group regardless of input size), merged by
  * set-union + truncate — associative and commutative, so map-side
  * partial aggregation applies and any shuffle/merge order yields the
  * SAME state. Unlike HLL (engine-specific register layout), the KMV
  * sketch VALUE is engine-independent: the k smallest of a
  * deterministic hash set is a pure function of the input, so the
  * DuckDB oracle reproduces it exactly with
  * `list_sort(list_distinct(list(h)))[:k]` and the driver hash-gate
  * compares sketches bit-for-bit — a fully gated approximate-distinct.
  *
  * Estimator (computed OUTSIDE in both engines from the same sketch):
  * if the sketch is full, distinct ≈ (k-1) * H / h_k where h_k is the
  * k-th smallest hash and H the hash range; if not full, the sketch
  * size IS the exact distinct count.
  *
  * Ref: Bar-Yossef et al., "Counting distinct elements in a data
  * stream" (RANDOM 2002) — the public KMV/bottom-k construction.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 1, "KMinValues needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  // analysis-time contract: the buffer stores longs, so a non-BIGINT
  // child must fail analysis rather than ClassCastException mid-job —
  // the function is reachable from raw SQL via the registry (which
  // casts integral inputs up to BIGINT for convenience)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"k_min_values requires BIGINT input, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def add(buf: java.util.TreeSet[Long], v: Long): Unit = {
    // reject early: values beyond the current k-th minimum can never
    // enter a full sketch, so the common case is one comparison
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) buf.remove(buf.last())
    }
  }

  override def update(buf: java.util.TreeSet[Long], input: InternalRow):
      java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[Long],
      other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinValues =
    copy(child = newChildren.head)

  override def prettyName: String = "k_min_values"
}

object KMinValues {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      KMinValues(ColumnBridge.expression(c), k).toAggregateExpression())
}
