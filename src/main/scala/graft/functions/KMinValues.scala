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

/** Bounded sorted set of the k smallest DISTINCT longs — the KMV
  * sketch state, kept as a primitive sorted array instead of a
  * `java.util.TreeSet[Long]`: the TreeSet boxed every insert/compare
  * and allocated a node per element, while here the common full-sketch
  * case is ONE primitive compare (`v >= max` → reject) and an accepted
  * value is a binary search plus an O(k) arraycopy — allocation-free.
  * Micro-benchmark (10M uniform adds, k=64, single thread, 3 rounds):
  * 150-240 ms vs 160-420 ms for the TreeSet formulation — a modest
  * ~1.5× once warm, because after the sketch fills BOTH paths reject
  * on the first compare; the structural win is zero boxing/GC pressure
  * per update, which is what matters inside a million-group aggregate.
  */
final class KMinBuffer(val k: Int) {
  private[functions] var values: Array[Long] = new Array[Long](math.min(k, 16))
  private[functions] var n: Int = 0

  def add(v: Long): Unit = {
    if (n == k && v >= values(n - 1)) return // full and not smaller: reject
    val i = java.util.Arrays.binarySearch(values, 0, n, v)
    if (i >= 0) return // already present
    val ins = -(i + 1)
    if (n == k) {
      // insert v at ins, dropping the current max (last slot)
      System.arraycopy(values, ins, values, ins + 1, k - 1 - ins)
      values(ins) = v
    } else {
      if (n == values.length)
        values = java.util.Arrays.copyOf(values, math.min(k, values.length * 2))
      System.arraycopy(values, ins, values, ins + 1, n - ins)
      values(ins) = v
      n += 1
    }
  }

  /** ascending copy of the current state */
  def toArray: Array[Long] = java.util.Arrays.copyOf(values, n)

  // value equality over (k, held values) — the capacity array beyond n
  // is scratch and must not participate
  override def equals(o: Any): Boolean = o match {
    case b: KMinBuffer =>
      b.k == k && b.n == n && java.util.Arrays.equals(b.values, 0, b.n, values, 0, n)
    case _ => false
  }
  override def hashCode: Int = {
    var h = k
    var i = 0
    while (i < n) { h = 31 * h + java.lang.Long.hashCode(values(i)); i += 1 }
    h
  }
}

/** KMV (k-minimum-values) distinct sketch as a custom
  * [[TypedImperativeAggregate]] — §7.3 tier (b) on the AGGREGATE side
  * (the scalar tier is the codegen Expressions; the whole-operator
  * tier is TopKPerGroup).
  *
  * State is the k smallest DISTINCT hash values seen (a bounded sorted
  * buffer: O(k) memory per group regardless of input size), merged by
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
  extends TypedImperativeAggregate[KMinBuffer] {

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

  override def createAggregationBuffer(): KMinBuffer = new KMinBuffer(k)

  override def update(buf: KMinBuffer, input: InternalRow): KMinBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KMinBuffer, other: KMinBuffer): KMinBuffer = {
    var i = 0
    while (i < other.n) { buf.add(other.values(i)); i += 1 }
    buf
  }

  override def eval(buf: KMinBuffer): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: KMinBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KMinBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KMinBuffer(k)
    // serialized form is ascending (the buffer's own order), so adds
    // append without shifting
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
