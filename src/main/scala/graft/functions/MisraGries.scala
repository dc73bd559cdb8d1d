package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items state: at most k (item → count) counters.
  *
  * Update: a tracked item increments; an untracked item takes a free
  * counter if one exists, else ALL counters decrement by one (zeros
  * evicted) — O(k) only on that overflow path, k is small by design.
  * Merge: counter-wise sum, then reduce back to k counters by
  * subtracting the (k+1)-th largest count from every counter and
  * evicting non-positives — the mergeable-summaries reduction
  * (Agarwal et al., "Mergeable summaries", PODS 2012; the guarantee
  * `true − n/(k+1) ≤ est ≤ true` survives ANY merge tree).
  */
final class MGBuffer(val k: Int) {
  private[graft] val counts = new mutable.HashMap[String, Long]

  def add(item: String, w: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + w)
      case None if counts.size < k => counts.update(item, w)
      case None =>
        // decrement-all by min(w, current min) would still be O(k·w)
        // for big w; the standard weighted step: insert, then reduce
        counts.update(item, w)
        reduceToK()
    }
  }

  private[functions] def reduceToK(): Unit = {
    if (counts.size <= k) return
    // (k+1)-th largest count = the smallest survivor's bar
    val sorted = counts.values.toArray
    java.util.Arrays.sort(sorted)
    val bar = sorted(sorted.length - (k + 1)) // (k+1)-th largest
    val dead = counts.iterator.flatMap { case (i, c) =>
      if (c - bar <= 0) Some(i) else None
    }.toList
    dead.foreach(counts.remove)
    counts.mapValuesInPlace((_, c) => c - bar)
  }
}

/** Heavy-hitters (frequent items) as the second custom
  * [[TypedImperativeAggregate]] (§7.3 tier (b); KMV was the first).
  *
  * The ESTIMATES are order- and partitioning-dependent (any bounded
  * counter summary's are), so the sketch VALUE cannot be hash-gated the
  * q86 way. Its GUARANTEES are deterministic, and that is what q95
  * gates (the q81/q88 tolerance pattern): after any merge order,
  * `est ≤ true` and `true − est ≤ n/(k+1)`, hence every item with
  * `true > n/(k+1)` is present. The gated query outputs those
  * guaranteed-TRUE booleans against the exact twin; the oracle emits
  * the literals.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  require(k >= 1, "misra_gries needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires STRING input, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    other.counts.foreach { case (i, c) =>
      buf.counts.update(i, buf.counts.getOrElse(i, 0L) + c)
    }
    buf.reduceToK()
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    // deterministic map layout (sorted keys) — the VALUES are still
    // merge-order-dependent, but a stable layout keeps runs comparable
    val items = buf.counts.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(items.map(i => UTF8String.fromString(i._1))),
      new GenericArrayData(items.map(_._2)))
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val entries = buf.counts.toArray
    val bytes = entries.map(e => e._1.getBytes(StandardCharsets.UTF_8))
    val size = 4 + entries.indices.map(i => 4 + bytes(i).length + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len); bb.get(sb)
      buf.counts.update(new String(sb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)

  override def prettyName: String = "misra_gries"
}

object MisraGries {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())
}
