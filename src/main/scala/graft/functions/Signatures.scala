package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Signature expressions over a shingle-hash set: the whole MinHash /
  * SimHash computation as ONE narrow per-row pass — no explode, no
  * groupBy, no shuffle. At cluster scale signature building becomes a
  * pure map stage; the only shuffle left in the dedup pipelines is the
  * candidate join itself.
  *
  * Values are pinned equal to the per-k/per-bit aggregate formulations
  * (SignatureEquivalenceSpec) and to the DuckDB oracle twins generated
  * from the same [[TextFunctions]] constants.
  */

/** minhash_k = min over hashes of (a_k*x + b_k) mod P, k = 0..15;
  * empty input → null (no shingles → no signature).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"""
         |${ev.value} = graft.functions.MinHashSig.sig($input);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import TextFunctions.{P, minhashA, minhashB, minhashK}
  private val as = minhashA.toArray
  private val bs = minhashB.toArray

  def sig(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val out = Array.fill(minhashK)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = hashes.getLong(i)
      var k = 0
      while (k < minhashK) {
        val v = (x * as(k) + bs(k)) % P
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(hashes: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes)))
}

/** 62-bit SimHash (two 31-bit feature planes): bit b set iff a majority
  * of hashes have feature bit b set (2*count > n — identical to the
  * ±1-sum fold); empty input → null.
  */
case class SimHashPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    if (hashes.numElements() == 0) null else SimHashPack.pack(hashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"""
         |if ($input.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.SimHashPack.pack($input);
         |}
       """.stripMargin)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}

object SimHashPack {
  import TextFunctions.{P, simhashA2, simhashB2, simhashBits}

  def pack(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](simhashBits)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      val h2 = (h * simhashA2 + simhashB2) % P
      var b = 0
      while (b < 31) {
        counts(b) += ((h >> b) & 1L).toInt
        b += 1
      }
      while (b < simhashBits) {
        counts(b) += ((h2 >> (b - 31)) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < simhashBits) {
      if (2 * counts(b) > n) sh |= (1L << b)
      b += 1
    }
    sh
  }

  def apply(hashes: Column): Column =
    ColumnBridge.column(SimHashPack(ColumnBridge.expression(hashes)))
}
