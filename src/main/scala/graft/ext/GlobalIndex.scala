package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global sequence-id assignment without the single-partition sort.
  *
  * The naive `row_number().over(Window.orderBy(keys))` moves EVERY row
  * to one partition (Spark even warns) — the one formulation that
  * cannot survive 100 TB. This is the standard two-phase replacement,
  * the same technique as Spark's own `RDD.zipWithIndex`:
  *
  *  1. `repartitionByRange(keys) + sortWithinPartitions(keys)` makes
  *     partition `i` hold a contiguous, locally-sorted key range — a
  *     parallel global order.
  *  2. a counting job over the SAME shuffled RDD object collects one
  *     long per partition (the map stage is reused — the range shuffle
  *     is paid once, the second job's stages show as skipped);
  *     `scanLeft` turns counts into start offsets.
  *  3. a per-partition imperative pass (the sanctioned `mapPartitions`
  *     tier) attaches `offset + local position` via a reused
  *     `JoinedRow` + `UnsafeProjection` — no row copying, no
  *     deserialization to external rows.
  *
  * The result is EXACTLY `row_number() - 1` under the total order
  * (`keys` must include a unique tiebreaker): partition boundaries move
  * with sampling, but a row's global position depends only on the total
  * order, so the output is deterministic on any cluster size or
  * partition layout. The index column is non-nullable LongType.
  */
object GlobalIndex {

  def withGlobalIndex(df: DataFrame, keys: Seq[Column], numParts: Int,
      idxCol: String = "global_idx"): DataFrame = {
    require(numParts >= 1, "numParts must be >= 1")
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(numParts, keys: _*)
      .sortWithinPartitions(keys: _*)
    val schema = ranged.schema
    require(!schema.fieldNames.contains(idxCol),
      s"column $idxCol already exists")
    // the physical InternalRow RDD; both jobs below run over THIS
    // object so the range-shuffle map stage is computed exactly once
    val rdd = ranged.queryExecution.toRdd
    val counts: Array[Long] = spark.sparkContext.runJob(rdd,
      (it: Iterator[InternalRow]) => {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      })
    val offsets = counts.scanLeft(0L)(_ + _)
    val outSchema = StructType(
      schema.fields :+ StructField(idxCol, LongType, nullable = false))
    val fieldTypes = outSchema.fields.map(_.dataType)
    val indexed = rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(fieldTypes)
      val joined = new JoinedRow
      val idx = new SpecificInternalRow(Seq(LongType)) // setLong: no boxing
      var i = offsets(pid)
      it.map { row =>
        idx.setLong(0, i); i += 1
        proj(joined(row, idx)): InternalRow
      }
    }
    ColumnBridge.ofInternalRows(spark, outSchema, indexed)
  }

  /** Global INCLUSIVE running sum of `weightCol` (a LongType column)
    * under the total order `keys` — the weighted generalization of
    * [[withGlobalIndex]], and the distributed replacement for
    * `sum(w).over(Window.orderBy(keys))` (which, like row_number, moves
    * the whole input to one partition). Same two-phase design: range
    * shuffle + local sort, one counting job collecting a per-partition
    * WEIGHT total, scanLeft offsets, then a per-partition imperative
    * pass attaching `offset + running local sum`. Output column
    * `cumCol` is non-nullable LongType; a row's value depends only on
    * the total order, so the result is identical on any cluster
    * layout. `keys` must include a unique tiebreaker.
    */
  def withGlobalPrefixSum(df: DataFrame, keys: Seq[Column],
      weightCol: String, numParts: Int,
      cumCol: String = "global_cum"): DataFrame = {
    require(numParts >= 1, "numParts must be >= 1")
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(numParts, keys: _*)
      .sortWithinPartitions(keys: _*)
    val schema = ranged.schema
    require(!schema.fieldNames.contains(cumCol),
      s"column $cumCol already exists")
    val wIdx = schema.fieldIndex(weightCol)
    require(schema.fields(wIdx).dataType == LongType,
      s"weight column $weightCol must be LongType, " +
        s"got ${schema.fields(wIdx).dataType}")
    val rdd = ranged.queryExecution.toRdd
    val partSums: Array[Long] = spark.sparkContext.runJob(rdd,
      (it: Iterator[InternalRow]) => {
        var s = 0L; while (it.hasNext) { s += it.next().getLong(wIdx) }; s
      })
    val offsets = partSums.scanLeft(0L)(_ + _)
    val outSchema = StructType(
      schema.fields :+ StructField(cumCol, LongType, nullable = false))
    val fieldTypes = outSchema.fields.map(_.dataType)
    val summed = rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(fieldTypes)
      val joined = new JoinedRow
      val cum = new SpecificInternalRow(Seq(LongType))
      var s = offsets(pid)
      it.map { row =>
        s += row.getLong(wIdx)
        cum.setLong(0, s)
        proj(joined(row, cum)): InternalRow
      }
    }
    ColumnBridge.ofInternalRows(spark, outSchema, summed)
  }
}
