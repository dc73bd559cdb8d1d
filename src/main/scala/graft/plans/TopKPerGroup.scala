package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Grouped top-k as a WHOLE-OPERATOR custom plan — logical node,
  * planner strategy, and a two-phase physical operator (SURVEY.md §7.3
  * tier (c)): the one operator family where the built-in formulation
  * (`row_number().over(Window.partitionBy(g).orderBy(o)) <= k`) pays a
  * full sort of every group's row set and shuffles EVERY row.
  *
  * This operator keeps a bounded heap of k rows per group:
  *
  *  - partial phase (pre-shuffle, any distribution): local top-k per
  *    group per input partition — the map-side combine; at most
  *    k·|groups| rows per partition cross the wire instead of all rows;
  *  - final phase (after a hash shuffle on the group key, inserted by
  *    `EnsureRequirements` from the declared `ClusteredDistribution`):
  *    merges the partial heaps exactly.
  *
  * Correctness: global top-k of a union = top-k of the union of
  * per-part top-ks (heap keeps the k first rows in the total sort
  * order; ties never occur when the caller includes a unique
  * tiebreaker, which `TopK.perGroup` requires by convention).
  * O(n log k) per partition, memory k·groups-per-partition rows.
  */
case class TopKPerGroup(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupCols))

  override protected def doExecute(): RDD[InternalRow] = {
    val ord = order
    val kk = k
    val keyExprs = groupCols
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = RowOrdering.create(ord, childOutput)
      // max-heap in sort order: root = WORST kept row, evicted when a
      // better (sort-earlier) row arrives
      val rowOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => cmp.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kk) {
              h += row.copy().asInstanceOf[UnsafeRow]
            } else if (cmp.compare(row, h.head) < 0) {
              h.dequeue()
              h += row.copy().asInstanceOf[UnsafeRow]
            }
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](rowOrd)
            h += row.copy().asInstanceOf[UnsafeRow]
            heaps.put(key.copy(), h)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerGroup (partial)" else "TopKPerGroup (final)"
}

/** Plans [[TopKPerGroup]] as partial → (shuffle) → final. Registered by
  * [[GraftExtensions]] via `injectPlannerStrategy`.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Public API:
  * `TopK.perGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 3)`
  * — order pairs are (column, descending?). The order MUST be a total
  * order (include a unique tiebreaker) for deterministic results.
  * Sort attributes resolve HERE against the analyzed child (a Column's
  * internal sort node would stay opaque inside a custom operator:
  * unresolvable by the generic analyzer rules and invisible to column
  * pruning).
  */
object TopK {
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}

  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(groupCols.nonEmpty,
      "TopK.perGroup needs at least one group column; for global top-k " +
        "use df.orderBy(...).limit(k) (TakeOrderedAndProject)")
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      plan.output.filter(_.name == name) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"unknown column $name in ${plan.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"ambiguous column $name: ${many.size} attributes match " +
            "(disambiguate with select/alias before TopK.perGroup)")
      }
    val groupAttrs = groupCols.map(attr)
    // the exec groups by raw UnsafeRow bytes; float/double keys would
    // need -0.0/NaN normalization (Catalyst's NormalizeFloatingNumbers
    // rule covers only the built-in operators) — reject them
    groupAttrs.foreach { a =>
      require(!a.dataType.isInstanceOf[org.apache.spark.sql.types.FloatType]
          && !a.dataType.isInstanceOf[org.apache.spark.sql.types.DoubleType],
        s"TopK.perGroup cannot group by floating-point column ${a.name} " +
          "(-0.0 vs 0.0 and NaN payloads would split groups)")
    }
    val order = orderCols.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    // self-register the strategy: the operator must plan in ANY
    // session, not only those built withExtensions(GraftExtensions).
    // Synchronized on the experimental methods holder: the naive
    // check-then-append is a read-modify-write that could drop a
    // strategy appended concurrently by another thread.
    val session = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.experimental.synchronized {
      if (!session.experimental.extraStrategies.contains(TopKStrategy)) {
        session.experimental.extraStrategies =
          session.experimental.extraStrategies :+ TopKStrategy
      }
    }
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupAttrs, order, k, plan))
  }
}
