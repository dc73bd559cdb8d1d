package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.internal.SQLConf

/** Grouped top-k as a WHOLE-OPERATOR custom plan — logical node,
  * planner strategy, and a two-phase physical operator (SURVEY.md §7.3
  * tier (c)): the one operator family where the built-in formulation
  * (`row_number().over(Window.partitionBy(g).orderBy(o)) <= k`) pays a
  * full sort of every group's row set and shuffles EVERY row.
  *
  *  - partial phase (pre-shuffle, any distribution): local top-k per
  *    group per input partition via a bounded heap per group — the
  *    map-side combine; at most k·|groups| rows per partition cross the
  *    wire instead of all rows. Memory is BOUNDED by a flush budget
  *    (`spark.graft.topk.partial.flushRows`): when the buffered row
  *    count reaches it (minimum one row per cycle), the current
  *    partial heaps are emitted downstream
  *    and the map is cleared — emitting extra partials is always
  *    correct because the final phase re-merges, so a high-cardinality
  *    group key degrades throughput (less combining) instead of OOMing
  *    the executor.
  *  - final phase (after a hash shuffle on the group key, inserted by
  *    `EnsureRequirements` from the declared `ClusteredDistribution`):
  *    SORT-BASED — it requires input ordered by (group, order), which
  *    Spark satisfies with a SortExec whose external sorter spills to
  *    disk, then streams each group taking its first k rows. Peak
  *    memory beyond the (spill-safe) sort is one group key + a row
  *    counter, regardless of group cardinality.
  *
  * Correctness: global top-k of a union = top-k of the union of
  * per-part top-ks (the heap keeps the k first rows in the total sort
  * order; the caller includes a unique tiebreaker by `TopK.perGroup`
  * convention, so the order is total).
  * O(n log k) per partition partial, memory min(budget, k·groups) rows.
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

/** Pre-shuffle partial: per-group bounded heaps with a row-count flush
  * budget (see class doc of [[TopKPerGroup]]).
  */
case class TopKPartialExec(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    flushRows: Long,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution)

  // cluster-scale observability: combine ratio = output/input rows,
  // and whether the flush budget ever triggered (a signal the group
  // cardinality outgrew the partial tier)
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "number of input rows"),
    "numFlushes" -> SQLMetrics.createMetric(sparkContext, "budget-triggered flushes"))

  override protected def doExecute(): RDD[InternalRow] = {
    val ord = order
    val kk = k
    val budget = flushRows
    val keyExprs = groupCols
    val childOutput = child.output
    val outRows = longMetric("numOutputRows")
    val inRows = longMetric("numInputRows")
    val flushes = longMetric("numFlushes")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = RowOrdering.create(ord, childOutput)
      // max-heap in sort order: root = WORST kept row, evicted when a
      // better (sort-earlier) row arrives
      val rowOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => cmp.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      var bufRows = 0L
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kk) {
              h += row.copy().asInstanceOf[UnsafeRow]
              bufRows += 1
            } else if (cmp.compare(row, h.head) < 0) {
              h.dequeue()
              h += row.copy().asInstanceOf[UnsafeRow]
            }
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](rowOrd)
            h += row.copy().asInstanceOf[UnsafeRow]
            heaps.put(key.copy(), h)
            bufRows += 1
        }
      }
      def drain(): Iterator[InternalRow] = {
        // materialize before clearing — the heap iterators are lazy
        val out = heaps.valuesIterator.flatMap(_.iterator).toArray
        heaps.clear()
        bufRows = 0L
        outRows.add(out.length)
        out.iterator
      }
      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!cur.hasNext && (iter.hasNext || bufRows > 0)) {
            // at most `budget` rows buffered; the max(1) floors the
            // budget so each drain cycle always makes progress (a zero
            // budget still buffers one row per cycle)
            // metric batched per drain cycle — a per-row SQLMetric
            // add would put an atomic on the map-side hot path
            var consumed = 0L
            while (iter.hasNext && bufRows < budget.max(1L)) {
              insert(iter.next())
              consumed += 1
            }
            inRows.add(consumed)
            if (iter.hasNext) flushes.add(1) // budget, not end-of-input
            cur = drain()
          }
          cur.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          cur.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)

  override def nodeName: String = "TopKPerGroup (partial)"
}

/** Post-shuffle final: streams (group, order)-sorted input, emitting
  * the first k rows of each group. The required ordering is satisfied
  * by a spill-safe SortExec that `EnsureRequirements` inserts above the
  * exchange, so this operator itself holds O(1) state.
  */
case class TopKFinalExec(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  private def groupOrdering: Seq[SortOrder] =
    groupCols.map(a => SortOrder(a, Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupCols))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupOrdering ++ order)
  override def outputOrdering: Seq[SortOrder] = groupOrdering ++ order

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val keyExprs = groupCols
    val childOutput = child.output
    val outRows = longMetric("numOutputRows")
    val nGroups = longMetric("numGroups")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // group boundaries by ORDERING equality, not UnsafeRow byte
      // equality: the upstream SortExec groups by ordering, so keys that
      // are ordering-equal yet byte-distinct (non-canonical NaN doubles
      // in a directly-constructed plan — NormalizeFloatingNumbers does
      // not see custom operators) must stay one group here too, or the
      // counter resets mid-group and emits more than k rows.
      val keyCmp = RowOrdering.create(
        keyExprs.map(a => SortOrder(a, Ascending)), keyExprs)
      var curKey: UnsafeRow = null
      var emitted = 0
      iter.flatMap { row =>
        val key = keyProj(row)
        if (curKey == null || keyCmp.compare(key, curKey) != 0) {
          curKey = key.copy()
          emitted = 1
          nGroups.add(1)
          outRows.add(1)
          Iterator.single(row)
        } else if (emitted < kk) {
          emitted += 1
          outRows.add(1)
          Iterator.single(row)
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)

  override def nodeName: String = "TopKPerGroup (final)"
}

/** Plans [[TopKPerGroup]] as partial → (shuffle+sort) → final.
  * Registered by [[GraftExtensions]] via `injectPlannerStrategy`.
  */
object TopKStrategy extends SparkStrategy {
  /** Partial-phase flush budget in buffered rows per partition. */
  val flushRowsKey = "spark.graft.topk.partial.flushRows"
  val flushRowsDefault = 1L << 20 // ~1M rows ≈ tens of MB of UnsafeRows

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val budget =
        SQLConf.get.getConfString(flushRowsKey, flushRowsDefault.toString).toLong
      TopKFinalExec(g, o, k,
        TopKPartialExec(g, o, k, budget, planLater(child))) :: Nil
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
