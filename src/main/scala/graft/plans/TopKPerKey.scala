package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, AttributeSet, BaseOrdering, Expression,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension: per-key top-k with a rank column.
  *
  * The DataFrame idiom — `row_number().over(Window.partitionBy(k).orderBy
  * (o)) <= n` — fully sorts every key group before discarding all but k
  * rows. This operator plans to [[TopKPerKeyExec]], which keeps a bounded
  * k-element heap per key: O(n log k) per partition, memory bounded by
  * keys × k instead of the partition's row count, no sort spill. The
  * logical node declares a `ClusteredDistribution` on the keys, so Spark
  * inserts exactly the same single hash shuffle the window would.
  *
  * Registered either via [[graft.GraftExtensions]]
  * (`injectPlannerStrategy`) or lazily through
  * `spark.experimental.extraStrategies` in [[TopKPerKey.perKey]].
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference, // constructor-held so copy() keeps its exprId
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Per-key top-k executor. Runs in two phases, like a hash aggregate:
  *
  *  - `partial = true` (map side, before the key shuffle): per-partition
  *    bounded heaps, no distribution requirement, no rank output. Each
  *    map partition forwards at most k rows per key, so the shuffle and
  *    the final reducer see ≤ k × partitions rows per key instead of the
  *    whole key group — the difference between O(group) and O(k) reducer
  *    input when one key owns most of a 100 TB table.
  *  - `partial = false` (reduce side, after the shuffle): same heaps over
  *    the surviving candidates, emitting the rank column.
  *
  * Top-k is decomposable (top-k of a union = top-k of per-part top-ks),
  * so the two-phase result is row-identical to a single global pass.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rankAttr)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val emitRank = !partial
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering: BaseOrdering = RowOrdering.create(sortOrder, childOutput)
      // scala.PriorityQueue dequeues the MAX of its ordering; under the
      // requested ordering (best row compares smallest) the max IS the
      // current worst kept row — exactly the eviction candidate.
      val heapOrd: Ordering[InternalRow] = ordering
      val heaps = mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(
          key.copy(), mutable.PriorityQueue.empty[InternalRow](heapOrd))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      if (!emitRank) {
        heaps.iterator.flatMap(_._2.iterator)
      } else {
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val joined = new JoinedRow
        val outProj = UnsafeProjection.create(output, output)
        heaps.iterator.flatMap { case (_, heap) =>
          val sorted = heap.dequeueAll.reverse // ascending in requested order
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.update(0, i + 1)
            outProj(joined(row, rankRow))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKeyPlan =>
      // two-phase: map-side partial heaps feed the key shuffle the final
      // (rank-emitting) heaps require — the hash-aggregate pattern
      TopKPerKeyExec(t.keys, t.order, t.k, t.rankAttr, partial = false,
        TopKPerKeyExec(t.keys, t.order, t.k, t.rankAttr, partial = true,
          planLater(t.child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  private def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughTopK
    }
  }

  /** Top `k` rows per key group, ordered by `order` (e.g. `col(x).desc`),
    * with a 1-based `rank` column appended.
    */
  def perKey(df: DataFrame, keyCols: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val child = df.queryExecution.analyzed
    val keys = keyCols.map(GraftBridge.catalystExpression)
    val sortOrder = order.map(GraftBridge.catalystExpression).map {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    val rankAttr = AttributeReference("rank", IntegerType, nullable = false)()
    GraftBridge.ofRows(spark, TopKPerKeyPlan(keys, sortOrder, k, rankAttr, child))
  }
}
