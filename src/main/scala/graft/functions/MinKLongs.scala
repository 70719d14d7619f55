package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** `min_k_longs(col, k)`: the k smallest long values per group, returned
  * as an ascending array — a MERGEABLE bounded sketch, the aggregate
  * behind distributed reservoir/priority sampling (hash the rows, keep
  * the k smallest hashes; the winners are a uniform sample).
  *
  * Why an aggregate and not a window/TopKPerKey: a
  * `TypedImperativeAggregate` participates in two-phase aggregation —
  * every map partition reduces to a k-element buffer BEFORE the shuffle
  * and buffers merge associatively on the reduce side, so the shuffle
  * carries O(groups × k) longs no matter how many rows feed it. State is
  * one bounded max-heap per group; `serialize` packs it to k longs.
  */
case class MinKLongs(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[Long]]
    with UnaryLike[Expression] {

  require(k > 0, "min_k_longs needs k > 0")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_k_longs expects bigint, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long] // max-heap: head is the worst kept value

  private def add(buf: mutable.PriorityQueue[Long], v: Long): Unit =
    if (buf.size < k) buf.enqueue(v)
    else if (v < buf.head) { buf.dequeue(); buf.enqueue(v) }

  override def update(
      buf: mutable.PriorityQueue[Long], input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[Long],
      other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(buf.toArray.sorted)

  override def serialize(buf: mutable.PriorityQueue[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKLongs =
    copy(child = newChild)

  override def prettyName: String = "min_k_longs"
}

object MinKLongs {
  /** Column-API entry point. */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      MinKLongs(GraftBridge.expression(c), k).toAggregateExpression())
}
