package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** `vec_sum(arr)`: elementwise sum of equal-length numeric arrays per
  * group — the vector-space reduction behind centroids, Gram identities,
  * and mean-embedding computations.
  *
  * Why an aggregate and not posexplode + per-(group, dim) sums: a
  * `TypedImperativeAggregate` participates in two-phase aggregation with
  * ONE double[d] buffer per group, so every map partition reduces its
  * vectors locally and the shuffle carries O(groups × d) doubles. The
  * posexplode formulation is algebraically identical but generates d
  * rows per vector and hash-aggregates them — at 10⁶ vectors × 64 dims
  * that is 64M generated rows of pure row-churn overhead before the
  * same-sized exchange.
  *
  * Null arrays are skipped. A length mismatch against the group's
  * first-seen vector fails loudly — silently zero-padding or truncating
  * would corrupt the sum.
  */
case class VecSumDoubles(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc =
      if (buf.isEmpty) new Array[Double](n)
      else {
        require(buf.length == n,
          s"vec_sum: length mismatch (${buf.length} vs $n) within one group")
        buf
      }
    val f = isFloat
    var i = 0
    while (i < n) { acc(i) += VectorIndexKernels.elem(arr, i, f); i += 1 }
    acc
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf.length == other.length,
      s"vec_sum: length mismatch (${buf.length} vs ${other.length}) across partitions")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumDoubles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumDoubles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumDoubles =
    copy(child = newChild)

  override def prettyName: String = "vec_sum"
}

object VecSumDoubles {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    GraftBridge.column(
      VecSumDoubles(GraftBridge.expression(c)).toAggregateExpression())
}
