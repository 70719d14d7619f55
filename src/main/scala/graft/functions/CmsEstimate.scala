package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency estimate from a serialized Count-Min sketch.
  *
  * Spark registers the BUILD side (`count_min_sketch(col, eps, conf, seed)`
  * — a mergeable aggregate whose cells are commutative sums, so map-side
  * partials combine and the result is partition-order invariant) but ships
  * no probe: the sketch comes back as an opaque binary. This expression is
  * the probe — `CountMinSketch.readFrom(bytes).estimateCount(item)` — with
  * the CMS guarantee intact: never an undercount, overcount ≤ ε·N with
  * probability ≥ confidence.
  *
  * The sketch is deserialized once per distinct binary per thread (the
  * intended shape is one broadcast sketch row probed by a bounded candidate
  * frame, so the cache hits on every row after the first); probing is then
  * O(depth) array reads inside whole-stage codegen.
  */
case class CmsEstimate(sketch: Expression, item: Expression)
    extends BinaryExpression {

  override def left: Expression = sketch
  override def right: Expression = item

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (sketch.dataType, item.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, bigint), got " +
          s"${s.catalogString}, ${i.catalogString}")
    }

  // per-thread (bytes → sketch) memo: codegen shares one referenced
  // expression instance across a stage's task threads
  @transient private lazy val cache =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  /** Codegen/eval entry point: deserialize-once-then-probe. */
  def estimate(bytes: Array[Byte], item: Long): Long = {
    val hit = cache.get()
    val sk =
      if (hit != null && (hit._1 eq bytes)) hit._2
      else {
        val s = CountMinSketch.readFrom(bytes)
        cache.set((bytes, s))
        s
      }
    sk.estimateCount(java.lang.Long.valueOf(item))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    estimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (sk, it) => s"${ev.value} = $ref.estimate($sk, $it);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(sketch = newLeft, item = newRight)

  override def prettyName: String = "cms_estimate"
}

object CmsEstimate {
  /** Column-API entry point. */
  def apply(sketch: Column, item: Column): Column =
    GraftBridge.column(
      CmsEstimate(GraftBridge.expression(sketch), GraftBridge.expression(item)))
}
