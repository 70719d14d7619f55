package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over an array of pre-hashed tokens.
  *
  * For every token hash, each of the 64 bit positions votes +1 (bit set) or
  * −1 (bit clear); the signature sets the bits with a positive tally.
  * Integer votes are order-independent, so the result is deterministic
  * under any partitioning.
  *
  * The previous formulation — 64 separate `aggregate` folds in one
  * projection — walked the token array 64 times through interpreted
  * higher-order-function eval (HOFs are CodegenFallback) and dominated the
  * whole dedup suite. This walks the array once inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint> of token hashes, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SimHash64.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

object SimHash64 {
  /** Shared by interpreted eval and generated code (bit-identical paths).
    * Null array slots are skipped (no token, no vote).
    */
  def compute(hs: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hs.numElements()
    var w = 0
    while (w < n) {
      if (!hs.isNullAt(w)) {
        val h = hs.getLong(w)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      w += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Column-API entry point. */
  def apply(hashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(hashes)))
}
