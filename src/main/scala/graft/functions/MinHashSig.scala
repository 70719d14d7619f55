package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native MinHash signature over an array of pre-hashed shingles: for
  * each of the `a.length` fixed permutations `x → (a_i·x + b_i) mod P`,
  * the minimum permuted value across the array — the classic min-wise
  * signature (Broder, "On the resemblance and containment of documents",
  * SEQUENCES 1997).
  *
  * The previous formulation — 64 separate `array_min(transform(...))`
  * expressions in one projection — walked the shingle array 64 times and
  * allocated 64 intermediate arrays per document (HOFs are interpreted,
  * not codegen'd). This walks the array ONCE inside whole-stage codegen
  * and allocates only the 64-slot output, the same fix that took SimHash
  * from 15 s to 0.8 s. Arithmetic is bit-identical to the HOF form:
  * inputs are already reduced mod P (< 2³¹), multipliers are < P, so
  * `a_i·x + b_i` stays below 2⁶³ — no overflow, same `pmod` result.
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {

  require(a.length == b.length, "multiplier/offset arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint> of shingle hashes, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |${ev.value} = graft.functions.MinHashSig.compute($x, $aRef, $bRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSig {
  val P: Long = 2147483647L // 2^31 - 1

  /** Shared by interpreted eval and generated code. Null slots are
    * skipped; an array with no usable hash has no signature → null
    * (mirrors array_min over an empty array).
    */
  def compute(xs: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = xs.numElements()
    var seen = false
    var w = 0
    while (w < n) {
      if (!xs.isNullAt(w)) {
        seen = true
        val x = xs.getLong(w)
        var i = 0
        while (i < k) {
          val v = java.lang.Math.floorMod(a(i) * x + b(i), P)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      w += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  /** Column-API entry point. */
  def apply(hashes: Column, a: Seq[Long], b: Seq[Long]): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes), a.toArray, b.toArray))
}
