package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native sorted-distinct word-n-gram hashes: for a document's word array,
  * the 64-bit xxhash of every n-word shingle joined by single spaces,
  * deduplicated and value-sorted — bit-identical to
  * {{{
  * sort_array(array_distinct(transform(
  *   sequence(lit(0), size(ws) - n),
  *   i => xxhash64(concat_ws(" ", ws[i+1] … ws[i+n])))))
  * }}}
  * (same seed-42 XXH64 over the same concatenated UTF-8 bytes, same
  * concat_ws null-skip rule), but in ONE codegen'd pass per row.
  *
  * The HOF chain is the hot loop of every shingle-based operator
  * (near-dup Jaccard, MinHash-LSH, containment, contamination) and runs
  * INTERPRETED — higher-order functions are CodegenFallback — allocating
  * a UTF8String per shingle plus two set structures per row (the string
  * array_distinct's hash set, then the long one). At sf10 those scan
  * stages dominate the dedup family. This expression gathers the word
  * refs once, builds each shingle's bytes in a thread-local grow-only
  * buffer (zero per-shingle allocation), hashes with the same XXH64 the
  * SQL function uses, then sort+dedups the longs in place — the sorted
  * output is exactly the representation [[SortedIntersectCount]]
  * verifies, so callers need no further array_sort.
  *
  * Same lesson as [[SimHash64]]/[[MinHashSig]]: fold the interpreted HOF
  * chain into one native pass shared by eval and codegen.
  */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash64 expects array<string> of words, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHash64.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleHash64.compute($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_hash64"
}

object ShingleHash64 {

  private val Seed = 42L // Spark's xxhash64 seed

  /** Grow-only per-thread shingle byte buffer (documents are task-local;
    * compute never escapes the calling thread).
    */
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 10)
  }

  private val Empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** Shared by interpreted eval and generated code. Null word slots are
    * skipped along with their separator, as concat_ws does.
    */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    val k = m - n + 1
    if (k <= 0) return Empty
    val ws = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      ws(i) = if (words.isNullAt(i)) null else words.getUTF8String(i)
      i += 1
    }
    val out = new Array[Long](k)
    var b = buf.get()
    var p = 0
    while (p < k) {
      var need = n - 1 // upper bound on separators
      var j = 0
      while (j < n) {
        val w = ws(p + j)
        if (w != null) need += w.numBytes()
        j += 1
      }
      if (b.length < need) {
        b = new Array[Byte](java.lang.Math.max(need, b.length << 1))
        buf.set(b)
      }
      var off = 0
      var first = true
      j = 0
      while (j < n) {
        val w = ws(p + j)
        if (w != null) {
          if (!first) { b(off) = ' '; off += 1 }
          w.writeToMemory(b, Platform.BYTE_ARRAY_OFFSET + off)
          off += w.numBytes()
          first = false
        }
        j += 1
      }
      out(p) = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, off, Seed)
      p += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 1
    while (r < k) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    val distinct = w + 1
    UnsafeArrayData.fromPrimitiveArray(
      if (distinct == k) out else java.util.Arrays.copyOf(out, distinct))
  }

  /** Column-API entry point. */
  def apply(words: Column, n: Int): Column =
    GraftBridge.column(ShingleHash64(GraftBridge.expression(words), n))
}
