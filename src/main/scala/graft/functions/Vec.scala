package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector algebra over `array<float>` embedding columns.
  *
  * Everything here is composed from higher-order Catalyst functions
  * (`zip_with`, `aggregate`, `transform`) — fully codegen'd, no UDFs, so the
  * hot path stays inside WholeStageCodegen at any scale. Elements are widened
  * to double before arithmetic so results are engine-portable (float
  * accumulation order differences would otherwise leak into comparisons).
  */
object Vec {

  /** Dot product of two equal-length numeric arrays, folded in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Sum of squares, folded in index order. */
  def sq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(sq(a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
