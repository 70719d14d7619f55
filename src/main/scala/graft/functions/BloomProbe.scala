package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column-API face for Spark's internal Bloom-filter probe.
  *
  * `bloom_filter_agg` (the build side — bit-OR cells, so commutative,
  * mergeable, partition-order invariant) is in the public SQL registry, but
  * its probe `might_contain` is internal-only: Catalyst instantiates it
  * when injecting runtime filters (`InjectRuntimeFilter`), and no public
  * function exposes it. This wrapper hands the same expression to library
  * code so an operator can stage an EXPLICIT broadcast-Bloom pre-filter —
  * the hand-rolled runtime filter — where the optimizer's cost model
  * wouldn't inject one (e.g. guarding a `distinct` rather than a join).
  *
  * The bloom argument must be a literal or scalar subquery (the
  * expression's own analysis rule enforces foldability — a per-row bloom
  * would defeat the point). False positives only ever ADD candidates;
  * callers keep an exact confirm step downstream, so results stay exact.
  */
object BloomProbe {
  def mightContain(bloom: Column, value: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloom), GraftBridge.expression(value)))

  /** Build side: `BloomFilterAggregate` sized explicitly. Both halves of
    * the pair live in Catalyst's INTERNAL registry only (`bloom_filter_agg`
    * resolves for the optimizer's generated plans, not user SQL), hence
    * the direct expression construction here.
    */
  def bloomAgg(value: Column, estimatedNumItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(GraftBridge.expression(value),
      Literal(estimatedNumItems), Literal(numBits)).toAggregateExpression())
}
