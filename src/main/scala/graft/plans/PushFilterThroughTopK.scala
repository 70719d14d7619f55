package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: push key-only filters through [[TopKPerKeyPlan]].
  *
  * Catalyst's own predicate pushdown stops at unknown logical nodes, so
  * `topKPerKey(df, keys, ...).filter(key = x)` would otherwise rank EVERY
  * key group and then discard most of them. A predicate that references
  * only the grouping keys commutes with per-key top-k — dropping whole
  * groups before or after ranking selects exactly the same rows — so it
  * is safe to push below the node, where the built-in rules continue
  * pushing it down to the scan (partition pruning / parquet filters).
  * Predicates referencing the rank column or non-key columns stay above.
  *
  * The commute argument needs the predicate to drop or keep whole KEY
  * GROUPS, so it only holds when every grouping key is a bare
  * `AttributeReference` and the predicate references only those
  * attributes. With a computed key (e.g. key = a % 10) a predicate on
  * `a` references the key's INPUT attribute yet cuts rows WITHIN a key
  * group (a = 42 keeps some of group 2's rows, not all), which would
  * change the top-k result — so any non-attribute key disables the rule.
  *
  * Registered by [[graft.GraftExtensions]] (`injectOptimizerRule`) and by
  * the lazy `TopKPerKey.perKey` path (`spark.experimental
  * .extraOptimizations`).
  */
object PushFilterThroughTopK extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, t: TopKPerKeyPlan)
        if t.keys.forall(_.isInstanceOf[AttributeReference]) =>
      val keyAttrs = AttributeSet(t.keys)
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.nonEmpty &&
          p.references.subsetOf(keyAttrs))
      if (push.isEmpty) f
      else {
        val pushed = t.withNewChildren(
          Seq(Filter(push.reduce(And), t.child))).asInstanceOf[TopKPerKeyPlan]
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
