package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** `UPDATE graft.t SET … [WHERE …]` = ONE read-modify-write
  * [[graft.sinks.ParquetMergeSink.merge]] commit, completing the row-level
  * SQL surface after INSERT (V1Write seam), DELETE (`SupportsDelete` →
  * deletion vectors) and MERGE ([[RewriteGraftMerge]]). The reference runs
  * UPDATE through PostgreSQL (migrations and ad-hoc repair both assume
  * it); here the analyzed [[UpdateTable]] is intercepted post-resolution —
  * the same seam as MERGE, before vanilla Spark refuses the node for
  * non-`SupportsRowLevelOperations` tables — and rewritten to a driver
  * command that reads the matching rows, applies the assignments, and
  * merges the result back by the table's own merge keys:
  *
  * {{{
  *   UPDATE graft.t SET v = 'fixed', score = score * 2 WHERE score < 0
  *   -- ≡ merge(current.filter(score < 0)
  *   --          .select(k, 'fixed' AS v, score*2 AS score, ver), keys, ver)
  * }}}
  *
  * The sink's source-precedence tie-break (an incoming row outranks the
  * current row on a version tie, ParquetMergeSink.scala `PrefCol`) is what
  * makes this sound WITHOUT forcing the statement to bump the version
  * column: the rewritten rows win their buckets even when `SET` leaves
  * `merge.version` untouched. A WHERE matching zero rows is a no-op that
  * leaves the manifest version unchanged (the sink's empty-batch guard).
  *
  * Refused loudly, never silently reinterpreted:
  *  - non-writable targets (time-travel reads, DV-carrying maintained
  *    tables, plain directories without merge metadata);
  *  - assignment to a merge-key column (the sink merges BY key — changing
  *    a row's identity is a DELETE + INSERT, not a keyed overwrite);
  *  - nested-field assignment (`SET s.x = …`) — the sink stores whole
  *    rows, partial struct writes are not part of its contract;
  *  - nondeterministic assignments or predicates (`SET x = rand()`): the
  *    read-modify-write would commit different bytes on every task retry,
  *    breaking the lake's replay discipline;
  *  - a value not castable to the column type.
  *
  * Statement-level replay semantics are SQL's, not the batch protocol's:
  * the source of a MERGE/INSERT is external (replaying the same batch
  * converges), while UPDATE reads table-CURRENT values, so replaying
  * `SET x = x + 1` advances x again by design. Constant assignments
  * (`SET x = 'v' WHERE …`) converge; the spec pins both behaviors.
  */
object RewriteGraftUpdate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u: UpdateTable
        if u.resolved && RewriteGraftMerge.graftTarget(u.table).isDefined =>
      rewrite(u, RewriteGraftMerge.graftTarget(u.table).get)
  }

  private def refuse(table: String, what: String): Nothing =
    throw new UnsupportedOperationException(
      s"UPDATE $table: $what — SQL UPDATE covers deterministic top-level " +
        "column assignments on CURRENT merge-sink tables, merged back by " +
        "the manifest-recorded merge keys; anything else runs through the " +
        "sink APIs")

  private def rewrite(u: UpdateTable,
      target: (org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation, GraftTable)): LogicalPlan = {
    val (rel, gt) = target
    val name = gt.name()
    val (keys, version, buckets) = gt.writeCfg.getOrElse(refuse(name,
      "not SQL-writable (only CURRENT merge-sink tables whose manifest " +
        "records merge.keys/merge.version accept UPDATE; time-travel " +
        "reads and DV-carrying tables are read-only)"))

    u.condition.foreach { c =>
      if (!c.deterministic)
        refuse(name, s"WHERE ${c.sql} is nondeterministic (a retried task " +
          "would select different rows)")
    }

    val targetAttrs = rel.output
    val assigned = u.assignments.map { a =>
      val k = RewriteGraftMerge.attrOf(a.key)
      if (k == null || !targetAttrs.exists(_.exprId == k.exprId))
        refuse(name, s"assignment ${a.sql} does not target a top-level " +
          "table column (nested-field SET is not part of the sink's " +
          "whole-row contract)")
      if (!a.value.deterministic)
        refuse(name, s"assignment ${a.sql} is nondeterministic (a retried " +
          "task would commit different values)")
      if (keys.exists(kk => conf.resolver(kk, k.name)) &&
          !a.value.semanticEquals(k))
        refuse(name, s"assignment ${a.sql} changes merge-key column " +
          s"${k.name} (keys: ${keys.mkString(", ")}) — the sink merges BY " +
          "key; a key change is DELETE + INSERT, not a keyed overwrite")
      if (!Cast.canCast(a.value.dataType, k.dataType))
        refuse(name, s"assignment ${a.sql}: ${a.value.dataType.sql} does " +
          s"not cast to column type ${k.dataType.sql}")
      k.exprId -> a.value
    }
    if (assigned.map(_._1).distinct.size != assigned.size)
      refuse(name, "a column is assigned more than once")
    val byId = assigned.toMap

    // Every table column, assigned ones replaced (cast to the column's
    // exact type), the rest carried — the sink stores whole rows.
    val projected: Seq[NamedExpression] = targetAttrs.map { a =>
      byId.get(a.exprId) match {
        case None => a
        case Some(v) if v.semanticEquals(a) => a
        case Some(v) =>
          val cast: Expression =
            if (org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(v.dataType, a.dataType)) v
            else Cast(v, a.dataType, Some(conf.sessionLocalTimeZone))
          Alias(cast, a.name)()
      }
    }
    val matching = u.condition.map(Filter(_, u.table)).getOrElse(u.table)
    GraftUpdateCommand(name, gt.tablePath, keys, version, buckets,
      Project(projected, matching))
  }
}

/** Driver command executing the accepted UPDATE as one
  * [[graft.sinks.ParquetMergeSink.merge]] commit. The source plan reads
  * the table's pre-commit state (the merge writes a NEW generation and
  * flips the manifest only afterwards, and the sink barriers its batch
  * before writing), so the self-referential read-modify-write needs no
  * checkpoint.
  */
case class GraftUpdateCommand(tableName: String, path: String,
    keys: Seq[String], version: String, buckets: Int, source: LogicalPlan)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)
  override def simpleString(maxFields: Int): String =
    s"GraftUpdateCommand $tableName keys=[${keys.mkString(",")}] version=$version"

  override def run(spark: SparkSession): Seq[Row] = {
    val bridge = org.apache.spark.sql.GraftBridge
    graft.sinks.ParquetMergeSink.merge(
      bridge.ofRows(spark, source), path, keys, version, buckets)
    Seq.empty
  }
}
