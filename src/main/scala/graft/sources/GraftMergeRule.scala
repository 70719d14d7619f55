package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, EqualTo, Expression, Literal, Not}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** `MERGE INTO graft.t` = ONE idempotent
  * [[graft.sinks.ParquetMergeSink.mergeActions]] commit — the SQL face of
  * the sink's MERGE-shaped multi-action upsert, completing the row-level
  * SQL surface the catalog opened with INSERT (V1Write seam) and DELETE
  * (`SupportsDelete`). The reference gets MERGE semantics from
  * PostgreSQL's `INSERT .. ON CONFLICT DO UPDATE` (db.go:1171-1175); here
  * the analyzed [[MergeIntoTable]] is intercepted POST-RESOLUTION (star
  * assignments already expanded and aligned by the analyzer) and rewritten
  * to a driver command that hands the source frame to the sink — the same
  * interception seam Delta Lake uses for its MERGE, because vanilla Spark
  * only plans MERGE for `SupportsRowLevelOperations` tables via a
  * full-group rewrite (ReplaceData), which would replace whole buckets
  * through a V2 write instead of routing the ONE-commit
  * O(batch + touched buckets) merge protocol the lake is built on.
  *
  * Accepted shape — exactly the sink's contract, refused loudly otherwise
  * (never a silent semantic drift):
  *
  * {{{
  *   MERGE INTO graft.t AS t USING src AS s
  *   ON t.k1 = s.k1 [AND t.k2 = s.k2 ...]        -- exactly the merge keys
  *   [WHEN MATCHED AND <pred over s> THEN DELETE]
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED [AND NOT <pred>] THEN INSERT *
  * }}}
  *
  *  - the ON condition must be the conjunction of key equalities over the
  *    manifest-recorded `merge.keys` — the sink merges by key, any other
  *    join shape is not a bucket merge;
  *  - `UPDATE SET *` / `INSERT *` only: the sink stores the source row
  *    projected onto the table's columns (Delta's star actions); partial
  *    assignments would silently null-drift unassigned columns;
  *  - a MATCHED DELETE needs a predicate over SOURCE columns (the CDC op
  *    flag), and the INSERT must then carry the complementary
  *    `AND NOT <pred>` guard: the sink's contract is "unmatched
  *    delete-marked rows are no-ops", and without the guard SQL would
  *    insert them — the exact Delta CDC recipe, demanded explicitly;
  *  - duplicate source keys resolve latest-wins on `merge.version` BEFORE
  *    actions apply (the winning row's verdict decides) — the lake's
  *    ON CONFLICT discipline where ANSI MERGE would raise a cardinality
  *    error; replaying the same MERGE converges to the same table.
  */
object RewriteGraftMerge extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if m.resolved && graftTarget(m.targetTable).isDefined =>
      rewrite(m, graftTarget(m.targetTable).get)
  }

  private[sources] def graftTarget(plan: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
    plan match {
      case SubqueryAlias(_, child) => graftTarget(child)
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        Some((r, r.table.asInstanceOf[GraftTable]))
      case _ => None
    }

  private def refuse(table: String, what: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO $table: $what — the SQL face covers exactly " +
        "ParquetMergeSink.mergeActions (ON = the merge keys; optional " +
        "WHEN MATCHED AND <source pred> THEN DELETE; WHEN MATCHED THEN " +
        "UPDATE SET *; WHEN NOT MATCHED [AND NOT <pred>] THEN INSERT *); " +
        "anything else runs through the sink APIs")

  /** The attribute under star-alignment's optional no-op cast, else null. */
  private[sources] def attrOf(e: Expression): AttributeReference = e match {
    case a: AttributeReference => a
    case Cast(a: AttributeReference, _, _, _) => a
    case _ => null
  }

  private def rewrite(m: MergeIntoTable,
      target: (DataSourceV2Relation, GraftTable)): LogicalPlan = {
    val (rel, gt) = target
    val name = gt.name()
    val (keys, version, buckets) = gt.writeCfg.getOrElse(refuse(name,
      "not SQL-writable (only CURRENT merge-sink tables whose manifest " +
        "records merge.keys/merge.version accept MERGE; time-travel reads " +
        "and DV-carrying tables are read-only)"))
    if (m.notMatchedBySourceActions.nonEmpty)
      refuse(name, "WHEN NOT MATCHED BY SOURCE is not part of the merge " +
        "protocol (the sink never touches rows the batch does not name)")
    if (m.schemaEvolutionEnabled)
      refuse(name, "WITH SCHEMA EVOLUTION is not supported (the table's " +
        "columns are fixed by its manifest)")

    val targetAttrs = rel.output
    val sourceAttrs = m.sourceTable.output
    val sourceIds = m.sourceTable.outputSet

    // ON = conjunction of target-key = source-key equalities covering
    // EXACTLY merge.keys (order-free, each key once).
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val matchedKeys = conjuncts(m.mergeCondition).map {
      case EqualTo(l, r) =>
        val (la, ra) = (attrOf(l), attrOf(r))
        if (la == null || ra == null)
          refuse(name, s"ON condition term ${EqualTo(l, r).sql} is not a " +
            "plain column equality")
        val (t, s) =
          if (targetAttrs.exists(_.exprId == la.exprId) && sourceIds.contains(ra)) (la, ra)
          else if (targetAttrs.exists(_.exprId == ra.exprId) && sourceIds.contains(la)) (ra, la)
          else refuse(name, s"ON condition term ${EqualTo(l, r).sql} must " +
            "compare a target column with a source column")
        if (!conf.resolver(t.name, s.name))
          refuse(name, s"ON pairs differently-named columns ${t.name}/${s.name}" +
            " — the sink merges on same-named key columns")
        if (!keys.exists(k => conf.resolver(k, t.name)))
          refuse(name, s"ON references non-key column ${t.name} (merge keys: " +
            keys.mkString(", ") + ")")
        t.name.toLowerCase(java.util.Locale.ROOT)
      case other =>
        refuse(name, s"ON condition term ${other.sql} is not a key equality")
    }
    val wantKeys = keys.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    if (matchedKeys.toSet != wantKeys || matchedKeys.size != wantKeys.size)
      refuse(name, s"ON must equate exactly the merge keys (${keys.mkString(", ")}) " +
        s"once each; got ${matchedKeys.mkString(", ")}")

    // Star-aligned assignments: every target column := same-named source
    // column (the analyzer expands `SET *` / `INSERT *` to this form).
    def requireStar(what: String, assignments: Seq[Assignment]): Unit = {
      val assigned = assignments.map { a =>
        val (k, v) = (attrOf(a.key), attrOf(a.value))
        if (k == null || v == null || !sourceIds.contains(v) ||
            !conf.resolver(k.name, v.name))
          refuse(name, s"$what assigns ${a.sql} — only the star form " +
            s"(every target column := same-named source column) maps onto " +
            "the sink's project-source-onto-table-columns semantics")
        k.name.toLowerCase(java.util.Locale.ROOT)
      }
      val want = targetAttrs.map(_.name.toLowerCase(java.util.Locale.ROOT))
      if (assigned.sorted != want.sorted)
        refuse(name, s"$what must assign every table column exactly once " +
          s"(${want.mkString(", ")}); got ${assigned.mkString(", ")}")
    }

    val (deleteWhen, update) = m.matchedActions match {
      case Seq(u: UpdateAction) => (None, u)
      case Seq(DeleteAction(Some(p)), u: UpdateAction) =>
        if (!p.references.subsetOf(sourceIds))
          refuse(name, "the MATCHED DELETE predicate must read only SOURCE " +
            "columns (the source carries the verdict — a CDC op flag, an " +
            "erasure list joined upstream)")
        (Some(p), u)
      case Seq(DeleteAction(None), _*) =>
        refuse(name, "an unconditional MATCHED DELETE deletes every matched " +
          "row, leaving the UPDATE dead — use DELETE FROM / " +
          "TableMaintenance.deleteWhere for bulk deletion")
      case Seq(_: DeleteAction) =>
        refuse(name, "WHEN MATCHED THEN DELETE without an UPDATE action: " +
          "the sink updates every matched non-deleted row (source wins), " +
          "which is not what this statement asks")
      case other =>
        refuse(name, s"unsupported WHEN MATCHED shape (${other.size} actions)")
    }
    if (update.condition.isDefined)
      refuse(name, "a conditional UPDATE is not expressible: the sink " +
        "updates every matched non-deleted row (source wins on match)")
    requireStar("UPDATE", update.assignments)

    val insert = m.notMatchedActions match {
      case Seq(i: InsertAction) => i
      case other =>
        refuse(name, s"unsupported WHEN NOT MATCHED shape (${other.size} " +
          "actions) — exactly one INSERT * is required (without it, " +
          "unmatched source rows would be silently dropped)")
    }
    requireStar("INSERT", insert.assignments)
    (deleteWhen, insert.condition) match {
      case (None, None) => ()
      case (None, Some(_)) =>
        refuse(name, "a conditional INSERT without a MATCHED DELETE is not " +
          "expressible (the sink inserts every unmatched non-delete-marked " +
          "row); filter the source instead")
      case (Some(p), Some(q))
        if q.semanticEquals(Not(p)) || p.semanticEquals(Not(q)) => ()
      case (Some(p), _) =>
        refuse(name, "with WHEN MATCHED AND <pred> THEN DELETE the INSERT " +
          s"must carry AND NOT(${p.sql}): the sink's unmatched " +
          "delete-marked rows are no-ops (the Delta CDC recipe), and an " +
          "unguarded INSERT would insert them")
    }

    GraftMergeCommand(name, gt.tablePath, keys, version, buckets,
      m.sourceTable, deleteWhen.getOrElse(Literal.FalseLiteral))
  }
}

/** Driver command executing the accepted MERGE as one
  * [[graft.sinks.ParquetMergeSink.mergeActions]] commit (one new
  * generation for the touched buckets + one manifest flip — atomic to
  * readers, replay-idempotent, single version increment).
  */
case class GraftMergeCommand(tableName: String, path: String,
    keys: Seq[String], version: String, buckets: Int,
    source: LogicalPlan, deleteWhen: Expression)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)
  override def simpleString(maxFields: Int): String =
    s"GraftMergeCommand $tableName keys=[${keys.mkString(",")}] version=$version"

  override def run(spark: SparkSession): Seq[Row] = {
    val bridge = org.apache.spark.sql.GraftBridge
    graft.sinks.ParquetMergeSink.mergeActions(
      bridge.ofRows(spark, source), path, keys, version,
      bridge.column(deleteWhen), buckets)
    Seq.empty
  }
}
