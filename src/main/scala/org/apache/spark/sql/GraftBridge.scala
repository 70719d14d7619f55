package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters, the
  * established pattern for Spark libraries that ship native Catalyst
  * expressions with a Column-API face.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eagerly convert a Column to a catalyst expression tree (with real
    * UnresolvedAttribute leaves the analyzer can resolve inside custom
    * logical nodes) — `ExpressionUtils.expression` defers conversion behind
    * a ColumnNodeExpression wrapper, which generic analysis never unwraps.
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
