package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Column ⇄ catalyst Expression bridge. Spark 4 hides the classic
  * converters behind `private[sql]`; custom expressions (AvroCodec,
  * ProtoCodec) need exactly these two hops and nothing else, so this
  * lives in the sql package to reach them.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Column → catalyst Expression.
    *
    * `ExpressionUtils.expression` wraps the column node in an
    * `Unevaluable` `ColumnNodeExpression` — fine inside a Dataset plan
    * (the analyzer unwraps it) but dead weight inside a
    * FunctionRegistry builder, where nothing converts it. The node
    * converter produces the real (possibly unresolved) catalyst tree,
    * which analysis then resolves in either context.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** LogicalPlan → DataFrame (`Dataset.ofRows` is private[sql]); the hop
    * a custom logical operator needs to surface as a DataFrame.
    */
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
