package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst Expression bridge. Spark 4 hides the classic
  * converters behind `private[sql]`; custom expressions (AvroCodec,
  * ProtoCodec) need exactly these two hops and nothing else, so this
  * lives in the sql package to reach them.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
