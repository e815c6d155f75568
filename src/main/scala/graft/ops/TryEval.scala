package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Per-row exception containment — the runtime half of `Operators.safe`
  * (`Operators.java:114-116`: on exception, log and keep going).
  *
  * Spark's `try_*` family covers arithmetic/cast; this generalizes to
  * ANY expression: a row where evaluation throws yields null instead of
  * failing the task. Combine with the Result/DLQ split to route such
  * rows. CodegenFallback keeps the catch boundary per-row without
  * poisoning surrounding codegen.
  */
case class TryEval(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_try"

  override def eval(input: InternalRow): Any =
    try child.eval(input)
    catch { case _: Exception => null }

  override protected def withNewChildInternal(newChild: Expression): TryEval =
    copy(child = newChild)
}

object TryEval {
  /** `safeColumn(expr)` — null on per-row evaluation failure. */
  def apply(c: Column): Column = GraftBridge.column(TryEval(GraftBridge.expression(c)))
}
