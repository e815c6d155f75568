package graft.formats

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Optimizer barrier for expensive decode expressions.
  *
  * Catalyst's predicate pushdown substitutes aliases into pushed
  * filters, so `decode(...).as("res")` followed by `where(res.error
  * isNull)` re-inlines the decode into the filter — and decode
  * expressions are CodegenFallback, so there is no subexpression
  * elimination to rescue it: the payload gets parsed 3-4× per row
  * (measured 2.7× slowdown on the JSON pipeline at 2M records).
  *
  * Marking the decode non-deterministic makes Catalyst treat it as
  * un-duplicatable and un-pushable-through: it is evaluated exactly
  * once per row in its own projection. The expression IS semantically
  * deterministic — the flag is used purely as an optimizer fence, the
  * same contract as Spark's own `AssertTrue`-style fences. Trade-off:
  * unrelated filters also stop pushing through the decode projection,
  * so apply route/topic filters BEFORE decoding (as `KafkaShape.routes`
  * does).
  */
case class DecodeBarrier(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "decode_once"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def withNewChildInternal(newChild: Expression): DecodeBarrier =
    copy(child = newChild)
}

object DecodeBarrier {
  def apply(c: Column): Column =
    GraftBridge.column(DecodeBarrier(GraftBridge.expression(c)))
}
