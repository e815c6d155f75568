package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Mitchell eighth-bit log2 as ONE codegen'd expression — the native
  * form of [[graft.ops.TextStats.mitchellE8Sql]]'s 43-branch CASE
  * ladder (floor-log2 + pow2 floor + pow2/8, ~130 generated branches
  * per call). A projection that inlines several of the SQL ladders
  * (q181's Dunning G² carries 16 logs) blows janino's 64 KB method
  * limit and silently drops the whole stage to interpreted execution;
  * this expression compiles to one static call around
  * `Long.numberOfLeadingZeros`. Values are bit-equal to the SQL
  * emitter on the shared domain ([[graft.ops.TextStats.mitchellE8Long]]
  * is the same arithmetic and is differentially specced against the
  * CASE form; `MitchellE8Spec` pins this expression to both). The SQL
  * emitter itself stays — it is the DuckDB twin's only option.
  */
case class MitchellE8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mitchell_e8"

  override protected def nullSafeEval(input: Any): Any =
    graft.ops.TextStats.mitchellE8Long(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.TextStats.mitchellE8Long($c)")

  override protected def withNewChildInternal(newChild: Expression): MitchellE8 =
    copy(child = newChild)
}

object MitchellE8 {
  /** Column form. */
  def apply(c: Column): Column =
    GraftBridge.column(MitchellE8(GraftBridge.expression(c)))

  /** Eighth-bit integer log2 of a POSITIVE count column — the native
    * form of [[graft.ops.TextStats.log2E8Sql]]:
    * m8(n·2^SHIFT) − 8·SHIFT. Same domain contract as the SQL emitter
    * (n ≥ 1; n·2^20 must stay under 2^63).
    */
  def log2E8(n: Column): Column = {
    import org.apache.spark.sql.functions.lit
    val shift = graft.ops.TextStats.LmShift
    apply(n * lit(1L << shift)) - lit(8L * shift)
  }
}
