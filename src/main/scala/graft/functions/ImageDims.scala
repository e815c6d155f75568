package graft.functions

import graft.multimodal.MediaHeaders
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native image-header probe: `binary → struct(format, width, height)`
  * or NULL when the bytes are not a recognized well-formed PNG / GIF /
  * BMP / JPEG prefix ([[graft.multimodal.MediaHeaders.parseImage]] —
  * real container-layout parsing, not the stub codec). Evaluates from
  * generated code via a static helper (the [[Md5Long]] pattern), so a
  * 100 TB metadata-extraction scan stays inside whole-stage codegen
  * with no mapPartitions stage when only dimensions are needed.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ImageDims.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_dims"

  override protected def nullSafeEval(input: Any): Any =
    ImageDims.dims(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.ImageDims.dims($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

object ImageDims {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Called from generated code; null = unrecognized/malformed. */
  def dims(bytes: Array[Byte]): InternalRow = {
    val d = MediaHeaders.parseImage(bytes)
    if (d == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(d.format), d.width, d.height))
  }

  def apply(bin: Column): Column =
    GraftBridge.column(ImageDims(GraftBridge.expression(bin)))
}
