package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed byte size of a string's UTF-8 bytes (zlib
  * level 6, fixed) — the kernel of the compression-ratio quality
  * signal: repetitive boilerplate compresses far below natural text,
  * so `compressed/raw` is a one-number repetitiveness detector (the
  * heuristic quality-filter family popularized by large web-corpus
  * cleaning pipelines, cf. Rae et al. 2021 "Scaling Language Models"
  * repetition filters).
  *
  * [[Md5Long]]'s static-helper codegen pattern: a thread-local
  * `Deflater` is RESET per value, never reallocated, and the
  * expression stays inside whole-stage codegen. Deterministic for a
  * fixed input and level (single setInput + finish, no streaming
  * flush boundaries).
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_size"

  override protected def nullSafeEval(input: Any): Any =
    DeflateSize.size(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateSize.size($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {
  private val deflaters: ThreadLocal[Deflater] = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6)
  }

  /** Compressed size in bytes. Called from generated code. */
  def size(s: UTF8String): Long = sizeBytes(s.getBytes)

  def sizeBytes(bytes: Array[Byte]): Long = {
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column form. */
  def apply(c: Column): Column =
    GraftBridge.column(DeflateSize(GraftBridge.expression(c)))
}
