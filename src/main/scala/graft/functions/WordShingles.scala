package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as ONE native pass over the text — the
  * codegen-friendly form of the `transform(sequence(...), i =>
  * array_join(slice(tokens, i+1, n), " "))` construction it replaces.
  *
  * Why: that higher-order-function chain is interpreted per WINDOW —
  * every shingle pays a lambda invocation, a `slice` array allocation
  * and an `array_join` — and it sits on the hottest path in the
  * catalog (every dedup/sketch/contamination query shingles the full
  * corpus). This expression tokenizes once and emits all windows in a
  * single loop, called from generated code like [[Md5Long]], so the
  * scan stays inside whole-stage codegen.
  *
  * Value identity with the replaced form (and with the DuckDB twin
  * `shinglesE`), pinned by `TextFnsSpec`:
  *  - trim strips SPACES only (Spark `trim()` semantics, not
  *    `String.trim`'s ≤0x20 rule);
  *  - tokens = Java-regex split on `[ \t\n\x0B\f\r]+` with limit −1
  *    (leading match ⇒ leading empty token, same as Spark `split`);
  *  - fewer than n tokens ⇒ one shingle: the space-join of ALL tokens
  *    (empty text ⇒ `[""]`).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** THE whitespace class (compiled once) — referenced from
    * [[TextFns.WS_CLASS]] rather than copied, so the oracle-parity
    * tokenization cannot drift between the native kernel and the
    * relational `tokens`/`shinglesRelational` forms.
    */
  private val WS = Pattern.compile(TextFns.WS_CLASS + "+")

  /** All n-token windows of `text`, space-joined. Called from
    * generated code.
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // Spark trim(): strip ' ' (0x20) only — NOT String.trim's <= 0x20
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val toks: Array[String] =
      if (b == e) Array.empty else WS.split(s.substring(b, e), -1)
    if (toks.length < n) {
      new GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val m = toks.length - n + 1
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column form. */
  def apply(c: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), n))
}
