package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-word language ID as ONE native pass over the text — the
  * codegen-friendly form of [[TextFns.langIdRelational]]'s string
  * arithmetic, which generated |langs| × |markers| (40 for the default
  * table) `replace` + `length` pairs per call: each is a FULL scan of
  * the joined token string, and the generated code is large enough
  * that a stage composing langId with another wide operator (q180:
  * the NaiveBayes agreement join) blows janino's 64 KB method limit
  * and silently drops the whole stage to INTERPRETED execution — the
  * r15 q181 failure class, found again in r16 via the bench stderr.
  * This expression tokenizes once and probes a marker hash table per
  * token (one static call site in generated code, like [[Md5Long]]).
  *
  * Value identity with the relational form, pinned by `TextFnsSpec`'s
  * differential:
  *  - tokens = Spark `trim` (spaces only) + Java-regex split on
  *    `[ \t\n\x0B\f\r]+` with limit −1 ([[WordShingles]]' rule);
  *  - per language, score = count of tokens whose UTF8String
  *    lowercase equals one of its (lowercased) markers — the
  *    double-space-join arithmetic counts exactly token-equal hits,
  *    a marker listed twice counts twice, and a token matching
  *    markers of several languages scores each of them;
  *  - winner = max (score, lang) in struct order (highest score, tie
  *    to the BINARY-greatest lang — `array_max` semantics);
  *  - score 0 (empty/markerless text) and NULL text both yield
  *    "und", never NULL — the relational `when(best.score > 0, …)
  *    .otherwise("und")` falls through to "und" on a NULL condition.
  */
case class LangId(child: Expression, markers: Map[String, Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"
  override def nullable: Boolean = false

  @transient private lazy val kernel = new LangId.Kernel(markers)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    kernel.best(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdKernel", kernel,
      classOf[LangId.Kernel].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} =
          $ref.best(${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {
  private val WS = Pattern.compile(TextFns.WS_CLASS + "+")
  private val UND = UTF8String.fromString("und")

  /** Precomputed marker table: lowercase marker → indices into the
    * binary-sorted language array (one entry PER LISTING, so a marker
    * repeated inside one language counts twice, like the replaced
    * per-marker sum). Shipped into generated code as a reference
    * object (the [[VecSqQuantize]] scales pattern).
    */
  final class Kernel(markers: Map[String, Seq[String]]) extends Serializable {
    private val langs: Array[UTF8String] = markers.keys.toArray
      .map(UTF8String.fromString).sortWith(_.compareTo(_) < 0)
    private val table = new java.util.HashMap[String, Array[Int]]()
    langs.zipWithIndex.foreach { case (lang, i) =>
      markers(lang.toString).foreach { w0 =>
        val w = UTF8String.fromString(w0).toLowerCase.toString
        val prev = table.get(w)
        table.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }

    /** Winning language for `text` (null/empty/markerless → "und").
      * Called from generated code.
      */
    def best(text: UTF8String): UTF8String = {
      if (langs.isEmpty) return UND
      val counts = new Array[Int](langs.length)
      if (text != null) {
        val s = text.toString
        // Spark trim(): strip ' ' (0x20) only — the WordShingles rule
        var b = 0
        var e = s.length
        while (b < e && s.charAt(b) == ' ') b += 1
        while (e > b && s.charAt(e - 1) == ' ') e -= 1
        if (b != e) {
          val toks = WS.split(s.substring(b, e), -1)
          var i = 0
          while (i < toks.length) {
            // UTF8String lowercase — the relational form lowercases
            // the joined token string through Spark's `lower`
            val hit = table.get(
              UTF8String.fromString(toks(i)).toLowerCase.toString)
            if (hit != null) {
              var j = 0
              while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
            }
            i += 1
          }
        }
      }
      // langs is binary-ascending, so >= hands ties to the greater
      // language — array_max's struct order
      var bi = 0
      var i = 1
      while (i < langs.length) {
        if (counts(i) >= counts(bi)) bi = i
        i += 1
      }
      if (counts(bi) > 0) langs(bi) else UND
    }
  }

  /** Column form. */
  def apply(c: Column, markers: Map[String, Seq[String]]): Column =
    GraftBridge.column(LangId(GraftBridge.expression(c), markers))
}
