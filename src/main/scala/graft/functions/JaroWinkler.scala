package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity ×10⁶ as an EXACT integer — the canonical
  * record-linkage string comparator (Jaro, JASA 1989; Winkler, ASA
  * 1990; the default field scorer in Fellegi–Sunter toolkits), native
  * and codegen'd like [[Md5Long]] (static-helper-from-generated-code).
  *
  * Definition (the standard one, incl. the 0.7 boost threshold most
  * implementations share):
  *
  *   jaro = (m/|a| + m/|b| + (2m − x)/(2m)) / 3
  *
  * with m = matches inside the ⌊max(|a|,|b|)/2⌋−1 window, x = matched
  * characters whose aligned order differs (so t = x/2 transpositions
  * contributes (m − t)/m = (2m − x)/(2m)), and
  *
  *   jw = jaro                       if jaro ≤ 0.7
  *        (jaro·(10 − ℓ) + ℓ) / 10   otherwise, ℓ = common prefix ≤ 4
  *
  * The result is floor(10⁶ · jw) computed over EXACT BigInt rationals
  * (common denominator 3·|a|·|b|·2m·10) — no double anywhere, so the
  * score is deterministic and engine-portable, unlike library floats
  * that disagree in the last ulp. Equal strings (incl. two empties)
  * score 10⁶; one empty side or m = 0 scores 0.
  *
  * Scale notes: O(|a|·|b|) per row like every Jaro implementation —
  * a NAME comparator for post-blocking verify stages (the q125 /
  * q292 candidate pairs), not a document metric.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jwX1e6(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.jwX1e6($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression)
      : JaroWinkler = copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** floor(10⁶·jw) over exact rationals. Called from generated code. */
  def jwX1e6(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1000000L
    if (la == 0 || lb == 0) return 0L
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // x = aligned matched chars that differ (t = x/2 transpositions)
    var x = 0
    var j = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) x += 1
        j += 1
      }
      i += 1
    }
    // jaro = N/D with D = 3·la·lb·2m (exact; strings can be long, so
    // the products go through BigInt)
    val bla = BigInt(la); val blb = BigInt(lb); val bm2 = BigInt(2L * m)
    val num = BigInt(m) * blb * bm2 + BigInt(m) * bla * bm2 +
      (bm2 - x) * bla * blb
    val den = bla * blb * bm2 * 3
    // boost only past the conventional 0.7 threshold
    val boosted = num * 10 > den * 7
    if (!boosted) (BigInt(1000000) * num / den).toLong
    else {
      var l = 0
      while (l < 4 && l < la && l < lb && a.charAt(l) == b.charAt(l)) l += 1
      // jw = (jaro·(10 − l) + l) / 10 = (num·(10 − l) + l·den) / (10·den)
      (BigInt(1000000) * (num * (10 - l) + BigInt(l) * den) /
        (den * 10)).toLong
    }
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
