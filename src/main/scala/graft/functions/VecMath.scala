package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector kernels — the codegen-friendly forms of the
  * `zip_with`/`aggregate` constructions they replace. Spark's
  * higher-order functions carry no `doGenCode`: every element of every
  * row pays an interpreted lambda frame, and the ANN family
  * (q28/q31/q49/q76/q79/q81) evaluates one dot product per candidate
  * PAIR. These expressions run the identical left-to-right IEEE
  * accumulation (acc + a_i·b_i ascending — bit-identical results, the
  * DuckDB twins' `list_dot_product` order) as a tight loop called from
  * generated code, like [[Md5Long]] and [[WordShingles]].
  *
  * Length mismatch and null elements both return NULL — exactly the
  * `zip_with`/`aggregate` null conventions the kernels replace (a
  * null slot nulls the product, which nulls the fold), so the
  * SQL-registered `graft_dot`/`graft_l2` surface keeps its semantics.
  */
object VecMath {

  /** Σ a_i·b_i, ascending; null on length mismatch OR any null
    * element — the exact null-propagation the `zip_with`/`aggregate`
    * construction has (a null slot nulls the product, which nulls the
    * fold). Called from generated code.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Integer Σ a_i·b_i, ascending; null on length mismatch or null
    * element. Exact — the quantized-ANN (int8 SQ) scoring kernel.
    */
  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** |A ∩ B| of two SORTED distinct long arrays by merge scan —
    * allocation-free (no per-row hash set, unlike
    * `array_intersect`), O(|A| + |B|), null on any null element.
    * The set-similarity verify kernel: inputs are the
    * `sort_array(collect_set(...))` arrays every candidate pair
    * joins back to, so sortedness holds by construction (documented
    * precondition — an unsorted input undercounts, it does not
    * throw).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): java.lang.Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Σ (a_i−b_i)², ascending; null on length mismatch or null
    * element.
    */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Int8 scalar quantization kernel (r15): element i maps to
    * (long) floor(x_i · 127.0 / scales(i)), 0 where scales(i) == 0 —
    * the same IEEE multiply-then-divide order as the transform-lambda
    * form it replaces ([[graft.sim.Similarity.sqQuantize]]), so the
    * codes are bit-identical. Null handling mirrors the lambda exactly
    * (r16 — the r15 kernel returned null for a null element at a
    * zero-scale dimension where the lambda's `when(get(s,i) === 0.0,
    * 0L)` returned 0L without inspecting the element): scales(i) == 0
    * emits 0L regardless of element nullity, a null element at a
    * nonzero scale stays null, and an element past the scales array
    * stays null (`get(s, i)` out of bounds). Called from generated
    * code; pinned per-corner by GraftFunctionsSpec.
    */
  def sqQuantize(v: ArrayData, scales: Array[Double]): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < scales.length) {
        val s = scales(i)
        if (s == 0.0) out(i) = java.lang.Long.valueOf(0L)
        else if (!v.isNullAt(i))
          out(i) = java.lang.Long.valueOf(
            math.floor(v.getDouble(i) * 127.0 / s).toLong)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native int8 scalar quantization of an array<double> vector — the
  * codegen form of the per-element transform lambda, which was
  * interpreted per (row × dimension) across the whole SQ family
  * (q76/q108/q117/q118/q271/q294/q318…). Scales travel as a reference
  * object into generated code.
  */
case class VecSqQuantize(child: Expression, scales: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> input, got ${t.catalogString}")
    }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)
  override def prettyName: String = "graft_sq_quantize"
  override protected def nullSafeEval(input: Any): Any =
    VecMath.sqQuantize(input.asInstanceOf[ArrayData], scales)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqScales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecMath.sqQuantize($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): VecSqQuantize =
    copy(child = newChild)
}

object VecSqQuantize {
  def apply(v: Column, scales: Array[Double]): Column =
    GraftBridge.column(VecSqQuantize(GraftBridge.expression(v), scales))
}

/** Shared shape of the two binary vector kernels. */
abstract class VecBinaryExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  // a length mismatch yields null even for non-null children
  override def nullable: Boolean = true
}

/** Dot product Σ a_i·b_i as one generated-code loop. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "graft_vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDot")
      s"""java.lang.Double $r = graft.functions.VecMath.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance Σ (a_i−b_i)² as one generated-code loop. */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "graft_vec_l2sq"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecL2")
      s"""java.lang.Double $r = graft.functions.VecMath.l2sq($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Integer dot product over two array<bigint> columns (SQ codes). */
case class VecDotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot_long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDotL")
      s"""java.lang.Long $r = graft.functions.VecMath.dotLong($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

object VecDotLong {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VecDotLong(GraftBridge.expression(a), GraftBridge.expression(b)))
}

object VecL2Sq {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VecL2Sq(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** |A ∩ B| over two SORTED distinct array<bigint> columns as one
  * generated-code merge scan ([[VecMath.sortedIntersectCount]]) — the
  * allocation-free replacement for `size(array_intersect(a, b))` on
  * the set-similarity verify path.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_intersect_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sic")
      s"""java.lang.Long $r = graft.functions.VecMath.sortedIntersectCount($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
