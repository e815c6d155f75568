package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** A centroid matrix shipped to executors as ONE reference object,
  * with norms precomputed by the same ascending fold + sqrt the
  * [[VecMath.dot]] kernel evaluates.
  */
final class CellMatrix(val cents: Array[Array[Double]]) extends Serializable {
  val norms: Array[Double] = cents.map { c =>
    var a = 0.0; var i = 0
    while (i < c.length) { a += c(i) * c(i); i += 1 }
    math.sqrt(a)
  }
}

/** Nearest-centroid assignment as ONE kernel call — the O(numCells)
  * replacement for `array_max(array(struct(cosine(v, lit(c_i)), i)))`,
  * whose generated code grows LINEARLY with the cell count and gets
  * replicated into join-key null filters: ScaleRamp's 40-cell semDedup
  * measured janino's 64 KB method limit tripping (whole-stage codegen
  * disabled, ~2× wall clock). This expression evaluates the identical
  * doubles — ascending-fold dots, sim = dot/(vnorm·cnorm), zero-norm
  * guard to 0, ties to the LARGER cell via `Double.compare >= 0` (the
  * struct-max convention, NaN ordered greatest like Spark) — from one
  * generated call, so the value surface (and every oracle twin) is
  * unchanged while code size is constant in numCells.
  */
case class NearestCellExpr(child: Expression, matrix: CellMatrix)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_cell"

  override protected def nullSafeEval(input: Any): Any =
    CellOps.nearest(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellMatrix", matrix,
      "graft.functions.CellMatrix")
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Integer ${ev.value}Tmp = graft.functions.CellOps.nearest($c, $ref);
       |if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}Tmp.intValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellExpr =
    copy(child = newChild)
}

/** The `n` nearest cells, best first (sim DESC, cell DESC — the
  * `slice(reverse(array_sort(structs)), 1, n)` convention), as one
  * kernel call.
  */
case class TopCellsExpr(child: Expression, matrix: CellMatrix, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"need n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_cells"

  override protected def nullSafeEval(input: Any): Any =
    CellOps.top(input.asInstanceOf[ArrayData], matrix, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellMatrix", matrix,
      "graft.functions.CellMatrix")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.CellOps.top($c, $ref, $n);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TopCellsExpr =
    copy(child = newChild)
}

object CellOps {

  /** All cell sims of `v`: dot/(vnorm·cnorm) with zero-norm guard;
    * null when a length mismatches or an element is null.
    */
  private def sims(v: ArrayData, m: CellMatrix): Array[Double] = {
    val n = v.numElements()
    var vn2 = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i)
      vn2 += x * x
      i += 1
    }
    val vn = math.sqrt(vn2)
    val out = new Array[Double](m.cents.length)
    var c = 0
    while (c < m.cents.length) {
      val cent = m.cents(c)
      if (cent.length != n) return null
      out(c) =
        if (vn == 0.0 || m.norms(c) == 0.0) 0.0
        else {
          var d = 0.0
          var j = 0
          while (j < n) { d += v.getDouble(j) * cent(j); j += 1 }
          d / (vn * m.norms(c))
        }
      c += 1
    }
    out
  }

  /** argmax cell, ties to the larger cell (struct-max convention). */
  def nearest(v: ArrayData, m: CellMatrix): java.lang.Integer = {
    val s = sims(v, m)
    if (s == null || s.length == 0) return null
    var best = 0
    var c = 1
    while (c < s.length) {
      if (java.lang.Double.compare(s(c), s(best)) >= 0) best = c
      c += 1
    }
    best
  }

  /** Top-n cells by (sim DESC, cell DESC), best first. */
  def top(v: ArrayData, m: CellMatrix, n: Int): ArrayData = {
    val s = sims(v, m)
    if (s == null) return null
    val idx = Array.range(0, s.length).sortWith { (a, b) =>
      val cmp = java.lang.Double.compare(s(a), s(b))
      if (cmp != 0) cmp > 0 else a > b
    }
    new GenericArrayData(idx.take(n).map(i => i: Any))
  }
}

object NearestCellExpr {
  def apply(v: Column, centroids: Seq[Array[Double]]): Column =
    GraftBridge.column(NearestCellExpr(GraftBridge.expression(v),
      new CellMatrix(centroids.toArray)))
}

object TopCellsExpr {
  def apply(v: Column, centroids: Seq[Array[Double]], n: Int): Column =
    GraftBridge.column(TopCellsExpr(GraftBridge.expression(v),
      new CellMatrix(centroids.toArray), n))
}
