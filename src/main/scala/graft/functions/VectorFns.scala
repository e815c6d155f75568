package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` / `array<double>`
  * embedding columns. The kernels are native expressions
  * ([[VecDot]]/[[VecL2Sq]] — one generated-code loop per pair, no
  * interpreted lambda frames), no UDF, no driver involvement — so
  * similarity scans distribute trivially across a 1000-executor
  * cluster. Inputs are cast to array<double> so the accumulation is
  * the same left-to-right IEEE double fold on every engine.
  */
object VectorFns {

  /** Cast an embedding column to double for numerically stable math
    * (float32 parquet vectors widen exactly).
    */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product; sequential left-fold sum (deterministic order). */
  def dot(a: Column, b: Column): Column =
    VecDot(toDouble(a), toDouble(b))

  /** The `zip_with`/`aggregate` construction of [[dot]] — kept as the
    * independent cross-check [[VecDot]] is differentially specced
    * against.
    */
  def dotRelational(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm (= dot(v, v): identical acc + x·x fold). */
  def normSq(v: Column): Column = { val d = toDouble(v); VecDot(d, d) }

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(normSq(v))

  /** Cosine similarity in [-1,1]; 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(VecL2Sq(toDouble(a), toDouble(b)))

  /** The HOF construction of [[l2Distance]] (differential twin). */
  def l2DistanceRelational(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  /** Random-hyperplane (sign-bit) LSH signature for cosine similarity:
    * an H-bit bucket id. Vectors with high cosine similarity collide
    * with probability (1 - theta/pi)^H. `hyperplanes` are literal
    * (broadcast-as-constant) vectors — generated once, seeded, on the
    * driver; the per-row work is H dot products inside codegen.
    */
  def hyperplaneSignature(v: Column, hyperplanes: Seq[Array[Double]]): Column =
    hyperplanes.zipWithIndex.map { case (h, i) =>
      when(dot(v, typedlit(h.toSeq)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic seeded hyperplanes for [[hyperplaneSignature]]. */
  def randomHyperplanes(numBits: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numBits)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
