package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` / `array<double>`
  * embedding columns. Pure `zip_with`/`aggregate` expressions — codegen'd,
  * no UDF, no driver involvement — so similarity scans distribute
  * trivially across a 1000-executor cluster.
  */
object VectorFns {

  /** Cast an embedding column to double for numerically stable math
    * (float32 parquet vectors widen exactly).
    */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product; sequential left-fold sum (deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x * x)

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
