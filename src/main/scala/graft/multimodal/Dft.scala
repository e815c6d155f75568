package graft.multimodal

/** Integer-twiddle 64-point DFT probe — the spectral step above
  * [[WavCodec.frameHash]]'s energy gradients: bin energies
  * E_k = C_k² + S_k² with C_k = Σ_i x_i·ct(k,i), where the twiddle
  * factors ct/st are cos/sin QUANTIZED to ×10⁶ integers ONCE here
  * and shared verbatim with the SQL twin ([[valuesSql]]) — so both
  * engines run pure 64-bit/128-bit integer sums and the surface is
  * oracle-hashable with no libm in the loop (DuckDB's cos and the
  * JVM's disagree in the last ulp; a shared literal table cannot).
  *
  * The quantization costs ~1e-6 relative amplitude error — orders of
  * magnitude below the bin-to-bin contrasts tone detection reads.
  */
object Dft {
  val N = 64
  val Bins = 16

  /** (k, i, ct_x1e6, st_x1e6) for k in 1..Bins, i in 0..N-1. */
  val tableX1e6: IndexedSeq[(Int, Int, Long, Long)] =
    for (k <- 1 to Bins; i <- 0 until N) yield {
      val a = 2.0 * math.Pi * k * i / N
      (k, i, math.round(1e6 * math.cos(a)), math.round(1e6 * math.sin(a)))
    }

  private val ct = Array.ofDim[Long](Bins + 1, N)
  private val st = Array.ofDim[Long](Bins + 1, N)
  tableX1e6.foreach { case (k, i, c, s) => ct(k)(i) = c; st(k)(i) = s }

  /** Bin energies over the first N samples (exact BigInt squares). */
  def energies(samples: Array[Int]): Array[BigInt] = {
    require(samples.length >= N, s"need >= $N samples")
    val out = new Array[BigInt](Bins + 1)
    var k = 1
    while (k <= Bins) {
      var cc = 0L; var ss = 0L; var i = 0
      while (i < N) {
        cc += samples(i) * ct(k)(i)
        ss += samples(i) * st(k)(i)
        i += 1
      }
      out(k) = BigInt(cc) * BigInt(cc) + BigInt(ss) * BigInt(ss)
      k += 1
    }
    out
  }

  /** The same table as a SQL VALUES literal for the DuckDB twin:
    * `(k, i, ct, st)` rows, identical numbers by construction.
    */
  def valuesSql: String =
    tableX1e6.map { case (k, i, c, s) => s"($k,$i,$c,$s)" }
      .mkString("(VALUES ", ",", ")")
}
