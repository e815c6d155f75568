package graft.multimodal

/** Perceptual image hashing over REAL decoded pixels — the bridge
  * from the multimodal decode paths (PNG/BMP/GIF) into the dedup
  * family: dHash (difference hash, the classic public recipe: sample
  * down to a 9×8 grayscale grid, emit one bit per horizontal
  * gradient), all-integer so a DuckDB oracle recomputes the identical
  * hash from a closed-form pixel formula.
  *
  *  - downsample is nearest-neighbor with the integer split the grid
  *    features use: sample(r, c) = pixel((c·w) div 9, (r·h) div 8);
  *  - gray = (299·R + 587·G + 114·B) div 1000 (ITU-R 601 integer
  *    weights);
  *  - bit(r, c) = gray(r, c) > gray(r, c+1), index r·8+c;
  *  - the 64 bits are reported as two unsigned 32-bit halves
  *    (`lo` = rows 0–3, `hi` = rows 4–7) so neither engine touches
  *    the BIGINT sign bit.
  *
  * Hamming distance between hashes is then
  * `bit_count(lo ⊕ lo') + bit_count(hi ⊕ hi')` — codegen'd on the
  * Spark side, built-in on DuckDB — giving image near-dup detection
  * the same shape as the SimHash text path.
  */
object PixelHash {

  /** (lo, hi) 32-bit halves of the 64-bit dHash of an RGBA image. */
  def dHash(width: Int, height: Int, rgba: Array[Byte]): (Long, Long) = {
    // 9 columns × 8 rows of nearest-neighbor grayscale samples
    val g = new Array[Long](8 * 9)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        val x = c * width / 9
        val y = r * height / 8
        val p = (y * width + x) * 4
        g(r * 9 + c) = (299L * (rgba(p) & 0xFF) + 587L * (rgba(p + 1) & 0xFF) +
          114L * (rgba(p + 2) & 0xFF)) / 1000L
        c += 1
      }
      r += 1
    }
    var lo = 0L
    var hi = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r * 9 + c) > g(r * 9 + c + 1)) {
          if (r < 4) lo |= 1L << (r * 8 + c)
          else hi |= 1L << ((r - 4) * 8 + c)
        }
        c += 1
      }
      r += 1
    }
    (lo, hi)
  }
}
