package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity 61-bit hashing, derived from md5.
  *
  * MinHash / SimHash / LSH bucket hashes must be computable by BOTH the
  * Spark engine and the DuckDB correctness oracle, or the near-dup
  * operators can only ever get a weak rows-only check. `xxhash64` has no
  * DuckDB analog, so signatures here derive from `md5` (identical in
  * both engines) parsed into 32-bit chunks:
  *
  *   c_i = int(hexDigest[8i .. 8i+8))                      i = 0..3
  *   x   = ((c0 & (2^29-1)) << 32) | c1                    61-bit
  *   h_k = (a_k · x + b_k) mod (2^61 - 1)                  k-th hash
  *
  * (a_k, b_k) are per-k seeded random constants — the classic
  * 2-universal multiply-add family, which keeps the k MinHash estimators
  * effectively independent (a single-pair double-hashing family is
  * unbiased per k but correlated ACROSS k, inflating estimator variance
  * ~1.6×). The modulus being the Mersenne prime 2^61-1 lets the 61×31-bit
  * product reduce with shifts and adds only (2^61 ≡ 1 mod p), so every
  * intermediate stays below 2^63 − 2^32: safe under Spark ANSI mode and
  * DuckDB's overflow-checked operators alike, and one md5 per shingle
  * feeds all k hashes.
  *
  * Every Spark builder has its DuckDB-SQL twin in this file — keep them
  * adjacent so they cannot drift.
  */
object HashFns {

  /** 2^61 - 1, a Mersenne prime — the modulus of the hash family. */
  val P61: Long = (1L << 61) - 1
  private val M29 = (1L << 29) - 1
  private val M31 = (1L << 31) - 1
  private val M30 = (1L << 30) - 1

  /** Seeded (a_k, b_k) multiply-add constants; a ∈ [1, 2^31), b ∈ [0, p).
    * Embedded verbatim into the DuckDB oracles — never regenerate with a
    * different seed without re-deriving both sides.
    */
  val MINHASH_AB: IndexedSeq[(Long, Long)] = {
    val r = new scala.util.Random(42L)
    IndexedSeq.fill(64)((
      ((r.nextLong() & Long.MaxValue) % (M31 - 1)) + 1,
      (r.nextLong() & Long.MaxValue) % P61))
  }

  /** k-th hash of the 2-universal family over a 61-bit element hash x.
    * Overflow-free (a_k·x + b_k) mod p via the Mersenne identity
    * 2^61 ≡ 1 (mod p): split x = xh·2^31 + xl, reduce a·xh·2^31 by
    * re-splitting the 61-bit product. Max intermediate < 2^63 − 2^32.
    */
  def hashAt(x: Column, k: Int): Column = {
    val (a, b) = MINHASH_AB(k)
    val t1 = lit(a) * shiftright(x, 31)                       // a·xh < 2^61
    val hi = shiftright(t1, 30) + shiftleft(t1.bitwiseAND(lit(M30)), 31)
    (hi + lit(a) * x.bitwiseAND(lit(M31)) + lit(b)) % lit(P61)
  }

  /** Single 61-bit string hash: element hashes, bucket ids, band hashes.
    * = top 61 bits of the md5 digest ([[Md5Long]] masked to the modulus
    * range), identical to [[duckHash61]] on the oracle side.
    */
  def hash61(c: Column): Column = Md5Long(c).bitwiseAND(lit(P61))

  // ------------------------------------------------------------------ //
  // Scala-native forms — identical values computed off-plan (e.g. by   //
  // the multimodal StubCodec inside mapPartitions), so non-Column code //
  // stays oracle-verifiable through the same family.                   //
  // ------------------------------------------------------------------ //

  /** Scala-native [[hash61]] over raw bytes ([[Md5Long.hashBytes]]
    * masked to the modulus range).
    */
  def hash61Bytes(bytes: Array[Byte]): Long = Md5Long.hashBytes(bytes) & P61

  /** Scala-native [[hashAt]]: k-th 2-universal hash of a 61-bit x. */
  def hashAtLong(x: Long, k: Int): Long = {
    val (a, b) = MINHASH_AB(k)
    val t1 = a * (x >> 31)
    val hi = (t1 >> 30) + ((t1 & M30) << 31)
    (hi + a * (x & M31) + b) % P61
  }

  /** Bits of a 64-bit token hash without signed-shift hazards: bit b is
    * read from the low (c1) or high (c0) 32-bit chunk directly. Returns
    * (loChunk, hiChunk) to alias once per row before fanning out 64 bit
    * extractions.
    */
  def bitChunks(c: Column): (Column, Column) = {
    val h = Md5Long(c)
    (h.bitwiseAND(lit((1L << 32) - 1)), shiftrightunsigned(h, 32))
  }

  /** Bit b (0..63) of the 64-bit hash given (lo, hi) 32-bit chunks. */
  def bitAt(lo: Column, hi: Column, b: Int): Column =
    if (b < 32) shiftright(lo, b).bitwiseAND(lit(1L))
    else shiftright(hi, b - 32).bitwiseAND(lit(1L))

  // ------------------------------------------------------------------ //
  // DuckDB twins: SQL snippets computing the identical values.         //
  // ------------------------------------------------------------------ //

  /** DuckDB: i-th 32-bit chunk of md5 hex expression `hexE`. */
  def duckChunk(hexE: String, i: Int): String =
    s"CAST(('0x' || substr($hexE, ${1 + 8 * i}, 8)) AS BIGINT)"

  /** DuckDB: b1 of md5 hex expression. */
  def duckB1(hexE: String): String =
    s"(((${duckChunk(hexE, 0)} & $M29) << 32) | ${duckChunk(hexE, 1)})"

  /** DuckDB: k-th hash given an expression holding the 61-bit x. */
  def duckHashAt(xE: String, k: Int): String = {
    val (a, b) = MINHASH_AB(k)
    val t1 = s"($a * ($xE >> 31))"
    val hi = s"(($t1 >> 30) + (($t1 & $M30) << 31))"
    s"(($hi + $a * ($xE & $M31) + $b) % $P61)"
  }

  /** DuckDB: hash61 of a string expression. */
  def duckHash61(strE: String): String = duckB1(s"md5($strE)")

  /** DuckDB: bit b of the 64-bit hash given lo/hi chunk expressions. */
  def duckBitAt(loE: String, hiE: String, b: Int): String =
    if (b < 32) s"(($loE >> $b) & 1)" else s"(($hiE >> ${b - 32}) & 1)"
}
