package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass HyperLogLog register aggregation as a typed `Aggregator`
  * (UDAF). IN = a 61-bit [[HashFns.hash61]] value, BUF = the dense
  * 1024-byte register table, OUT = the exact integer `hll_reg_sum`
  * (Σ 2^(52−reg)) — the same oracle-exact readback as
  * [[graft.ops.Sketch.hllDistinct]], and the derivation mirrors the
  * column pipeline bit for bit (bucket = low 10 bits, rho = 52 −
  * bitLength of the remaining 51 bits, register = max — the identical
  * native fold `graft.streaming.Stateful.hllRunning` runs), so the
  * three forms are pinned against each other by spec and any of them
  * feeds the same `HllEstNumX10 div reg_sum` estimate.
  *
  * Why this exists next to the two-aggregation column form:
  * (a) ONE aggregation — partial 1 KiB buffers merge map-side and
  * only one buffer per group crosses the shuffle, no (key, bucket)
  * rows ever; (b) it composes where CHAINED aggregations cannot — a
  * watermarked streaming window (`groupBy(window(ts), key)
  * .agg(Sketch.hllAgg(hash))`) is a single stateful operator, giving
  * windowed distinct-count streams with append-mode emission at
  * watermark close, which the bucket-then-regsum construction (two
  * stateful aggs) cannot express as cleanly. max is idempotent, so
  * at-least-once redelivery never moves the result.
  */
object HllAgg extends Aggregator[java.lang.Long, Array[Byte], Long] {
  private final val M = 1024

  def zero: Array[Byte] = new Array[Byte](M)

  // Boxed input + explicit null skip (like the KMV/CMS imperative
  // twins): a NULL hash must not fold as h=0 (bucket 0, rho 52),
  // which would silently skew hll_reg_sum.
  def reduce(b: Array[Byte], boxed: java.lang.Long): Array[Byte] = {
    if (boxed == null) return b
    val h = boxed.longValue
    val bucket = (h & (M - 1).toLong).toInt
    val w = h >>> 10
    val rho =
      (if (w == 0L) 52 else 52 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
    if (rho > b(bucket)) b(bucket) = rho
    b
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  def finish(b: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < M) { s += 1L << (52 - b(i)); i += 1 }
    s
  }

  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
