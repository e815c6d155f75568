package graft.formats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Confluent wire-envelope math, re-derived from the public wire format
  * (reference behavior: `lib/kpipe-core/.../ConfluentEnvelope.java:10-41`
  * and `lib/kpipe-format-protobuf/.../ProtobufFormat.java:184-268`):
  *
  *  - Avro:     1 magic byte `0x00` + 4-byte big-endian schema id +
  *              Avro binary body (5-byte prefix);
  *  - Protobuf: same 5-byte prefix + a zig-zag-varint message-index
  *              list (`0x00` shorthand ⇒ `[0]`, the first message),
  *              then the protobuf body.
  *
  * Column helpers are pure expressions (offset moves in Tungsten); the
  * byte-level parsers are used by the decode expressions and the
  * executor-side SR dispatch.
  */
object ConfluentEnvelope {

  val MagicByte: Byte = 0x00
  val PrefixLength: Int = 5

  // ------------------------------------------------------------------ //
  // Column-level (batch/stream plans)                                  //
  // ------------------------------------------------------------------ //

  /** True when the binary column carries a plausible Confluent envelope.
    * (Spark has no byte-indexing builtin for BinaryType; a 1-byte
    * substring compare and a hex/conv round-trip keep this in codegen.)
    */
  def hasEnvelope(value: Column): Column =
    length(value) >= PrefixLength &&
      substring(value, 1, 1) === lit(Array[Byte](MagicByte))

  /** Big-endian int schema id from bytes [1,4] of the envelope. */
  def schemaId(value: Column): Column =
    conv(hex(substring(value, 2, 4)), 16, 10).cast("long")

  /** Payload after a fixed-length prefix skip (`Stream.skipBytes`):
    * one offset move, no copy amplification.
    */
  def skipBytes(value: Column, n: Int): Column =
    substring(value, n + 1, Int.MaxValue)

  /** Avro body after the 5-byte envelope. */
  def avroBody(value: Column): Column = skipBytes(value, PrefixLength)

  /** Column form of [[wrap]]: constant 5-byte prefix + body, one codegen
    * concat — the sink-side envelope writer.
    */
  def envelope(schemaId: Int, body: Column): Column =
    concat(lit(wrap(schemaId, Array.empty[Byte])), body)

  // ------------------------------------------------------------------ //
  // Byte-level (decode expressions, tests)                             //
  // ------------------------------------------------------------------ //

  /** Parse the 5-byte prefix; None when not an envelope. */
  def readSchemaId(bytes: Array[Byte]): Option[Int] =
    if (bytes == null || bytes.length < PrefixLength || bytes(0) != MagicByte) None
    else Some(
      ((bytes(1) & 0xFF) << 24) | ((bytes(2) & 0xFF) << 16) |
        ((bytes(3) & 0xFF) << 8) | (bytes(4) & 0xFF))

  /** Write the 5-byte prefix + body (test fixture construction). */
  def wrap(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](PrefixLength + body.length)
    out(0) = MagicByte
    out(1) = ((schemaId >>> 24) & 0xFF).toByte
    out(2) = ((schemaId >>> 16) & 0xFF).toByte
    out(3) = ((schemaId >>> 8) & 0xFF).toByte
    out(4) = (schemaId & 0xFF).toByte
    System.arraycopy(body, 0, out, PrefixLength, body.length)
    out
  }

  /** Zig-zag decode (protobuf sint). */
  def zigzagDecode(n: Long): Long = (n >>> 1) ^ -(n & 1)

  /** Zig-zag encode. */
  def zigzagEncode(n: Long): Long = (n << 1) ^ (n >> 63)

  /** Read one unsigned varint at `pos`; returns (value, bytesConsumed).
    * Throws on truncation or >10-byte runs (malformed).
    */
  def readVarint(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var value = 0L
    var shift = 0
    var i = pos
    while (true) {
      if (i >= bytes.length) throw new IllegalArgumentException(
        s"truncated varint at offset $pos")
      if (shift >= 64) throw new IllegalArgumentException(
        s"varint too long at offset $pos")
      val b = bytes(i)
      value |= (b & 0x7FL) << shift
      i += 1
      if ((b & 0x80) == 0) return (value, i - pos)
      shift += 7
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write an unsigned varint. */
  def writeVarint(value: Long): Array[Byte] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var v = value
    while ((v & ~0x7FL) != 0) { buf += ((v & 0x7F) | 0x80).toByte; v >>>= 7 }
    buf += (v & 0x7F).toByte
    buf.toArray
  }

  /** Message-index list of a Confluent Protobuf envelope, read from
    * the position right after the 5-byte prefix. Wire layout: zig-zag
    * varint count, then that many zig-zag varint indexes; a single
    * `0x00` is the documented shorthand for `[0]` (first message).
    * Returns (indexPath, bytesConsumed-after-prefix).
    */
  def readMessageIndexes(bytes: Array[Byte], pos: Int = PrefixLength): (List[Int], Int) = {
    val (rawCount, n0) = readVarint(bytes, pos)
    val count = zigzagDecode(rawCount)
    if (count == 0) return (List(0), n0)
    if (count < 0 || count > 128) throw new IllegalArgumentException(
      s"implausible message-index count $count")
    var off = pos + n0
    val indexes = List.newBuilder[Int]
    var i = 0L
    while (i < count) {
      val (raw, n) = readVarint(bytes, off)
      val idx = zigzagDecode(raw)
      if (idx < 0 || idx > Int.MaxValue) throw new IllegalArgumentException(
        s"implausible message index $idx")
      indexes += idx.toInt
      off += n
      i += 1
    }
    (indexes.result(), off - pos)
  }

  /** Write a message-index list (uses the `0x00` shorthand for [0]). */
  def writeMessageIndexes(indexes: List[Int]): Array[Byte] =
    if (indexes == List(0)) Array[Byte](0)
    else (writeVarint(zigzagEncode(indexes.length.toLong)) ++
      indexes.flatMap(i => writeVarint(zigzagEncode(i.toLong)))).toArray
}
