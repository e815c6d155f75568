package graft.formats

import java.io.ByteArrayOutputStream

/** CBOR (RFC 8949) codec on pure JDK bytes — the binary JSON sibling
  * of the Avro/protobuf wire decoders: IoT and telemetry stacks ship
  * CBOR where web stacks ship JSON, and a Kafka-decode engine meets it
  * on real topics. Decodes the definite-length core of the format —
  * major types 0/1 (unsigned/negative ints), 2 (byte strings),
  * 3 (UTF-8 text), 4 (arrays), 5 (maps), 7's false/true/null and
  * float64 — to a small value tree, and renders that tree as
  * deterministic JSON-ish text (map entries in ENCODED order, the
  * wire's own order, so rendering is a pure function of the bytes).
  *
  * Out-of-subset inputs (indefinite lengths, tags, float16/32,
  * malformed, truncated) return null — decode is TOTAL (the Result
  * convention: a poison record must not kill a 100 TB decode stage).
  * The encoder writes the same subset back (ints in their SHORTEST
  * form, as the spec's preferred serialization requires), which makes
  * round-trips testable; independence comes from RFC 8949 Appendix A's
  * published test vectors in `CborCodecSpec`.
  *
  * Scale shape: per-record work is O(bytes); used from the batched
  * mapPartitions stages it is map-only, no shuffle.
  */
object CborCodec {

  sealed trait Value
  final case class CInt(v: Long) extends Value
  final case class CBytes(v: Array[Byte]) extends Value
  final case class CText(v: String) extends Value
  final case class CArr(v: Vector[Value]) extends Value
  final case class CMap(v: Vector[(Value, Value)]) extends Value
  final case class CBool(v: Boolean) extends Value
  case object CNull extends Value
  final case class CFloat(v: Double) extends Value

  private final class Reader(val b: Array[Byte]) {
    var p = 0
    def u8(): Int = { val v = b(p) & 0xFF; p += 1; v }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || p + n > b.length) throw new IllegalArgumentException("short")
      val out = java.util.Arrays.copyOfRange(b, p, p + n); p += n; out
    }
    def uint(ai: Int): Long = ai match {
      case v if v < 24 => v
      case 24 => u8()
      case 25 => (u8() << 8) | u8()
      case 26 => ((u8().toLong << 24) | (u8() << 16) | (u8() << 8) | u8())
      case 27 =>
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | u8(); i += 1 }
        v
      case _ => throw new IllegalArgumentException("indefinite/reserved")
    }
  }

  /** Decode one CBOR data item; null outside the subset. */
  def decode(bytes: Array[Byte]): Value = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val r = new Reader(bytes)
      val v = item(r, 0)
      if (r.p != bytes.length) null else v   // trailing garbage rejected
    } catch { case _: Exception => null }
  }

  private def item(r: Reader, depth: Int): Value = {
    if (depth > 32) throw new IllegalArgumentException("too deep")
    val ib = r.u8()
    val major = ib >> 5
    val ai = ib & 0x1F
    major match {
      case 0 => CInt(r.uint(ai))
      case 1 =>
        val n = r.uint(ai)
        // -1 - n; values beyond Long.MinValue are out of subset
        if (n < 0) throw new IllegalArgumentException("neg overflow")
        CInt(-1L - n)
      case 2 => CBytes(r.take(toLen(r.uint(ai))))
      case 3 => CText(new String(r.take(toLen(r.uint(ai))), "UTF-8"))
      case 4 =>
        val n = toLen(r.uint(ai))
        CArr(Vector.fill(n)(item(r, depth + 1)))
      case 5 =>
        val n = toLen(r.uint(ai))
        CMap(Vector.fill(n)((item(r, depth + 1), item(r, depth + 1))))
      case 7 => ai match {
        case 20 => CBool(false)
        case 21 => CBool(true)
        case 22 => CNull
        case 27 =>
          var bits = 0L
          var i = 0
          while (i < 8) { bits = (bits << 8) | r.u8(); i += 1 }
          CFloat(java.lang.Double.longBitsToDouble(bits))
        case _ => throw new IllegalArgumentException("simple/float16/32")
      }
      case _ => throw new IllegalArgumentException("tags unsupported")
    }
  }

  private def toLen(v: Long): Int = {
    if (v < 0 || v > Int.MaxValue) throw new IllegalArgumentException("len")
    v.toInt
  }

  /** Deterministic JSON-ish rendering: map entries in encoded order,
    * byte strings as lowercase hex under "h''", float64 via
    * Double.toString (deterministic shortest-repr in the JVM).
    */
  def toJson(v: Value): String = v match {
    case null => null
    case CInt(x) => x.toString
    case CBool(x) => x.toString
    case CNull => "null"
    case CFloat(x) => x.toString
    case CText(s) =>
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    case CBytes(b) => "\"h'" + b.map(x => f"${x & 0xFF}%02x").mkString + "'\""
    case CArr(xs) => xs.map(toJson).mkString("[", ",", "]")
    case CMap(kv) =>
      kv.map { case (k, x) => toJson(k) + ":" + toJson(x) }
        .mkString("{", ",", "}")
  }

  /** Encode the subset back (shortest-form ints — the spec's
    * preferred serialization).
    */
  def encode(v: Value): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(out, v)
    out.toByteArray
  }

  private def writeHead(out: ByteArrayOutputStream, major: Int, n: Long): Unit = {
    val m = major << 5
    if (n < 24) out.write(m | n.toInt)
    else if (n < 256) { out.write(m | 24); out.write(n.toInt) }
    else if (n < 65536) {
      out.write(m | 25); out.write((n >> 8).toInt); out.write(n.toInt & 0xFF)
    } else if (n < (1L << 32)) {
      out.write(m | 26)
      var i = 3
      while (i >= 0) { out.write(((n >> (8 * i)) & 0xFF).toInt); i -= 1 }
    } else {
      out.write(m | 27)
      var i = 7
      while (i >= 0) { out.write(((n >> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
  }

  private def write(out: ByteArrayOutputStream, v: Value): Unit = v match {
    case CInt(x) if x >= 0 => writeHead(out, 0, x)
    case CInt(x) => writeHead(out, 1, -1L - x)
    case CBytes(b) => writeHead(out, 2, b.length); out.write(b, 0, b.length)
    case CText(s) =>
      val b = s.getBytes("UTF-8")
      writeHead(out, 3, b.length); out.write(b, 0, b.length)
    case CArr(xs) => writeHead(out, 4, xs.length); xs.foreach(write(out, _))
    case CMap(kv) =>
      writeHead(out, 5, kv.length)
      kv.foreach { case (k, x) => write(out, k); write(out, x) }
    case CBool(false) => out.write(0xF4)
    case CBool(true) => out.write(0xF5)
    case CNull => out.write(0xF6)
    case CFloat(x) =>
      out.write(0xFB)
      val bits = java.lang.Double.doubleToLongBits(x)
      var i = 7
      while (i >= 0) { out.write(((bits >> (8 * i)) & 0xFF).toInt); i -= 1 }
  }

  /** Deterministic telemetry-record fixture for the q192 oracle: per
    * id a map {"id": id, "n": id % 13 + 1, "tags": [t0..], "name":
    * "rec-<id>", "ok": id % 2 == 0} whose decoded field extractions
    * have closed forms a SQL twin can state directly.
    */
  def testRecord(id: Long): Array[Byte] = {
    val n = id % 13 + 1
    encode(CMap(Vector(
      CText("id") -> CInt(id),
      CText("n") -> CInt(n),
      CText("tags") -> CArr((0L until (id % 4 + 1)).toVector
        .map(i => CText(s"t${(id + i) % 7}"))),
      CText("name") -> CText(s"rec-$id"),
      CText("ok") -> CBool(id % 2 == 0))))
  }

  /** Field extraction helpers over a decoded top-level map. */
  def mapGet(v: Value, key: String): Value = v match {
    case CMap(kv) => kv.collectFirst { case (CText(k), x) if k == key => x }
      .orNull
    case _ => null
  }
}
