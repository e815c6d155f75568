package graft.formats

import org.scalatest.funsuite.AnyFunSuite
import CborCodec._

/** CBOR coverage against RFC 8949 Appendix A's PUBLISHED test vectors
  * — an independent ground truth the codec cannot have been fitted to
  * (the same golden-vector discipline as the PNG/GIF suites). The
  * appendix vectors are preferred (shortest-form) serializations, so
  * decode→encode must reproduce the exact input bytes.
  */
class CborCodecSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // (hex, expected value) — RFC 8949 Appendix A rows in the subset
  private val vectors: Seq[(String, Value)] = Seq(
    "00" -> CInt(0), "01" -> CInt(1), "0a" -> CInt(10), "17" -> CInt(23),
    "1818" -> CInt(24), "1819" -> CInt(25), "1864" -> CInt(100),
    "1903e8" -> CInt(1000), "1a000f4240" -> CInt(1000000),
    "1b000000e8d4a51000" -> CInt(1000000000000L),
    "20" -> CInt(-1), "29" -> CInt(-10), "3863" -> CInt(-100),
    "3903e7" -> CInt(-1000),
    "4401020304" -> CBytes(Array[Byte](1, 2, 3, 4)),
    "60" -> CText(""), "6161" -> CText("a"), "6449455446" -> CText("IETF"),
    "62225c" -> CText("\"\\"),
    "62c3bc" -> CText("ü"),
    "80" -> CArr(Vector.empty),
    "83010203" -> CArr(Vector(CInt(1), CInt(2), CInt(3))),
    "8301820203820405" -> CArr(Vector(CInt(1),
      CArr(Vector(CInt(2), CInt(3))), CArr(Vector(CInt(4), CInt(5))))),
    "98190102030405060708090a0b0c0d0e0f101112131415161718181819" ->
      CArr((1 to 25).toVector.map(i => CInt(i))),
    "a0" -> CMap(Vector.empty),
    "a201020304" -> CMap(Vector(CInt(1) -> CInt(2), CInt(3) -> CInt(4))),
    "a26161016162820203" -> CMap(Vector(CText("a") -> CInt(1),
      CText("b") -> CArr(Vector(CInt(2), CInt(3))))),
    "826161a161626163" -> CArr(Vector(CText("a"),
      CMap(Vector(CText("b") -> CText("c"))))),
    "f4" -> CBool(false), "f5" -> CBool(true), "f6" -> CNull,
    "fb3ff199999999999a" -> CFloat(1.1),
    "fb7e37e43c8800759c" -> CFloat(1.0e300),
    "fbc010666666666666" -> CFloat(-4.1))

  test("RFC 8949 Appendix A vectors decode to the published values") {
    for ((h, want) <- vectors) {
      val got = decode(hex(h))
      (got, want) match {
        case (CBytes(a), CBytes(b)) =>
          assert(a.toSeq === b.toSeq, s"vector $h")
        case _ => assert(got === want, s"vector $h")
      }
    }
  }

  test("appendix vectors are preferred serializations: decode∘encode is identity") {
    for ((h, _) <- vectors) {
      assert(encode(decode(hex(h))).map(b => f"${b & 0xFF}%02x").mkString
        === h, s"round trip $h")
    }
  }

  test("out-of-subset and malformed inputs return null, never throw") {
    // indefinite-length byte string, tag 1 epoch, float16 +Inf,
    // truncated int, trailing garbage, empty, null
    for (h <- Seq("5f42010243030405ff", "c11a514b67b0", "f97c00", "1b0000",
                  "0001", "f7", "fc"))
      assert(decode(hex(h)) === null, s"must reject $h")
    assert(decode(Array.empty[Byte]) === null)
    assert(decode(null) === null)
  }

  test("JSON rendering is deterministic and preserves encoded map order") {
    assert(toJson(decode(hex("a26161016162820203"))) === """{"a":1,"b":[2,3]}""")
    // REVERSED key order renders reversed — the wire's order, not sorted
    val rev = encode(CMap(Vector(CText("b") -> CInt(2), CText("a") -> CInt(1))))
    assert(toJson(decode(rev)) === """{"b":2,"a":1}""")
    assert(toJson(decode(hex("4401020304"))) === "\"h'01020304'\"")
    assert(toJson(decode(hex("62225c"))) === "\"\\\"\\\\\"")
    assert(toJson(decode(hex("fb3ff199999999999a"))) === "1.1")
  }

  test("testRecord fixture decodes to its closed form (the q192 contract)") {
    val v = decode(testRecord(9L))
    assert(mapGet(v, "id") === CInt(9))
    assert(mapGet(v, "n") === CInt(10))      // 9 % 13 + 1
    assert(mapGet(v, "ok") === CBool(false)) // odd
    assert(mapGet(v, "tags") === CArr(Vector(CText("t2"), CText("t3"))))
    assert(mapGet(v, "name") === CText("rec-9"))
    assert(toJson(v) ===
      """{"id":9,"n":10,"tags":["t2","t3"],"name":"rec-9","ok":false}""")
    assert(mapGet(v, "missing") === null)
    assert(mapGet(CInt(1), "x") === null)
  }
}
