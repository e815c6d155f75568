package graft.formats

import graft.SparkSpec
import graft.formats.Warc.{parseAll, testAsset}

/** Kernel semantics for [[Warc]] — framing, gzip member handling,
  * HTTP splitting, and the malformed-input prefix-greedy policy on
  * hand-written buffers (the fixture path is certified end-to-end by
  * the q358 oracle row).
  */
class WarcSpec extends SparkSpec {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def rec(wtype: String, block: String,
                  uri: String = "http://x/"): String = {
    val n = block.getBytes(utf8).length
    s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: $n\r\n\r\n$block\r\n\r\n"
  }

  test("multi-record plain buffer frames all three types in order") {
    val buf = (rec("request", "GET / HTTP/1.1\r\n\r\n") +
      rec("response",
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello body") +
      rec("metadata", "k: v\r\n")).getBytes(utf8)
    val rs = parseAll(buf)
    assert(rs.map(_.warcType) === Seq("request", "response", "metadata"))
    val r = rs(1)
    assert(r.httpStatus === 200L)
    assert(r.httpContentType === "text/plain")
    assert(r.body === "hello body")
    assert(rs(0).targetUri === "http://x/")
  }

  test("LF-only line endings parse; HTTP LF-LF body split works") {
    val block = "HTTP/1.1 301 Moved\nLocation: /y\n\nmoved"
    val raw = s"WARC/1.0\nWARC-Type: response\n" +
      s"Content-Length: ${block.getBytes(utf8).length}\n\n$block"
    val rs = parseAll(raw.getBytes(utf8))
    assert(rs.size === 1)
    assert(rs.head.httpStatus === 301L)
    assert(rs.head.body === "moved")
  }

  test("truncated Content-Length ends the walk, keeping prior records") {
    val good = rec("metadata", "a: 1\r\n")
    val bad = "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 99999\r\n\r\nshort"
    val rs = parseAll((good + bad).getBytes(utf8))
    assert(rs.size === 1)
    assert(rs.head.warcType === "metadata")
  }

  test("garbage, empty, and corrupt-gzip inputs return empty, never throw") {
    assert(parseAll(null) === Seq.empty)
    assert(parseAll(Array.emptyByteArray) === Seq.empty)
    assert(parseAll("not a warc at all".getBytes(utf8)) === Seq.empty)
    assert(parseAll(Array[Byte](0x1F.toByte, 0x8B.toByte, 0, 0)) === Seq.empty)
  }

  test("non-HTTP response block keeps raw body with status -1") {
    val rs = parseAll(rec("response", "raw bytes no http").getBytes(utf8))
    assert(rs.head.httpStatus === -1L)
    assert(rs.head.body === "raw bytes no http")
  }

  test("fixture: gzip members (odd id) and plain (even id) parse identically") {
    val html = graft.ops.Html.testAsset(7L, "w1 w2 w3 w4 w5 w6")
    Seq(6L, 7L).foreach { id =>
      val rs = parseAll(testAsset(id, html))
      assert(rs.map(_.warcType) ===
        Seq("request", "response", "metadata"), s"id=$id")
      val r = rs(1)
      assert(r.httpStatus === (if (id % 9 == 0) 404L else 200L))
      assert(r.httpContentType === "text/html; charset=utf-8")
      assert(r.body === html, s"id=$id body round-trip")
      assert(r.targetUri === graft.ops.Url.testUrl(id))
    }
  }

  test("fixture 404 arm and gzip of multi-kilobyte pages round-trip") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val html = graft.ops.Html.testAsset(9L, text)
    val rs = parseAll(testAsset(9L, html)) // 9 % 9 == 0 → 404, odd → gzip
    assert(rs(1).httpStatus === 404L)
    assert(rs(1).body === html)
  }
}
