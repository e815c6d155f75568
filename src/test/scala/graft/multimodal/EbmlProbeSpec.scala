package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class EbmlProbeSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/mp4/$name")
    try in.readAllBytes() finally in.close()
  }

  test("golden WebM fixture (independent CPython encoder): full walk" +
    " incl. non-default scale and float32 duration") {
    val m = EbmlProbe.probe(fixture("golden_webm.webm"))
    assert(m != null)
    assert(m.docType === "webm")
    assert(m.timestampScaleNs === 90000L)
    // 40000.0 float32 ticks × 90000 ns = 3600 ms exactly
    assert(m.durationMs === 3600L)
    assert(m.tracks.size === 2)
    val v = m.tracks.head
    assert((v.number, v.trackType, v.codec, v.width, v.height) ===
      ((1L, "video", "V_VP9", 1280L, 720L)))
    val a = m.tracks(1)
    assert((a.number, a.trackType, a.codec, a.width, a.height) ===
      ((2L, "audio", "A_OPUS", 0L, 0L)))
  }

  test("testAsset closed form: every field round-trips") {
    for (id <- 0L until 48L) {
      val m = EbmlProbe.probe(EbmlProbe.testAsset(id))
      assert(m != null, s"id=$id")
      assert(m.docType === (if (id % 2 == 0) "webm" else "matroska"))
      assert(m.timestampScaleNs === 1000000L)
      assert(m.durationMs === (id % 997 + 1) * 250)
      assert(m.tracks.size === (1 + id % 3).toInt)
      val v = m.tracks.head
      assert(v.trackType === "video")
      assert(v.codec === Seq("V_VP8", "V_VP9", "V_AV1")((id % 3).toInt))
      assert(v.width === 320L + 16 * (id % 40))
      assert(v.height === 240L + 16 * (id % 30))
      if (m.tracks.size > 1) {
        assert(m.tracks(1).trackType === "audio")
        assert(m.tracks(1).codec === Seq("A_OPUS", "A_VORBIS")((id % 2).toInt))
      }
      if (m.tracks.size > 2) {
        assert(m.tracks(2).trackType === "subtitle")
        assert(m.tracks(2).codec === "S_TEXT/UTF8")
      }
    }
  }

  test("subset policy: garbage returns null, never throws") {
    assert(EbmlProbe.probe(null) === null)
    assert(EbmlProbe.probe(Array.emptyByteArray) === null)
    assert(EbmlProbe.probe("plain text, not ebml".getBytes) === null)
    val good = EbmlProbe.testAsset(5L)
    // truncated mid-element
    assert(EbmlProbe.probe(good.take(good.length - 3)) === null)
    // zero first byte = invalid vint
    val bad = good.clone(); bad(0) = 0
    assert(EbmlProbe.probe(bad) === null)
    // an ISO-BMFF stream is not EBML: its size-prefixed layout reads
    // as an invalid vint (leading zero byte) immediately
    val mp4NotEbml = Mp4Probe.testAsset(5L)
    assert(EbmlProbe.probe(mp4NotEbml) === null)
  }
}
