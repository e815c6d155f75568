package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class Mp4ProbeSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/mp4/$name")
    try in.readAllBytes() finally in.close()
  }

  test("golden v0 fixture (independent CPython encoder): full walk") {
    // ftyp + free + moov(mvhd v0 + video trak + audio trak) + mdat,
    // built by an independent struct-packed encoder from the public
    // ISO 14496-12 layout
    val m = Mp4Probe.probe(fixture("golden_v0.mp4"))
    assert(m != null)
    assert(m.majorBrand === "isom")
    assert(m.minorVersion === 512L)
    assert(m.timescale === 600L)
    assert(m.durationUnits === 3600L)
    assert(m.durationMs === 6000L)
    assert(m.tracks.size === 2)
    val v = m.tracks.head
    assert((v.trackId, v.handler, v.codec, v.width, v.height,
      v.durationUnits) === ((1L, "vide", "avc1", 640L, 360L, 3600L)))
    val a = m.tracks(1)
    assert((a.trackId, a.handler, a.codec, a.width, a.height) ===
      ((2L, "soun", "mp4a", 0L, 0L)))
  }

  test("golden v1 fixture: 64-bit largesize moov + version-1 boxes") {
    val m = Mp4Probe.probe(fixture("golden_v1_largesize.mp4"))
    assert(m != null)
    assert(m.majorBrand === "mp42")
    assert(m.timescale === 90000L)
    assert(m.durationUnits === 270000L)
    assert(m.durationMs === 3000L)
    val t = m.tracks.head
    assert((t.handler, t.codec, t.width, t.height) ===
      (("vide", "hev1", 1920L, 1080L)))
  }

  test("testAsset closed form: every field round-trips for both" +
    " layout versions") {
    for (id <- 0L until 48L) {
      val m = Mp4Probe.probe(Mp4Probe.testAsset(id))
      assert(m != null, s"id=$id")
      assert(m.majorBrand ===
        (if (id % 2 == 0) "isom" else "mp42"), s"id=$id")
      assert(m.minorVersion === id % 100)
      assert(m.timescale === 1000L + (id % 9) * 600)
      assert(m.durationUnits === (id % 997 + 1) * 100)
      assert(m.tracks.size === (1 + id % 3).toInt)
      val v = m.tracks.head
      assert(v.handler === "vide")
      assert(v.width === 320L + 16 * (id % 40))
      assert(v.height === 240L + 16 * (id % 30))
      assert(v.codec === Seq("avc1", "hev1", "vp09", "av01")((id % 4).toInt))
      if (m.tracks.size > 1) {
        assert(m.tracks(1).handler === "soun")
        assert(m.tracks(1).codec ===
          Seq("mp4a", "opus")((id % 2).toInt))
        assert(m.tracks(1).width === 0L)
      }
      if (m.tracks.size > 2) {
        assert(m.tracks(2).handler === "text")
        assert(m.tracks(2).codec === "tx3g")
      }
    }
  }

  test("subset policy: corpus garbage returns null, never throws") {
    assert(Mp4Probe.probe(null) === null)
    assert(Mp4Probe.probe(Array.emptyByteArray) === null)
    assert(Mp4Probe.probe("not an mp4 at all, just text".getBytes) === null)
    // truncated mid-box: valid ftyp then a box whose size overruns
    val good = Mp4Probe.testAsset(7L)
    assert(Mp4Probe.probe(good.take(good.length - 5)) === null)
    // declared size smaller than a header
    val bad = good.clone()
    bad(0) = 0; bad(1) = 0; bad(2) = 0; bad(3) = 3
    assert(Mp4Probe.probe(bad) === null)
    // a stream with ftyp but no moov/mvhd
    val ftypOnly = good.take(
      java.nio.ByteBuffer.wrap(good, 0, 4).getInt)
    assert(Mp4Probe.probe(ftypOnly) === null)
  }
}
