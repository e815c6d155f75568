package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class ContainerProbesSpec extends AnyFunSuite {

  private def fixture(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    try in.readAllBytes() finally in.close()
  }

  test("golden LE TIFF fixture (independent CPython encoder): RGB," +
    " offset BitsPerSample array, thumbnail IFD") {
    val m = ContainerProbes.probeTiff(fixture("/tiff/golden_le_rgb.tiff"))
    assert(m != null)
    assert(m.byteOrder === "II")
    assert(m.width === 640L)
    assert(m.height === 480L)
    assert(m.bitsPerSample === 8L)
    assert(m.compression === 5L)
    assert(m.photometric === 2L)
    assert(m.samplesPerPixel === 3L)
    assert(m.orientation === 1L)
    assert(m.nEntries === 7L)
    assert(m.nIfds === 2L)
  }

  test("golden BE TIFF fixture: MM byte order, 16-bit gray, single IFD") {
    val m = ContainerProbes.probeTiff(fixture("/tiff/golden_be_gray16.tiff"))
    assert(m != null)
    assert(m.byteOrder === "MM")
    assert(m.width === 1024L)
    assert(m.height === 768L)
    assert(m.bitsPerSample === 16L)
    assert(m.compression === 1L)
    assert(m.samplesPerPixel === 1L)
    assert(m.orientation === 6L)
    assert(m.nIfds === 1L)
  }

  test("tiffTestAsset closed form: every field round-trips under both" +
    " byte orders") {
    for (id <- 0L until 48L) {
      val m = ContainerProbes.probeTiff(ContainerProbes.tiffTestAsset(id))
      assert(m != null, s"id=$id")
      assert(m.byteOrder === (if (id % 2 == 0) "II" else "MM"))
      assert(m.width === 100 + id % 400)
      assert(m.height === 80 + id % 300)
      val arm = (id % 3).toInt
      assert(m.bitsPerSample === Seq(8L, 16L, 8L)(arm), s"id=$id")
      assert(m.samplesPerPixel === Seq(1L, 1L, 3L)(arm))
      assert(m.photometric === Seq(1L, 1L, 2L)(arm))
      assert(m.compression === Seq(1L, 5L, 7L)(arm))
      assert(m.orientation === 1 + id % 8)
      assert(m.nEntries === 7L)
      assert(m.nIfds === (if (id % 4 == 0) 2L else 1L), s"id=$id")
    }
  }

  test("golden AVI fixture (independent CPython encoder): avih + two" +
    " strl streams") {
    val m = ContainerProbes.probeAvi(fixture("/avi/golden_h264.avi"))
    assert(m != null)
    assert(m.usPerFrame === 33333L)
    assert(m.totalFrames === 900L)
    assert(m.width === 1280L)
    assert(m.height === 720L)
    assert(m.nStreams === 2L)
    assert(m.videoCodec === "H264")
    assert(m.hasAudio === true)
    assert(m.fpsMilli === 30000L) // 1e9 / 33333 truncated
    assert(m.durationMs === 29999L) // 33333 * 900 / 1000
  }

  test("aviTestAsset closed form: every field round-trips") {
    for (id <- 0L until 48L) {
      val m = ContainerProbes.probeAvi(ContainerProbes.aviTestAsset(id))
      assert(m != null, s"id=$id")
      assert(m.usPerFrame ===
        Seq(41666L, 40000L, 33333L, 16666L)((id % 4).toInt))
      assert(m.totalFrames === (id % 997 + 1) * 10)
      assert(m.width === 320 + 16 * (id % 40))
      assert(m.height === 240 + 16 * (id % 30))
      assert(m.nStreams === 1 + id % 2)
      assert(m.videoCodec ===
        Seq("MJPG", "XVID", "H264", "FMP4")((id % 4).toInt))
      assert(m.hasAudio === (id % 2 == 1))
      assert(m.durationMs === m.usPerFrame * m.totalFrames / 1000)
      assert(m.fpsMilli === 1000000000L / m.usPerFrame)
    }
  }

  test("sniffFormat + inventoryDurationMs: every family's asset routes" +
    " to its own walker with the probe's duration") {
    for (id <- 0L until 56L) {
      val (bytes, fmt, wantDur) = (id % 7) match {
        case 0 =>
          val b = Mp4Probe.testAsset(id)
          (b, "mp4", Mp4Probe.probe(b).durationMs)
        case 1 =>
          val b = EbmlProbe.testAsset(id)
          (b, "webm", EbmlProbe.probe(b).durationMs)
        case 2 =>
          val b = AudioProbes.flacTestAsset(id)
          (b, "flac", AudioProbes.probeFlac(b).durationMs)
        case 3 =>
          val b = AudioProbes.mp3TestAsset(id)
          (b, "mp3", AudioProbes.probeMp3(b).durationMs)
        case 4 =>
          val b = AudioProbes.oggTestAsset(id)
          (b, "ogg", AudioProbes.probeOgg(b).durationMs)
        case 5 =>
          (ContainerProbes.tiffTestAsset(id), "tiff", -1L)
        case _ =>
          val b = ContainerProbes.aviTestAsset(id)
          (b, "avi", ContainerProbes.probeAvi(b).durationMs)
      }
      assert(ContainerProbes.sniffFormat(bytes) === fmt, s"id=$id")
      assert(ContainerProbes.inventoryDurationMs(bytes) ===
        ((fmt, wantDur)), s"id=$id")
    }
    // unrecognized bytes: (null, -1), never a throw
    assert(ContainerProbes.sniffFormat("plain document text".getBytes)
      === null)
    assert(ContainerProbes.inventoryDurationMs(
      "plain document text, long enough".getBytes) === ((null, -1L)))
    // WAV routes as wav (the RIFF sibling of avi)
    val wav = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++
      "WAVEfmt ".getBytes
    assert(ContainerProbes.sniffFormat(wav) === "wav")
  }

  test("subset policy: corpus garbage returns null, never throws") {
    assert(ContainerProbes.probeTiff(null) === null)
    assert(ContainerProbes.probeTiff(Array.emptyByteArray) === null)
    assert(ContainerProbes.probeTiff("plain text".getBytes) === null)
    val goodT = ContainerProbes.tiffTestAsset(5L)
    // truncated mid-IFD
    assert(ContainerProbes.probeTiff(goodT.take(20)) === null)
    // bad magic number (43)
    val badMagic = goodT.clone(); badMagic(3) = 43
    assert(ContainerProbes.probeTiff(badMagic) === null)
    // IFD offset beyond the buffer
    val badOff = goodT.clone(); badOff(4) = 0x7F
    assert(ContainerProbes.probeTiff(badOff) === null)
    // self-pointing IFD chain must hit the 64-page cycle guard, not loop
    val loop = ContainerProbes.tiffTestAsset(2L) // LE, single IFD
    val nextPtrOff = 8 + 2 + 12 * 7 // next-IFD pointer after 7 entries
    loop(nextPtrOff) = 8 // points back at IFD 1
    loop(nextPtrOff + 1) = 0; loop(nextPtrOff + 2) = 0; loop(nextPtrOff + 3) = 0
    val m = ContainerProbes.probeTiff(loop)
    assert(m != null && m.nIfds === 64L)

    assert(ContainerProbes.probeAvi(null) === null)
    assert(ContainerProbes.probeAvi("RIFFxxxxWAVE".getBytes) === null)
    val goodA = ContainerProbes.aviTestAsset(7L)
    assert(ContainerProbes.probeAvi(goodA.take(goodA.length - 9)) === null)
    // chunk size overruns the buffer
    val badSz = goodA.clone(); badSz(16) = 0x7F.toByte
    assert(ContainerProbes.probeAvi(badSz) === null)
  }
}
