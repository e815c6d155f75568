package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class AudioProbesSpec extends AnyFunSuite {

  private def fixture(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    try in.readAllBytes() finally in.close()
  }

  test("golden FLAC fixture (independent CPython encoder): full walk") {
    // fLaC + STREAMINFO + VORBIS_COMMENT + PADDING(last), struct-packed
    // by an independent encoder from the public FLAC spec layout
    val m = AudioProbes.probeFlac(fixture("/flac/golden_stereo16.flac"))
    assert(m != null)
    assert(m.minBlockSize === 4096L)
    assert(m.maxBlockSize === 4096L)
    assert(m.sampleRate === 44100L)
    assert(m.channels === 2L)
    assert(m.bitsPerSample === 16L)
    assert(m.totalSamples === 441000L)
    assert(m.nMetadataBlocks === 3L)
    assert(m.durationMs === 10000L)
  }

  test("golden MP3 v2.3 fixture: big-endian frame sizes, MPEG-1 table") {
    val m = AudioProbes.probeMp3(fixture("/mp3/golden_v23_128k.mp3"))
    assert(m != null)
    assert(m.id3Version === "2.3.0")
    assert(m.tagSize === 49L)
    assert(m.nId3Frames === 2L)
    assert(m.mpegVersion === 1L)
    assert(m.layer === 3L)
    assert(m.bitrateKbps === 128L)
    assert(m.sampleRate === 44100L)
    assert(m.channelMode === "joint_stereo")
    assert(m.audioBytes === 4004L)
    assert(m.durationMs === 250L) // 4004·8/128, truncated
  }

  test("golden MP3 v2.4 fixture: syncsafe frame sizes, MPEG-2 table") {
    val m = AudioProbes.probeMp3(fixture("/mp3/golden_v24_mpeg2.mp3"))
    assert(m != null)
    assert(m.id3Version === "2.4.0")
    assert(m.tagSize === 20L)
    assert(m.nId3Frames === 1L)
    assert(m.mpegVersion === 2L)
    assert(m.bitrateKbps === 40L)
    assert(m.sampleRate === 24000L)
    assert(m.channelMode === "mono")
    assert(m.audioBytes === 1004L)
    assert(m.durationMs === 200L)
  }

  test("flacTestAsset closed form: every field round-trips") {
    for (id <- 0L until 48L) {
      val m = AudioProbes.probeFlac(AudioProbes.flacTestAsset(id))
      assert(m != null, s"id=$id")
      assert(m.minBlockSize === 4096L)
      assert(m.maxBlockSize === 4096L)
      assert(m.sampleRate === Seq(8000L, 16000L, 22050L, 24000L,
        32000L, 44100L, 48000L, 96000L)((id % 8).toInt), s"id=$id")
      assert(m.channels === 1 + id % 4, s"id=$id")
      assert(m.bitsPerSample === Seq(8L, 16L, 24L)((id % 3).toInt))
      assert(m.totalSamples === (id % 997 + 1) * 1000)
      val expBlocks = 1 + (if (id % 3 == 0) 1 else 0) +
        (if (id % 5 == 0) 1 else 0)
      assert(m.nMetadataBlocks === expBlocks.toLong, s"id=$id")
      assert(m.durationMs === 1000L * m.totalSamples / m.sampleRate)
    }
  }

  test("mp3TestAsset closed form: every field round-trips for both" +
    " tag versions and both MPEG tables") {
    val v1Br = Seq(0L, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    val v2Br = Seq(0L, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
      128, 144, 160)
    for (id <- 0L until 72L) {
      val m = AudioProbes.probeMp3(AudioProbes.mp3TestAsset(id))
      assert(m != null, s"id=$id")
      assert(m.id3Version === (if (id % 2 == 0) "2.4.0" else "2.3.0"))
      assert(m.nId3Frames === 1 + id % 4, s"id=$id")
      assert(m.tagSize === (1 + id % 4) * (12 + id % 7) + 6, s"id=$id")
      val v1 = id % 3 != 0
      assert(m.mpegVersion === (if (v1) 1L else 2L))
      val brIdx = (1 + id % 14).toInt
      assert(m.bitrateKbps === (if (v1) v1Br(brIdx) else v2Br(brIdx)),
        s"id=$id")
      val srIdx = ((id % 9) / 3).toInt
      assert(m.sampleRate === (if (v1) Seq(44100L, 48000L, 32000L)(srIdx)
        else Seq(22050L, 24000L, 16000L)(srIdx)), s"id=$id")
      assert(m.channelMode === Seq("stereo", "joint_stereo",
        "dual_channel", "mono")((id % 4).toInt))
      assert(m.audioBytes === 4 + (id % 997 + 1) * 100)
      assert(m.durationMs === m.audioBytes * 8 / m.bitrateKbps)
    }
  }

  test("golden Ogg Vorbis fixture (independent CPython encoder):" +
    " page walk + id header") {
    val m = AudioProbes.probeOgg(fixture("/ogg/golden_vorbis.ogg"))
    assert(m != null)
    assert(m.codec === "vorbis")
    assert(m.serial === 123456L)
    assert(m.channels === 2L)
    assert(m.sampleRate === 44100L)
    assert(m.preSkip === 0L)
    assert(m.nPages === 3L)
    assert(m.lastGranule === 88200L)
    assert(m.durationMs === 2000L)
  }

  test("golden Ogg Opus fixture: OpusHead + 48 kHz granule clock") {
    val m = AudioProbes.probeOgg(fixture("/ogg/golden_opus.ogg"))
    assert(m != null)
    assert(m.codec === "opus")
    assert(m.serial === 777L)
    assert(m.channels === 1L)
    assert(m.preSkip === 312L)
    assert(m.nPages === 2L)
    assert(m.lastGranule === 312L + 96000L)
    assert(m.durationMs === 2000L) // (granule - preskip)/48k
  }

  test("oggTestAsset closed form: every field round-trips for both" +
    " codecs") {
    for (id <- 0L until 48L) {
      val m = AudioProbes.probeOgg(AudioProbes.oggTestAsset(id))
      assert(m != null, s"id=$id")
      val vorbis = id % 2 == 0
      assert(m.codec === (if (vorbis) "vorbis" else "opus"))
      assert(m.serial === 7000 + id % 89)
      assert(m.channels === 1 + id % 3)
      assert(m.sampleRate === (if (vorbis)
        Seq(8000L, 16000L, 44100L, 48000L)(((id % 8) / 2).toInt)
        else 48000L), s"id=$id")
      assert(m.preSkip === (if (vorbis) 0L else 312L))
      assert(m.nPages === 2 + id % 3)
      val samples = (id % 997 + 1) * 960
      assert(m.lastGranule ===
        (if (vorbis) samples else 312L + samples))
      assert(m.durationMs === (if (vorbis) 1000L * samples / m.sampleRate
        else samples / 48), s"id=$id")
    }
  }

  test("subset policy: corpus garbage returns null, never throws") {
    assert(AudioProbes.probeFlac(null) === null)
    assert(AudioProbes.probeFlac(Array.emptyByteArray) === null)
    assert(AudioProbes.probeFlac("just text, not flac".getBytes) === null)
    val goodF = AudioProbes.flacTestAsset(7L)
    // truncated mid-block: the last block's body overruns
    assert(AudioProbes.probeFlac(goodF.take(goodF.length - 5)) === null)
    // block chain with no STREAMINFO: strip the first block
    val noSi = "fLaC".getBytes ++ Array[Byte](0x81.toByte, 0, 0, 2, 0, 0)
    assert(AudioProbes.probeFlac(noSi) === null)

    assert(AudioProbes.probeMp3(null) === null)
    assert(AudioProbes.probeMp3("ID2 not a tag".getBytes) === null)
    val goodM = AudioProbes.mp3TestAsset(7L)
    // truncate before the MPEG header
    assert(AudioProbes.probeMp3(goodM.take(12)) === null)
    // corrupt the sync word
    val badSync = goodM.clone()
    badSync(badSync.length - 100) = 0 // deep in filler, harmless
    val hdrOff = goodM.length - ((7 % 997 + 1) * 100).toInt - 4
    val badHdr = goodM.clone(); badHdr(hdrOff) = 0x12
    assert(AudioProbes.probeMp3(badHdr) === null)
    // reserved bitrate index 15
    val badBr = goodM.clone()
    badBr(hdrOff + 2) = 0xF0.toByte
    assert(AudioProbes.probeMp3(badBr) === null)
  }
}
