package graft.multimodal

import graft.SparkSpec

/** BMP pixel and WAV PCM decode coverage.
  *
  * The golden vectors were produced by an INDEPENDENT reference
  * implementation (CPython `struct` building the documented layouts
  * byte by byte) — not by our encoders — so a bug mirrored into both
  * encode and decode cannot cancel out. They cover: 24-bit bottom-up
  * BMP with row padding, 32-bit TOP-DOWN BMP with alpha, 16-bit PCM
  * WAV at full amplitude range, and 8-bit stereo PCM with a LIST
  * chunk between fmt and data.
  */
class BmpWavCodecSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 3x2 24-bit bottom-up, stride 9 -> padded 12
  private val bmp24 = hex(
    "424d4e0000000000000036000000280000000300000002000000010018000000" +
      "000018000000130b0000130b000000000000000000001e140a3c32285a504600" +
      "00000000ff00ff00ff0000000000")
  // 2x2 32-bit top-down (negative height), alpha carried
  private val bmp32 = hex(
    "424d4600000000000000360000002800000002000000feffffff010020000000" +
      "0000100000000000000000000000000000000000000003020104070605080b0a" +
      "090c0f0e0d10")
  // 16-bit mono 8000 Hz: samples [0, 1000, -1000, 32767, -32768]
  private val wav16 = hex(
    "524946462e00000057415645666d7420100000000100010040" +
      "1f0000803e000002001000646174610a0000000000e80318fcff7f0080")
  // 8-bit stereo 44100 Hz with a LIST chunk before data: [0,128,255,64]
  private val wav8 = hex(
    "524946463400000057415645666d7420100000000100020044ac000088580100" +
      "020008004c49535404000000494e464f64617461040000000080ff40")

  test("BMP golden: 24-bit bottom-up with stride padding decodes to RGBA") {
    val img = BmpCodec.decode(bmp24)
    assert(img != null && img.width === 3 && img.height === 2)
    val px = img.rgba.map(_ & 0xFF).grouped(4).map(_.toSeq).toSeq
    assert(px === Seq(
      Seq(255, 0, 0, 255), Seq(0, 255, 0, 255), Seq(0, 0, 255, 255),
      Seq(10, 20, 30, 255), Seq(40, 50, 60, 255), Seq(70, 80, 90, 255)))
  }

  test("BMP golden: 32-bit top-down preserves alpha and row order") {
    val img = BmpCodec.decode(bmp32)
    assert(img != null && img.width === 2 && img.height === 2)
    val px = img.rgba.map(_ & 0xFF).grouped(4).map(_.toSeq).toSeq
    assert(px === Seq(Seq(1, 2, 3, 4), Seq(5, 6, 7, 8),
      Seq(9, 10, 11, 12), Seq(13, 14, 15, 16)))
  }

  test("BMP round trip: encode(decode-source) -> decode is identity on pixels") {
    val rgba = (0 until 5 * 3 * 4).map { i =>
      (if (i % 4 == 3) 0xFF else (i * 37) % 256).toByte
    }.toArray
    val img = BmpCodec.decode(BmpCodec.encode(5, 3, rgba))
    assert(img != null && img.width === 5 && img.height === 3)
    assert(img.rgba.toSeq === rgba.toSeq)
  }

  test("BMP rejects garbage, truncation, and unsupported compression") {
    assert(BmpCodec.decode(null) === null)
    assert(BmpCodec.decode(Array[Byte](1, 2, 3)) === null)
    assert(BmpCodec.decode("not a bitmap at all, just text!!!!!!!!!!!!!!!!!!!!!!!"
      .getBytes("US-ASCII")) === null)
    val truncated = bmp24.take(bmp24.length - 4)
    assert(BmpCodec.decode(truncated) === null)
    val rle = bmp24.clone(); rle(30) = 1 // compression = BI_RLE8
    assert(BmpCodec.decode(rle) === null)
  }

  test("WAV golden: 16-bit PCM full-range samples decode exactly") {
    val w = WavCodec.decode(wav16)
    assert(w != null && w.sampleRate === 8000 && w.channels === 1 &&
      w.bitsPerSample === 16)
    assert(w.samples.toSeq === Seq(0, 1000, -1000, 32767, -32768))
    val (n, peak, sumAbs, energy, crossings) = WavCodec.pcmStats(w)
    assert(n === 5L && peak === 32768L)
    assert(sumAbs === 0L + 1000 + 1000 + 32767 + 32768)
    assert(energy === (1000L * 1000 + 1000L * 1000 + 32767L * 32767 +
      32768L * 32768) / 5)
    // crossings under (prev<0) != (s<0): 0>=,1000>=,-1000<,32767>=,-32768<
    assert(crossings === 3L)
  }

  test("WAV golden: 8-bit stereo with a LIST chunk between fmt and data") {
    val w = WavCodec.decode(wav8)
    assert(w != null && w.sampleRate === 44100 && w.channels === 2 &&
      w.bitsPerSample === 8)
    assert(w.samples.toSeq === Seq(-128, 0, 127, -64))
  }

  test("WAV round trip + testWav matches the closed form") {
    val samples = Array(5, -7, 0, 32767, -32768, 123)
    val back = WavCodec.decode(WavCodec.encode(22050, samples))
    assert(back != null && back.samples.toSeq === samples.toSeq)
    val tw = WavCodec.decode(WavCodec.testWav(id = 42L, nSamples = 80,
      sampleRate = 9000))
    assert(tw != null && tw.sampleRate === 9000 && tw.samples.length === 80)
    (0 until 80).foreach { i =>
      assert(tw.samples(i) === (((42L * 31 + 17L * i) % 65536) - 32768).toInt)
    }
  }

  test("frameHash: gradient bits from hand-built energies; short input is None") {
    // frameLen 1: energy per frame = |sample|; strictly descending
    // amplitudes set every gradient bit
    val desc = WavCodec.Wav(8000, 1, 16, (65 to 1 by -1).toArray)
    assert(WavCodec.frameHash(desc, frameLen = 1) ===
      Some((0xFFFFFFFFL, 0xFFFFFFFFL)))
    val asc = WavCodec.Wav(8000, 1, 16, (1 to 65).toArray)
    assert(WavCodec.frameHash(asc, frameLen = 1) === Some((0L, 0L)))
    // negative amplitudes count by magnitude
    val descNeg = WavCodec.Wav(8000, 1, 16, (65 to 1 by -1).map(-_).toArray)
    assert(WavCodec.frameHash(descNeg, frameLen = 1) ===
      Some((0xFFFFFFFFL, 0xFFFFFFFFL)))
    assert(WavCodec.frameHash(WavCodec.Wav(8000, 1, 16, new Array[Int](64)),
      frameLen = 1) === None, "64 frames is one short of 65")
    // frameLen 2 sums pairs: [3,0, 1,1, ...] -> e0=3 > e1=2
    val paired = WavCodec.Wav(8000, 1, 16,
      Array.tabulate(130)(i => if (i < 2) 3 - i * 3 else 1))
    val Some((lo, _)) = WavCodec.frameHash(paired, frameLen = 2)
    assert((lo & 1L) === 1L, "frame 0 energy 3 beats frame 1 energy 2")
  }

  test("tone detection: square-wave fundamentals land on bins 16/8/4/2, dominant") {
    import org.apache.spark.sql.functions._
    val synth = udf((id: Long) => WavCodec.testTone(id, 80, 8000))
    import spark.implicits._
    val media = (0L to 7L).toDF("doc_id")
      .select(col("doc_id"), synth(col("doc_id")).as("wav"))
    val out = Multimodal.wavToneDetect(media, "doc_id", "wav")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // period 4*2^(id%4) samples -> 64-point fundamental 64/P
    val expectedBin = Seq(16L, 8L, 4L, 2L)
    out.foreach { case (id, bin, dom) =>
      assert(bin === expectedBin((id % 4).toInt),
        s"doc $id detected bin $bin")
      assert(dom > 500L, s"doc $id fundamental not dominant: $dom")
    }
    // short blob: error row, no padded fake
    val short = Seq((99L, WavCodec.testTone(99L, 32, 8000)))
      .toDF("doc_id", "wav")
    val err = Multimodal.wavToneDetect(short, "doc_id", "wav").collect().head
    assert(err.isNullAt(1) && err.getString(4).contains("fewer than"))
  }

  test("WAV rejects garbage, non-PCM, and truncated data") {
    assert(WavCodec.decode(null) === null)
    assert(WavCodec.decode(Array.fill[Byte](50)(0)) === null)
    val nonPcm = wav16.clone(); nonPcm(20) = 3 // IEEE float format
    assert(WavCodec.decode(nonPcm) === null)
    assert(WavCodec.decode(wav16.take(wav16.length - 2)) === null)
  }

  test("Spark stages: bmpPixelStats and wavPcmStats decode real blobs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val synthB = udf((id: Long) => BmpCodec.testImage(id, 5, 4))
    val dfB = spark.range(0, 10).select(col("id"),
      synthB(col("id")).as("bmp"))
    val outB = Multimodal.bmpPixelStats(dfB, "id", "bmp")
      .orderBy("id").collect()
    assert(outB.length === 10)
    outB.foreach { r =>
      assert(r.getInt(1) === 5 && r.getInt(2) === 4 && r.isNullAt(7))
      // alpha is constant 255 -> mean_a_x100 == 25500 exactly
      assert(r.getLong(6) === 25500L)
    }
    // cross-codec: BMP means equal PNG means for the same pattern
    val synthP = udf((id: Long) => PngCodec.testImage(id, 5, 4))
    val outP = Multimodal.pngPixelStats(
        spark.range(0, 10).select(col("id"), synthP(col("id")).as("png")),
        "id", "png")
      .orderBy("id").collect()
    assert(outB.map(r => (r.getLong(3), r.getLong(4), r.getLong(5))).toSeq ===
      outP.map(r => (r.getLong(3), r.getLong(4), r.getLong(5))).toSeq)

    val synthW = udf((id: Long) => WavCodec.testWav(id, 60, 8000))
    val outW = Multimodal.wavPcmStats(
        spark.range(0, 10).select(col("id"), synthW(col("id")).as("wav")),
        "id", "wav")
      .orderBy("id").collect()
    assert(outW.length === 10)
    outW.foreach { r =>
      assert(r.getLong(2) === 60L && r.isNullAt(7))
      assert(r.getLong(3) <= 32768L && r.getLong(3) > 0L)
    }
  }
}
