package graft.multimodal

import graft.SparkSpec

/** GIF LZW decode coverage. The dictionary-stream golden was produced
  * by an INDEPENDENT CPython LZW encoder (real dictionary build, not
  * our uncompressed-trick encoder) and round-trip-validated against a
  * Python re-statement of the decode rules before being frozen here —
  * it exercises dictionary-entry codes, which our own encoder never
  * emits. The 1×1 transparent GIF is the canonical public example of
  * the GCE transparency path.
  */
class GifCodecSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 6x5, 4-color palette, REAL LZW stream with dictionary entries
  private val gifLzw = hex(
    "4749463839610600050081000000ff003cc325788794b44b4d2c000000000600" +
      "050000020a44347679681e8c8cb400003b")
  private val lzwIndices = Seq(
    0, 1, 2, 3, 0, 1, 1, 2, 3, 0, 1, 2, 2, 3, 0, 1, 2, 3,
    0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1)
  private val palette = Seq(
    Seq(0, 255, 0), Seq(60, 195, 37), Seq(120, 135, 148), Seq(180, 75, 77))

  // canonical 1x1 white pixel with GCE transparent index 0
  private val gif1x1 = hex(
    "47494638396101000100800000ffffff00000021f904010000" +
      "00002c00000000010001000002024401003b")

  test("GIF golden: real dictionary LZW stream decodes to exact pixels") {
    val img = GifCodec.decode(gifLzw)
    assert(img != null && img.width === 6 && img.height === 5)
    val px = img.rgba.map(_ & 0xFF).grouped(4).map(_.toSeq).toSeq
    assert(px === lzwIndices.map(i => palette(i) :+ 255))
  }

  test("GIF golden: canonical 1x1 transparent-white GCE example") {
    val img = GifCodec.decode(gif1x1)
    assert(img != null && img.width === 1 && img.height === 1)
    assert(img.rgba.map(_ & 0xFF).toSeq === Seq(255, 255, 255, 0),
      "white pixel, alpha 0 via the transparent index")
  }

  test("testImage round trip matches the closed-form index and palette") {
    val id = 37L; val w = 9; val h = 7
    val img = GifCodec.decode(GifCodec.testImage(id, w, h))
    assert(img != null && img.width === w && img.height === h)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val i = (id * 7 + 3 * x + 5 * y) % 256
        val p = (y * w + x) * 4
        assert((img.rgba(p) & 0xFF) === i.toInt)
        assert((img.rgba(p + 1) & 0xFF) === ((i * 11 + 3) % 256).toInt)
        assert((img.rgba(p + 2) & 0xFF) === ((i * 31 + 7) % 256).toInt)
        assert((img.rgba(p + 3) & 0xFF) === 255)
      }
    }
  }

  test("a large testImage crosses the periodic-CLEAR boundary intact") {
    // 30x20 = 600 pixels > the encoder's 250-literal CLEAR period
    val img = GifCodec.decode(GifCodec.testImage(5L, 30, 20))
    assert(img != null && img.width === 30 && img.height === 20)
    val i0 = (5L * 7 + 3 * 29 + 5 * 19) % 256 // last pixel
    val p = (19 * 30 + 29) * 4
    assert((img.rgba(p) & 0xFF) === i0.toInt)
  }

  test("GIF rejects garbage, interlace, truncation, and bad signatures") {
    assert(GifCodec.decode(null) === null)
    assert(GifCodec.decode("GIF89a but then nonsense follows here..."
      .getBytes("US-ASCII")) === null)
    assert(GifCodec.decode(hex("474946383761")) === null)
    val interlaced = gifLzw.clone()
    interlaced(30) = (interlaced(30) | 0x40).toByte // image-descriptor packed
    assert(GifCodec.decode(interlaced) === null)
    assert(GifCodec.decode(gifLzw.take(gifLzw.length - 6)) === null)
  }

  test("Spark stage: gifPixelStats decodes real LZW blobs, errors are total") {
    import org.apache.spark.sql.functions._
    val synth = udf((id: Long) => GifCodec.testImage(id, 6, 5))
    val good = Multimodal.gifPixelStats(
        spark.range(0, 8).select(col("id"), synth(col("id")).as("gif")),
        "id", "gif")
      .orderBy("id").collect()
    assert(good.length === 8)
    good.foreach { r =>
      assert(r.getInt(1) === 6 && r.getInt(2) === 5 && r.isNullAt(7))
      assert(r.getLong(6) === 25500L)
    }
    val bad = Multimodal.gifPixelStats(
        spark.range(0, 3).select(col("id"), lit("junk".getBytes).as("gif")),
        "id", "gif")
      .collect()
    assert(bad.forall(r => r.isNullAt(1) && !r.isNullAt(7)))
  }
}
