package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PNG pixel-decode coverage.
  *
  * The golden vectors below were produced by an INDEPENDENT reference
  * implementation (CPython's zlib + struct + binascii, the stock PNG
  * recipe) — not by [[PngCodec.encode]] — so a bug mirrored into both
  * our encoder and decoder cannot cancel out. Each covers a different
  * color type and a different scanline filter.
  */
class PngCodecSpec extends SparkSpec {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 3x2 RGB (color type 2), both rows filter 0
  private val rgbFixture = hex(
    "89504e470d0a1a0a0000000d49484452000000030000000208020000001216f14d" +
      "0000001c49444154789c6360646266616563e7e064f8f5fb0f97889c86910d001c" +
      "3103f1f02a48a20000000049454e44ae426082")
  // 2x2 palette (color type 3): PLTE [(255,0,0),(0,255,0),(0,0,255)]
  private val paletteFixture = hex(
    "89504e470d0a1a0a0000000d49484452000000020000000208030000004568fd16" +
      "00000009504c5445ff000000ff000000ff2d4acd8a0000000e49444154789c6360" +
      "606460620000000e0004c6887cf80000000049454e44ae426082")
  // 2x2 grayscale (color type 0), second row filter 2 (Up)
  private val grayFixture = hex(
    "89504e470d0a1a0a0000000d494844520000000200000002080000000057dd52f8" +
      "0000000e49444154789c63e03ac124320700042201851ffa277900000000" +
      "49454e44ae426082")
  // 2x1 gray+alpha (color type 4), filter 1 (Sub)
  private val gaFixture = hex(
    "89504e470d0a1a0a0000000d49484452000000020000000108040000005e2bb701" +
      "0000000d49444154789c634cf9cff51b0005a6026a359bc5c10000000049454e44" +
      "ae426082")

  private def u(b: Array[Byte]): Seq[Int] = b.map(_ & 0xFF).toSeq

  test("golden RGB fixture decodes to the exact pixels") {
    val img = PngCodec.decode(rgbFixture)
    assert(img != null && img.width === 3 && img.height === 2)
    assert(u(img.rgba) === Seq(
      1, 2, 3, 255, 4, 5, 6, 255, 7, 8, 9, 255,
      250, 251, 252, 255, 10, 20, 30, 255, 40, 50, 60, 255))
  }

  test("golden palette fixture expands PLTE indices") {
    val img = PngCodec.decode(paletteFixture)
    assert(img != null && img.width === 2 && img.height === 2)
    assert(u(img.rgba) === Seq(
      255, 0, 0, 255, 0, 255, 0, 255,
      0, 0, 255, 255, 255, 0, 0, 255))
  }

  test("golden grayscale fixture undoes the Up filter") {
    val img = PngCodec.decode(grayFixture)
    assert(img != null && img.width === 2 && img.height === 2)
    assert(u(img.rgba) === Seq(
      10, 10, 10, 255, 200, 200, 200, 255,
      30, 30, 30, 255, 100, 100, 100, 255))
  }

  test("golden gray+alpha fixture undoes the Sub filter and keeps alpha") {
    val img = PngCodec.decode(gaFixture)
    assert(img != null && img.width === 2 && img.height === 1)
    assert(u(img.rgba) === Seq(100, 100, 100, 255, 110, 110, 110, 250))
  }

  test("encode/decode round-trips arbitrary RGBA under every filter type") {
    val w = 17; val h = 11
    val rgba = Array.tabulate(w * h * 4)(i =>
      ((i * 131 + (i / 7) * 17 + 3) % 256).toByte)
    (0 to 4).foreach { f =>
      val bytes = PngCodec.encode(w, h, rgba, _ => f)
      val back = PngCodec.decode(bytes)
      assert(back != null, s"filter $f failed to decode")
      assert(back.width === w && back.height === h)
      assert(back.rgba.toSeq === rgba.toSeq, s"filter $f corrupted pixels")
    }
    // and the cycling-filter form the catalog fixture generator uses
    val cyc = PngCodec.decode(PngCodec.encode(w, h, rgba, y => y % 5))
    assert(cyc.rgba.toSeq === rgba.toSeq)
  }

  test("decode is total: truncated, non-PNG, and hostile-dims inputs return null") {
    assert(PngCodec.decode(null) === null)
    assert(PngCodec.decode(Array[Byte](1, 2, 3)) === null)
    assert(PngCodec.decode(rgbFixture.take(30)) === null)
    assert(PngCodec.decode("not a png at all, just text bytes".getBytes) === null)
    // valid signature + IHDR claiming ~2^31 pixels must not allocate
    val huge = rgbFixture.clone()
    huge(16 + 3) = 0x7F.toByte   // width high byte → absurd
    assert(PngCodec.decode(huge) === null)
  }

  test("nearest-neighbor resize samples real pixels") {
    // 2x2 distinct-color image → 1x1 picks the top-left pixel
    val rgba = Array[Byte](
      10, 20, 30, -1 /*255*/, 40, 50, 60, -1,
      70, 80, 90, -1, 100, 110, 120, -1)
    val small = PngCodec.resize(PngCodec.encode(2, 2, rgba), 1, 1)
    val img = PngCodec.decode(small)
    assert(img.width === 1 && img.height === 1)
    assert(u(img.rgba) === Seq(10, 20, 30, 255))
    // and upscale 2x2 → 4x4 replicates each source pixel 2x2
    val big = PngCodec.decode(PngCodec.resize(PngCodec.encode(2, 2, rgba), 4, 4))
    assert(big.width === 4 && big.height === 4)
    assert(u(big.rgba).slice(0, 8) === Seq(10, 20, 30, 255, 10, 20, 30, 255))
  }

  test("testImage channel means match the closed-form formula (the q142 contract)") {
    (Seq(0L, 1L, 7L, 12345L)).foreach { id =>
      val w = (id % 13 + 4).toInt; val h = (id % 11 + 4).toInt
      val img = PngCodec.decode(PngCodec.testImage(id, w, h))
      assert(img != null && img.width === w && img.height === h)
      val (mr, mg, mb, ma) = PngCodec.channelMeansX100(img)
      def mean(f: (Int, Int) => Long): Long = {
        var s = 0L
        for (y <- 0 until h; x <- 0 until w) s += f(x, y)
        100 * s / (w.toLong * h)
      }
      assert(mr === mean((x, y) => (id * 7 + 3 * x + 5 * y) % 256))
      assert(mg === mean((x, y) => (id * 11 + x + 2 * y) % 256))
      assert(mb === mean((x, y) => (id * 13 + 2 * x + y) % 256))
      assert(ma === 25500L)
    }
  }

  test("gridFeatures: cell means are exact over a hand-checkable image") {
    // 2x2 image, one pixel per cell at g=2 — the feature vector IS the
    // pixel values, channel by channel
    val rgba = Array[Byte](
      10, 20, 30, -1, 40, 50, 60, -1,
      70, 80, 90, -1, 100, 110, 120, -1)
    val f = PngCodec.gridFeatures(PngCodec.encode(2, 2, rgba), 2)
    assert(f.toSeq === Seq(10L, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
    // g=1 collapses to the whole-image mean
    val f1 = PngCodec.gridFeatures(PngCodec.encode(2, 2, rgba), 1)
    assert(f1.toSeq === Seq((10L + 40 + 70 + 100) / 4,
      (20L + 50 + 80 + 110) / 4, (30L + 60 + 90 + 120) / 4))
    assert(PngCodec.gridFeatures("nope".getBytes, 2) === null)
  }

  test("pngGridFeatures stage feeds exact integer vectors; null for bad blobs") {
    val rows = Seq((1L, PngCodec.testImage(3L, 8, 6)),
      (2L, "bad".getBytes)).toDF("doc_id", "png")
    val out = Multimodal.pngGridFeatures(rows, "doc_id", "png", grid = 2)
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1).length === 12)
    assert(out(1).isNullAt(1))
  }

  test("pngPixelStats: batched stage decodes good blobs and error-routes bad ones") {
    val good = PngCodec.testImage(5L, 6, 4)
    val rows = Seq((1L, good), (2L, "garbage".getBytes), (3L, null))
      .toDF("doc_id", "png")
    val out = Multimodal.pngPixelStats(rows, "doc_id", "png")
      .orderBy("id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Int]("width") === 6 && out(0).getAs[Int]("height") === 4)
    assert(out(0).getAs[Long]("mean_a_x100") === 25500L)
    assert(out(0).isNullAt(out(0).fieldIndex("error")))
    assert(!out(1).isNullAt(out(1).fieldIndex("error")))
    assert(out(1).isNullAt(out(1).fieldIndex("width")))
    assert(!out(2).isNullAt(out(2).fieldIndex("error")))
  }

  test("PixelCodec features come from real pixels for PNG, stub otherwise") {
    // 2x2 image with known pixels: dim 12 at g=2 is the full grid,
    // each feature = pixel channel / 256
    val rgba = Array[Byte](
      10, 20, 30, -1, 40, 50, 60, -1,
      70, 80, 90, -1, 100, 110, 120, -1)
    val png = PngCodec.encode(2, 2, rgba)
    val f = Multimodal.PixelCodec.features(png, 12)
    assert(f.toSeq === Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
      .map(_.toFloat / 256.0f))
    // dim 14 grows the grid to 3x3 (3·g² ≥ dim): indices 12-13 are
    // cell 4's real means — pixel (1,1) = (100, 110) under the 3-split
    assert(Multimodal.PixelCodec.features(png, 14).drop(12).toSeq
      === Seq(100.0f / 256, 110.0f / 256))
    assert(Multimodal.PixelCodec.features(png, 5).toSeq === f.take(5).toSeq)
    // non-PNG bytes keep the deterministic stub family
    val stub = Multimodal.PixelCodec.features("not png".getBytes, 8)
    assert(stub.toSeq === Multimodal.StubCodec.features("not png".getBytes, 8).toSeq)
  }

  test("PixelCodec resize is REAL for PNG bytes and falls back for others") {
    val png = PngCodec.testImage(9L, 8, 8)
    val resized = Multimodal.PixelCodec.resize(png, 4, 4)
    val img = PngCodec.decode(resized)
    assert(img != null && img.width === 4 && img.height === 4)
    // non-PNG bytes take the stub path (total, non-null)
    val stub = Multimodal.PixelCodec.resize("just bytes".getBytes, 4, 4)
    assert(stub != null)
  }
}
