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

  // ---------------------------------------------------------------- //
  // r13 full-matrix subsets: Adam7, 16-bit, sub-byte depths.          //
  // ImageIO's PNG plugin is the JDK's INDEPENDENT codec — where it    //
  // can write a subset we compare decoders on its bytes; where it     //
  // can't, a spec-local chunk writer (independent bit-packing) plus   //
  // the closed form covers it, and ImageIO re-reads our input.        //
  // ---------------------------------------------------------------- //

  private def imageIoPng(img: java.awt.image.BufferedImage,
                         progressive: Boolean): Array[Byte] = {
    import javax.imageio.{ImageIO, ImageWriteParam, IIOImage}
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    if (progressive) param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("Adam7 RGB written by ImageIO decodes bit-exactly to ImageIO's own read") {
    import javax.imageio.ImageIO
    val w = 21; val h = 13   // non-multiples of 8: ragged pass dims
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, ((x * 37 + y) % 256 << 16) | ((y * 53 + x) % 256 << 8)
        | ((x * y + 7) % 256))
    val bytes = imageIoPng(src, progressive = true)
    assert((bytes(16 + 12) & 0xFF) === 1, "fixture must really be Adam7")
    val ours = PngCodec.decode(bytes)
    assert(ours != null && ours.width === w && ours.height === h)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val t = theirs.getRGB(x, y); val p = (y * w + x) * 4
      assert(((ours.rgba(p) & 0xFF) << 16 | (ours.rgba(p + 1) & 0xFF) << 8 |
        (ours.rgba(p + 2) & 0xFF)) === (t & 0xFFFFFF), s"pixel ($x,$y)")
    }
  }

  test("16-bit gray written by ImageIO: ours == theirs >> 8") {
    import javax.imageio.ImageIO
    val w = 9; val h = 7
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 9173 + y * 257) % 65536)
    val bytes = imageIoPng(src, progressive = false)
    assert((bytes(16 + 8) & 0xFF) === 16, "fixture must really be 16-bit")
    val ours = PngCodec.decode(bytes)
    assert(ours != null && ours.width === w && ours.height === h)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w)
      assert((ours.rgba((y * w + x) * 4) & 0xFF)
        === (theirs.getRaster.getSample(x, y, 0) >> 8), s"pixel ($x,$y)")
  }

  test("1/2/4-bit palette written by ImageIO decodes bit-exactly") {
    import javax.imageio.ImageIO
    for (nbits <- Seq(1, 2, 4)) {
      val n = 1 << nbits
      val cmap = Array.tabulate(n)(i =>
        (i * 255 / (n - 1) << 16) | ((255 - i * 255 / (n - 1)) << 8) | (i * 40 % 256))
      val icm = new java.awt.image.IndexColorModel(nbits, n,
        cmap.map(c => ((c >> 16) & 0xFF).toByte),
        cmap.map(c => ((c >> 8) & 0xFF).toByte),
        cmap.map(c => (c & 0xFF).toByte))
      val w = 11; val h = 5
      val src = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
      for (y <- 0 until h; x <- 0 until w)
        src.getRaster.setSample(x, y, 0, (x + y * 3) % n)
      val bytes = imageIoPng(src, progressive = false)
      assert((bytes(16 + 8) & 0xFF) === nbits, s"fixture must be $nbits-bit")
      assert((bytes(16 + 9) & 0xFF) === 3, "fixture must be palette type")
      val ours = PngCodec.decode(bytes)
      assert(ours != null, s"$nbits-bit palette must decode")
      val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until h; x <- 0 until w) {
        val t = theirs.getRGB(x, y); val p = (y * w + x) * 4
        assert(((ours.rgba(p) & 0xFF) << 16 | (ours.rgba(p + 1) & 0xFF) << 8 |
          (ours.rgba(p + 2) & 0xFF)) === (t & 0xFFFFFF),
          s"$nbits-bit pixel ($x,$y)")
      }
    }
  }

  // spec-local chunk writer: independent re-statement of the byte
  // layout (CRC over type+data, big-endian lengths, zlib IDAT)
  private def rawPng(w: Int, h: Int, bitDepth: Int, colorType: Int,
                     interlace: Int, scanBytes: Array[Byte]): Array[Byte] = {
    def be(v: Int) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def chunk(t: String, d: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(t.getBytes("US-ASCII")); crc.update(d)
      be(d.length) ++ t.getBytes("US-ASCII") ++ d ++ be(crc.getValue.toInt)
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(scanBytes); defl.finish()
    val buf = new Array[Byte](scanBytes.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = be(w) ++ be(h) ++ Array(bitDepth.toByte, colorType.toByte,
      0.toByte, 0.toByte, interlace.toByte)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("sub-byte gray, 16-bit RGB and Adam7 4-bit gray: closed form + ImageIO re-read") {
    import javax.imageio.ImageIO
    // 4-bit gray 5x3, filter 0: samples (x + 2y) % 16, scale ×17
    val w = 5; val h = 3
    val pix = (x: Int, y: Int) => (x + 2 * y) % 16
    val rows = (0 until h).flatMap { y =>
      0.toByte +: (0 until (w + 1) / 2).map { bx =>
        val hi = pix(2 * bx, y) << 4
        val lo = if (2 * bx + 1 < w) pix(2 * bx + 1, y) else 0
        ((hi | lo) & 0xFF).toByte
      }
    }.toArray
    val g4 = rawPng(w, h, 4, 0, 0, rows)
    val ours4 = PngCodec.decode(g4)
    assert(ours4 != null)
    for (y <- 0 until h; x <- 0 until w)
      assert((ours4.rgba((y * w + x) * 4) & 0xFF) === pix(x, y) * 17,
        s"4-bit gray ($x,$y)")
    assert(ImageIO.read(new java.io.ByteArrayInputStream(g4)) != null,
      "independent reader accepts the fixture")

    // 16-bit RGB 3x2, filter 0: channel c of (x,y) = (1000*c + 300*x
    // + 77*y) — high byte expected
    val v16 = (x: Int, y: Int, c: Int) => (5000 * (c + 1) + 3000 * x + 777 * y) % 65536
    val rgb16 = (0 until 2).flatMap { y =>
      0.toByte +: (0 until 3).flatMap { x =>
        (0 until 3).flatMap { c =>
          Seq(((v16(x, y, c) >> 8) & 0xFF).toByte, (v16(x, y, c) & 0xFF).toByte)
        }
      }
    }.toArray
    val p16 = rawPng(3, 2, 16, 2, 0, rgb16)
    val ours16 = PngCodec.decode(p16)
    assert(ours16 != null)
    val theirs16 = ImageIO.read(new java.io.ByteArrayInputStream(p16))
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3) {
      assert((ours16.rgba((y * 3 + x) * 4 + c) & 0xFF) === (v16(x, y, c) >> 8),
        s"16-bit rgb ($x,$y,$c)")
      assert((ours16.rgba((y * 3 + x) * 4 + c) & 0xFF)
        === (theirs16.getRaster.getSample(x, y, c) >> 8),
        s"16-bit rgb vs ImageIO ($x,$y,$c)")
    }

    // Adam7 4-bit gray 9x9: the nastiest combo — per-pass bit packing
    val aw = 9; val ah = 9
    val apix = (x: Int, y: Int) => (3 * x + y) % 16
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val scan = passes.flatMap { case (x0, y0, dx, dy) =>
      val pw = math.max(0, (aw - x0 + dx - 1) / dx)
      val ph = math.max(0, (ah - y0 + dy - 1) / dy)
      if (pw == 0 || ph == 0) Seq.empty[Byte]
      else (0 until ph).flatMap { j =>
        0.toByte +: (0 until (pw + 1) / 2).map { bx =>
          val hi = apix(x0 + 2 * bx * dx, y0 + j * dy) << 4
          val lo = if (2 * bx + 1 < pw) apix(x0 + (2 * bx + 1) * dx, y0 + j * dy) else 0
          ((hi | lo) & 0xFF).toByte
        }
      }
    }.toArray
    val a7 = rawPng(aw, ah, 4, 0, 1, scan)
    val oursA = PngCodec.decode(a7)
    assert(oursA != null, "Adam7 4-bit gray must decode")
    for (y <- 0 until ah; x <- 0 until aw)
      assert((oursA.rgba((y * aw + x) * 4) & 0xFF) === apix(x, y) * 17,
        s"adam7 4-bit ($x,$y)")
    val theirsA = ImageIO.read(new java.io.ByteArrayInputStream(a7))
    for (y <- 0 until ah; x <- 0 until aw)
      assert((oursA.rgba((y * aw + x) * 4) & 0xFF)
        === theirsA.getRaster.getSample(x, y, 0) * 17,
        s"adam7 vs ImageIO ($x,$y)")
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
