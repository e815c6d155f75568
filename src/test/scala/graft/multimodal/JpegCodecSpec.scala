package graft.multimodal

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Baseline-JPEG decode coverage.
  *
  * Two independent certifications, mirroring the PNG suite's golden
  * discipline:
  *  1. flat-block fixtures ([[JpegCodec.encodeFlat]], all AC zero,
  *     q=16, even samples) decode EXACTLY to their closed form — the
  *     same formula the q171 DuckDB twin evaluates;
  *  2. JPEGs written by `javax.imageio` (the JDK's independent
  *     libjpeg-lineage implementation, never our encoder) decode to
  *     within IDCT/upsampling tolerance of ImageIO's own reader — a
  *     bug mirrored into both our encoder and decoder cannot cancel
  *     out.
  */
class JpegCodecSpec extends SparkSpec {

  /** The closed-form expected RGB for [[JpegCodec.testJpeg]] pixels —
    * written independently of the codec (block formula + the CCIR 601
    * 16.16 fixed-point conversion), the exact arithmetic the q171
    * DuckDB twin reproduces in SQL.
    */
  private def expectedRgb(id: Long, x: Int, y: Int): (Int, Int, Int) = {
    val bx = x / 8; val by = y / 8
    val lum = (((id * 7 + 3L * bx + 5L * by) % 120) * 2 + 4).toInt
    val cb = (((id * 11 + bx + 2L * by) % 16) * 2).toInt
    val cr = (((id * 13 + 2L * bx + by) % 16) * 2).toInt
    def clamp(v: Int) = math.min(255, math.max(0, v))
    (clamp(lum + ((91881 * cr + 32768) >> 16)),
      clamp(lum + ((-22554 * cb - 46802 * cr + 32768) >> 16)),
      clamp(lum + ((116130 * cb + 32768) >> 16)))
  }

  test("flat-block fixture decodes bit-exactly to the closed form") {
    for ((id, w, h) <- Seq((1L, 8, 8), (7L, 24, 16), (13L, 19, 11),
                           (42L, 9, 25), (999L, 32, 32))) {
      val img = JpegCodec.decode(JpegCodec.testJpeg(id, w, h))
      assert(img != null, s"id=$id ${w}x$h must decode")
      assert((img.width, img.height) === ((w, h)))
      var mismatches = 0
      for (y <- 0 until h; x <- 0 until w) {
        val p = (y * w + x) * 4
        val got = (img.rgba(p) & 0xFF, img.rgba(p + 1) & 0xFF,
          img.rgba(p + 2) & 0xFF)
        if (got != expectedRgb(id, x, y)) mismatches += 1
        assert((img.rgba(p + 3) & 0xFF) === 255)
      }
      assert(mismatches === 0,
        s"id=$id ${w}x$h: $mismatches pixels off closed form")
    }
  }

  test("restart markers: interval decode matches the no-restart decode") {
    val id = 5L
    val plain = JpegCodec.decode(JpegCodec.testJpeg(id, 40, 24))
    val rst = JpegCodec.decode(JpegCodec.encodeFlat(40, 24,
      (bx, by) => (((id * 7 + 3L * bx + 5L * by) % 120) * 2 + 4).toInt,
      (bx, by) => (128 + ((id * 11 + bx + 2L * by) % 16) * 2).toInt,
      (bx, by) => (128 + ((id * 13 + 2L * bx + by) % 16) * 2).toInt,
      restartInterval = 3))
    assert(rst != null, "restart-interval stream must decode")
    assert(rst.rgba.toSeq === plain.rgba.toSeq)
  }

  private def writeImageIoJpeg(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpg", out), "JDK must have a JPEG writer")
    out.toByteArray
  }

  test("grayscale ImageIO JPEG: our decode within ±2 of ImageIO's reader") {
    val w = 37; val h = 29
    val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (128 + 90 * math.sin(x / 5.0) * math.cos(y / 4.0)).toInt
      src.getRaster.setSample(x, y, 0, math.min(255, math.max(0, v)))
    }
    val bytes = writeImageIoJpeg(src)
    val ours = JpegCodec.decode(bytes)
    assert(ours != null, "JDK-written grayscale JPEG must decode")
    assert((ours.width, ours.height) === ((w, h)))
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val t = theirs.getRaster.getSample(x, y, 0)
      val o = ours.rgba((y * w + x) * 4) & 0xFF
      maxDiff = math.max(maxDiff, math.abs(t - o))
    }
    assert(maxDiff <= 2, s"gray decode drift vs ImageIO: maxDiff=$maxDiff")
  }

  test("color 4:2:0 ImageIO JPEG: dims exact, means within ±2, pixels close") {
    val w = 48; val h = 40
    val src = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth low-frequency pattern: fancy-vs-replication chroma
      // upsampling differences stay small away from sharp edges
      val r = (128 + 100 * math.sin(x / 9.0)).toInt
      val g = (128 + 100 * math.cos(y / 8.0)).toInt
      val b = (128 + 80 * math.sin((x + y) / 11.0)).toInt
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = writeImageIoJpeg(src)
    val ours = JpegCodec.decode(bytes)
    assert(ours != null, "JDK-written color JPEG must decode")
    assert((ours.width, ours.height) === ((w, h)))
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumT = Array(0L, 0L, 0L); var sumO = Array(0L, 0L, 0L)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val t = theirs.getRGB(x, y)
      val p = (y * w + x) * 4
      val tc = Array((t >> 16) & 0xFF, (t >> 8) & 0xFF, t & 0xFF)
      val oc = Array(ours.rgba(p) & 0xFF, ours.rgba(p + 1) & 0xFF,
        ours.rgba(p + 2) & 0xFF)
      for (c <- 0 until 3) {
        sumT(c) += tc(c); sumO(c) += oc(c)
        maxDiff = math.max(maxDiff, math.abs(tc(c) - oc(c)))
      }
    }
    val n = w.toLong * h
    for (c <- 0 until 3)
      assert(math.abs(sumT(c) / n - sumO(c) / n) <= 2,
        s"channel $c mean drift: ${sumT(c) / n} vs ${sumO(c) / n}")
    // replication vs fancy upsampling differ most at chroma slopes;
    // a smooth pattern keeps the bound tight
    assert(maxDiff <= 24, s"pixel drift vs ImageIO: maxDiff=$maxDiff")
  }

  test("islow IDCT within ±1 of the exact double-precision IDCT") {
    val rnd = new scala.util.Random(20260814L)
    // exact reference: separable double IDCT with StrictMath tables
    val cosT = Array.tabulate(8, 8)((u, x) =>
      StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0) *
        (if (u == 0) StrictMath.sqrt(0.125) else 0.5))
    def refIdct(coef: Array[Int]): Array[Int] = {
      val out = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8)
          s += coef(v * 8 + u) * cosT(u)(x) * cosT(v)(y)
        val r = Math.round(s).toInt + 128
        out(y * 8 + x) = math.min(255, math.max(0, r))
      }
      out
    }
    for (trial <- 0 until 50) {
      val coef = Array.tabulate(64) { i =>
        // realistic spectra: large DC, decaying sparse AC
        if (i == 0) rnd.nextInt(2048) - 1024
        else if (rnd.nextInt(4) == 0) (rnd.nextInt(513) - 256) / (1 + i / 8)
        else 0
      }
      val got = new Array[Byte](64)
      JpegCodec.idct8x8(coef.clone(), got, 0, 8)
      val want = refIdct(coef)
      for (i <- 0 until 64)
        assert(math.abs((got(i) & 0xFF) - want(i)) <= 1,
          s"trial $trial sample $i: islow ${got(i) & 0xFF} vs exact ${want(i)}")
    }
  }

  test("error paths are total: progressive, truncated, garbage, null") {
    val good = JpegCodec.testJpeg(3L, 16, 16)
    // flip SOF0 (C0) to SOF2 (C2): progressive is out of subset
    val prog = good.clone()
    var i = 0
    var flipped = false
    while (i + 1 < prog.length && !flipped) {
      if ((prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0) {
        prog(i + 1) = 0xC2.toByte; flipped = true
      }
      i += 1
    }
    assert(flipped && JpegCodec.decode(prog) == null)
    assert(JpegCodec.decode(good.take(good.length / 2)) == null)
    assert(JpegCodec.decode(Array.fill[Byte](64)(0x55)) == null)
    assert(JpegCodec.decode(null) == null)
    assert(JpegCodec.decode(Array[Byte]()) == null)
  }

  test("gridFeatures and resizeToPng ride the real decode") {
    val bytes = JpegCodec.testJpeg(11L, 16, 16)
    val grid = JpegCodec.gridFeatures(bytes, 2)
    assert(grid != null && grid.length === 12)
    // cell (0,0) covers exactly blocks (0..1, 0..1)? grid=2 over 16px
    // → cells are 8x8 = exactly one block each: means ARE the flat
    // block values
    val (r0, g0, b0) = expectedRgb(11L, 0, 0)
    assert((grid(0), grid(1), grid(2)) === ((r0.toLong, g0.toLong, b0.toLong)))
    val png = JpegCodec.resizeToPng(bytes, 4, 4)
    assert(png != null)
    val dec = PngCodec.decode(png)
    assert(dec != null && dec.width === 4 && dec.height === 4)
    // nearest-neighbor at (0,0) samples source (0,0)
    assert((dec.rgba(0) & 0xFF, dec.rgba(1) & 0xFF, dec.rgba(2) & 0xFF)
      === expectedRgb(11L, 0, 0))
    assert(JpegCodec.gridFeatures(Array.fill[Byte](10)(1), 2) == null)
    assert(JpegCodec.resizeToPng(Array.fill[Byte](10)(1), 2, 2) == null)
  }

  test("Spark stage: jpegPixelStats decodes real JFIF blobs; errors are total") {
    import org.apache.spark.sql.functions._
    val synth = udf((id: Long) => JpegCodec.testJpeg(id, 24, 16))
    val good = Multimodal.jpegPixelStats(
        spark.range(0, 8).select(col("id"), synth(col("id")).as("jpg")),
        "id", "jpg")
      .orderBy("id").collect()
    assert(good.length === 8)
    good.foreach { r =>
      assert(r.getInt(1) === 24 && r.getInt(2) === 16 && r.isNullAt(7))
      assert(r.getLong(6) === 25500L) // opaque alpha
    }
    // hand-check one blob against the closed form, through the stage
    val r0 = good(0) // id = 0
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until 16; x <- 0 until 24) {
      val (er, eg, eb) = expectedRgb(0L, x, y)
      sr += er; sg += eg; sb += eb
    }
    val n = 24L * 16
    assert(r0.getLong(3) === 100 * sr / n)
    assert(r0.getLong(4) === 100 * sg / n)
    assert(r0.getLong(5) === 100 * sb / n)
    val bad = Multimodal.jpegPixelStats(
        spark.range(0, 3).select(col("id"), lit("junk".getBytes).as("jpg")),
        "id", "jpg")
      .collect()
    assert(bad.forall(r => r.isNullAt(1) && !r.isNullAt(7)))
  }
}
