package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Real PNG pixel codec on pure-JDK primitives — the piece that closes
  * the multimodal probe stage's "stops exactly at pixel decode" seam
  * for one format: `java.util.zip.Inflater`/`Deflater` ARE the zlib
  * the PNG spec (RFC 2083 / ISO 15948) requires, so decoding needs no
  * image library at all, just the chunk walk, the five scanline
  * filters, and the color-type expansion.
  *
  * Scope (r13: the FULL legal PNG matrix): every color type (0 gray,
  * 2 RGB, 3 palette via PLTE, 4 gray+alpha, 6 RGBA) at every legal
  * bit depth (1/2/4/8/16 per spec §11.2.2 — sub-byte grays scale by
  * 255/(2^d−1), 16-bit takes the high byte), both non-interlaced and
  * Adam7-interlaced (§8.2: seven passes, each filtered as its own
  * sub-image, scattered onto the canvas), decoded to a
  * width×height×RGBA byte buffer. Malformed inputs return null —
  * decode is TOTAL (the Result convention: a poison blob must not
  * kill a 100 TB decode stage).
  *
  * The encoder writes the same subset back (RGBA, one IDAT, per-row
  * filter choice) — which makes the decoder testable far beyond a
  * fixed fixture: any pixel buffer round-trips through real
  * deflate + real filters, and a hand-laid STORED-block golden vector
  * pins the byte layout against implementation-mirrored bugs.
  *
  * Scale shape: per-blob work is O(pixels); used inside the batched
  * [[Multimodal]] mapPartitions stages it is map-only, no shuffle, and
  * peak memory is batchSize × decoded size.
  */
object PngCodec {

  final case class Png(width: Int, height: Int, rgba: Array[Byte])

  private val Signature =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) |
      ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)

  /** Decode to RGBA; null on anything outside the supported subset. */
  def decode(bytes: Array[Byte]): Png = {
    try {
      if (bytes == null || bytes.length < Signature.length + 12) return null
      var i = 0
      while (i < Signature.length) {
        if (bytes(i) != Signature(i)) return null
        i += 1
      }
      var pos = Signature.length
      var w = 0; var h = 0; var bitDepth = -1; var colorType = -1
      var interlace = -1; var sawIhdr = false; var sawIend = false
      var palette: Array[Byte] = null
      val idat = new ByteArrayOutputStream()
      while (!sawIend && pos + 8 <= bytes.length) {
        val len = be32(bytes, pos)
        if (len < 0 || pos + 12 + len > bytes.length) return null
        val chunkType = new String(bytes, pos + 4, 4, "US-ASCII")
        val dataStart = pos + 8
        chunkType match {
          case "IHDR" =>
            if (len != 13) return null
            w = be32(bytes, dataStart); h = be32(bytes, dataStart + 4)
            bitDepth = bytes(dataStart + 8) & 0xFF
            colorType = bytes(dataStart + 9) & 0xFF
            interlace = bytes(dataStart + 12) & 0xFF
            sawIhdr = true
          case "PLTE" =>
            palette = java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + len)
          case "IDAT" => idat.write(bytes, dataStart, len)
          case "IEND" => sawIend = true
          case _ => ()   // ancillary chunks (tEXt, gAMA, tRNS…) skipped
        }
        pos += 12 + len
      }
      if (!sawIhdr || w <= 0 || h <= 0) return null
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return null
      }
      // legal (colorType, bitDepth) matrix — PNG spec §11.2.2
      val depthOk = colorType match {
        case 0 => bitDepth == 1 || bitDepth == 2 || bitDepth == 4 ||
          bitDepth == 8 || bitDepth == 16
        case 3 => bitDepth == 1 || bitDepth == 2 || bitDepth == 4 ||
          bitDepth == 8
        case _ => bitDepth == 8 || bitDepth == 16
      }
      if (!depthOk || (interlace != 0 && interlace != 1)) return null
      if (colorType == 3 && (palette == null || palette.length % 3 != 0))
        return null
      // guard absurd dimensions before allocating (w·h·4 must fit an
      // array; a hostile header must not OOM the executor); ·2 covers
      // the 16-bit raw buffer
      if (w.toLong * h * channels * 2 + h > Int.MaxValue / 8) return null

      val bitsPerPixel = bitDepth * channels
      // filter-byte distance: bytes per complete pixel, min 1 (§9)
      val bpp = math.max(1, bitsPerPixel / 8)
      def strideOf(pw: Int): Int = (pw * bitsPerPixel + 7) / 8
      // Adam7 pass origins and steps (§8.2); non-interlaced = 1 pass
      val passes: Array[(Int, Int, Int, Int)] =
        if (interlace == 0) Array((0, 0, 1, 1))
        else Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      val passDims = passes.map { case (x0, y0, dx, dy) =>
        ((w - x0 + dx - 1) / dx, (h - y0 + dy - 1) / dy)
      }
      val totalRaw = passDims.map { case (pw, ph) =>
        if (pw > 0 && ph > 0) (strideOf(pw) + 1) * ph else 0
      }.sum
      val raw = inflateExact(idat.toByteArray, totalRaw)
      if (raw == null) return null

      val rgba = new Array[Byte](w * h * 4)
      val gmax = (1 << math.min(bitDepth, 8)) - 1
      var rawOff = 0
      var pi = 0
      while (pi < passes.length) {
        val (x0, y0, dx, dy) = passes(pi)
        val (pw, ph) = passDims(pi)
        if (pw > 0 && ph > 0) {
          val stride = strideOf(pw)
          // undo this pass's per-scanline filter (each pass is its own
          // sub-image: filtering never crosses pass boundaries, §8.2)
          val recon = new Array[Byte](stride * ph)
          var y = 0
          while (y < ph) {
            val filter = raw(rawOff + y * (stride + 1)) & 0xFF
            val rowIn = rawOff + y * (stride + 1) + 1
            val rowOut = y * stride
            var x = 0
            while (x < stride) {
              val cur = raw(rowIn + x) & 0xFF
              val a = if (x >= bpp) recon(rowOut + x - bpp) & 0xFF else 0
              val b = if (y > 0) recon(rowOut - stride + x) & 0xFF else 0
              val c = if (x >= bpp && y > 0) recon(rowOut - stride + x - bpp) & 0xFF else 0
              val v = filter match {
                case 0 => cur
                case 1 => cur + a
                case 2 => cur + b
                case 3 => cur + ((a + b) >> 1)
                case 4 => cur + paeth(a, b, c)
                case _ => return null
              }
              recon(rowOut + x) = (v & 0xFF).toByte
              x += 1
            }
            y += 1
          }
          // scatter this pass's pixels onto the full canvas
          var j = 0
          while (j < ph) {
            var i2 = 0
            while (i2 < pw) {
              val q = ((y0 + j * dy) * w + (x0 + i2 * dx)) * 4
              colorType match {
                case 0 =>
                  val g = (sampleAt(recon, stride, bitDepth, gmax,
                    j, i2, 0, channels) * 255 / gmax).toByte
                  rgba(q) = g; rgba(q + 1) = g; rgba(q + 2) = g
                  rgba(q + 3) = 0xFF.toByte
                case 2 =>
                  rgba(q) = sampleAt(recon, stride, bitDepth, gmax, j, i2, 0, channels).toByte
                  rgba(q + 1) = sampleAt(recon, stride, bitDepth, gmax, j, i2, 1, channels).toByte
                  rgba(q + 2) = sampleAt(recon, stride, bitDepth, gmax, j, i2, 2, channels).toByte
                  rgba(q + 3) = 0xFF.toByte
                case 3 =>
                  val idx = sampleAt(recon, stride, bitDepth, gmax,
                    j, i2, 0, channels) * 3
                  if (idx + 2 >= palette.length) return null
                  rgba(q) = palette(idx); rgba(q + 1) = palette(idx + 1)
                  rgba(q + 2) = palette(idx + 2); rgba(q + 3) = 0xFF.toByte
                case 4 =>
                  val g = sampleAt(recon, stride, bitDepth, gmax, j, i2, 0, channels).toByte
                  rgba(q) = g; rgba(q + 1) = g; rgba(q + 2) = g
                  rgba(q + 3) = sampleAt(recon, stride, bitDepth, gmax, j, i2, 1, channels).toByte
                case 6 =>
                  rgba(q) = sampleAt(recon, stride, bitDepth, gmax, j, i2, 0, channels).toByte
                  rgba(q + 1) = sampleAt(recon, stride, bitDepth, gmax, j, i2, 1, channels).toByte
                  rgba(q + 2) = sampleAt(recon, stride, bitDepth, gmax, j, i2, 2, channels).toByte
                  rgba(q + 3) = sampleAt(recon, stride, bitDepth, gmax, j, i2, 3, channels).toByte
              }
              i2 += 1
            }
            j += 1
          }
          rawOff += (stride + 1) * ph
        }
        pi += 1
      }
      Png(w, h, rgba)
    } catch { case _: Exception => null }
  }

  /** Channel sample of pixel (row, px) as 0..255-range-compatible raw
    * value: 8-bit direct; 16-bit takes the most-significant byte (the
    * standard 16→8 reduction); sub-byte depths (grayscale/palette
    * only, so channels == 1) extract big-endian-packed bits and
    * return the RAW 0..2^d−1 value — grayscale callers scale by
    * 255/gmax, palette callers index directly.
    */
  private def sampleAt(recon: Array[Byte], stride: Int, bitDepth: Int,
                       gmax: Int, row: Int, px: Int, ch: Int,
                       channels: Int): Int =
    if (bitDepth == 8) recon(row * stride + px * channels + ch) & 0xFF
    else if (bitDepth == 16) recon(row * stride + (px * channels + ch) * 2) & 0xFF
    else {
      val bitPos = px * bitDepth   // channels == 1 for sub-byte depths
      val shift = 8 - bitDepth - (bitPos & 7)
      (recon(row * stride + (bitPos >> 3)) >> shift) & gmax
    }

  /** PNG spec §6.6 Paeth predictor — ties resolve a, then b. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflateExact(deflated: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(deflated)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && inf.needsInput()) return null   // truncated stream
        off += n
      }
      if (off == expected) out else null
    } catch { case _: Exception => null }
    finally inf.end()
  }

  /** Encode an RGBA buffer as a color-type-6 non-interlaced PNG. The
    * filter for each row comes from `filterFor(y)` ∈ [0, 4] — exposing
    * the choice lets round-trip tests drive EVERY unfilter path, not
    * just the None default.
    */
  def encode(width: Int, height: Int, rgba: Array[Byte],
             filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgba.length == width * height * 4,
      s"rgba length ${rgba.length} != ${width * height * 4}")
    val stride = width * 4
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val filter = filterFor(y)
      require(filter >= 0 && filter <= 4, s"bad filter $filter")
      raw(y * (stride + 1)) = filter.toByte
      var x = 0
      while (x < stride) {
        val cur = rgba(y * stride + x) & 0xFF
        val a = if (x >= 4) rgba(y * stride + x - 4) & 0xFF else 0
        val b = if (y > 0) rgba((y - 1) * stride + x) & 0xFF else 0
        val c = if (x >= 4 && y > 0) rgba((y - 1) * stride + x - 4) & 0xFF else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 => paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new Deflater()
    val deflated = try {
      def_.setInput(raw); def_.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new ByteArrayOutputStream()
      while (!def_.finished()) out.write(buf, 0, def_.deflate(buf))
      out.toByteArray
    } finally def_.end()

    val png = new ByteArrayOutputStream()
    png.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 6; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(png, "IHDR", ihdr)
    writeChunk(png, "IDAT", deflated)
    writeChunk(png, "IEND", Array.empty[Byte])
    png.toByteArray
  }

  /** Deterministic Adam7-interlaced 4-bit grayscale fixture — the
    * exotic-subset analog of `testImage`: pixel (x, y) has 4-bit gray
    * level (id·3 + 5·x + 7·y) % 16, so the decoded 8-bit value is
    * that ×17. Rows are filter 0, samples big-endian bit-packed PER
    * ADAM7 PASS — the encoder interleaves, the decoder must
    * de-interleave, and the q174 DuckDB twin computes the same means
    * straight from the formula: two independent paths, one ground
    * truth, exercising interlacing and sub-byte packing at once.
    */
  def testImageInterlaced(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    def pix(x: Int, y: Int): Int =
      (((id % 16) * 3 + 5L * x + 7L * y) % 16).toInt
    val passes = Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val scan = new ByteArrayOutputStream()
    passes.foreach { case (x0, y0, dx, dy) =>
      val pw = math.max(0, (w - x0 + dx - 1) / dx)
      val ph = math.max(0, (h - y0 + dy - 1) / dy)
      if (pw > 0 && ph > 0) {
        var j = 0
        while (j < ph) {
          scan.write(0)   // filter None
          var bx = 0
          while (bx < (pw + 1) / 2) {
            val hi = pix(x0 + 2 * bx * dx, y0 + j * dy) << 4
            val lo = if (2 * bx + 1 < pw)
              pix(x0 + (2 * bx + 1) * dx, y0 + j * dy) else 0
            scan.write(hi | lo)
            bx += 1
          }
          j += 1
        }
      }
    }
    val raw = scan.toByteArray
    val def_ = new Deflater()
    val deflated = try {
      def_.setInput(raw); def_.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new ByteArrayOutputStream()
      while (!def_.finished()) out.write(buf, 0, def_.deflate(buf))
      out.toByteArray
    } finally def_.end()
    val png = new ByteArrayOutputStream()
    png.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 4; ihdr(9) = 0; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 1
    writeChunk(png, "IHDR", ihdr)
    writeChunk(png, "IDAT", deflated)
    writeChunk(png, "IEND", Array.empty[Byte])
    png.toByteArray
  }

  private def putBe32(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = ((v >>> 24) & 0xFF).toByte; b(p + 1) = ((v >>> 16) & 0xFF).toByte
    b(p + 2) = ((v >>> 8) & 0xFF).toByte; b(p + 3) = (v & 0xFF).toByte
  }

  private def writeChunk(out: ByteArrayOutputStream, chunkType: String,
                         data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length)
    out.write(len, 0, 4)
    val t = chunkType.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    val c = new Array[Byte](4); putBe32(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  /** Integer per-channel means ×100 over the decoded RGBA —
    * (mean_r, mean_g, mean_b, mean_a), each `(100·Σchannel) div
    * (w·h)`: exact integers, so a DuckDB oracle computing the same
    * sums from the source pixel formula hashes identically.
    */
  def channelMeansX100(png: Png): (Long, Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L; var a = 0L
    var i = 0
    while (i < png.rgba.length) {
      r += png.rgba(i) & 0xFF; g += png.rgba(i + 1) & 0xFF
      b += png.rgba(i + 2) & 0xFF; a += png.rgba(i + 3) & 0xFF
      i += 4
    }
    val n = png.width.toLong * png.height
    (100 * r / n, 100 * g / n, 100 * b / n, 100 * a / n)
  }

  /** Deterministic RGBA test pattern, PNG-encoded — the shared fixture
    * generator behind the q142 catalog query and its DuckDB twin: the
    * twin computes channel sums straight from this closed-form pixel
    * formula, so a hash match proves the whole real-zlib encode →
    * decode → unfilter path reproduces the pixels exactly. The row
    * filter cycles through all five types so every unfilter branch is
    * on the measured path.
    *
    * pixel(x, y) = ((id·7 + 3x + 5y) % 256, (id·11 + x + 2y) % 256,
    * (id·13 + 2x + y) % 256, 255).
    */
  def testImage(id: Long, w: Int, h: Int): Array[Byte] = {
    val rgba = new Array[Byte](w * h * 4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 4
        rgba(p) = ((id * 7 + 3L * x + 5L * y) % 256).toByte
        rgba(p + 1) = ((id * 11 + x + 2L * y) % 256).toByte
        rgba(p + 2) = ((id * 13 + 2L * x + y) % 256).toByte
        rgba(p + 3) = 0xFF.toByte
        x += 1
      }
      y += 1
    }
    encode(w, h, rgba, y => ((id + y) % 5).toInt)
  }

  /** REAL pixel features from a decoded PNG: the image is cut into a
    * g×g cell grid and each cell contributes its integer per-channel
    * RGB mean — a 3·g² feature vector of actual pixel statistics (the
    * classic color-layout descriptor), not a content-hash fake. Cells
    * partition the image by the same integer split nearest-neighbor
    * resize uses (pixel (x,y) → cell (g·x div w, g·y div h)), so every
    * pixel lands in exactly one cell and the means are exact integers
    * — a DuckDB oracle can recompute them from a closed-form pixel
    * formula. Layout: cell-major row order, (r, g, b) per cell.
    * Returns null for undecodable bytes.
    */
  def gridFeatures(bytes: Array[Byte], g: Int): Array[Long] = {
    val img = decode(bytes)
    if (img == null || g <= 0) return null
    val sums = new Array[Long](g * g * 3)
    val counts = new Array[Long](g * g)
    var y = 0
    while (y < img.height) {
      val cy = g * y / img.height
      var x = 0
      while (x < img.width) {
        val cell = cy * g + g * x / img.width
        val p = (y * img.width + x) * 4
        sums(cell * 3) += img.rgba(p) & 0xFF
        sums(cell * 3 + 1) += img.rgba(p + 1) & 0xFF
        sums(cell * 3 + 2) += img.rgba(p + 2) & 0xFF
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(g * g * 3) { i =>
      val c = counts(i / 3)
      if (c == 0) 0L else sums(i) / c
    }
  }

  /** Real nearest-neighbor resize for PNG bytes: decode → sample →
    * re-encode. Null in (unsupported) → null out.
    */
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = decode(bytes)
    if (img == null || w <= 0 || h <= 0) return null
    val out = new Array[Byte](w * h * 4)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val s = (sy * img.width + sx) * 4
        val d = (y * w + x) * 4
        out(d) = img.rgba(s); out(d + 1) = img.rgba(s + 1)
        out(d + 2) = img.rgba(s + 2); out(d + 3) = img.rgba(s + 3)
        x += 1
      }
      y += 1
    }
    encode(w, h, out)
  }
}
