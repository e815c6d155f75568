package graft.multimodal

/** Real BMP pixel codec on pure JDK byte twiddling — no libraries, no
  * native code: the Windows BITMAPFILEHEADER + BITMAPINFOHEADER layout
  * (public format documentation; dims parse per MediaHeaders.scala's
  * BMP branch), uncompressed BI_RGB only, 24-bit BGR and 32-bit BGRA,
  * bottom-up (positive height) and top-down (negative height) row
  * orders, row stride padded to 4 bytes. Together with [[PngCodec]]
  * this makes the multimodal layer's image path REAL for two formats:
  * bytes in → actual pixels out, no decode stub on the measured path.
  */
object BmpCodec {

  final case class Bmp(width: Int, height: Int, rgba: Array[Byte])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >>> 8) & 0xFF).toByte
  }

  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >>> 8) & 0xFF).toByte
    b(o + 2) = ((v >>> 16) & 0xFF).toByte; b(o + 3) = ((v >>> 24) & 0xFF).toByte
  }

  /** Decode an uncompressed 24/32-bit BMP to RGBA (top-down row
    * order). Returns null for anything else — total function, never
    * throws on hostile bytes.
    */
  def decode(bytes: Array[Byte]): Bmp = {
    try {
      if (bytes == null || bytes.length < 54) return null
      if (bytes(0) != 'B' || bytes(1) != 'M') return null
      val dataOffset = le32(bytes, 10)
      val headerSize = le32(bytes, 14)
      if (headerSize < 40) return null // BITMAPCOREHEADER etc. unsupported
      val width = le32(bytes, 18)
      val rawHeight = le32(bytes, 22)
      val planes = le16(bytes, 26)
      val bpp = le16(bytes, 28)
      val compression = le32(bytes, 30)
      if (width <= 0 || rawHeight == 0 || planes != 1) return null
      if (compression != 0 || (bpp != 24 && bpp != 32)) return null
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      if (width > (1 << 14) || height > (1 << 14)) return null
      val bytesPerPx = bpp / 8
      val stride = (width * bytesPerPx + 3) & ~3
      if (dataOffset < 0 || dataOffset.toLong + stride.toLong * height > bytes.length)
        return null
      val rgba = new Array[Byte](width * height * 4)
      var row = 0
      while (row < height) {
        val srcRow = if (topDown) row else height - 1 - row
        val src = dataOffset + srcRow * stride
        var x = 0
        while (x < width) {
          val s = src + x * bytesPerPx
          val d = (row * width + x) * 4
          rgba(d) = bytes(s + 2)     // R (file is BGR)
          rgba(d + 1) = bytes(s + 1) // G
          rgba(d + 2) = bytes(s)     // B
          rgba(d + 3) = if (bpp == 32) bytes(s + 3) else 0xFF.toByte
          x += 1
        }
        row += 1
      }
      Bmp(width, height, rgba)
    } catch { case _: Exception => null }
  }

  /** Encode RGBA (top-down) as a 24-bit bottom-up BI_RGB BMP — the
    * classic layout every viewer reads; alpha is dropped.
    */
  def encode(width: Int, height: Int, rgba: Array[Byte]): Array[Byte] = {
    require(rgba.length == width * height * 4, "rgba length mismatch")
    val stride = (width * 3 + 3) & ~3
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length)
    putLe32(out, 10, 54)
    putLe32(out, 14, 40)
    putLe32(out, 18, width)
    putLe32(out, 22, height) // positive = bottom-up
    putLe16(out, 26, 1)
    putLe16(out, 28, 24)
    putLe32(out, 30, 0) // BI_RGB
    putLe32(out, 34, dataSize)
    var row = 0
    while (row < height) {
      val dst = 54 + (height - 1 - row) * stride // bottom-up
      var x = 0
      while (x < width) {
        val s = (row * width + x) * 4
        val d = dst + x * 3
        out(d) = rgba(s + 2)     // B
        out(d + 1) = rgba(s + 1) // G
        out(d + 2) = rgba(s)     // R
        x += 1
      }
      row += 1
    }
    out
  }

  /** The q142 closed-form test pattern, BMP-encoded — the SAME pixel
    * formula ([[PngCodec.testImage]]), so the q159 oracle twin is the
    * identical closed-form sum and a hash match proves the BMP
    * stride/BGR/bottom-up path reproduced every pixel.
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
    encode(w, h, rgba)
  }

  /** Integer per-channel means ×100 — same contract as
    * [[PngCodec.channelMeansX100]].
    */
  def channelMeansX100(img: Bmp): (Long, Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L; var a = 0L
    var i = 0
    while (i < img.rgba.length) {
      r += img.rgba(i) & 0xFF; g += img.rgba(i + 1) & 0xFF
      b += img.rgba(i + 2) & 0xFF; a += img.rgba(i + 3) & 0xFF
      i += 4
    }
    val n = img.width.toLong * img.height
    (100 * r / n, 100 * g / n, 100 * b / n, 100 * a / n)
  }
}
