package graft.multimodal

/** Pure-JVM media container-header parsing — the REAL part of the
  * multimodal probe stage. No image/audio libraries exist in this
  * environment, but container headers are public byte layouts (PNG:
  * RFC 2083 §3.1/§4.1.1; GIF: GIF89a spec §17-18; BMP:
  * BITMAPINFOHEADER; JPEG: ITU-T T.81 §B.2.2 SOF segments; WAV: RIFF
  * WAVE fmt/data chunks), so dimension / sample-rate / duration
  * extraction is implementable exactly, and only pixel decode stays
  * behind the [[Multimodal.MediaCodec]] stub seam.
  *
  * All parsers are TOTAL: any malformed / truncated input returns
  * null (never throws) — the Result-convention requirement for a
  * decode stage a poison blob must not kill.
  */
object MediaHeaders {

  /** Parsed image header: format ∈ {png, gif, bmp, jpeg}. */
  final case class ImageDims(format: String, width: Int, height: Int)

  /** Parsed WAV header: PCM sample rate and data-chunk duration. */
  final case class WavInfo(sampleRate: Int, durationMs: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean = {
    var j = 0
    while (j < s.length) {
      if (u8(b, i + j) != s.charAt(j)) return false
      j += 1
    }
    true
  }

  /** Parse an image container header; null if not a recognized,
    * well-formed PNG / GIF / BMP / JPEG prefix.
    */
  def parseImage(b: Array[Byte]): ImageDims = {
    if (b == null || b.length < 4) return null
    // PNG: 8-byte signature, then the IHDR chunk (must be first):
    // length(4) "IHDR" width(4 BE) height(4 BE).
    if (b.length >= 24 && u8(b, 0) == 0x89 && ascii(b, 1, "PNG") &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a &&
        u8(b, 7) == 0x0a && ascii(b, 12, "IHDR")) {
      val w = be32(b, 16); val h = be32(b, 20)
      return if (w > 0 && h > 0) ImageDims("png", w, h) else null
    }
    // GIF87a / GIF89a: logical screen width/height, LE16 at 6/8.
    if (b.length >= 10 && (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a"))) {
      val w = le16(b, 6); val h = le16(b, 8)
      return if (w > 0 && h > 0) ImageDims("gif", w, h) else null
    }
    // BMP: "BM", BITMAPINFOHEADER width LE32 at 18, height LE32 at 22
    // (negative height = top-down rows; magnitude is the pixel height).
    if (b.length >= 26 && ascii(b, 0, "BM")) {
      val w = le32(b, 18); val h = math.abs(le32(b, 22))
      return if (w > 0 && h > 0) ImageDims("bmp", w, h) else null
    }
    // JPEG: SOI then marker segments; dimensions live in the first
    // SOFn frame header (FFC0-FFCF except DHT/DAC: C4, C8, CC):
    // marker(2) length(2) precision(1) height(2 BE) width(2 BE).
    if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return null
        var j = i
        while (j < b.length && u8(b, j) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return null
        val m = u8(b, j)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (j + 7 >= b.length) return null
          val h = be16(b, j + 4); val w = be16(b, j + 6)
          return if (w > 0 && h > 0) ImageDims("jpeg", w, h) else null
        }
        if (m == 0xd9 || m == 0xda) return null // EOI / SOS before SOF
        if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) i = j + 1 // bare markers
        else {
          if (j + 2 >= b.length) return null
          val len = be16(b, j + 1)
          if (len < 2) return null
          i = j + 1 + len
        }
      }
      return null
    }
    null
  }

  /** Parse a RIFF/WAVE header: PCM sample rate from the fmt chunk and
    * duration from data-chunk size / byte rate. Null unless both
    * chunks are present and sane.
    */
  def parseWav(b: Array[Byte]): WavInfo = {
    if (b == null || b.length < 44) return null
    if (!ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE")) return null
    var sampleRate = 0
    var byteRate = 0
    var dataSize = -1L
    var i = 12
    while (i + 8 <= b.length && (sampleRate == 0 || dataSize < 0)) {
      val size = le32(b, i + 4).toLong & 0xffffffffL
      if (ascii(b, i, "fmt ")) {
        if (i + 24 > b.length) return null
        sampleRate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
      } else if (ascii(b, i, "data")) {
        dataSize = size
      }
      if (size > Int.MaxValue - 16) return null
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || byteRate <= 0 || dataSize < 0) null
    else WavInfo(sampleRate, dataSize * 1000L / byteRate)
  }
}
