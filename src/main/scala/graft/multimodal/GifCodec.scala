package graft.multimodal

/** Real GIF pixel codec on pure JDK byte twiddling — the GIF89a
  * layout (public specification; dims parse per MediaHeaders.scala's
  * GIF branch): logical screen descriptor, global/local color
  * tables, extension-block skipping with Graphic Control Extension
  * transparency, and a full LZW decoder (variable code width 3..12
  * bits, LSB-first bitstream across data sub-blocks, CLEAR/EOI
  * handling, the `code == next` self-referential case). Non-
  * interlaced only — interlaced images return null rather than
  * wrong pixels.
  *
  * With [[PngCodec]] (zlib/DEFLATE) and [[BmpCodec]] (raw BGR) this
  * is the third independent real decompression path on the
  * multimodal image surface.
  */
object GifCodec {

  final case class Gif(width: Int, height: Int, rgba: Array[Byte])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  /** Decode the FIRST image of a GIF87a/89a to RGBA. Returns null on
    * anything malformed, interlaced, or truncated — total function.
    */
  def decode(bytes: Array[Byte]): Gif = {
    try {
      if (bytes == null || bytes.length < 13) return null
      val sig = new String(bytes, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return null
      val sw = le16(bytes, 6)
      val sh = le16(bytes, 8)
      val packed = bytes(10) & 0xFF
      var pos = 13
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val sz = 2 << (packed & 0x07)
        gct = java.util.Arrays.copyOfRange(bytes, pos, pos + sz * 3)
        pos += sz * 3
      }
      var transparentIdx = -1
      while (pos < bytes.length) {
        (bytes(pos) & 0xFF) match {
          case 0x21 => // extension: label + sub-blocks
            val label = bytes(pos + 1) & 0xFF
            if (label == 0xF9 && (bytes(pos + 2) & 0xFF) >= 4) {
              if ((bytes(pos + 3) & 0x01) != 0)
                transparentIdx = bytes(pos + 6) & 0xFF
            }
            pos += 2
            while ((bytes(pos) & 0xFF) != 0) pos += 1 + (bytes(pos) & 0xFF)
            pos += 1
          case 0x2C => // image descriptor
            val iw = le16(bytes, pos + 5)
            val ih = le16(bytes, pos + 7)
            val ipacked = bytes(pos + 9) & 0xFF
            if ((ipacked & 0x40) != 0) return null // interlaced unsupported
            pos += 10
            var ct = gct
            if ((ipacked & 0x80) != 0) {
              val sz = 2 << (ipacked & 0x07)
              ct = java.util.Arrays.copyOfRange(bytes, pos, pos + sz * 3)
              pos += sz * 3
            }
            if (ct == null || iw <= 0 || ih <= 0) return null
            if (iw > (1 << 14) || ih > (1 << 14)) return null
            val minCode = bytes(pos) & 0xFF
            pos += 1
            // concatenate data sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            while ((bytes(pos) & 0xFF) != 0) {
              val n = bytes(pos) & 0xFF
              data.write(bytes, pos + 1, n)
              pos += 1 + n
            }
            val indices = lzwDecode(data.toByteArray, minCode, iw * ih)
            if (indices == null) return null
            val w = if (iw > 0) iw else sw
            val h = if (ih > 0) ih else sh
            val rgba = new Array[Byte](w * h * 4)
            var i = 0
            while (i < w * h) {
              val idx = indices(i) & 0xFF
              if (idx * 3 + 2 >= ct.length) return null
              rgba(i * 4) = ct(idx * 3)
              rgba(i * 4 + 1) = ct(idx * 3 + 1)
              rgba(i * 4 + 2) = ct(idx * 3 + 2)
              rgba(i * 4 + 3) =
                if (idx == transparentIdx) 0x00.toByte else 0xFF.toByte
              i += 1
            }
            return Gif(w, h, rgba)
          case 0x3B => return null // trailer before any image
          case _ => return null
        }
      }
      null
    } catch { case _: Exception => null }
  }

  /** GIF-LZW decode of `data` (sub-blocks already concatenated) into
    * exactly `expected` palette indices. Returns null on corrupt
    * streams.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Array[Byte] = {
    if (minCode < 2 || minCode > 11) return null
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    // dictionary as (prefix code, appended byte); literals implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = eoi + 1
    var codeSize = minCode + 1
    var prev = -1
    var acc = 0L
    var accBits = 0
    var bytePos = 0
    val scratch = new Array[Byte](4096)

    def expand(code: Int, into: Array[Byte]): Int = {
      // walk the chain into scratch reversed, return length
      var c = code
      var n = 0
      while (c >= clear + 2) { // dictionary entry
        into(n) = suffix(c); n += 1; c = prefix(c)
      }
      into(n) = c.toByte; n + 1
    }

    while (outPos < expected) {
      while (accBits < codeSize) {
        if (bytePos >= data.length) return null
        acc |= (data(bytePos) & 0xFFL) << accBits
        accBits += 8
        bytePos += 1
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize
      accBits -= codeSize
      if (code == clear) {
        next = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (outPos == expected) out else null
      } else if (prev == -1) {
        if (code >= clear) return null // first code must be a literal
        out(outPos) = code.toByte; outPos += 1
        prev = code
      } else {
        var firstByte: Byte = 0
        if (code < next && code != clear && code != eoi) {
          val n = expand(code, scratch)
          firstByte = scratch(n - 1)
          var i = n - 1
          while (i >= 0 && outPos < expected) {
            out(outPos) = scratch(i); outPos += 1; i -= 1
          }
          if (i >= 0) return null // overflow: stream longer than w*h
        } else if (code == next) {
          // K ω K case: entry = dict[prev] + first(dict[prev])
          val n = expand(prev, scratch)
          firstByte = scratch(n - 1)
          var i = n - 1
          while (i >= 0 && outPos < expected) {
            out(outPos) = scratch(i); outPos += 1; i -= 1
          }
          if (i >= 0 || outPos >= expected + 1) return null
          if (outPos < expected) { out(outPos) = firstByte; outPos += 1 }
          else return null
        } else return null
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = firstByte; next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out
  }

  /** Encode palette indices as a real GIF89a with a 256-entry global
    * color table, using the classic "uncompressed GIF" LZW stream:
    * every index emitted as its own 9-bit literal code with periodic
    * CLEARs so the code width never grows — a VALID LZW stream any
    * conformant decoder (including ours) must accept.
    */
  def encode(width: Int, height: Int, indices: Array[Byte],
             palette: Array[Byte]): Array[Byte] = {
    require(palette.length == 768, "palette must be 256 RGB entries")
    require(indices.length == width * height, "indices length mismatch")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xFF); out.write((width >> 8) & 0xFF)
    out.write(height & 0xFF); out.write((height >> 8) & 0xFF)
    out.write(0xF7) // GCT present, 256 entries, 8-bit color
    out.write(0); out.write(0)
    out.write(palette, 0, 768)
    out.write(0x2C) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(width & 0xFF); out.write((width >> 8) & 0xFF)
    out.write(height & 0xFF); out.write((height >> 8) & 0xFF)
    out.write(0) // no LCT, not interlaced
    out.write(8) // LZW min code size
    // 9-bit codes LSB-first: CLEAR, literals with periodic CLEAR, EOI
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    def put(code: Int): Unit = {
      acc |= (code.toLong & 0x1FF) << accBits
      accBits += 9
      while (accBits >= 8) {
        bits.write((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8
      }
    }
    put(256) // CLEAR
    var sinceClear = 0
    var i = 0
    while (i < indices.length) {
      put(indices(i) & 0xFF)
      sinceClear += 1
      if (sinceClear == 250) { put(256); sinceClear = 0 }
      i += 1
    }
    put(257) // EOI
    if (accBits > 0) bits.write((acc & 0xFF).toInt)
    val stream = bits.toByteArray
    var p = 0
    while (p < stream.length) {
      val n = math.min(255, stream.length - p)
      out.write(n)
      out.write(stream, p, n)
      p += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Closed-form test fixture: index(x, y) = (id·7 + 3x + 5y) % 256
    * (the q142 pattern's R channel as the palette index), palette[i]
    * = (i, (i·11 + 3) % 256, (i·31 + 7) % 256) — both formulas
    * recomputable by a DuckDB twin, so a hash match proves the whole
    * LZW decode + palette mapping reproduced every pixel.
    */
  def testImage(id: Long, w: Int, h: Int): Array[Byte] = {
    val indices = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        indices(y * w + x) = ((id * 7 + 3L * x + 5L * y) % 256).toByte
        x += 1
      }
      y += 1
    }
    val palette = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      palette(i * 3) = i.toByte
      palette(i * 3 + 1) = ((i * 11 + 3) % 256).toByte
      palette(i * 3 + 2) = ((i * 31 + 7) % 256).toByte
      i += 1
    }
    encode(w, h, indices, palette)
  }

  /** Integer per-channel means ×100 — same contract as
    * [[PngCodec.channelMeansX100]].
    */
  def channelMeansX100(img: Gif): (Long, Long, Long, Long) = {
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
