package graft.multimodal

import java.io.ByteArrayOutputStream

/** Baseline JPEG (ITU-T T.81 / ISO 10918-1) pixel codec in pure JVM —
  * closes the LAST stubbed decode path (rounds ≤12 probed JPEG
  * headers via [[MediaHeaders]] but fell back to the hash stub for
  * pixels). Reference treats media blobs as opaque binaries
  * (kpipe `lib/kpipe-core/src/main/java/org/kpipe/sink` routes raw
  * `byte[]`); real decode is north-star training-pipeline scope, same
  * as the PNG/BMP/GIF/WAV codecs.
  *
  * Decode subset — baseline + extended-sequential Huffman DCT
  * (SOF0/SOF1), 8-bit precision, 1 or 3 components, any sampling
  * factors ≤ 4 (4:4:4, 4:2:2, 4:2:0, ...), restart markers, 8- and
  * 16-bit quantization tables, one interleaved scan. Progressive
  * (SOF2), arithmetic coding, 12-bit, and multi-scan files return
  * null (total error path), mirroring the PNG codec's documented
  * interlace subset.
  *
  * Determinism: all-integer pipeline. The inverse DCT is the
  * Loeffler–Ligtenberg–Moshovitz 13-bit fixed-point factorization
  * (the "islow" method of the published IJG design — spec-accurate
  * to ±1/pixel), with the exact flat-block shortcut when all AC
  * coefficients are zero; chroma upsampling is sample replication
  * (nearest); YCbCr→RGB is the CCIR 601 16.16 fixed-point form with
  * half-up rounding. Every step is closed-form reproducible, which
  * is what lets a DuckDB oracle certify flat-block images bit-exactly
  * (q171's twin).
  *
  * Scale shape: map-only, O(pixels) per blob, no shuffle — the same
  * batched mapPartitions plumbing as every other media stage.
  */
object JpegCodec {

  final case class Jpeg(width: Int, height: Int, rgba: Array[Byte])

  // zigzag index -> natural (row-major) index
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the spec's F.2.2.3 DECODE form. */
  private final class Huff(counts: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val huffVal: Array[Byte] = vals
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  private final class Component {
    var id = 0; var h = 1; var v = 1; var tq = 0
    var dcTab = 0; var acTab = 0
    var pred = 0
    var blocksW = 0; var blocksH = 0
    var plane: Array[Byte] = null   // blocksW*8 x blocksH*8 samples
  }

  /** Entropy-coded-segment bit reader with 0xFF00 byte unstuffing;
    * stops (returns -1 bits) at any real marker.
    */
  private final class BitReader(val b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var hitMarker = false
    def nextBit(): Int = {
      if (nBits == 0) {
        if (pos >= b.length) { hitMarker = true; return -1 }
        var byte0 = b(pos) & 0xFF
        pos += 1
        if (byte0 == 0xFF) {
          if (pos >= b.length) { hitMarker = true; return -1 }
          val m = b(pos) & 0xFF
          if (m == 0x00) pos += 1                 // stuffed literal FF
          else { pos -= 1; hitMarker = true; return -1 }
        }
        acc = byte0; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val bit = nextBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit; i += 1
      }
      v
    }
    /** Skip to and consume an expected RSTn marker; true on success. */
    def restart(n: Int): Boolean = {
      acc = 0; nBits = 0; hitMarker = false
      // a stuffed pad byte (FF00) and 0xFF fill bytes may precede the
      // marker (spec B.1.1.2); the reader stops BEFORE the 0xFF
      while (pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF &&
             (b(pos + 1) & 0xFF) == 0x00) pos += 2
      while (pos + 2 < b.length && (b(pos) & 0xFF) == 0xFF &&
             (b(pos + 1) & 0xFF) == 0xFF) pos += 1
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xFF) != 0xFF) return false
      val m = b(pos + 1) & 0xFF
      if (m != 0xD0 + (n % 8)) return false
      pos += 2
      true
    }
  }

  private def decodeHuff(br: BitReader, t: Huff): Int = {
    var code = br.nextBit()
    if (code < 0) return Int.MinValue
    var l = 1
    while (l <= 16) {
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
        return t.huffVal(t.valPtr(l) + code - t.minCode(l)) & 0xFF
      val bit = br.nextBit()
      if (bit < 0) return Int.MinValue
      code = (code << 1) | bit
      l += 1
    }
    Int.MinValue
  }

  /** F.2.2.1 EXTEND: map a SSSS-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0
    else if (v < (1 << (t - 1))) v - (1 << t) + 1
    else v

  private final val ConstBits = 13
  private final val Pass1Bits = 2
  // FIX(x) = round(x * 2^13) — the published LL&M islow constants
  private final val F_0_298631336 = 2446
  private final val F_0_390180644 = 3196
  private final val F_0_541196100 = 4433
  private final val F_0_765366865 = 6270
  private final val F_0_899976223 = 7373
  private final val F_1_175875602 = 9633
  private final val F_1_501321110 = 12299
  private final val F_1_847759065 = 15137
  private final val F_1_961570560 = 16069
  private final val F_2_053119869 = 16819
  private final val F_2_562915447 = 20995
  private final val F_3_072711026 = 25172

  private def descale(x: Long, n: Int): Int =
    ((x + (1L << (n - 1))) >> n).toInt

  /** 8×8 inverse DCT, 13-bit fixed point (islow), dequantized
    * coefficients in natural order in/out; output is level-shifted
    * clamped samples 0..255. Exact flat output on DC-only blocks.
    */
  private[multimodal] def idct8x8(coef: Array[Int], out: Array[Byte],
                                  outPos: Int, outStride: Int): Unit = {
    val ws = new Array[Int](64)
    // pass 1: columns
    var c = 0
    while (c < 8) {
      var allZero = true
      var r = 1
      while (r < 8 && allZero) { if (coef(r * 8 + c) != 0) allZero = false; r += 1 }
      if (allZero) {
        val dc = coef(c) << Pass1Bits
        var i = 0
        while (i < 8) { ws(i * 8 + c) = dc; i += 1 }
      } else {
        val z2 = coef(2 * 8 + c).toLong; val z3 = coef(6 * 8 + c).toLong
        var z1 = (z2 + z3) * F_0_541196100
        val t2 = z1 + z3 * -F_1_847759065
        val t3 = z1 + z2 * F_0_765366865
        val t0 = (coef(c).toLong + coef(4 * 8 + c)) << ConstBits
        val t1 = (coef(c).toLong - coef(4 * 8 + c)) << ConstBits
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = coef(7 * 8 + c).toLong; var o1 = coef(5 * 8 + c).toLong
        var o2 = coef(3 * 8 + c).toLong; var o3 = coef(1 * 8 + c).toLong
        z1 = o0 + o3; var z2b = o1 + o2
        var z3b = o0 + o2; var z4 = o1 + o3
        val z5 = (z3b + z4) * F_1_175875602
        o0 *= F_0_298631336; o1 *= F_2_053119869
        o2 *= F_3_072711026; o3 *= F_1_501321110
        z1 *= -F_0_899976223; z2b *= -F_2_562915447
        z3b = z3b * -F_1_961570560 + z5
        z4 = z4 * -F_0_390180644 + z5
        o0 += z1 + z3b; o1 += z2b + z4
        o2 += z2b + z3b; o3 += z1 + z4
        ws(0 * 8 + c) = descale(t10 + o3, ConstBits - Pass1Bits)
        ws(7 * 8 + c) = descale(t10 - o3, ConstBits - Pass1Bits)
        ws(1 * 8 + c) = descale(t11 + o2, ConstBits - Pass1Bits)
        ws(6 * 8 + c) = descale(t11 - o2, ConstBits - Pass1Bits)
        ws(2 * 8 + c) = descale(t12 + o1, ConstBits - Pass1Bits)
        ws(5 * 8 + c) = descale(t12 - o1, ConstBits - Pass1Bits)
        ws(3 * 8 + c) = descale(t13 + o0, ConstBits - Pass1Bits)
        ws(4 * 8 + c) = descale(t13 - o0, ConstBits - Pass1Bits)
      }
      c += 1
    }
    // pass 2: rows, with final descale + level shift + clamp
    var r = 0
    while (r < 8) {
      val p = r * 8
      val z2 = ws(p + 2).toLong; val z3 = ws(p + 6).toLong
      var z1 = (z2 + z3) * F_0_541196100
      val t2 = z1 + z3 * -F_1_847759065
      val t3 = z1 + z2 * F_0_765366865
      val t0 = (ws(p).toLong + ws(p + 4)) << ConstBits
      val t1 = (ws(p).toLong - ws(p + 4)) << ConstBits
      val t10 = t0 + t3; val t13 = t0 - t3
      val t11 = t1 + t2; val t12 = t1 - t2
      var o0 = ws(p + 7).toLong; var o1 = ws(p + 5).toLong
      var o2 = ws(p + 3).toLong; var o3 = ws(p + 1).toLong
      z1 = o0 + o3; var z2b = o1 + o2
      var z3b = o0 + o2; var z4 = o1 + o3
      val z5 = (z3b + z4) * F_1_175875602
      o0 *= F_0_298631336; o1 *= F_2_053119869
      o2 *= F_3_072711026; o3 *= F_1_501321110
      z1 *= -F_0_899976223; z2b *= -F_2_562915447
      z3b = z3b * -F_1_961570560 + z5
      z4 = z4 * -F_0_390180644 + z5
      o0 += z1 + z3b; o1 += z2b + z4
      o2 += z2b + z3b; o3 += z1 + z4
      val sh = ConstBits + Pass1Bits + 3
      val base = outPos + r * outStride
      def clampStore(i: Int, v: Long): Unit = {
        val s = descale(v, sh) + 128
        out(base + i) = (if (s < 0) 0 else if (s > 255) 255 else s).toByte
      }
      clampStore(0, t10 + o3); clampStore(7, t10 - o3)
      clampStore(1, t11 + o2); clampStore(6, t11 - o2)
      clampStore(2, t12 + o1); clampStore(5, t12 - o1)
      clampStore(3, t13 + o0); clampStore(4, t13 - o0)
      r += 1
    }
  }

  /** Decode to RGBA; null on anything outside the supported subset. */
  def decode(bytes: Array[Byte]): Jpeg = {
    try decodeOrThrow(bytes)
    catch { case _: Throwable => null }
  }

  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)

  private[multimodal] def decodeOrThrow(b: Array[Byte]): Jpeg = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    val quant = new Array[Array[Int]](4)       // natural-order tables
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var pos = 2
    var scanStart = -1
    while (scanStart < 0) {
      if (pos + 4 > b.length) return null
      if ((b(pos) & 0xFF) != 0xFF) return null
      val marker = b(pos + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) { pos += 2 }
      else if (marker == 0xD9) return null       // EOI before any scan
      else {
        val len = u16(b, pos + 2)
        if (len < 2 || pos + 2 + len > b.length) return null
        val d = pos + 4
        marker match {
          case 0xDB =>                           // DQT
            var p = d
            while (p < pos + 2 + len) {
              val pq = (b(p) & 0xF0) >> 4; val tq = b(p) & 0x0F
              if (tq > 3 || pq > 1) return null
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) {
                t(Zigzag(i)) =
                  if (pq == 0) b(p + 1 + i) & 0xFF
                  else u16(b, p + 1 + 2 * i)
                i += 1
              }
              quant(tq) = t
              p += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xC4 =>                           // DHT
            var p = d
            while (p < pos + 2 + len) {
              val tc = (b(p) & 0xF0) >> 4; val th = b(p) & 0x0F
              if (tc > 1 || th > 3) return null
              val counts = Array.tabulate(16)(i => b(p + 1 + i) & 0xFF)
              val n = counts.sum
              if (n > 256) return null
              val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
              val h = new Huff(counts, vals)
              if (tc == 0) dcTabs(th) = h else acTabs(th) = h
              p += 17 + n
            }
          case 0xC0 | 0xC1 =>                    // SOF0/SOF1 baseline
            if (comps != null) return null
            if ((b(d) & 0xFF) != 8) return null  // 8-bit precision only
            height = u16(b, d + 1); width = u16(b, d + 3)
            val nc = b(d + 5) & 0xFF
            if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return null
            comps = Array.fill(nc)(new Component)
            var i = 0
            while (i < nc) {
              val p = d + 6 + 3 * i
              comps(i).id = b(p) & 0xFF
              comps(i).h = (b(p + 1) & 0xF0) >> 4
              comps(i).v = b(p + 1) & 0x0F
              comps(i).tq = b(p + 2) & 0xFF
              if (comps(i).h < 1 || comps(i).h > 4 ||
                  comps(i).v < 1 || comps(i).v > 4 || comps(i).tq > 3)
                return null
              i += 1
            }
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return null                          // progressive/arith/lossless
          case 0xDD =>                           // DRI
            restartInterval = u16(b, d)
          case 0xDA =>                           // SOS
            if (comps == null) return null
            val ns = b(d) & 0xFF
            if (ns != comps.length) return null  // one interleaved scan
            var i = 0
            while (i < ns) {
              val cid = b(d + 1 + 2 * i) & 0xFF
              val comp = comps.find(_.id == cid).getOrElse(return null)
              comp.dcTab = (b(d + 2 + 2 * i) & 0xF0) >> 4
              comp.acTab = b(d + 2 + 2 * i) & 0x0F
              i += 1
            }
            // Ss=0, Se=63, Ah=Al=0 for sequential
            if ((b(d + 1 + 2 * ns) & 0xFF) != 0 ||
                (b(d + 2 + 2 * ns) & 0xFF) != 63 ||
                (b(d + 3 + 2 * ns) & 0xFF) != 0) return null
            scanStart = pos + 2 + len
          case _ => ()                           // APPn/COM/etc: skip
        }
        if (scanStart < 0) pos = pos + 2 + len
      }
    }

    val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { comp =>
      comp.blocksW = mcusX * comp.h
      comp.blocksH = mcusY * comp.v
      val planeBytes = comp.blocksW.toLong * 8 * comp.blocksH * 8
      if (planeBytes > 256L * 1024 * 1024) return null   // blob bomb guard
      comp.plane = new Array[Byte](planeBytes.toInt)
      if (quant(comp.tq) == null) return null
      if (dcTabs(comp.dcTab) == null || acTabs(comp.acTab) == null) return null
    }

    val br = new BitReader(b, scanStart)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var rstCount = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart(rstCount)) return null
        rstCount = (rstCount + 1) % 8
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val qt = quant(comp.tq)
        val dcT = dcTabs(comp.dcTab); val acT = acTabs(comp.acTab)
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            java.util.Arrays.fill(coef, 0)
            val t = decodeHuff(br, dcT)
            if (t == Int.MinValue || t > 15) return null
            val diffBits = br.receive(t)
            if (diffBits == Int.MinValue) return null
            comp.pred += extend(diffBits, t)
            coef(0) = comp.pred * qt(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = decodeHuff(br, acT)
              if (rs == Int.MinValue) return null
              val r = rs >> 4; val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) return null
                val vb = br.receive(s)
                if (vb == Int.MinValue) return null
                coef(Zigzag(k)) = extend(vb, s) * qt(Zigzag(k))
                k += 1
              }
            }
            val blockX = mx * comp.h + bx; val blockY = my * comp.v + by
            idct8x8(coef, comp.plane,
              blockY * 8 * (comp.blocksW * 8) + blockX * 8, comp.blocksW * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // color convert + upsample (sample replication) to RGBA
    val rgba = new Array[Byte](width * height * 4)
    if (comps.length == 1) {
      val c0 = comps(0); val stride = c0.blocksW * 8
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = c0.plane(y * stride + x)
          val p = (y * width + x) * 4
          rgba(p) = g; rgba(p + 1) = g; rgba(p + 2) = g
          rgba(p + 3) = 0xFF.toByte
          x += 1
        }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      val sy = cy.blocksW * 8; val sb = cb.blocksW * 8; val sr = cr.blocksW * 8
      var y = 0
      while (y < height) {
        val yY = y * cy.v / vMax; val yB = y * cb.v / vMax
        val yR = y * cr.v / vMax
        var x = 0
        while (x < width) {
          val lum = cy.plane(yY * sy + x * cy.h / hMax) & 0xFF
          val cbv = (cb.plane(yB * sb + x * cb.h / hMax) & 0xFF) - 128
          val crv = (cr.plane(yR * sr + x * cr.h / hMax) & 0xFF) - 128
          val p = (y * width + x) * 4
          rgba(p) = clamp255(lum + ((91881 * crv + 32768) >> 16))
          rgba(p + 1) =
            clamp255(lum + ((-22554 * cbv - 46802 * crv + 32768) >> 16))
          rgba(p + 2) = clamp255(lum + ((116130 * cbv + 32768) >> 16))
          rgba(p + 3) = 0xFF.toByte
          x += 1
        }
        y += 1
      }
    }
    Jpeg(width, height, rgba)
  }

  private def clamp255(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  def channelMeansX100(img: Jpeg): (Long, Long, Long, Long) = {
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

  /** Grid color-layout features from decoded JPEG pixels — the
    * [[PngCodec.gridFeatures]] contract over the JPEG decode path.
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

  /** Nearest-neighbor resize for JPEG bytes. The resized image is
    * re-encoded LOSSLESSLY as PNG (the library's canonical raster
    * container) — re-encoding through lossy JPEG would silently
    * degrade every pass through the resize stage. Null in → null out.
    */
  def resizeToPng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = decode(bytes)
    if (img == null || w <= 0 || h <= 0) return null
    val out = new Array[Byte](w * h * 4)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val sp = (sy * img.width + sx) * 4
        val dp = (y * w + x) * 4
        out(dp) = img.rgba(sp); out(dp + 1) = img.rgba(sp + 1)
        out(dp + 2) = img.rgba(sp + 2); out(dp + 3) = img.rgba(sp + 3)
        x += 1
      }
      y += 1
    }
    PngCodec.encode(w, h, out, _ => 0)
  }

  // ---------------------------------------------------------------
  // Flat-block test encoder (the q171 fixture generator)
  // ---------------------------------------------------------------

  /** Bit writer with 0xFF byte stuffing for the entropy segment. */
  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = {
      while (n != 0) put(1, 1)   // pad with 1s per the spec
    }
  }

  // Minimal DC Huffman table used by the test encoder: category i
  // (0..11) encoded in canonical order. Counts: one code per length
  // 2,3,3,3,3,3,4,5,6,7,8,9 — the spec's K.3.1 luminance DC layout.
  private val TestDcCounts =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val TestDcVals = Array.tabulate(12)(_.toByte)
  // Minimal AC table: only EOB (run=0,size=0 → symbol 0x00) is ever
  // emitted by the flat-block encoder, but the table must be valid:
  // one 2-bit code.
  private val TestAcCounts =
    Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val TestAcVals = Array[Byte](0x00)

  private def dcCode(cat: Int): (Int, Int) = {
    // canonical codes for TestDcCounts: len2: cat0; len3: cat1..5;
    // len4: cat6; len5: cat7; ... (the spec's Annex K.3.1 shape)
    val lens = Array(2, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9)
    var code = 0; var prevLen = lens(0)
    var i = 0
    var c = 0
    while (i <= cat) {
      if (i == 0) { code = 0; prevLen = lens(0) }
      else {
        code += 1
        if (lens(i) > prevLen) { code <<= (lens(i) - prevLen); prevLen = lens(i) }
      }
      c = code
      i += 1
    }
    (c, lens(cat))
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  private def writeSeg(out: ByteArrayOutputStream, marker: Int,
                       body: Array[Int]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    body.foreach(v => out.write(v & 0xFF))
  }

  /** Encode a blockwise-flat YCbCr 4:4:4 baseline JPEG: per 8×8 block
    * the three components are CONSTANT (only DC coefficients, all AC
    * zero), every quantization entry is 16 and sample values are even,
    * so quantization is exact and decode reproduces every input sample
    * bit-for-bit — lossless through a lossy container, which is what
    * lets the DuckDB twin certify the whole marker/Huffman/IDCT/color
    * pipeline from a closed-form formula. `yB`/`cbB`/`crB` give the
    * per-block component values in block row-major order.
    */
  def encodeFlat(width: Int, height: Int,
                 yB: (Int, Int) => Int, cbB: (Int, Int) => Int,
                 crB: (Int, Int) => Int,
                 restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0)
    val out = new ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8)             // SOI
    // DQT: table 0, all 16s (zigzag order irrelevant for a constant)
    writeSeg(out, 0xDB, Array(0x00) ++ Array.fill(64)(16))
    if (restartInterval > 0)
      writeSeg(out, 0xDD,
        Array((restartInterval >> 8) & 0xFF, restartInterval & 0xFF))
    // SOF0: 8-bit, 3 components, 1x1 sampling, all qtable 0
    writeSeg(out, 0xC0, Array(8,
      (height >> 8) & 0xFF, height & 0xFF,
      (width >> 8) & 0xFF, width & 0xFF, 3,
      1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    // DHT: DC table 0 + AC table 0
    writeSeg(out, 0xC4,
      Array(0x00) ++ TestDcCounts ++ TestDcVals.map(_.toInt) ++
        Array(0x10) ++ TestAcCounts ++ TestAcVals.map(_.toInt))
    // SOS: 3 components, DC/AC table 0, Ss=0 Se=63 Ah/Al=0
    writeSeg(out, 0xDA, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val bw = new BitWriter(out)
    val bxN = (width + 7) / 8; val byN = (height + 7) / 8
    val pred = Array(0, 0, 0)
    var mcu = 0
    var rstN = 0
    var by = 0
    while (by < byN) {
      var bx = 0
      while (bx < bxN) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          out.write(0xFF); out.write(0xD0 + rstN)
          rstN = (rstN + 1) % 8
          pred(0) = 0; pred(1) = 0; pred(2) = 0
        }
        var ci = 0
        while (ci < 3) {
          val v = ci match {
            case 0 => yB(bx, by); case 1 => cbB(bx, by); case _ => crB(bx, by)
          }
          require(v >= 0 && v <= 255 && v % 2 == 0,
            s"flat encoder needs even samples in 0..254, got $v")
          val dc = (v - 128) / 2                 // 8(v-128)/q00, q00=16
          val diff = dc - pred(ci); pred(ci) = dc
          val cat = category(diff)
          val (code, len) = dcCode(cat)
          bw.put(code, len)
          if (cat > 0)
            bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
          bw.put(0, 2)                           // AC: EOB (code 00, 2 bits)
          ci += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9)             // EOI
    out.toByteArray
  }

  /** Deterministic flat-block test JPEG — q171's fixture. Per block
    * (bx, by): Y = ((id·7 + 3bx + 5by) % 120)·2 + 4,
    * Cb = 128 + ((id·11 + bx + 2by) % 16)·2,
    * Cr = 128 + ((id·13 + 2bx + by) % 16)·2 — even values, chroma
    * offsets non-negative, so the twin's fixed-point YCbCr→RGB is a
    * pure closed form.
    */
  def testJpeg(id: Long, w: Int, h: Int): Array[Byte] =
    encodeFlat(w, h,
      (bx, by) => (((id * 7 + 3L * bx + 5L * by) % 120) * 2 + 4).toInt,
      (bx, by) => (128 + ((id * 11 + bx + 2L * by) % 16) * 2).toInt,
      (bx, by) => (128 + ((id * 13 + 2L * bx + by) % 16) * 2).toInt)
}
