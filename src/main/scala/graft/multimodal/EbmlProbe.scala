package graft.multimodal

/** Minimal Matroska / WebM (EBML, RFC 8794) container probe — the
  * second half of the web-video inventory beside [[Mp4Probe]]: where
  * ISO-BMFF is fixed-layout boxes, EBML is variable-length integers
  * everywhere — (vint id)(vint size)(payload) — so this is a genuinely
  * different byte walk, not a re-skin. Extracts the DocType
  * (webm/matroska), the segment timestamp scale and duration, and per
  * track its number, type (video/audio/subtitle), codec id and pixel
  * dimensions. Element ids and semantics from the PUBLIC Matroska
  * spec (RFC 8794 + matroska.org element registry).
  *
  * Subset policy: malformed vints, truncated elements, or a missing
  * EBML header/Segment/Info return null — corpus garbage must never
  * throw. Duration is an EBML float (the one non-integer field in
  * the walk); it is floored to ms AFTER the timestamp-scale multiply
  * so integer-valued durations — every synthetic asset — stay exact.
  *
  * Scale shape: map-only, O(bytes) per blob, no shuffle.
  */
object EbmlProbe {

  final case class Track(number: Long, trackType: String, codec: String,
                         width: Long, height: Long)
  final case class Movie(docType: String, timestampScaleNs: Long,
                         durationMs: Long, tracks: Seq[Track])

  // element ids (class-encoded, as they appear on the wire)
  private val EbmlHeader = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackNumber = 0xD7L
  private val TrackType = 0x83L
  private val CodecId = 0x86L
  private val Video = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL

  /** Parse a vint at `o`; returns (value, widthBytes) or null.
    * `keepMarker` = true for element IDs (the marker bit is part of
    * the id), false for sizes (marker stripped).
    */
  private def vint(b: Array[Byte], o: Int, keepMarker: Boolean)
      : (Long, Int) = {
    if (o >= b.length) return null
    val first = b(o) & 0xFF
    if (first == 0) return null
    val w = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (w < 1 || w > 8 || o + w > b.length) return null
    var v = if (keepMarker) first.toLong
      else first.toLong & ((1 << (8 - w)) - 1)
    var i = 1
    while (i < w) { v = (v << 8) | (b(o + i) & 0xFFL); i += 1 }
    (v, w)
  }

  private def uintAt(b: Array[Byte], o: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v = (v << 8) | (b(o + i) & 0xFFL); i += 1 }
    v
  }

  private def floatAt(b: Array[Byte], o: Int, len: Int): Double =
    len match {
      case 4 => java.lang.Float.intBitsToFloat(uintAt(b, o, 4).toInt)
        .toDouble
      case 8 => java.lang.Double.longBitsToDouble(uintAt(b, o, 8))
      case _ => Double.NaN
    }

  def probe(bytes: Array[Byte]): Movie = {
    if (bytes == null || bytes.length < 8) return null
    var docType: String = null
    var tsScale = 1000000L // spec default: 1 ms per tick
    var durationTicks = Double.NaN
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]
    var bad = false

    // walk one level of elements in [from, until); `handler` decides
    // per-element whether to descend, read a value, or skip
    def walk(from: Int, until: Int)(handler: (Long, Int, Int) => Unit)
        : Unit = {
      var o = from
      while (o < until && !bad) {
        val id = vint(bytes, o, keepMarker = true)
        if (id == null) { bad = true; return }
        val sz = vint(bytes, o + id._2, keepMarker = false)
        if (sz == null) { bad = true; return }
        val body = o + id._2 + sz._2
        // "unknown size" (all value bits set) → to end of scope; only
        // tolerated for the top-level Segment, the streaming form
        val unknown = sz._1 == (1L << (7 * sz._2)) - 1
        val len = if (unknown) (until - body).toLong else sz._1
        if (len < 0 || body + len > until) { bad = true; return }
        handler(id._1, body, (body + len).toInt)
        o = (body + len).toInt
      }
      if (o != until) bad = true
    }

    def parseTrackEntry(from: Int, until: Int): Unit = {
      var num = -1L; var typ = -1L; var codec: String = null
      var w = 0L; var h = 0L
      walk(from, until) { (id, b, e) =>
        id match {
          case TrackNumber => num = uintAt(bytes, b, e - b)
          case TrackType => typ = uintAt(bytes, b, e - b)
          case CodecId => codec = new String(bytes.slice(b, e),
            java.nio.charset.StandardCharsets.US_ASCII)
          case Video => walk(b, e) { (vid, vb, ve) =>
            vid match {
              case PixelWidth => w = uintAt(bytes, vb, ve - vb)
              case PixelHeight => h = uintAt(bytes, vb, ve - vb)
              case _ => ()
            }
          }
          case _ => ()
        }
      }
      if (num >= 0) tracks += Track(num,
        typ match { case 1 => "video"; case 2 => "audio"
          case 17 => "subtitle"; case t => s"type$t" },
        if (codec == null) "" else codec, w, h)
    }

    walk(0, bytes.length) { (id, b, e) =>
      id match {
        case EbmlHeader => walk(b, e) { (hid, hb, he) =>
          if (hid == DocType) docType = new String(
            bytes.slice(hb, he).takeWhile(_ != 0),
            java.nio.charset.StandardCharsets.US_ASCII)
        }
        case Segment => walk(b, e) { (sid, sb, se) =>
          sid match {
            case Info => walk(sb, se) { (iid, ib, ie) =>
              iid match {
                case TimestampScale => tsScale = uintAt(bytes, ib, ie - ib)
                case Duration => durationTicks = floatAt(bytes, ib, ie - ib)
                case _ => ()
              }
            }
            case Tracks => walk(sb, se) { (tid, tb, te) =>
              if (tid == TrackEntry) parseTrackEntry(tb, te)
            }
            case _ => ()
          }
        }
        case _ => ()
      }
    }
    if (bad || docType == null || tsScale <= 0) return null
    val durMs = if (durationTicks.isNaN) -1L
      else math.floor(durationTicks * tsScale / 1e6).toLong
    Movie(docType, tsScale, durMs, tracks.toSeq)
  }

  private val VideoCodecs = Vector("V_VP8", "V_VP9", "V_AV1")
  private val AudioCodecs = Vector("A_OPUS", "A_VORBIS")

  /** Deterministic synthetic WebM whose probed fields are closed-form
    * functions of `id` (the q192/q339 discipline). Track 1 is always
    * video; ids ≡ 1 (mod 3) add audio; ≡ 2 add audio + subtitle.
    * Durations are integer-valued float64 ticks at the default 1 ms
    * scale, so the floor-to-ms is exact on both engines.
    */
  def testAsset(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def idBytes(x: Long): Array[Byte] = {
      // element ids are written verbatim at their class width
      val w = if (x <= 0xFFL) 1 else if (x <= 0xFFFFL) 2
        else if (x <= 0xFFFFFFL) 3 else 4
      (w - 1 to 0 by -1).map(i => ((x >> (8 * i)) & 0xFF).toByte).toArray
    }
    def sizeBytes(n: Long): Array[Byte] = {
      require(n < (1L << 21) - 1, "test assets stay under 2-MiB bodies")
      // 3-byte size everywhere: marker 0x20 in the first byte
      Array((0x20 | (n >> 16)).toByte, ((n >> 8) & 0xFF).toByte,
        (n & 0xFF).toByte)
    }
    def el(eid: Long, body: Array[Byte]): Array[Byte] =
      idBytes(eid) ++ sizeBytes(body.length) ++ body
    def uintEl(eid: Long, v: Long, len: Int): Array[Byte] =
      el(eid, (len - 1 to 0 by -1).map(i =>
        ((v >> (8 * i)) & 0xFF).toByte).toArray)
    def cat(xs: Array[Byte]*): Array[Byte] =
      xs.foldLeft(Array.emptyByteArray)(_ ++ _)

    val docType = if (id % 2 == 0) "webm" else "matroska"
    out.write(el(EbmlHeader,
      el(DocType, docType.getBytes("US-ASCII"))))

    val durTicks = (id % 997 + 1) * 250L // integer ms at default scale
    val durBits = java.lang.Double.doubleToLongBits(durTicks.toDouble)
    val info = el(Info, cat(
      uintEl(TimestampScale, 1000000L, 3),
      el(Duration, (7 to 0 by -1).map(i =>
        ((durBits >> (8 * i)) & 0xFF).toByte).toArray)))

    val nTracks = 1 + (id % 3).toInt
    val entries = (1 to nTracks).map { tno =>
      val (typ, codec, w, h) = tno match {
        case 1 => (1L, VideoCodecs((id % 3).toInt),
          320L + 16 * (id % 40), 240L + 16 * (id % 30))
        case 2 => (2L, AudioCodecs((id % 2).toInt), 0L, 0L)
        case _ => (17L, "S_TEXT/UTF8", 0L, 0L)
      }
      val video = if (typ == 1L) el(Video, cat(
        uintEl(PixelWidth, w, 2), uintEl(PixelHeight, h, 2)))
      else Array.emptyByteArray
      el(TrackEntry, cat(
        uintEl(TrackNumber, tno.toLong, 1),
        uintEl(TrackType, typ, 1),
        el(CodecId, codec.getBytes("US-ASCII")),
        video))
    }
    out.write(el(Segment, cat(info, el(Tracks, cat(entries: _*)))))
    out.toByteArray
  }
}
