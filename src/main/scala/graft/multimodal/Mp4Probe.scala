package graft.multimodal

/** Minimal MP4 / ISO-BMFF (ISO 14496-12) container probe — the video
  * analog of [[MediaHeaders]]'s PNG/GIF/BMP/JPEG/RIFF walkers: a pure
  * byte walk over the box tree (no codec work), extracting the
  * metadata a 100 TB video-corpus inventory stage needs before any
  * decode is attempted: brand, movie timescale/duration, and per
  * track its handler (vide/soun/…), sample-entry codec fourcc and
  * pixel dimensions. Boxes are (u32 size)(4cc type)[u64 largesize if
  * size==1]; container boxes (moov/trak/mdia/minf/stbl) nest, leaf
  * boxes are parsed by fixed layout with version-0 AND version-1
  * (64-bit time) forms of mvhd/tkhd/mdhd supported. Reference:
  * public ISO base-media spec structure as implemented by every
  * open-source demuxer (e.g. mp4box.js, libavformat isom.c — layout
  * only, no code).
  *
  * Subset policy (documented, the PNG discipline): malformed sizes,
  * truncated boxes, or a missing moov return null — a probe stage
  * must never throw on corpus garbage. Frame/sample decode is out of
  * scope here by design; [[Multimodal]]'s sample stage remains the
  * seam for a real decoder.
  *
  * Scale shape: map-only, O(bytes) per blob, no shuffle.
  */
object Mp4Probe {

  final case class Track(trackId: Long, handler: String, codec: String,
                         width: Long, height: Long, durationUnits: Long)
  final case class Movie(majorBrand: String, minorVersion: Long,
                         timescale: Long, durationUnits: Long,
                         tracks: Seq[Track]) {
    def durationMs: Long =
      if (timescale <= 0) -1L else 1000L * durationUnits / timescale
  }

  private def u16(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 8) | (b(o + 1) & 0xFFL)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b.slice(o, o + 4), java.nio.charset.StandardCharsets.US_ASCII)

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Probe `bytes` as an MP4; null when it is not a well-formed
    * ISO-BMFF stream with an ftyp and a moov/mvhd.
    */
  def probe(bytes: Array[Byte]): Movie = {
    if (bytes == null || bytes.length < 16) return null
    var majorBrand: String = null
    var minorVersion = -1L
    var timescale = -1L
    var duration = -1L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]
    // per-trak accumulation state
    var tkId = -1L; var tkDur = -1L; var tkW = -1L; var tkH = -1L
    var handler: String = null; var codec: String = null
    var bad = false

    def flushTrack(): Unit = {
      if (tkId >= 0) tracks += Track(tkId,
        if (handler == null) "" else handler,
        if (codec == null) "" else codec,
        math.max(tkW, 0), math.max(tkH, 0), math.max(tkDur, 0))
      tkId = -1; tkDur = -1; tkW = -1; tkH = -1
      handler = null; codec = null
    }

    def walk(from: Int, until: Int): Unit = {
      var o = from
      while (o + 8 <= until && !bad) {
        var size = u32(bytes, o)
        val typ = fourcc(bytes, o + 4)
        var hdr = 8
        if (size == 1) {
          if (o + 16 > until) { bad = true; return }
          size = u64(bytes, o + 8); hdr = 16
        } else if (size == 0) size = (until - o).toLong // to end of file
        if (size < hdr || o + size > until) { bad = true; return }
        val body = o + hdr
        val end = o + size.toInt
        typ match {
          case "ftyp" if size >= hdr + 8 =>
            majorBrand = fourcc(bytes, body)
            minorVersion = u32(bytes, body + 4)
          case "mvhd" if size >= hdr + 4 =>
            val v = bytes(body) & 0xFF
            if (v == 1 && size >= hdr + 32) {
              timescale = u32(bytes, body + 20)
              duration = u64(bytes, body + 24)
            } else if (v == 0 && size >= hdr + 20) {
              timescale = u32(bytes, body + 12)
              duration = u32(bytes, body + 16)
            }
          case "trak" =>
            flushTrack()
            walk(body, end)
            flushTrack()
          case "tkhd" if size >= hdr + 4 =>
            val v = bytes(body) & 0xFF
            // v0: ver/flags 4, times 2×4, id 4, res 4, dur 4 → id@12,
            // dur@20, width/height 16.16 at body+76/80; v1: 64-bit
            // times/duration shift id to 20, dims to 88/92
            if (v == 0 && size >= hdr + 84) {
              tkId = u32(bytes, body + 12)
              tkDur = u32(bytes, body + 20)
              tkW = u32(bytes, body + 76) >> 16
              tkH = u32(bytes, body + 80) >> 16
            } else if (v == 1 && size >= hdr + 96) {
              tkId = u32(bytes, body + 20)
              tkDur = u64(bytes, body + 28)
              tkW = u32(bytes, body + 88) >> 16
              tkH = u32(bytes, body + 92) >> 16
            }
          case "hdlr" if size >= hdr + 12 =>
            handler = fourcc(bytes, body + 8)
          case "stsd" if size >= hdr + 16 =>
            // ver/flags 4, entry_count 4, first sample entry:
            // (u32 size)(4cc codec)
            if (u32(bytes, body + 4) >= 1) codec = fourcc(bytes, body + 12)
          case t if Containers.contains(t) =>
            walk(body, end)
          case _ => () // skip unknown boxes
        }
        o = end
      }
      if (o != until) bad = true
    }

    walk(0, bytes.length)
    flushTrack()
    if (bad || majorBrand == null || timescale <= 0) null
    else Movie(majorBrand, minorVersion, timescale, duration, tracks.toSeq)
  }

  private val VideoCodecs = Vector("avc1", "hev1", "vp09", "av01")
  private val AudioCodecs = Vector("mp4a", "opus")
  private val Brands = Vector("isom", "mp42")

  /** Deterministic synthetic MP4 whose every probed field is a
    * CLOSED-FORM function of `id` — the q192 CBOR discipline: the
    * DuckDB twin restates brand/timescale/duration/tracks/dims from
    * the same formulas, so a hash match certifies the whole box walk
    * (sizes, nesting, fixed-point dims, version layouts). Track 1 is
    * always video; ids ≡ 1 (mod 3) add audio; ≡ 2 add audio + text.
    * Even ids use version-1 (64-bit) mvhd/tkhd so both layouts stay
    * covered on the oracle path.
    */
  def testAsset(id: Long): Array[Byte] = {
    val ts = 1000L + (id % 9) * 600
    val dur = (id % 997 + 1) * 100
    val nTracks = 1 + (id % 3).toInt
    val v1 = id % 2 == 0
    val out = new java.io.ByteArrayOutputStream()
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length)
      b.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.put(body); b.array()
    }
    def be32(x: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(x.toInt).array()
    def be64(x: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(x).array()
    def cat(xs: Array[Byte]*): Array[Byte] = xs.reduce(_ ++ _)

    val brand = Brands((id % 2).toInt)
    out.write(box("ftyp", cat(
      brand.getBytes("US-ASCII"), be32(id % 100),
      brand.getBytes("US-ASCII"))))

    val mvhd =
      if (v1) box("mvhd", cat(Array[Byte](1, 0, 0, 0),
        be64(0), be64(0), be32(ts), be64(dur),
        be32(0x00010000L), Array[Byte](1, 0), new Array[Byte](10),
        new Array[Byte](36), new Array[Byte](24), be32(nTracks + 1L)))
      else box("mvhd", cat(Array[Byte](0, 0, 0, 0),
        be32(0), be32(0), be32(ts), be32(dur),
        be32(0x00010000L), Array[Byte](1, 0), new Array[Byte](10),
        new Array[Byte](36), new Array[Byte](24), be32(nTracks + 1L)))

    val handlers = Seq("vide", "soun", "text").take(nTracks)
    val traks = handlers.zipWithIndex.map { case (h, i) =>
      val trackId = i + 1L
      val (w, hgt) =
        if (h == "vide") (320L + 16 * (id % 40), 240L + 16 * (id % 30))
        else (0L, 0L)
      val codec = h match {
        case "vide" => VideoCodecs((id % 4).toInt)
        case "soun" => AudioCodecs((id % 2).toInt)
        case _ => "tx3g"
      }
      val tkhd =
        if (v1) box("tkhd", cat(Array[Byte](1, 0, 0, 7),
          be64(0), be64(0), be32(trackId), be32(0), be64(dur),
          new Array[Byte](8), new Array[Byte](8), new Array[Byte](36),
          be32(w << 16), be32(hgt << 16)))
        else box("tkhd", cat(Array[Byte](0, 0, 0, 7),
          be32(0), be32(0), be32(trackId), be32(0), be32(dur),
          new Array[Byte](8), new Array[Byte](8), new Array[Byte](36),
          be32(w << 16), be32(hgt << 16)))
      val mdhd = box("mdhd", cat(Array[Byte](0, 0, 0, 0),
        be32(0), be32(0), be32(ts), be32(dur),
        Array[Byte](0x55, 0xC4.toByte), Array[Byte](0, 0)))
      val hdlr = box("hdlr", cat(be32(0), be32(0),
        h.getBytes("US-ASCII"), new Array[Byte](12), Array[Byte](0)))
      val entry = box(codec, new Array[Byte](8)) // 6 reserved + dri
      val stsd = box("stsd", cat(be32(0), be32(1), entry))
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", cat(mdhd, hdlr, minf))
      box("trak", cat(tkhd, mdia))
    }
    out.write(box("moov", cat((mvhd +: traks): _*)))
    out.toByteArray
  }
}
