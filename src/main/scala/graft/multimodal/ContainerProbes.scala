package graft.multimodal

/** TIFF and AVI container probes — the remaining inventory walkers
  * beside [[MediaHeaders]] (PNG/GIF/BMP/JPEG/WAV), [[Mp4Probe]],
  * [[EbmlProbe]] and [[AudioProbes]] (FLAC/MP3/Ogg): pure byte walks
  * over the public layouts (TIFF 6.0 IFD entries under BOTH byte
  * orders; RIFF-AVI hdrl/avih/strl/strh), extracting what a 100 TB
  * corpus needs before any decode. Malformed input returns null,
  * never throws (the [[Mp4Probe]] subset policy).
  *
  * Scale shape: map-only, O(bytes) per blob, no shuffle.
  *
  * Execution seam (why the q339–q349 catalog entries wrap these in
  * per-row scalar `udf`s while ImageDims is a codegen'd Catalyst
  * expression): each probe is a stateful TOTAL parser — branchy
  * chunk walks with data-dependent offsets, early-exit null paths
  * and per-call local state — with no vectorizable or expression-
  * template form; hand-writing `doGenCode` for it would inline a
  * page of opaque Java into the generated class for zero gain (the
  * cost is the walk itself, not the call). The per-row lambda call
  * amortizes over kilobyte blobs (thousands of byte reads per
  * invocation), the surrounding plan stays whole-stage-codegen on
  * both sides of the call boundary, and the struct return feeds
  * column pruning normally. `mapPartitions` would buy only the same
  * per-row JVM call with worse composability (loses the Column
  * seam). ImageDims earns its expression form because it reads a
  * FIXED header prefix — a few branchless loads that codegen can
  * actually fuse; these walkers do not.
  */
object ContainerProbes {

  // ------------------------------------------------------------------
  // TIFF
  // ------------------------------------------------------------------

  /** First-IFD summary of a TIFF: dimensions, first bits-per-sample,
    * compression, photometric interpretation, samples per pixel,
    * orientation, entry count — plus the page (IFD-chain) count and
    * the byte order.
    */
  final case class TiffInfo(byteOrder: String, width: Long, height: Long,
                            bitsPerSample: Long, compression: Long,
                            photometric: Long, samplesPerPixel: Long,
                            orientation: Long, nEntries: Long,
                            nIfds: Long)

  /** Probe `bytes` as TIFF 6.0: "II"/"MM" + magic 42, IFD chain of
    * 12-byte entries (tag, type, count, inline value or offset) under
    * the declared byte order. SHORT(3) and LONG(4) single values read
    * inline; a count-&gt;1 BitsPerSample follows its offset to the
    * first element. Null on bad magic, a truncated IFD, or an IFD
    * offset outside the buffer; the IFD chain is bounded at 64 pages
    * (cycle guard — corpus garbage must not loop).
    */
  def probeTiff(bytes: Array[Byte]): TiffInfo = {
    if (bytes == null || bytes.length < 8) return null
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) return null
    def u16(o: Int): Long =
      if (o < 0 || o + 2 > bytes.length) -1
      else if (le) (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8)
      else ((bytes(o) & 0xFFL) << 8) | (bytes(o + 1) & 0xFFL)
    def u32(o: Int): Long =
      if (o < 0 || o + 4 > bytes.length) -1
      else if (le) u16(o) | (u16(o + 2) << 16)
      else (u16(o) << 16) | u16(o + 2)
    if (u16(2) != 42) return null
    var ifdOff = u32(4)
    var width = -1L; var height = -1L; var bps = 1L
    var compression = 1L; var photometric = -1L; var spp = 1L
    var orientation = 1L; var nEntries = -1L
    var nIfds = 0L
    var first = true
    while (ifdOff != 0 && nIfds < 64) {
      if (ifdOff < 8 || ifdOff + 2 > bytes.length) return null
      val n = u16(ifdOff.toInt)
      if (n < 0 || ifdOff + 2 + 12 * n + 4 > bytes.length) return null
      if (first) {
        nEntries = n
        var i = 0
        while (i < n) {
          val e = (ifdOff + 2 + 12 * i).toInt
          val tag = u16(e)
          val typ = u16(e + 2)
          val cnt = u32(e + 4)
          // inline SHORT/LONG single value; count>1 follows the offset
          def value(): Long =
            if (cnt == 1 && typ == 3) u16(e + 8)
            else if (cnt == 1 && typ == 4) u32(e + 8)
            else if (cnt > 1 && typ == 3) u16(u32(e + 8).toInt)
            else if (cnt > 1 && typ == 4) u32(u32(e + 8).toInt)
            else -1
          tag match {
            case 256 => width = value()
            case 257 => height = value()
            case 258 => bps = value()
            case 259 => compression = value()
            case 262 => photometric = value()
            case 274 => orientation = value()
            case 277 => spp = value()
            case _ => ()
          }
          i += 1
        }
      }
      first = false
      nIfds += 1
      ifdOff = u32((ifdOff + 2 + 12 * n).toInt)
    }
    if (nIfds < 1 || width < 0 || height < 0) null
    else TiffInfo(if (le) "II" else "MM", width, height, bps,
      compression, photometric, spp, orientation, nEntries, nIfds)
  }

  /** Deterministic synthetic TIFF with closed-form probed fields
    * (the [[Mp4Probe.testAsset]] discipline): little-endian on even
    * ids, big-endian on odd; width 100+id%400, height 80+id%300;
    * (bits, samples, photometric) = (8,1,1) / (16,1,1) / (8,3,2) by
    * id%3 — the multi-sample arm stores BitsPerSample as a count-3
    * SHORT array behind an offset, so the offset-follow path stays
    * on the oracle path; compression 1/5/7 by id%3 (mirrors the
    * sample arms), orientation 1+id%8; ids ≡ 0 (mod 4) append a
    * half-size thumbnail IFD (n_ifds 2).
    */
  def tiffTestAsset(id: Long): Array[Byte] = {
    val le = id % 2 == 0
    val width = 100 + id % 400
    val height = 80 + id % 300
    val arm = (id % 3).toInt
    val bits = Seq(8L, 16L, 8L)(arm)
    val spp = Seq(1L, 1L, 3L)(arm)
    val photometric = Seq(1L, 1L, 2L)(arm)
    val compression = Seq(1L, 5L, 7L)(arm)
    val orientation = 1 + id % 8
    val twoIfds = id % 4 == 0
    val bo = java.nio.ByteBuffer.allocate(4096).order(
      if (le) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    bo.put((if (le) "II" else "MM").getBytes("US-ASCII"))
    bo.putShort(42)
    bo.putInt(8) // first IFD right after the header
    def entry(tag: Int, typ: Int, cnt: Int, v: Long): Unit = {
      bo.putShort(tag.toShort); bo.putShort(typ.toShort); bo.putInt(cnt)
      if (typ == 3 && cnt == 1) { bo.putShort(v.toShort); bo.putShort(0) }
      else bo.putInt(v.toInt)
    }
    // IFD 1: 7 entries; the count-3 BitsPerSample array (arm 2) lives
    // right after the IFD's next pointer
    val n1 = 7
    val ifd1End = 8 + 2 + 12 * n1 + 4
    val bpsArrOff = ifd1End
    val ifd2Off = if (twoIfds) ifd1End + (if (spp > 1) 6 else 0) else 0
    bo.putShort(n1.toShort)
    entry(256, 4, 1, width)
    entry(257, 4, 1, height)
    if (spp > 1) entry(258, 3, 3, bpsArrOff)
    else entry(258, 3, 1, bits)
    entry(259, 3, 1, compression)
    entry(262, 3, 1, photometric)
    entry(274, 3, 1, orientation)
    entry(277, 3, 1, spp)
    bo.putInt(ifd2Off)
    if (spp > 1) { bo.putShort(bits.toShort); bo.putShort(bits.toShort)
      bo.putShort(bits.toShort) }
    if (twoIfds) {
      bo.putShort(2)
      entry(256, 4, 1, width / 2)
      entry(257, 4, 1, height / 2)
      bo.putInt(0)
    }
    java.util.Arrays.copyOf(bo.array(), bo.position())
  }

  // ------------------------------------------------------------------
  // AVI
  // ------------------------------------------------------------------

  /** RIFF-AVI summary: main-header timing/dims/stream count, the
    * first video stream's codec fourcc, audio presence, and the exact
    * integral duration `usPerFrame·totalFrames div 1000`.
    */
  final case class AviInfo(usPerFrame: Long, totalFrames: Long,
                           width: Long, height: Long, nStreams: Long,
                           videoCodec: String, hasAudio: Boolean) {
    def durationMs: Long = usPerFrame * totalFrames / 1000
    /** DERIVED frame rate, not a nominal label: the container stores
      * only microseconds-per-frame, so fps_milli is the truncated
      * integral 1e9/usPerFrame — 41666 µs reads 24000, 40000 reads
      * 25000, 33333 reads 30000, but the 60 fps arm (16666 µs) reads
      * 60002 because no integer µs value truncates to exactly 60000
      * (16667 µs would read 59998). The oracle twin states the same
      * integral divide, so the off-nominal value is deterministic
      * and hash-stable on both engines.
      */
    def fpsMilli: Long =
      if (usPerFrame <= 0) -1L else 1000000000L / usPerFrame
  }

  private def le16(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    le16(b, o) | (le16(b, o + 2) << 16)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b.slice(o, o + 4), java.nio.charset.StandardCharsets.US_ASCII)

  /** Probe `bytes` as RIFF-AVI: 'RIFF' size 'AVI ', then a chunk walk
    * where LIST chunks ('hdrl', 'strl') nest — 'avih' yields
    * usPerFrame/totalFrames/streams/width/height, each 'strl's 'strh'
    * yields fccType ('vids'/'auds') and the video codec fourcc. Null
    * on bad magic, a chunk overrunning the buffer, or a missing avih.
    */
  def probeAvi(bytes: Array[Byte]): AviInfo = {
    if (bytes == null || bytes.length < 12) return null
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ")
      return null
    var usPerFrame = -1L; var totalFrames = -1L
    var width = -1L; var height = -1L; var nStreams = -1L
    var videoCodec = ""; var hasAudio = false
    var bad = false
    def walk(from: Int, until: Int): Unit = {
      var o = from
      while (o + 8 <= until && !bad) {
        val id = fourcc(bytes, o)
        val sz = le32(bytes, o + 4)
        val body = o + 8
        if (sz < 0 || body + sz > until) { bad = true; return }
        id match {
          case "LIST" if sz >= 4 =>
            walk(body + 4, body + sz.toInt) // skip the list type fourcc
          case "avih" if sz >= 40 =>
            usPerFrame = le32(bytes, body)
            totalFrames = le32(bytes, body + 16)
            nStreams = le32(bytes, body + 24)
            width = le32(bytes, body + 32)
            height = le32(bytes, body + 36)
          case "strh" if sz >= 8 =>
            val t = fourcc(bytes, body)
            if (t == "vids" && videoCodec.isEmpty)
              videoCodec = fourcc(bytes, body + 4)
            if (t == "auds") hasAudio = true
          case _ => ()
        }
        o = body + sz.toInt + (sz.toInt & 1) // chunks pad to even
      }
      if (o != until) bad = true
    }
    walk(12, bytes.length)
    if (bad || usPerFrame < 0 || width < 0) null
    else AviInfo(usPerFrame, totalFrames, width, height, nStreams,
      videoCodec, hasAudio)
  }

  // ------------------------------------------------------------------
  // Format sniffing + unified inventory dispatch
  // ------------------------------------------------------------------

  /** Magic-byte format sniff — the dispatcher a 100 TB mixed-media
    * corpus runs FIRST: one cheap prefix test routes each blob to the
    * right container walker (no probe ever parses a foreign format).
    * Returns the format tag or null for unrecognized bytes. Order
    * matters only for RIFF (WAVE vs AVI share the outer magic).
    */
  def sniffFormat(b: Array[Byte]): String = {
    if (b == null || b.length < 12) return null
    def at(o: Int, s: String): Boolean =
      s.zipWithIndex.forall { case (c, i) => b(o + i) == c.toByte }
    if (at(0, "fLaC")) "flac"
    else if (at(0, "ID3")) "mp3"
    else if (at(0, "OggS")) "ogg"
    else if (at(4, "ftyp")) "mp4"
    else if ((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) "webm"
    else if (at(0, "II") && b(2) == 42 && b(3) == 0) "tiff"
    else if (at(0, "MM") && b(2) == 0 && b(3) == 42) "tiff"
    else if (at(0, "RIFF") && at(8, "AVI ")) "avi"
    else if (at(0, "RIFF") && at(8, "WAVE")) "wav"
    else null
  }

  /** Unified inventory record: sniffed format + the one field every
    * container family shares (playback duration; -1 for still
    * images / unrecognized). The per-format detail stays with the
    * dedicated probes — this is the routing + rollup stage.
    */
  def inventoryDurationMs(b: Array[Byte]): (String, Long) =
    sniffFormat(b) match {
      case "mp4" =>
        val m = Mp4Probe.probe(b); ("mp4", if (m == null) -1 else m.durationMs)
      case "webm" =>
        val m = EbmlProbe.probe(b); ("webm", if (m == null) -1 else m.durationMs)
      case "flac" =>
        val m = AudioProbes.probeFlac(b)
        ("flac", if (m == null) -1 else m.durationMs)
      case "mp3" =>
        val m = AudioProbes.probeMp3(b)
        ("mp3", if (m == null) -1 else m.durationMs)
      case "ogg" =>
        val m = AudioProbes.probeOgg(b)
        ("ogg", if (m == null) -1 else m.durationMs)
      case "avi" =>
        val m = probeAvi(b); ("avi", if (m == null) -1 else m.durationMs)
      case "tiff" => ("tiff", -1L)
      case "wav" => ("wav", -1L)
      case _ => (null, -1L)
    }

  // exact microseconds-per-frame literals for 24/25/30/60 fps — both
  // engines restate the same table, so the truncation IS the contract
  private val UsPerFrame = Vector(41666L, 40000L, 33333L, 16666L)
  private val AviCodecs = Vector("MJPG", "XVID", "H264", "FMP4")

  /** Deterministic synthetic AVI with closed-form probed fields:
    * usPerFrame from the 24/25/30/60 fps literal table (id%4),
    * totalFrames (id%997+1)·10, dims like the q339 video track,
    * 1 + id%2 streams (audio strl on odd ids), codec AviCodecs(id%4).
    */
  def aviTestAsset(id: Long): Array[Byte] = {
    val usPf = UsPerFrame((id % 4).toInt)
    val frames = (id % 997 + 1) * 10
    val width = 320 + 16 * (id % 40)
    val height = 240 + 16 * (id % 30)
    val nStreams = 1 + (id % 2)
    val codec = AviCodecs((id % 4).toInt)
    def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id4.getBytes("US-ASCII")); b.putInt(body.length)
      b.array() ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPf.toInt); b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(frames.toInt); b.putInt(0); b.putInt(nStreams.toInt)
      b.putInt(0); b.putInt(width.toInt); b.putInt(height.toInt)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
      chunk("avih", b.array())
    }
    def strh(t: String, h: String): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(t.getBytes("US-ASCII")); b.put(h.getBytes("US-ASCII"))
      b.putInt(0); b.putShort(0); b.putShort(0); b.putInt(0)
      b.putInt(1); b.putInt(30); b.putInt(0); b.putInt(frames.toInt)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
      chunk("strh", b.array())
    }
    val strls = list("strl", strh("vids", codec)) ++
      (if (nStreams > 1) list("strl", strh("auds", "    "))
       else Array.emptyByteArray)
    val hdrl = list("hdrl", avih ++ strls)
    val movi = list("movi", chunk("00dc", Array.fill(64)(0x42.toByte)))
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")); out.putInt(payload.length - 4 + 4)
    out.array() ++ payload
  }
}
