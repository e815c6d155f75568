package graft.multimodal

/** FLAC and MP3 container probes — the audio half of the corpus
  * inventory stage beside [[Mp4Probe]] (ISO-BMFF) and [[EbmlProbe]]
  * (Matroska/WebM): pure byte walks extracting the metadata a 100 TB
  * audio corpus needs before any sample decode (rate, channels, bit
  * depth, duration, tag shape). Layouts are the public format specs
  * as implemented by every open-source demuxer (flac.h / id3v2.4
  * structure document / MPEG-1 audio frame header — layout only, no
  * code).
  *
  * Subset policy (the [[Mp4Probe]] discipline): malformed magic,
  * truncated blocks, or reserved field values return null — a probe
  * stage must never throw on corpus garbage.
  *
  * Scale shape: map-only, O(bytes) per blob, no shuffle.
  */
object AudioProbes {

  // ------------------------------------------------------------------
  // FLAC
  // ------------------------------------------------------------------

  /** STREAMINFO summary of a FLAC stream plus the metadata-block
    * count — `durationMs` is the exact integral 1000·samples div
    * rate.
    */
  final case class FlacInfo(minBlockSize: Long, maxBlockSize: Long,
                            sampleRate: Long, channels: Long,
                            bitsPerSample: Long, totalSamples: Long,
                            nMetadataBlocks: Long) {
    def durationMs: Long =
      if (sampleRate <= 0) -1L else 1000L * totalSamples / sampleRate
  }

  private def u16(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 8) | (b(o + 1) & 0xFFL)
  private def u24(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 16) | ((b(o + 1) & 0xFFL) << 8) | (b(o + 2) & 0xFFL)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o) << 16) | u16(b, o + 2)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  /** Probe `bytes` as FLAC ("fLaC" magic, then metadata blocks of
    * 1-byte (last‹‹7|type) header + 3-byte big-endian length; block
    * type 0 = the mandatory 34-byte STREAMINFO whose packed 64-bit
    * tail is rate(20) channels−1(3) bps−1(5) totalSamples(36)).
    * Null when the magic, the block chain, or STREAMINFO is absent
    * or truncated.
    */
  def probeFlac(bytes: Array[Byte]): FlacInfo = {
    if (bytes == null || bytes.length < 8) return null
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
        bytes(3) == 'C')) return null
    var o = 4
    var info: FlacInfo = null
    var nBlocks = 0L
    var last = false
    while (!last) {
      if (o + 4 > bytes.length) return null
      val hdr = bytes(o) & 0xFF
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7F
      val len = u24(bytes, o + 1).toInt
      val body = o + 4
      if (typ == 127 || body + len > bytes.length) return null
      nBlocks += 1
      if (typ == 0) {
        if (len < 34) return null
        val packed = u64(bytes, body + 10)
        info = FlacInfo(
          minBlockSize = u16(bytes, body),
          maxBlockSize = u16(bytes, body + 2),
          sampleRate = (packed >>> 44) & 0xFFFFF,
          channels = ((packed >>> 41) & 0x7) + 1,
          bitsPerSample = ((packed >>> 36) & 0x1F) + 1,
          totalSamples = packed & 0xFFFFFFFFFL,
          nMetadataBlocks = -1)
      }
      o = body + len
    }
    if (info == null || info.sampleRate <= 0) null
    else info.copy(nMetadataBlocks = nBlocks)
  }

  private val FlacRates =
    Vector(8000L, 16000L, 22050L, 24000L, 32000L, 44100L, 48000L, 96000L)
  private val FlacBps = Vector(8L, 16L, 24L)

  /** Deterministic synthetic FLAC whose every probed field is a
    * CLOSED-FORM function of `id` (the [[Mp4Probe.testAsset]]
    * discipline — the DuckDB twin restates the formulas, so a hash
    * match certifies the whole block walk including the 20/3/5/36
    * bit unpack): rate = FlacRates(id%8), channels = 1+id%4,
    * bps = FlacBps(id%3), totalSamples = (id%997+1)·1000; ids ≡ 0
    * (mod 3) append a PADDING block and ids ≡ 0 (mod 5) an
    * APPLICATION block, so nMetadataBlocks = 1 + [3|id] + [5|id] and
    * the last-block flag moves between layouts.
    */
  def flacTestAsset(id: Long): Array[Byte] = {
    val rate = FlacRates((id % 8).toInt)
    val channels = 1 + id % 4
    val bps = FlacBps((id % 3).toInt)
    val total = (id % 997 + 1) * 1000
    val extra = Seq(
      if (id % 3 == 0) Some((1, new Array[Byte](16))) else None, // PADDING
      if (id % 5 == 0)
        Some((2, "graftAPP".getBytes("US-ASCII"))) else None     // APPLICATION
    ).flatten
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    def block(typ: Int, body: Array[Byte], isLast: Boolean): Unit = {
      out.write((if (isLast) 0x80 else 0) | typ)
      out.write(((body.length >> 16) & 0xFF).toInt)
      out.write(((body.length >> 8) & 0xFF).toInt)
      out.write((body.length & 0xFF).toInt)
      out.write(body)
    }
    val si = java.nio.ByteBuffer.allocate(34)
    si.putShort(4096.toShort).putShort(4096.toShort)
    si.put(Array[Byte](0, 0, 0)).put(Array[Byte](0, 0, 0)) // frame sizes
    si.putLong((rate << 44) | ((channels - 1) << 41) |
      ((bps - 1) << 36) | total)
    si.put(new Array[Byte](16)) // MD5 unset
    block(0, si.array(), isLast = extra.isEmpty)
    extra.zipWithIndex.foreach { case ((t, b), i) =>
      block(t, b, isLast = i == extra.size - 1)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // MP3 (ID3v2 tag + first MPEG audio frame header)
  // ------------------------------------------------------------------

  /** ID3v2 tag shape + first MPEG frame parameters — `durationMs` is
    * the constant-bitrate estimate (audioBytes·8) div kbps, exact
    * integral.
    */
  final case class Mp3Info(id3Version: String, tagSize: Long,
                           nId3Frames: Long, mpegVersion: Long,
                           layer: Long, bitrateKbps: Long,
                           sampleRate: Long, channelMode: String,
                           audioBytes: Long) {
    def durationMs: Long =
      if (bitrateKbps <= 0) -1L else audioBytes * 8 / bitrateKbps
  }

  // MPEG-1 / MPEG-2 Layer III bitrate tables (kbps, index 1..14) and
  // sample-rate tables (index 0..2) from the public frame-header spec
  private val BitrateV1L3 = Vector(0L, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L3 = Vector(0L, 8, 16, 24, 32, 40, 48, 56,
    64, 80, 96, 112, 128, 144, 160)
  private val RateV1 = Vector(44100L, 48000L, 32000L)
  private val RateV2 = Vector(22050L, 24000L, 16000L)
  private val ChannelModes = Vector("stereo", "joint_stereo",
    "dual_channel", "mono")

  private def syncsafe(b: Array[Byte], o: Int): Long =
    ((b(o) & 0x7FL) << 21) | ((b(o + 1) & 0x7FL) << 14) |
      ((b(o + 2) & 0x7FL) << 7) | (b(o + 3) & 0x7FL)

  /** Probe `bytes` as an ID3v2-tagged MP3: tag header "ID3" vMajor
    * vMinor flags syncsafe-size, frames of (4cc id)(4-byte size —
    * syncsafe in v2.4, plain big-endian in v2.3)(2 flag bytes)(body)
    * counted until padding or tag end, then the first MPEG audio
    * frame header (11-bit sync, version, layer, bitrate/rate
    * indices, channel mode). Null on a missing tag, a malformed
    * frame chain, or reserved header values (free/bad bitrate,
    * reserved rate, non-Layer-III).
    */
  def probeMp3(bytes: Array[Byte]): Mp3Info = {
    if (bytes == null || bytes.length < 14) return null
    if (!(bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3'))
      return null
    val vMajor = bytes(3) & 0xFF
    val vMinor = bytes(4) & 0xFF
    if (vMajor != 3 && vMajor != 4) return null
    val tagSize = syncsafe(bytes, 6)
    val tagEnd = 10 + tagSize.toInt
    if (tagEnd + 4 > bytes.length) return null
    // walk the frame chain
    var o = 10
    var nFrames = 0L
    var done = false
    while (!done && o + 10 <= tagEnd) {
      if (bytes(o) == 0) done = true // padding
      else {
        val sz = if (vMajor == 4) syncsafe(bytes, o + 4)
          else u32(bytes, o + 4)
        if (sz < 0 || o + 10 + sz > tagEnd) return null
        nFrames += 1
        o = o + 10 + sz.toInt
      }
    }
    // first MPEG frame header
    val h = tagEnd
    if ((bytes(h) & 0xFF) != 0xFF || (bytes(h + 1) & 0xE0) != 0xE0)
      return null
    val verBits = (bytes(h + 1) >> 3) & 0x3   // 3 = MPEG-1, 2 = MPEG-2
    val layerBits = (bytes(h + 1) >> 1) & 0x3 // 1 = Layer III
    if ((verBits != 3 && verBits != 2) || layerBits != 1) return null
    val mpegVersion = if (verBits == 3) 1L else 2L
    val brIdx = (bytes(h + 2) >> 4) & 0xF
    val srIdx = (bytes(h + 2) >> 2) & 0x3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
    val mode = (bytes(h + 3) >> 6) & 0x3
    Mp3Info(
      id3Version = s"2.$vMajor.$vMinor",
      tagSize = tagSize,
      nId3Frames = nFrames,
      mpegVersion = mpegVersion,
      layer = 3L,
      bitrateKbps = if (mpegVersion == 1) BitrateV1L3(brIdx)
        else BitrateV2L3(brIdx),
      sampleRate = if (mpegVersion == 1) RateV1(srIdx) else RateV2(srIdx),
      channelMode = ChannelModes(mode),
      audioBytes = (bytes.length - tagEnd).toLong)
  }

  // ------------------------------------------------------------------
  // Ogg (Vorbis / Opus identification header + page walk)
  // ------------------------------------------------------------------

  /** Ogg stream shape from the page walk + BOS identification packet
    * — `durationMs` is exact integral off the final granule position
    * (Vorbis granules tick at the stream rate; Opus granules always
    * tick at 48 kHz and exclude pre-skip).
    */
  final case class OggInfo(codec: String, serial: Long, channels: Long,
                           sampleRate: Long, preSkip: Long,
                           nPages: Long, lastGranule: Long) {
    def durationMs: Long = codec match {
      case "vorbis" =>
        if (sampleRate <= 0) -1L else 1000L * lastGranule / sampleRate
      case "opus" => 1000L * math.max(lastGranule - preSkip, 0) / 48000L
      case _ => -1L
    }
  }

  private def le16(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    le16(b, o) | (le16(b, o + 2) << 16)
  private def le64(b: Array[Byte], o: Int): Long =
    le32(b, o) | (le32(b, o + 4) << 32)

  /** Probe `bytes` as an Ogg stream (RFC 3533 page layout: "OggS",
    * version 0, header type, 64-bit LE granule, serial, page seq,
    * CRC, segment count + lacing table, segment data): the page walk
    * is structural — each page's length comes from its lacing
    * values, never from magic scanning — and the BOS page's first
    * packet is decoded as a Vorbis identification header
    * (`\x01vorbis`) or an `OpusHead`. Null on a missing/malformed
    * BOS, a broken page chain, version ≠ 0, or an unknown codec.
    */
  def probeOgg(bytes: Array[Byte]): OggInfo = {
    if (bytes == null || bytes.length < 28) return null
    var o = 0
    var nPages = 0L
    var lastGranule = -1L
    var serial = -1L
    var codec: String = null
    var channels = -1L; var rate = -1L; var preSkip = 0L
    while (o + 27 <= bytes.length) {
      if (!(bytes(o) == 'O' && bytes(o + 1) == 'g' && bytes(o + 2) == 'g' &&
          bytes(o + 3) == 'S') || bytes(o + 4) != 0) return null
      val granule = le64(bytes, o + 6)
      val pageSerial = le32(bytes, o + 14)
      val nSegs = bytes(o + 26) & 0xFF
      if (o + 27 + nSegs > bytes.length) return null
      var dataLen = 0
      var i = 0
      while (i < nSegs) { dataLen += bytes(o + 27 + i) & 0xFF; i += 1 }
      val body = o + 27 + nSegs
      if (body + dataLen > bytes.length) return null
      if (nPages == 0) {
        if ((bytes(o + 5) & 0x02) == 0) return null // first page must be BOS
        serial = pageSerial
        // identification packet: Vorbis or Opus
        if (dataLen >= 30 && bytes(body) == 1 &&
            new String(bytes.slice(body + 1, body + 7), "US-ASCII") == "vorbis") {
          codec = "vorbis"
          channels = bytes(body + 11) & 0xFFL
          rate = le32(bytes, body + 12)
        } else if (dataLen >= 19 &&
            new String(bytes.slice(body, body + 8), "US-ASCII") == "OpusHead") {
          codec = "opus"
          channels = bytes(body + 9) & 0xFFL
          preSkip = le16(bytes, body + 10)
          rate = le32(bytes, body + 12) // input rate, informational
        } else return null
      }
      nPages += 1
      if (granule >= 0) lastGranule = granule
      o = body + dataLen
    }
    if (o != bytes.length || codec == null || nPages < 1) return null
    OggInfo(codec, serial, channels, rate, preSkip, nPages, lastGranule)
  }

  private val VorbisRates = Vector(8000L, 16000L, 44100L, 48000L)

  /** Deterministic synthetic Ogg with closed-form probed fields:
    * Vorbis on even ids (rate VorbisRates((id%8) div 2 — decorrelated
    * from the codec mod so all four rates occur), granules at the
    * stream rate) and Opus on odd (pre-skip 312, granules at 48 kHz
    * — duration (id%997+1)·20 ms exactly), channels 1 + id%3,
    * serial 7000 + id%89, and 2 + id%3 pages (BOS + data pages, the
    * last carrying the final granule; multi-segment lacing on the
    * data pages keeps the ≥255-byte path covered).
    */
  def oggTestAsset(id: Long): Array[Byte] = {
    val vorbis = id % 2 == 0
    val channels = (1 + id % 3).toInt
    val serial = 7000 + id % 89
    val nPages = (2 + id % 3).toInt
    val samples = (id % 997 + 1) * 960
    val finalGranule = if (vorbis) samples else 312L + samples
    val out = new java.io.ByteArrayOutputStream()
    def page(headerType: Int, granule: Long, seq: Long,
             body: Array[Byte]): Unit = {
      out.write("OggS".getBytes("US-ASCII"))
      out.write(0) // version
      out.write(headerType)
      val b = java.nio.ByteBuffer.allocate(20)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putLong(granule); b.putInt(serial.toInt); b.putInt(seq.toInt)
      b.putInt(0) // CRC unchecked by the probe (a corpus walk cannot
                  // afford a per-page CRC pass; structure is the check)
      out.write(b.array())
      // lacing: full 255-byte segments + the sub-255 tail
      val full = body.length / 255
      out.write(full + 1)
      (0 until full).foreach(_ => out.write(255))
      out.write(body.length % 255)
      out.write(body)
    }
    val idHeader: Array[Byte] = if (vorbis) {
      val b = java.nio.ByteBuffer.allocate(30)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put("vorbis".getBytes("US-ASCII"))
      b.putInt(0) // vorbis version
      b.put(channels.toByte)
      b.putInt(VorbisRates(((id % 8) / 2).toInt).toInt)
      b.putInt(0).putInt(0).putInt(0) // bitrates
      b.put(0xB8.toByte) // blocksizes
      b.put(1.toByte)    // framing
      b.array()
    } else {
      val b = java.nio.ByteBuffer.allocate(19)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("OpusHead".getBytes("US-ASCII"))
      b.put(1.toByte) // version
      b.put(channels.toByte)
      b.putShort(312.toShort) // pre-skip
      b.putInt(48000)         // input sample rate
      b.putShort(0.toShort)   // output gain
      b.put(0.toByte)         // channel mapping family
      b.array()
    }
    page(0x02, -1L, 0L, idHeader)
    // data pages: the granule advances linearly, the last page lands
    // on finalGranule; bodies are ≥ 255 bytes so lacing multi-segments
    (1 until nPages).foreach { p =>
      val g = finalGranule * p / (nPages - 1)
      page(if (p == nPages - 1) 0x04 else 0x00, g, p.toLong,
        Array.fill(300 + (id % 7).toInt * 50)(0x5A.toByte))
    }
    out.toByteArray
  }

  private val Id3FrameIds = Vector("TIT2", "TPE1", "TALB", "TRCK")

  /** Deterministic synthetic MP3 with closed-form probed fields:
    * v2.4 tags on even ids (syncsafe frame sizes) and v2.3 on odd
    * (plain big-endian — both size codecs stay covered), 1 + id%4
    * text frames of body length 1 + id%7 (+1 encoding byte), 6 bytes
    * of tag padding, MPEG-2 on ids ≡ 0 (mod 3) else MPEG-1, bitrate
    * index 1 + id%14 through the REAL kbps tables, rate index
    * (id%9) div 3 (decorrelated from the version mod so MPEG-1 hits
    * all three rates), channel mode id%4, and (id%997+1)·100 + 4
    * audio bytes.
    */
  def mp3TestAsset(id: Long): Array[Byte] = {
    val v4 = id % 2 == 0
    val nFrames = (1 + id % 4).toInt
    val bodyLen = (1 + id % 7).toInt // text bytes, after encoding byte
    val out = new java.io.ByteArrayOutputStream()
    val frames = new java.io.ByteArrayOutputStream()
    (0 until nFrames).foreach { i =>
      frames.write(Id3FrameIds(i).getBytes("US-ASCII"))
      val sz = 1 + bodyLen
      if (v4) {
        frames.write(((sz >> 21) & 0x7F).toInt); frames.write(((sz >> 14) & 0x7F).toInt)
        frames.write(((sz >> 7) & 0x7F).toInt); frames.write((sz & 0x7F).toInt)
      } else {
        frames.write((sz >> 24) & 0xFF); frames.write((sz >> 16) & 0xFF)
        frames.write((sz >> 8) & 0xFF); frames.write(sz & 0xFF)
      }
      frames.write(0); frames.write(0) // frame flags
      frames.write(3) // encoding: UTF-8
      frames.write(("x" * bodyLen).getBytes("US-ASCII"))
    }
    frames.write(new Array[Byte](6)) // tag padding
    val tagBody = frames.toByteArray
    out.write("ID3".getBytes("US-ASCII"))
    out.write(if (v4) 4 else 3); out.write(0); out.write(0)
    val ts = tagBody.length
    out.write((ts >> 21) & 0x7F); out.write((ts >> 14) & 0x7F)
    out.write((ts >> 7) & 0x7F); out.write(ts & 0x7F)
    out.write(tagBody)
    // MPEG frame header + constant filler "audio"
    val v1 = id % 3 != 0
    val brIdx = (1 + id % 14).toInt
    val srIdx = ((id % 9) / 3).toInt
    val mode = (id % 4).toInt
    out.write(0xFF)
    out.write(0xE0 | ((if (v1) 3 else 2) << 3) | (1 << 1))
    out.write((brIdx << 4) | (srIdx << 2))
    out.write(mode << 6)
    out.write(new Array[Byte](((id % 997 + 1) * 100).toInt))
    out.toByteArray
  }
}
