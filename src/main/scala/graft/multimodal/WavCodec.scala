package graft.multimodal

/** Real WAV PCM sample codec on pure JDK byte twiddling — the RIFF
  * chunk walk (same public layout MediaHeaders.scala's WAV branch
  * parses for q116, here continued past the header into the `data`
  * payload): PCM format 1 only, 16-bit signed little-endian and 8-bit
  * unsigned samples, any channel count (samples stay interleaved).
  * This makes the multimodal layer's audio path REAL: bytes in →
  * actual PCM amplitudes out, with integer-exact sample statistics a
  * DuckDB oracle can recompute from a closed-form waveform.
  */
object WavCodec {

  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       samples: Array[Int])

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

  /** Decode a PCM WAV to centered integer samples (16-bit: as stored;
    * 8-bit unsigned: value − 128). Walks RIFF chunks so fmt/data in
    * any order (and LIST/fact chunks between them) parse. Returns
    * null for non-RIFF, non-PCM, or truncated payloads — total
    * function, never throws on hostile bytes.
    */
  def decode(bytes: Array[Byte]): Wav = {
    try {
      if (bytes == null || bytes.length < 44) return null
      if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
        bytes(10) != 'V' || bytes(11) != 'E') return null
      var pos = 12
      var rate = -1; var channels = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (pos + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val sz = le32(bytes, pos + 4)
        if (sz < 0) return null
        if (id == "fmt " && pos + 8 + 16 <= bytes.length) {
          val fmt = le16(bytes, pos + 8)
          if (fmt != 1) return null // PCM only
          channels = le16(bytes, pos + 10)
          rate = le32(bytes, pos + 12)
          bits = le16(bytes, pos + 22)
        } else if (id == "data") {
          dataOff = pos + 8; dataLen = sz
        }
        pos += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      if (rate <= 0 || channels <= 0 || dataOff < 0) return null
      if (bits != 16 && bits != 8) return null
      if (dataOff.toLong + dataLen > bytes.length) return null
      val n = dataLen / (bits / 8)
      val samples = new Array[Int](n)
      var i = 0
      if (bits == 16) {
        while (i < n) {
          samples(i) = le16(bytes, dataOff + 2 * i).toShort.toInt
          i += 1
        }
      } else {
        while (i < n) {
          samples(i) = (bytes(dataOff + i) & 0xFF) - 128
          i += 1
        }
      }
      Wav(rate, channels, bits, samples)
    } catch { case _: Exception => null }
  }

  /** Encode centered integer samples as 16-bit PCM mono WAV. */
  def encode(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16)
    putLe16(out, 20, 1)  // PCM
    putLe16(out, 22, 1)  // mono
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * 2)
    putLe16(out, 32, 2)  // block align
    putLe16(out, 34, 16) // bits
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(out, 44 + 2 * i, samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** Deterministic 16-bit PCM test waveform — the shared fixture
    * behind q160 and its DuckDB twin: sample(i) =
    * ((id·31 + 17·i) % 65536) − 32768, a full-range sawtooth-ish
    * sweep whose statistics the twin recomputes in closed form, so a
    * hash match proves real bytes → real amplitudes.
    */
  def testWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val samples = new Array[Int](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = (((id * 31 + 17L * i) % 65536) - 32768).toInt
      i += 1
    }
    encode(sampleRate, samples)
  }

  /** Deterministic square-wave test tone — the q234 fixture: period
    * P = 4·2^(id mod 4) samples (4, 8, 16 or 32 → 64-point-DFT
    * fundamental at bin 16, 8, 4 or 2), full swing ±20000. The twin
    * recomputes sample(i) = ((i div (P/2)) mod 2 == 0 ? 20000 :
    * −20000) in closed form, so a hash match proves real bytes →
    * real samples → the right spectral peak.
    */
  def testTone(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val half = (2L << (id % 4)).toInt // P/2 for P = 4 << (id % 4)
    val samples = new Array[Int](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = if ((i / half) % 2 == 0) 20000 else -20000
      i += 1
    }
    encode(sampleRate, samples)
  }

  /** 64-bit acoustic fingerprint over decoded PCM — the audio analog
    * of [[PixelHash.dHash]] (energy-gradient hashing, the
    * public-recipe core that fingerprinting systems build on before
    * any spectral work): the first 65 frames of `frameLen` samples
    * each reduce to their integer Σ|s| energy, and bit f says
    * whether frame f is louder than frame f+1 — packed as two 32-bit
    * halves so the BIGINT sign bit stays untouched on every engine.
    * Returns None when fewer than 65 complete frames exist (no
    * zero-padded fake).
    */
  def frameHash(w: Wav, frameLen: Int = 64): Option[(Long, Long)] = {
    val need = 65 * frameLen
    if (w.samples.length < need) return None
    val e = new Array[Long](65)
    var f = 0
    while (f < 65) {
      var s = 0L
      var i = f * frameLen
      val end = i + frameLen
      while (i < end) { s += math.abs(w.samples(i).toLong); i += 1 }
      e(f) = s
      f += 1
    }
    var lo = 0L
    var hi = 0L
    f = 0
    while (f < 64) {
      if (e(f) > e(f + 1)) {
        if (f < 32) lo |= 1L << f else hi |= 1L << (f - 32)
      }
      f += 1
    }
    Some((lo, hi))
  }

  /** Integer-exact PCM statistics over decoded samples:
    * (n_samples, peak |s|, Σ|s|, ⌊Σs²/n⌋, sign crossings — a
    * (prev < 0) ≠ (s < 0) flip count). All BIGINT-safe: |s| ≤ 2¹⁵ so
    * Σs² ≤ n·2³⁰.
    */
  def pcmStats(w: Wav): (Long, Long, Long, Long, Long) = {
    var peak = 0L; var sumAbs = 0L; var energy = 0L; var crossings = 0L
    var i = 0
    while (i < w.samples.length) {
      val s = w.samples(i).toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      sumAbs += a
      energy += s * s
      if (i > 0 && ((w.samples(i - 1) < 0) != (s < 0))) crossings += 1
      i += 1
    }
    val n = w.samples.length.toLong
    (n, peak, sumAbs, if (n == 0) 0L else energy / n, crossings)
  }
}
