package graft.multimodal

/** Parsed WAV container metadata: channel count, frame rate and
  * per-sample bit width, straight from the `fmt ` chunk. */
final case class WavMeta(channels: Int, sampleRate: Int, bitsPerSample: Int)

/** REAL RIFF/WAVE PCM decode (SURVEY §2 G10, round-12): pure-JVM
  * container walk + sample extraction — the audio twin of the image
  * pixel paths ([[Decode.pngPixels]], [[JpegDecode.pixels]]), built
  * from the public RIFF/WAVE layout only (the Microsoft/IBM 1991
  * multimedia-file format every audio tool ships):
  *
  *   1. RIFF header: `RIFF <size> WAVE` magic;
  *   2. chunk walk: 4-byte id + 4-byte little-endian length, odd
  *      lengths padded by one byte (the RIFF word-alignment rule),
  *      unknown chunks (LIST, fact, cue, …) skipped;
  *   3. `fmt `: PCM format tag, channel count, sample rate, bits per
  *      sample;
  *   4. `data`: the sample stream — 8-bit samples are UNSIGNED
  *      (centered at 128, returned as value−128), 16- and 24-bit
  *      samples are SIGNED little-endian (returned as-is), 32-bit
  *      IEEE-float samples (format tag 3 — WAVE_FORMAT_IEEE_FLOAT)
  *      are fixed-point-centered to the 24-bit grid:
  *      clamp(floor(f·2²³ + 0.5), −2²³, 2²³−1), NaN → 0 (one
  *      documented deterministic mapping into the integer-exact
  *      stats pipeline; −1.0 lands exactly on −2²³ and +1.0 CLIPS to
  *      2²³−1, exactly as a 24-bit DAC clips its positive rail).
  *      Channels stay frame-interleaved.
  *
  * Scope (loudly bounded like the image decoders): integer PCM
  * (format tag 1) at 8/16/24-bit and IEEE-float PCM (format tag 3)
  * at 32-bit, 1–2 channels — directly tagged, or wrapped in
  * WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE, round-14: the SubFormat GUID
  * indirection modern encoders emit for anything ≥ 2 channels or
  * > 16 bits; a header-walk-only unwrap). ADPCM and other foreign
  * SubFormat GUIDs, sub-width valid bits, 32-bit int, 64-bit float
  * and malformed/truncated/ragged containers return None — bad
  * bytes are data, not exceptions, at a 100 TB decode seam. The spec pins output sample-exact against
  * `javax.sound.sampled` (the JDK's independent WAV reader) on
  * round-trip and hand-assembled containers; a `bitsPerSample` of 32
  * in the returned meta always means float (int32 is out of scope,
  * so the width is unambiguous without a format field).
  */
object WavDecode {

  /** Decoded-sample volume cap — a crafted `data` length must never
    * force a multi-GB allocation (same discipline as the image
    * decoders' guards). */
  private val MAX_SAMPLES = 1L << 28

  /** The fixed KSDATAFORMAT_SUBTYPE suffix (bytes 5–16 of the
    * SubFormat GUID) every PCM/float extensible container carries —
    * a constant, not a per-decode allocation (decode() is the
    * per-payload hot path). */
  private val KS_SUFFIX = Array(0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
    0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71)

  private def u16le(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def u32le(p: Array[Byte], i: Int): Long =
    (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
  private def tag(p: Array[Byte], i: Int): String =
    new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** WAV container → (meta, centered samples in frame-interleaved
    * order). None outside the declared scope or for malformed bytes. */
  def decode(p: Array[Byte]): Option[(WavMeta, Array[Int])] = {
    if (p.length < 12 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE") return None
    var i = 12
    var meta: WavMeta = null
    var dataOff = -1
    var dataLen = -1
    // fmt must be seen before data can be sized-checked; the walk
    // tolerates any chunk order and stops once both are in hand
    while ((meta == null || dataOff < 0) && i + 8 <= p.length) {
      val id = tag(p, i)
      val len = u32le(p, i + 4)
      if (i + 8 + len > p.length) return None // truncated chunk
      val off = i + 8
      id match {
        case "fmt " =>
          if (len < 16) return None
          val rawFmt = u16le(p, off)
          val ch = u16le(p, off + 2)
          val rate = u32le(p, off + 4)
          val bits = u16le(p, off + 14)
          // WAVE_FORMAT_EXTENSIBLE (0xFFFE, round-14): the real tag is
          // indirected through the SubFormat GUID — Data1 carries the
          // wrapped tag, and the 12-byte KSDATAFORMAT suffix
          // {….-0000-0010-8000-00aa00389b71} pins the GUID family.
          // A header-walk-only change: the sample paths see tag 1/3
          // exactly as if the container were plain. wValidBitsPerSample
          // must equal the container width (or 0 = unspecified) —
          // sub-width valid bits (e.g. 20-in-24) change sample
          // semantics and stay out of scope.
          val fmt =
            if (rawFmt != 0xfffe) rawFmt
            else {
              if (len < 40 || u16le(p, off + 16) < 22) return None
              val validBits = u16le(p, off + 18)
              if (validBits != 0 && validBits != bits) return None
              val d1 = u32le(p, off + 24)
              var j = 0
              while (j < 12) {
                if ((p(off + 28 + j) & 0xff) != KS_SUFFIX(j)) return None
                j += 1
              }
              if (d1 != 1L && d1 != 3L) return None // ADPCM etc. GUIDs
              d1.toInt
            }
          // tag 1 = integer PCM (8/16/24), tag 3 = IEEE float (32)
          val widthOk = (fmt == 1 && (bits == 8 || bits == 16 || bits == 24)) ||
            (fmt == 3 && bits == 32)
          if (!widthOk || ch < 1 || ch > 2 ||
            rate <= 0 || rate > Int.MaxValue) return None
          meta = WavMeta(ch, rate.toInt, bits)
        case "data" =>
          dataOff = off
          dataLen = len.toInt
        case _ => () // LIST / fact / cue / …: skip
      }
      i = off + len.toInt + (len.toInt & 1) // odd chunks pad one byte
    }
    if (meta == null || dataOff < 0) return None
    val bytesPer = meta.bitsPerSample / 8
    // a ragged tail (data length not a whole number of frames) is a
    // malformed stream, not something to silently truncate
    if (dataLen % (bytesPer * meta.channels) != 0) return None
    val n = dataLen / bytesPer
    if (n > MAX_SAMPLES) return None
    val out = new Array[Int](n)
    var k = 0
    meta.bitsPerSample match {
      case 8 =>
        while (k < n) { out(k) = (p(dataOff + k) & 0xff) - 128; k += 1 }
      case 16 =>
        while (k < n) {
          // signed 16-bit LE: the sign-extending byte shift IS the value
          out(k) = (p(dataOff + 2 * k + 1) << 8) | (p(dataOff + 2 * k) & 0xff)
          k += 1
        }
      case 24 =>
        while (k < n) {
          val o = dataOff + 3 * k
          // top byte's int promotion sign-extends the 24-bit value
          out(k) = (p(o + 2) << 16) | ((p(o + 1) & 0xff) << 8) | (p(o) & 0xff)
          k += 1
        }
      case _ => // 32 ⇒ IEEE float (the fmt guard admits nothing else)
        while (k < n) {
          val f = java.lang.Float.intBitsToFloat(u32le(p, dataOff + 4 * k).toInt)
          out(k) =
            if (f.isNaN) 0
            else math.max(-8388608.0, math.min(8388607.0,
              math.floor(f * 8388608.0 + 0.5))).toInt
          k += 1
        }
    }
    Some((meta, out))
  }

  /** Wrap raw 8-bit-unsigned mono PCM in the canonical 44-byte WAV
    * container — the synthesizer the `m_audio` key feeds [[decode]]
    * (the shipped corpus carries no real audio; a real corpus would
    * feed its binary column directly). */
  def wrapPcm8Mono(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val n = samples.length
    // 44 + n is Int arithmetic: a payload within 44 bytes of
    // Int.MaxValue would wrap negative and surface as an opaque
    // NegativeArraySizeException from the allocation — fail loudly
    // with the actual contract instead (such a clip is beyond
    // decode's MAX_SAMPLES cap anyway, so it could never round-trip)
    require(n <= Int.MaxValue - 44,
      s"payload of $n bytes cannot fit a 44-byte-header WAV container")
    val out = new Array[Byte](44 + n)
    def w16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte
      out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte
      out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def tag4(i: Int, s: String): Unit = {
      var k = 0
      while (k < 4) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    tag4(0, "RIFF"); w32(4, 36L + n); tag4(8, "WAVE")
    tag4(12, "fmt "); w32(16, 16)
    w16(20, 1) // PCM
    w16(22, 1) // mono
    w32(24, sampleRate.toLong)
    w32(28, sampleRate.toLong) // byte rate = rate · 1 ch · 1 byte
    w16(32, 1) // block align
    w16(34, 8) // bits per sample
    tag4(36, "data"); w32(40, n.toLong)
    System.arraycopy(samples, 0, out, 44, n)
    out
  }
}
