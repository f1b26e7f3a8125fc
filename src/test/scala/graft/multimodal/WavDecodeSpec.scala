package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled._

import graft.SparkSpec

/** G10 (round-12): the REAL RIFF/WAVE PCM decode path, pinned
  * sample-exact against `javax.sound.sampled` — the JDK's
  * independent WAV reader — the same discipline as the image
  * decoders' ImageIO pins. */
class WavDecodeSpec extends SparkSpec {

  /** Independent WAV writer: raw PCM → container via javax.sound. */
  private def soundWav(pcm: Array[Byte], fmt: AudioFormat): Array[Byte] = {
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, pcm.length / fmt.getFrameSize)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Independent WAV reader: expected centered samples per the same
    * convention WavDecode declares (8-bit unsigned − 128, 16/24-bit
    * signed LE as-is, float32 fixed-point-centered to the 24-bit
    * grid). Container walk and byte assembly are javax.sound's and
    * java.nio's — independent of WavDecode's hand-rolled paths. */
  private def soundSamples(wav: Array[Byte]): (WavMeta, Array[Int]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    val raw = ais.readAllBytes()
    ais.close()
    val meta = WavMeta(fmt.getChannels, fmt.getSampleRate.toInt,
      fmt.getSampleSizeInBits)
    val out = fmt.getSampleSizeInBits match {
      case 8 => raw.map(b => (b & 0xff) - 128)
      case 16 => raw.grouped(2).map(p => (p(1) << 8) | (p(0) & 0xff)).toArray
      case 24 => raw.grouped(3)
        .map(p => (p(2) << 16) | ((p(1) & 0xff) << 8) | (p(0) & 0xff)).toArray
      case 32 => raw.grouped(4).map { p =>
        val f = java.nio.ByteBuffer.wrap(p)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat
        if (f.isNaN) 0
        else math.max(-8388608.0,
          math.min(8388607.0, math.floor(f * 8388608.0 + 0.5))).toInt
      }.toArray
    }
    (meta, out)
  }

  test("8-bit mono round-trip: decode matches javax.sound sample-exact") {
    val rng = new scala.util.Random(21)
    for (n <- Seq(1, 7, 256, 4093)) {
      val pcm = Array.fill(n)(rng.nextInt(256).toByte)
      val wav = soundWav(pcm, new AudioFormat(8000f, 8, 1, false, false))
      val got = WavDecode.decode(wav)
      assert(got.isDefined, s"n=$n: decode failed")
      val (meta, samples) = got.get
      val (refMeta, refSamples) = soundSamples(wav)
      assert(meta === refMeta)
      assert(samples.toSeq === refSamples.toSeq, s"n=$n: sample mismatch")
    }
  }

  test("16-bit stereo round-trip: signed LE frames, interleaved channels") {
    val rng = new scala.util.Random(22)
    val pcm = Array.fill(1024 * 4)(rng.nextInt(256).toByte) // 1024 frames
    val wav = soundWav(pcm, new AudioFormat(16000f, 16, 2, true, false))
    val got = WavDecode.decode(wav)
    assert(got.isDefined)
    val (meta, samples) = got.get
    val (refMeta, refSamples) = soundSamples(wav)
    assert(meta === refMeta && meta.channels === 2 && meta.bitsPerSample === 16)
    assert(samples.toSeq === refSamples.toSeq)
  }

  test("24-bit mono round-trip (round-13): sign-extended 3-byte LE frames match javax.sound") {
    val rng = new scala.util.Random(24)
    val pcm = Array.fill(333 * 3)(rng.nextInt(256).toByte) // 333 frames
    val wav = soundWav(pcm, new AudioFormat(22050f, 24, 1, true, false))
    val got = WavDecode.decode(wav)
    assert(got.isDefined, "24-bit decode failed")
    val (meta, samples) = got.get
    val (refMeta, refSamples) = soundSamples(wav)
    assert(meta === refMeta && meta.bitsPerSample === 24)
    assert(samples.toSeq === refSamples.toSeq)
    // the full signed 24-bit range is actually exercised
    assert(samples.exists(_ < -65536) && samples.exists(_ > 65536))
  }

  test("float32 stereo round-trip (round-13): fixed-point centering per the documented contract") {
    val rng = new scala.util.Random(25)
    val floats = Array.fill(256 * 2)(rng.nextFloat() * 2f - 1f)
    // full-scale, clipping and NaN corners of the documented mapping
    floats(0) = 1.0f; floats(1) = -1.0f; floats(2) = 1.5f; floats(3) = Float.NaN
    val bb = java.nio.ByteBuffer.allocate(floats.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    floats.foreach(bb.putFloat)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_FLOAT,
      16000f, 32, 2, 8, 16000f, false)
    val wav = soundWav(bb.array(), fmt)
    val got = WavDecode.decode(wav)
    assert(got.isDefined, "float32 decode failed")
    val (meta, samples) = got.get
    assert(meta === WavMeta(2, 16000, 32))
    val (refMeta, refSamples) = soundSamples(wav)
    assert(refMeta === meta)
    assert(samples.toSeq === refSamples.toSeq)
    assert(samples(0) === 8388607) // +1.0 full scale clamps to 2²³−1
    assert(samples(1) === -8388608) // −1.0 lands exactly on −2²³
    assert(samples(2) === 8388607) // out-of-range clips, like a DAC
    assert(samples(3) === 0) // NaN is silence, not poison
    // the float clip flows through the stats seam like any other
    import spark.implicits._
    val r = MultimodalPack.audioStatsOf(spark, Seq((11L, wav)).toDS()).head()
    assert(r.getLong(1) === 512L && r.getLong(2) === 16000L)
    assert(r.getLong(4) === samples.map(v => v.toLong * v).sum)
  }

  test("audioStatsOf: energy saturates at Long.MaxValue on full-scale wide samples, never wraps") {
    // round-13 review: 24-bit-grid samples square to 2⁴⁶, so a
    // full-scale clip overflows Σs² past ~2¹⁷ samples — the
    // accumulator must clamp, not wrap negative
    val n = (1 << 17) + 1024
    val bb = java.nio.ByteBuffer.allocate(n * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(_ => bb.putFloat(-1.0f)) // −1.0 → −2²³ exactly
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_FLOAT,
      16000f, 32, 1, 4, 16000f, false)
    val wav = soundWav(bb.array(), fmt)
    import spark.implicits._
    val r = MultimodalPack.audioStatsOf(spark, Seq((13L, wav)).toDS()).head()
    assert(r.getLong(4) === Long.MaxValue, "energy must clamp at the rail")
    assert(r.getLong(5) === 8388608L) // peak |−2²³| is unaffected
    // a clip just UNDER the rail stays exact
    val m = 1 << 16
    val bb2 = java.nio.ByteBuffer.allocate(m * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until m).foreach(_ => bb2.putFloat(-1.0f))
    val r2 = MultimodalPack.audioStatsOf(spark,
      Seq((14L, soundWav(bb2.array(), fmt))).toDS()).head()
    assert(r2.getLong(4) === m.toLong * (1L << 46))
  }

  test("the wrapper's own container: decode identity AND javax.sound agreement") {
    val rng = new scala.util.Random(23)
    val pcm = Array.fill(513)(rng.nextInt(256).toByte)
    val wav = WavDecode.wrapPcm8Mono(pcm, 8000)
    assert(wav.length === 44 + pcm.length)
    val (meta, samples) = WavDecode.decode(wav).get
    assert(meta === WavMeta(1, 8000, 8))
    assert(samples.toSeq === pcm.map(b => (b & 0xff) - 128).toSeq)
    // the independent reader parses the hand-rolled container too
    val (refMeta, refSamples) = soundSamples(wav)
    assert(refMeta === meta && refSamples.toSeq === samples.toSeq)
  }

  test("unknown chunks are skipped, including odd-length pad bytes") {
    val pcm = Array.tabulate(16)(i => (i * 7).toByte)
    val base = WavDecode.wrapPcm8Mono(pcm, 8000)
    // splice an odd-length junk chunk between WAVE and fmt: id+len+5
    // payload bytes + 1 pad byte (the RIFF word-alignment rule)
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5) ++ Array[Byte](0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // patch the RIFF size (offset 4, LE) for honesty — decode ignores it
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte
    spliced(5) = ((riffLen >> 8) & 0xff).toByte
    val got = WavDecode.decode(spliced)
    assert(got.isDefined, "junk chunk broke the walk")
    assert(got.get._2.toSeq === pcm.map(b => (b & 0xff) - 128).toSeq)
  }

  /** Hand-assemble a WAVE_FORMAT_EXTENSIBLE container: 40-byte fmt
    * chunk (tag 0xFFFE, cbSize 22, wValidBitsPerSample, channel mask
    * 0, SubFormat GUID = d1 + the KSDATAFORMAT suffix) around the
    * given raw data bytes. */
  private def extensibleWav(data: Array[Byte], ch: Int, rate: Int, bits: Int,
                            d1: Int, validBits: Int = 0,
                            guidSuffix: Array[Int] = Array(0x00, 0x00, 0x10, 0x00,
                              0x80, 0x00, 0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71)): Array[Byte] = {
    val out = new Array[Byte](12 + 8 + 40 + 8 + data.length)
    def w16(i: Int, v: Int): Unit = { out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte }
    def w32(i: Int, v: Long): Unit = (0 to 3).foreach(k => out(i + k) = ((v >> (8 * k)) & 0xff).toByte)
    def tag4(i: Int, s: String): Unit = (0 to 3).foreach(k => out(i + k) = s.charAt(k).toByte)
    tag4(0, "RIFF"); w32(4, out.length - 8L); tag4(8, "WAVE")
    tag4(12, "fmt "); w32(16, 40)
    w16(20, 0xfffe); w16(22, ch); w32(24, rate.toLong)
    w32(28, rate.toLong * ch * (bits / 8)); w16(32, ch * (bits / 8)); w16(34, bits)
    w16(36, 22) // cbSize
    w16(38, validBits); w32(40, 0L) // channel mask
    w32(44, d1.toLong)
    guidSuffix.zipWithIndex.foreach { case (b, k) => out(48 + k) = b.toByte }
    tag4(60, "data"); w32(64, data.length.toLong)
    System.arraycopy(data, 0, out, 68, data.length)
    out
  }

  test("extensible-wrapped PCM decodes identically to the plain tag (round-14)") {
    // 16-bit stereo signed LE frames
    val data = Array[Byte](0, 1, -1, 127, 34, -12, 0, -128, 9, 9, -7, 3)
    val plain = soundWav(data, new AudioFormat(8000f, 16, 2, true, false))
    val ext = extensibleWav(data, ch = 2, rate = 8000, bits = 16, d1 = 1)
    val (mp, sp) = WavDecode.decode(plain).get
    val (me, se) = WavDecode.decode(ext).get
    assert(me === mp && se.toSeq === sp.toSeq)
    // explicit wValidBitsPerSample equal to the container width is fine
    val extV = extensibleWav(data, 2, 8000, 16, d1 = 1, validBits = 16)
    assert(WavDecode.decode(extV).get._2.toSeq === sp.toSeq)
    // float32 through the GUID indirection (d1 = 3)
    val f = Array(0.5f, -1.0f, 0.25f, -0.125f)
    val fBytes = f.flatMap { x =>
      val b = java.lang.Float.floatToIntBits(x)
      Array((b & 0xff).toByte, ((b >> 8) & 0xff).toByte,
        ((b >> 16) & 0xff).toByte, ((b >> 24) & 0xff).toByte)
    }
    val extF = extensibleWav(fBytes, ch = 2, rate = 16000, bits = 32, d1 = 3)
    val (mf, sf) = WavDecode.decode(extF).get
    assert(mf === WavMeta(2, 16000, 32))
    // pinned against the documented fixed-point centering contract
    assert(sf.toSeq === f.toSeq.map(x =>
      math.max(-8388608.0, math.min(8388607.0, math.floor(x * 8388608.0 + 0.5))).toInt))
  }

  test("extensible rails: foreign GUIDs, sub-width valid bits, short fmt all refuse (round-14)") {
    val data = Array[Byte](0, 1, 2, 3)
    // ADPCM SubFormat (d1 = 2) is out of scope
    assert(WavDecode.decode(extensibleWav(data, 2, 8000, 16, d1 = 2)) === None)
    // a non-KSDATAFORMAT GUID suffix must not be trusted as PCM
    val badSuffix = Array(0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
      0x00, 0xaa, 0x00, 0x38, 0x9b, 0x72)
    assert(WavDecode.decode(
      extensibleWav(data, 2, 8000, 16, d1 = 1, guidSuffix = badSuffix)) === None)
    // 20 valid bits in a 24-bit container changes sample semantics
    val d24 = Array.tabulate(12)(_.toByte)
    assert(WavDecode.decode(
      extensibleWav(d24, 2, 8000, 24, d1 = 1, validBits = 20)) === None)
    // a 0xFFFE tag with a bare 16-byte fmt chunk is malformed
    val short = extensibleWav(data, 2, 8000, 16, d1 = 1)
    short(16) = 16 // fmt len shrunk under the extensible minimum
    assert(WavDecode.decode(short) === None)
    // cbSize below 22 cannot hold the GUID
    val cb = extensibleWav(data, 2, 8000, 16, d1 = 1)
    cb(36) = 20
    assert(WavDecode.decode(cb) === None)
  }

  test("out-of-scope and malformed containers fall back to None, never throw") {
    val pcm = Array.tabulate(64)(i => i.toByte)
    val base = WavDecode.wrapPcm8Mono(pcm, 8000)
    assert(WavDecode.decode(base).isDefined)
    assert(WavDecode.decode(Array[Byte]()) === None)
    assert(WavDecode.decode("RIFFnope".getBytes("US-ASCII")) === None)
    assert(WavDecode.decode(base.take(20)) === None) // truncated in fmt
    assert(WavDecode.decode(base.take(50)) === None) // truncated in data
    // float PCM (format tag 3) must be 32-bit — an 8-bit float
    // container is malformed, not decodable
    val fl = base.clone(); fl(20) = 3; assert(WavDecode.decode(fl) === None)
    // bits hacked to 24 over a 64-byte data chunk: 64 is not a whole
    // number of 3-byte frames — the ragged guard refuses
    val b24 = base.clone(); b24(34) = 24; assert(WavDecode.decode(b24) === None)
    // int PCM (format tag 1) at 32-bit stays out of scope
    val i32 = base.clone(); i32(34) = 32; assert(WavDecode.decode(i32) === None)
    // 3 channels out of scope
    val c3 = base.clone(); c3(22) = 3; assert(WavDecode.decode(c3) === None)
    // ragged data: declared 16-bit stereo frames are 4 bytes, so a
    // 66-byte data chunk is not a whole number of frames
    val ragged = WavDecode.wrapPcm8Mono(Array.tabulate(66)(_.toByte), 8000)
    ragged(34) = 16; ragged(22) = 2
    assert(WavDecode.decode(ragged) === None)
    // crafted huge declared data length: truncated-chunk guard refuses
    val huge = base.clone()
    huge(40) = 0xff.toByte; huge(41) = 0xff.toByte
    huge(42) = 0xff.toByte; huge(43) = 0x7f.toByte
    assert(WavDecode.decode(huge) === None)
  }

  test("audioStatsOf: integer stats match a direct recomputation; out-of-scope rows drop") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val clips = (1L to 5L).map { id =>
      id -> Array.fill(100 + rng.nextInt(400))(rng.nextInt(256).toByte)
    }
    val payloads = clips.map { case (id, pcm) =>
      (id, WavDecode.wrapPcm8Mono(pcm, 8000))
    } :+ ((99L, "not a wav".getBytes("US-ASCII")))
    val out = MultimodalPack.audioStatsOf(spark, payloads.toDS())
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 5 && !out.contains(99L))
    clips.foreach { case (id, pcm) =>
      val s = pcm.map(b => (b & 0xff) - 128)
      val r = out(id)
      assert(r.getLong(1) === s.length.toLong) // n_samples
      assert(r.getLong(2) === 8000L)
      assert(r.getLong(3) === s.length.toLong * 1000 / 8000)
      assert(r.getLong(4) === s.map(v => v.toLong * v).sum) // energy
      assert(r.getLong(5) === s.map(v => math.abs(v).toLong).max) // peak
      assert(r.getLong(6) === s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong)
      assert(r.getLong(7) === s.count(v => math.abs(v) <= 2).toLong)
    }
  }

  test("audioStatsOf stereo: frame-based duration, per-channel zero crossings") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    // 16000 Hz 16-bit stereo, 8000 frames = exactly 0.5 s
    val pcm = Array.fill(8000 * 4)(rng.nextInt(256).toByte)
    val wav = soundWav(pcm, new AudioFormat(16000f, 16, 2, true, false))
    val (_, samples) = WavDecode.decode(wav).get
    val r = MultimodalPack.audioStatsOf(spark, Seq((7L, wav)).toDS()).head()
    assert(r.getLong(1) === 16000L) // n_samples = total samples, both channels
    assert(r.getLong(2) === 16000L)
    // duration is FRAME-based: 8000 frames / 16000 Hz = 500 ms, not
    // the 1000 ms a total-sample count would claim
    assert(r.getLong(3) === 500L)
    assert(r.getLong(4) === samples.map(v => v.toLong * v).sum)
    // zero crossings counted WITHIN each channel of the interleaved
    // stream, never across the L/R boundary of one frame
    val perChannel = (0 until 2).map { c =>
      val chan = samples.indices.collect { case i if i % 2 == c => samples(i) }
      chan.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong
    }.sum
    assert(r.getLong(6) === perChannel)
  }

  test("m_audio key: one row per non-empty document, stats recompute exactly") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.SparkEntry.queries("m_audio")(spark, sfDir).collect()
    assert(out.length === docs.values.count(_.nonEmpty))
    out.take(20).foreach { r =>
      val s = docs(r.getLong(0)).getBytes("UTF-8").map(b => (b & 0xff) - 128)
      assert(r.getLong(1) === s.length.toLong)
      assert(r.getLong(4) === s.map(v => v.toLong * v).sum)
      assert(r.getLong(6) ===
        (if (s.length < 2) 0L else s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong))
    }
  }
}
