package graft.multimodal

import java.io.ByteArrayOutputStream

/** Hand-assembled baseline JPEG streams for DecodeSpec — the JPEG
  * twin of its hand-built PNGs: known quantized coefficients, CHOSEN
  * sampling grids / restart intervals, emitted through a minimal
  * spec-faithful encoder (T.81 §F.1: canonical Huffman codes, DC
  * differencing, AC run/size with ZRL/EOB, 0xFF00 stuffing, 1-padded
  * byte alignment, RSTn every Ri MCUs). The fixtures are
  * cross-checked against ImageIO's reader in the spec, so they can't
  * just mirror the decoder's bugs — they exercise exactly the shapes
  * ImageIO's WRITER never emits (4:2:2 chroma, declared sampling on
  * gray, restart markers with fill bytes). */
object JpegFixtures {

  /** Canonical encode tables: symbol → (code, length). DC: the 12
    * categories at 5 bits; AC: all 256 run/size symbols — 255 at
    * 9 bits + 1 at 10 (a DHT `bits` count is one BYTE, so 256 codes
    * cannot share one length) — valid canonical codes (Kraft < 1,
    * all-ones code unused at every length). */
  private val DC_BITS = Array.fill(12)(5)
  private val AC_BITS = Array.fill(255)(9) ++ Array(10)

  /** T.81 §C.2 canonical code assignment over non-decreasing lens. */
  private def canonical(lens: Array[Int]): Array[(Int, Int)] = {
    var code = 0
    var prev = lens(0)
    lens.map { l =>
      code <<= (l - prev)
      prev = l
      val c = code
      code += 1
      (c, l)
    }
  }
  private val dcCodes = canonical(DC_BITS)
  private val acCodes = canonical(AC_BITS)

  /** DHT payload for a table whose canonical codes are `lens`. */
  private def dhtPayload(tcTh: Int, lens: Array[Int]): Array[Byte] = {
    val bits = new Array[Int](17)
    lens.foreach(l => bits(l) += 1)
    (Array(tcTh) ++ bits.drop(1) ++ lens.indices).map(_.toByte)
  }

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** 1-pad to a byte boundary (T.81 §F.1.2.3). */
    def align(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private def category(v: Int): Int = {
    var c = 0
    var m = math.abs(v)
    while (m > 0) { c += 1; m >>= 1 }
    c
  }

  /** Encode one 8×8 block of quantized coefficients (natural order);
    * returns the new DC predictor. */
  private def encodeBlock(bw: BitWriter, coef: Array[Int], pred: Int): Int = {
    val dc = coef(0)
    val diff = dc - pred
    val c = category(diff)
    bw.put(dcCodes(c)._1, dcCodes(c)._2)
    if (c > 0) bw.put(if (diff >= 0) diff else diff + (1 << c) - 1, c)
    var k = 1
    var run = 0
    while (k < 64) {
      val v = coef(ZIGZAG(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { bw.put(acCodes(0xf0)._1, acCodes(0xf0)._2); run -= 16 }
        val sz = category(v)
        val sym = (run << 4) | sz
        bw.put(acCodes(sym)._1, acCodes(sym)._2)
        bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(acCodes(0x00)._1, acCodes(0x00)._2) // EOB
    dc
  }

  private def seg(out: ByteArrayOutputStream, marker: Int, payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload)
  }

  /** Assemble a baseline JPEG. `comps` = (id, h, v); `blocks(ci)(bi)`
    * = the bi-th 8×8 quantized-coefficient block of component ci, in
    * the order the SCAN consumes them (interleaved MCU order for 3
    * components, raster order for 1). Quant tables are identity
    * (all-1s). `restartInterval` > 0 emits DRI + a fill-byte-padded
    * RSTn after every Ri MCUs. `mcus` = total MCU count (drives the
    * restart cadence); `perMcu(ci)` = blocks of component ci per MCU. */
  def assemble(w: Int, h: Int, comps: Seq[(Int, Int, Int)],
               blocks: Seq[Seq[Array[Int]]], perMcu: Seq[Int], mcus: Int,
               restartInterval: Int = 0): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(out, 0xdb, (Array(0x00) ++ Array.fill(64)(1)).map(_.toByte)) // identity quant
    seg(out, 0xc0, (Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      comps.length) ++ comps.flatMap { case (id, ch, cv) =>
      Seq(id, (ch << 4) | cv, 0)
    }).map(_.toByte))
    seg(out, 0xc4, dhtPayload(0x00, DC_BITS)) // DC table 0
    seg(out, 0xc4, dhtPayload(0x10, AC_BITS)) // AC table 0
    if (restartInterval > 0)
      seg(out, 0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    seg(out, 0xda, (Array(comps.length) ++
      comps.flatMap(c => Seq(c._1, 0x00)) ++ Seq(0, 63, 0)).map(_.toByte))
    val bw = new BitWriter(out)
    val pred = Array.fill(comps.length)(0)
    val taken = Array.fill(comps.length)(0)
    var m = 0
    while (m < mcus) {
      if (restartInterval > 0 && m > 0 && m % restartInterval == 0) {
        bw.align()
        out.write(0xff); out.write(0xff) // FILL byte before the marker
        out.write(0xd0 + ((m / restartInterval - 1) % 8))
        java.util.Arrays.fill(pred, 0)
      }
      for (ci <- comps.indices; _ <- 0 until perMcu(ci)) {
        pred(ci) = encodeBlock(bw, blocks(ci)(taken(ci)), pred(ci))
        taken(ci) += 1
      }
      m += 1
    }
    bw.align()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** A deterministic sparse coefficient block: DC in a sane range,
    * a few small ACs (keeps IDCT output well inside the clamp). */
  def block(rng: scala.util.Random): Array[Int] = {
    val c = new Array[Int](64)
    c(0) = rng.nextInt(400) - 200
    (0 until 6).foreach { _ =>
      c(1 + rng.nextInt(63)) = rng.nextInt(61) - 30
    }
    c
  }
}
