package graft.multimodal

/** REAL baseline JPEG pixel decode (SURVEY §2 G2's last stub half —
  * round-11): pure-JVM entropy decode of baseline sequential DCT
  * Huffman JPEG (ITU-T T.81), no codec dependency — the JPEG twin of
  * [[Decode.pngPixels]]'s Inflater path.
  *
  * Pipeline (all public knowledge, each stage from its published
  * specification):
  *
  *   1. marker-segment walk: DQT quantization tables, DHT Huffman
  *      tables (canonical codes via T.81 §F.2.2.3's DECODE tables),
  *      SOF0 frame geometry, DRI restart interval, SOS scan header;
  *   2. MCU entropy decode: per-block DC (differential, per-component
  *      predictor) + AC (run/size, EOB/ZRL) exactly as T.81 §F.2.2,
  *      with 0xFF00 byte unstuffing and RSTn predictor resets;
  *   3. dequantize + the Loeffler–Ligtenberg–Moshovitz 8×8 integer
  *      IDCT (1989) in the 13-bit fixed-point arrangement every
  *      mainstream decoder ships (CONST_BITS=13 / PASS1_BITS=2 —
  *      the arrangement OpenJDK's bundled ImageIO JPEG reader uses,
  *      so the spec can pin output BYTE-EXACT against ImageIO as an
  *      independent reference decoder);
  *   4. chroma upsampling by the triangle filter (centers-between-
  *      samples weighting 3/4·near + 1/4·far) for the 2×1 and 2×2
  *      grids JFIF encoders emit, edge samples replicated;
  *   5. fixed-point YCbCr→RGB (CCIR 601 constants, 16-bit scaling).
  *
  * Scope (the declared contract, loudly bounded like the PNG path):
  * 8-bit-precision Huffman frames — SOF0 (baseline), SOF1 (extended
  * sequential, which at 8 bits decodes identically; rejecting it
  * would only refuse files some encoders mislabel) and SOF2
  * (progressive: spectral selection + successive approximation per
  * T.81 §G.2, decoded scan-by-scan into per-block coefficient
  * buffers and rendered at EOI — round-12) — with 1 or 3 components,
  * sampling grids gray / 4:4:4 / 4:2:2 / 4:2:0, and 8- OR 16-bit
  * (Pq=0/1) DQT tables (baseline proper forbids Pq=1; accepting it
  * is harmless leniency and the values flow through the same
  * dequantize path). Arithmetic coding, 12-bit sample precision,
  * hierarchical, and exotic grids return None — the deterministic
  * stub stays the fallback, and bad bytes are data, not exceptions,
  * at a 100 TB decode seam.
  */
object JpegDecode {

  /** Decoded-sample volume cap — same bound as [[Decode.pngPixels]]:
    * a crafted SOF must never force a multi-GB allocation. */
  private val MAX_SAMPLES = 1L << 28

  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in T.81 §F.2.2.3's MINCODE/MAXCODE/
    * VALPTR decode arrangement. */
  private final class HuffTable(bits: Array[Int], huffval: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int = huffval(valPtr(l) + code - minCode(l))
  }

  private final class Component(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var dcTab: HuffTable = _
    var acTab: HuffTable = _
    var pred: Int = 0
    var plane: Array[Byte] = _ // padded blocksW*8 × blocksH*8 samples
    var blocksW: Int = 0
    var blocksH: Int = 0
    var compW: Int = 0 // downsampled (cropped) dims
    var compH: Int = 0
    // progressive scan-sequence state (T.81 §G.1.1.1.1, round-13
    // ADVICE): the successive-approximation point each band has been
    // decoded to so far — −1 = not yet decoded. dcAl covers the DC
    // band; acAl(k) covers AC coefficient k (allocated on the
    // component's first AC scan). progressiveScan bails on an AC scan
    // before the DC first pass, a duplicate first pass (overlapping
    // re-decode), or a refinement whose Ah is not the band's current
    // point — a scan-script-illegal stream decodes to None, never to
    // Some(wrong pixels).
    var dcAl: Int = -1
    var acAl: Array[Int] = _
  }

  /** Decode failure as control flow, caught at the [[pixels]] seam —
    * keeps the hot loops free of Option boxing. */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  /** Entropy-coded-segment bit reader: 0xFF00 unstuffing; any other
    * marker mid-stream fails the decode (strict: a well-formed
    * baseline scan never needs the pad-with-ones recovery). */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= p.length) bail()
        var b = p(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= p.length) bail()
          val b2 = p(pos) & 0xff
          pos += 1
          if (b2 != 0x00) bail() // marker inside entropy data
          b = 0xff
        }
        acc = b; cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an RSTn marker (any index accepted).
      * T.81 §B.1.1.2 allows any number of 0xFF fill bytes before a
      * marker — skip them all, require ≥ 1. */
    def restart(): Unit = {
      cnt = 0
      if (pos >= p.length || (p(pos) & 0xff) != 0xff) bail()
      while (pos + 1 < p.length && (p(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= p.length) bail()
      val m = p(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) bail()
      pos += 2
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (code > t.maxCode(l)) {
        code = (code << 1) | bit()
        l += 1
        if (l > 16) bail()
      }
      t.value(l, code)
    }
  }

  /** T.81 §F.2.2.1 EXTEND: map a SIZE-bit magnitude to its signed
    * coefficient value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  // ---- integer IDCT (Loeffler–Ligtenberg–Moshovitz 1989) ----
  // 13-bit fixed-point constants: round(cos-product · 2^13) for the
  // rotator angles of the published flowgraph.
  private val CONST_BITS = 13
  private val PASS1_BITS = 2
  private val F_0_298631336 = 2446
  private val F_0_390180644 = 3196
  private val F_0_541196100 = 4433
  private val F_0_765366865 = 6270
  private val F_0_899976223 = 7373
  private val F_1_175875602 = 9633
  private val F_1_501321110 = 12299
  private val F_1_847759065 = 15137
  private val F_1_961570560 = 16069
  private val F_2_053119869 = 16819
  private val F_2_562915447 = 20995
  private val F_3_072711026 = 25172

  private def descale(x: Long, n: Int): Int = ((x + (1L << (n - 1))) >> n).toInt

  /** In-place 2-D IDCT of one dequantized 8×8 block (natural order)
    * into 8-bit samples written at plane[off + y·stride + x]. */
  private def idctBlock(coef: Array[Int], plane: Array[Byte], off: Int,
                        stride: Int): Unit = {
    val ws = new Array[Int](64)
    // pass 1: columns, scaled up by PASS1_BITS
    var c = 0
    while (c < 8) {
      if (coef(c + 8) == 0 && coef(c + 16) == 0 && coef(c + 24) == 0 &&
        coef(c + 32) == 0 && coef(c + 40) == 0 && coef(c + 48) == 0 &&
        coef(c + 56) == 0) {
        val dc = coef(c) << PASS1_BITS
        var i = 0
        while (i < 8) { ws(c + i * 8) = dc; i += 1 }
      } else {
        var z2 = coef(c + 16).toLong
        var z3 = coef(c + 48).toLong
        var z1 = (z2 + z3) * F_0_541196100
        val t2 = z1 + z3 * -F_1_847759065
        val t3 = z1 + z2 * F_0_765366865
        z2 = coef(c).toLong
        z3 = coef(c + 32).toLong
        val t0 = (z2 + z3) << CONST_BITS
        val t1 = (z2 - z3) << CONST_BITS
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = coef(c + 56).toLong
        var o1 = coef(c + 40).toLong
        var o2 = coef(c + 24).toLong
        var o3 = coef(c + 8).toLong
        z1 = o0 + o3
        z2 = o1 + o2
        z3 = o0 + o2
        var z4 = o1 + o3
        val z5 = (z3 + z4) * F_1_175875602
        o0 *= F_0_298631336
        o1 *= F_2_053119869
        o2 *= F_3_072711026
        o3 *= F_1_501321110
        z1 *= -F_0_899976223
        z2 *= -F_2_562915447
        z3 = z3 * -F_1_961570560 + z5
        z4 = z4 * -F_0_390180644 + z5
        o0 += z1 + z3
        o1 += z2 + z4
        o2 += z2 + z3
        o3 += z1 + z4
        ws(c) = descale(t10 + o3, CONST_BITS - PASS1_BITS)
        ws(c + 56) = descale(t10 - o3, CONST_BITS - PASS1_BITS)
        ws(c + 8) = descale(t11 + o2, CONST_BITS - PASS1_BITS)
        ws(c + 48) = descale(t11 - o2, CONST_BITS - PASS1_BITS)
        ws(c + 16) = descale(t12 + o1, CONST_BITS - PASS1_BITS)
        ws(c + 40) = descale(t12 - o1, CONST_BITS - PASS1_BITS)
        ws(c + 24) = descale(t13 + o0, CONST_BITS - PASS1_BITS)
        ws(c + 32) = descale(t13 - o0, CONST_BITS - PASS1_BITS)
      }
      c += 1
    }
    // pass 2: rows, final descale + level shift + clamp
    val shift = CONST_BITS + PASS1_BITS + 3
    var r = 0
    while (r < 8) {
      val b = r * 8
      val out = off + r * stride
      if (ws(b + 1) == 0 && ws(b + 2) == 0 && ws(b + 3) == 0 && ws(b + 4) == 0 &&
        ws(b + 5) == 0 && ws(b + 6) == 0 && ws(b + 7) == 0) {
        val dc = clamp8(descale(ws(b).toLong, PASS1_BITS + 3) + 128)
        var i = 0
        while (i < 8) { plane(out + i) = dc; i += 1 }
      } else {
        var z2 = ws(b + 2).toLong
        var z3 = ws(b + 6).toLong
        var z1 = (z2 + z3) * F_0_541196100
        val t2 = z1 + z3 * -F_1_847759065
        val t3 = z1 + z2 * F_0_765366865
        z2 = ws(b).toLong
        z3 = ws(b + 4).toLong
        val t0 = (z2 + z3) << CONST_BITS
        val t1 = (z2 - z3) << CONST_BITS
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = ws(b + 7).toLong
        var o1 = ws(b + 5).toLong
        var o2 = ws(b + 3).toLong
        var o3 = ws(b + 1).toLong
        z1 = o0 + o3
        z2 = o1 + o2
        z3 = o0 + o2
        var z4 = o1 + o3
        val z5 = (z3 + z4) * F_1_175875602
        o0 *= F_0_298631336
        o1 *= F_2_053119869
        o2 *= F_3_072711026
        o3 *= F_1_501321110
        z1 *= -F_0_899976223
        z2 *= -F_2_562915447
        z3 = z3 * -F_1_961570560 + z5
        z4 = z4 * -F_0_390180644 + z5
        o0 += z1 + z3
        o1 += z2 + z4
        o2 += z2 + z3
        o3 += z1 + z4
        plane(out) = clamp8(descale(t10 + o3, shift) + 128)
        plane(out + 7) = clamp8(descale(t10 - o3, shift) + 128)
        plane(out + 1) = clamp8(descale(t11 + o2, shift) + 128)
        plane(out + 6) = clamp8(descale(t11 - o2, shift) + 128)
        plane(out + 2) = clamp8(descale(t12 + o1, shift) + 128)
        plane(out + 5) = clamp8(descale(t12 - o1, shift) + 128)
        plane(out + 3) = clamp8(descale(t13 + o0, shift) + 128)
        plane(out + 4) = clamp8(descale(t13 - o0, shift) + 128)
      }
      r += 1
    }
  }

  private def clamp8(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  // ---- fixed-point YCbCr→RGB (CCIR 601, 16-bit scaling) ----
  private val SCALE = 16
  private val HALF = 1 << (SCALE - 1)
  private def fix(x: Double): Int = (x * (1 << SCALE) + 0.5).toInt
  private val crR = Array.tabulate(256)(i => (fix(1.40200) * (i - 128) + HALF) >> SCALE)
  private val cbB = Array.tabulate(256)(i => (fix(1.77200) * (i - 128) + HALF) >> SCALE)
  private val crG = Array.tabulate(256)(i => -fix(0.71414) * (i - 128))
  private val cbG = Array.tabulate(256)(i => -fix(0.34414) * (i - 128) + HALF)

  private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xff
  private def u16(p: Array[Byte], i: Int): Int = (u8(p, i) << 8) | u8(p, i + 1)

  /** Baseline JPEG → row-major interleaved 8-bit samples (gray: w·h
    * bytes; color: w·h·3 bytes, R,G,B order). None whenever the
    * payload is outside the declared scope or malformed. */
  def pixels(p: Array[Byte]): Option[Array[Byte]] =
    try decode(p) catch {
      case _: Bail => None
      case _: ArrayIndexOutOfBoundsException => None // truncated segment
    }

  private def decode(p: Array[Byte]): Option[Array[Byte]] = {
    if (p.length < 4 || u8(p, 0) != 0xff || u8(p, 1) != 0xd8) return None
    val qt = new Array[Array[Int]](4) // natural order
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var adobeTransform = -1 // APP14: 0 = none/RGB, 1 = YCbCr, 2 = YCCK
    var i = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 3 >= p.length) return None
      if (u8(p, i) != 0xff) return None
      var j = i
      while (j < p.length && u8(p, j) == 0xff) j += 1
      if (j >= p.length) return None
      val marker = u8(p, j)
      if ((marker >= 0xd0 && marker <= 0xd9) || marker == 0x01) { i = j + 1 }
      else {
        if (j + 2 >= p.length) return None
        val len = u16(p, j + 1)
        if (len < 2 || j + 1 + len > p.length) return None
        val seg = j + 3 // first payload byte
        val segEnd = j + 1 + len
        marker match {
          case 0xc0 | 0xc1 => // baseline / extended-sequential Huffman
            val (w, h, cs) = parseFrame(p, seg, segEnd).getOrElse(return None)
            width = w; height = h; comps = cs
          case 0xc2 => // progressive: its own multi-scan walk
            return decodeProgressive(p)
          case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
            return None // arithmetic / lossless / hierarchical
          case 0xc4 => // DHT: one or more tables per segment
            if (!parseDht(p, seg, segEnd, dcTabs, acTabs)) return None
          case 0xdb => // DQT
            if (!parseDqt(p, seg, segEnd, qt)) return None
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = u16(p, seg)
          case 0xee => // APP14: Adobe color-transform declaration
            if (len >= 14 &&
              new String(p, seg, 5, java.nio.charset.StandardCharsets.US_ASCII) == "Adobe")
              adobeTransform = u8(p, seg + 11)
          case 0xda => // SOS
            if (comps == null) return None
            val ns = u8(p, seg)
            if (ns != comps.length) return None // single interleaved scan only
            var k = 0
            while (k < ns) {
              val cid = u8(p, seg + 1 + 2 * k)
              val comp = comps.find(_.id == cid).getOrElse(return None)
              val td = u8(p, seg + 2 + 2 * k) >> 4
              val ta = u8(p, seg + 2 + 2 * k) & 15
              if (td > 3 || ta > 3) return None
              comp.dcTab = dcTabs(td)
              comp.acTab = acTabs(ta)
              if (comp.dcTab == null || comp.acTab == null || qt(comp.tq) == null)
                return None
              k += 1
            }
            sosAt = segEnd
          case _ => () // APPn / COM / other: skip
        }
        i = j + 1 + len
      }
    }

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    if (!frameInScope(comps, width, height, hMax, vMax, adobeTransform, MAX_SAMPLES))
      return None

    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { comp =>
      comp.blocksW = mcusX * comp.h
      comp.blocksH = mcusY * comp.v
      comp.compW = (width * comp.h + hMax - 1) / hMax
      comp.compH = (height * comp.v + vMax - 1) / vMax
      comp.plane = new Array[Byte](comp.blocksW * 8 * comp.blocksH * 8)
    }

    val br = new BitReader(p, sosAt)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      comps.foreach { comp =>
        val q = qt(comp.tq)
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val s = br.decode(comp.dcTab)
            if (s > 11) bail()
            comp.pred += extend(br.bits(s), s)
            coef(0) = comp.pred * q(0)
            // AC
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = br.decode(comp.acTab)
              val r = rs >> 4
              val sz = rs & 15
              if (sz == 0) {
                if (r == 15) k += 16 else open = false // ZRL / EOB
              } else {
                k += r
                if (k > 63 || sz > 10) bail()
                coef(ZIGZAG(k)) = extend(br.bits(sz), sz) * q(ZIGZAG(k))
                k += 1
              }
            }
            val stride = comp.blocksW * 8
            idctBlock(coef, comp.plane,
              ((my * comp.v + by) * 8) * stride + (mx * comp.h + bx) * 8, stride)
            bx += 1
          }
          by += 1
        }
      }
      mcu += 1
    }

    emit(comps, width, height, hMax, vMax)
  }

  /** Shared scope guard for both frame kinds: sampling grids gray /
    * 4:4:4 / 4:2:2 / 4:2:0 only, JFIF YCbCr color convention, sample
    * volume capped before any allocation. */
  private def frameInScope(comps: Array[Component], width: Int, height: Int,
                           hMax: Int, vMax: Int, adobeTransform: Int,
                           maxSamples: Long): Boolean = {
    if (hMax < 1 || hMax > 2 || vMax < 1 || vMax > 2) return false
    // declared scope: every non-luma component at 1×1 and the luma
    // grid one of 1×1 / 2×1 / 2×2 (gray, 4:4:4, 4:2:2, 4:2:0 — what
    // JFIF encoders emit). The 1×2 luma (4:4:0) grid is EXOTIC by the
    // class contract and must fall back, not decode through an
    // upsample path no reference decoder pins.
    if (comps.length == 3 && comps.drop(1).exists(c => c.h != 1 || c.v != 1))
      return false
    if (comps.length == 3 && comps(0).h == 1 && comps(0).v == 2) return false
    // the color convert assumes JFIF YCbCr: an Adobe stream declaring
    // transform 0 (RGB) — or components not carrying the JFIF 1/2/3
    // ids — would decode to garbage colors; fall back
    if (comps.length == 3 &&
      (adobeTransform == 0 || comps.map(_.id).toSeq != Seq(1, 2, 3)))
      return false
    if (comps.exists(c => c.h < 1 || c.h > hMax || c.v < 1 || c.v > vMax))
      return false
    width.toLong * height * comps.length <= maxSamples
  }

  /** Decoded component planes → the seam's output layout: upsample to
    * full resolution, then gray passthrough or YCbCr→RGB interleave. */
  private def emit(comps: Array[Component], width: Int, height: Int,
                   hMax: Int, vMax: Int): Option[Array[Byte]] = {
    val planes = comps.map(upsample(_, width, height, hMax, vMax))
    if (comps.length == 1) Some(planes(0))
    else {
      val y = planes(0); val cb = planes(1); val cr = planes(2)
      val out = new Array[Byte](width * height * 3)
      var px = 0
      val n = width * height
      while (px < n) {
        val yy = y(px) & 0xff
        val cbv = cb(px) & 0xff
        val crv = cr(px) & 0xff
        out(3 * px) = clamp8(yy + crR(crv))
        out(3 * px + 1) = clamp8(yy + ((cbG(cbv) + crG(crv)) >> SCALE))
        out(3 * px + 2) = clamp8(yy + cbB(cbv))
        px += 1
      }
      Some(out)
    }
  }

  /** SOF frame header, shared by the sequential (SOF0/SOF1) and
    * progressive (SOF2) paths: 8-bit-precision check, geometry, and
    * the per-component (id, sampling, tq) parse. Single-component
    * frames normalize the sampling factors to 1×1 — a one-component
    * scan is NON-INTERLEAVED (T.81 §A.2.3): its MCU is one 8×8 block
    * in raster order at the component's full resolution, so declared
    * factors are layout-inert (decoding them as interleaved MCUs
    * would block-scramble a gray stream carrying 2×2 factors). None
    * on a malformed or out-of-scope header. */
  private def parseFrame(p: Array[Byte], seg: Int, segEnd: Int)
      : Option[(Int, Int, Array[Component])] = {
    if (u8(p, seg) != 8) return None // precision
    val height = u16(p, seg + 1)
    val width = u16(p, seg + 3)
    val nc = u8(p, seg + 5)
    if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return None
    val comps = new Array[Component](nc)
    var k = 0
    while (k < nc) {
      val o = seg + 6 + 3 * k
      if (o + 2 >= segEnd) return None
      comps(k) =
        if (nc == 1) new Component(u8(p, o), 1, 1, u8(p, o + 2))
        else new Component(u8(p, o), u8(p, o + 1) >> 4, u8(p, o + 1) & 15, u8(p, o + 2))
      k += 1
    }
    Some((width, height, comps))
  }

  /** DHT segment: one or more canonical Huffman tables. False on a
    * malformed segment (the caller falls back). */
  private def parseDht(p: Array[Byte], seg: Int, segEnd: Int,
                       dcTabs: Array[HuffTable], acTabs: Array[HuffTable]): Boolean = {
    var o = seg
    while (o < segEnd) {
      val tc = u8(p, o) >> 4
      val th = u8(p, o) & 15
      if (tc > 1 || th > 3 || o + 17 > segEnd) return false
      val bits = new Array[Int](17)
      var n = 0
      var l = 1
      while (l <= 16) { bits(l) = u8(p, o + l); n += bits(l); l += 1 }
      if (n > 256 || o + 17 + n > segEnd) return false
      val vals = Array.tabulate(n)(k => u8(p, o + 17 + k))
      val t = new HuffTable(bits, vals)
      if (tc == 0) dcTabs(th) = t else acTabs(th) = t
      o += 17 + n
    }
    true
  }

  /** DQT segment: one or more 8- or 16-bit quantization tables,
    * de-zigzagged to natural order. */
  private def parseDqt(p: Array[Byte], seg: Int, segEnd: Int,
                       qt: Array[Array[Int]]): Boolean = {
    var o = seg
    while (o < segEnd) {
      val pq = u8(p, o) >> 4
      val tq = u8(p, o) & 15
      if (pq > 1 || tq > 3) return false
      val n = if (pq == 0) 64 else 128
      if (o + 1 + n > segEnd) return false
      val t = new Array[Int](64)
      var k = 0
      while (k < 64) {
        t(ZIGZAG(k)) = if (pq == 0) u8(p, o + 1 + k) else u16(p, o + 1 + 2 * k)
        k += 1
      }
      qt(tq) = t
      o += 1 + n
    }
    true
  }

  // ---- progressive (SOF2) — T.81 §G.2 ----

  /** Progressive decode: scans accumulate spectral-selection bands and
    * successive-approximation passes into per-block COEFFICIENT
    * buffers (raw, unquantized — T.81 §G.1.2); dequantize + IDCT run
    * once at EOI. The walk therefore differs from the sequential
    * path's: SOS does not end it — DHT/DQT/DRI may be redefined
    * between scans, and only EOI (or a malformed segment) stops the
    * loop. Coefficient memory holds the whole frame in ints, so the
    * sample-volume cap is 4× tighter than the streaming sequential
    * path's. */
  private def decodeProgressive(p: Array[Byte]): Option[Array[Byte]] = {
    val qt = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var coefs: Array[Array[Int]] = null // per component: block grid × 64, natural order
    var width = 0
    var height = 0
    var restartInterval = 0
    var adobeTransform = -1
    var hMax = 0
    var vMax = 0
    var mcusX = 0
    var mcusY = 0
    var sawScan = false
    var i = 2
    var eoi = false
    while (!eoi) {
      if (i + 1 >= p.length) return None
      if (u8(p, i) != 0xff) return None
      var j = i
      while (j < p.length && u8(p, j) == 0xff) j += 1
      if (j >= p.length) return None
      val marker = u8(p, j)
      if (marker == 0xd9) { eoi = true }
      else if ((marker >= 0xd0 && marker <= 0xd8) || marker == 0x01) { i = j + 1 }
      else {
        if (j + 2 >= p.length) return None
        val len = u16(p, j + 1)
        if (len < 2 || j + 1 + len > p.length) return None
        val seg = j + 3
        val segEnd = j + 1 + len
        var next = segEnd
        marker match {
          case 0xc2 =>
            if (comps != null) return None // one frame per stream
            val (w, h, cs) = parseFrame(p, seg, segEnd).getOrElse(return None)
            width = w; height = h; comps = cs
            hMax = comps.map(_.h).max
            vMax = comps.map(_.v).max
            // allocation guard BEFORE the buffers exist; the full
            // scope check (incl. a late Adobe APP14) re-runs at EOI
            if (!frameInScope(comps, width, height, hMax, vMax,
              adobeTransform, MAX_SAMPLES >> 2)) return None
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            comps.foreach { c =>
              c.blocksW = mcusX * c.h
              c.blocksH = mcusY * c.v
              c.compW = (width * c.h + hMax - 1) / hMax
              c.compH = (height * c.v + vMax - 1) / vMax
            }
            coefs = comps.map(c => new Array[Int](c.blocksW * c.blocksH * 64))
          case m if m >= 0xc0 && m <= 0xcf && m != 0xc2 && m != 0xc4 &&
            m != 0xc8 && m != 0xcc =>
            return None // a second frame kind inside a progressive stream
          case 0xc4 => if (!parseDht(p, seg, segEnd, dcTabs, acTabs)) return None
          case 0xdb => if (!parseDqt(p, seg, segEnd, qt)) return None
          case 0xdd =>
            if (len != 4) return None
            restartInterval = u16(p, seg)
          case 0xee => // APP14: Adobe color-transform declaration
            if (len >= 14 &&
              new String(p, seg, 5, java.nio.charset.StandardCharsets.US_ASCII) == "Adobe")
              adobeTransform = u8(p, seg + 11)
          case 0xda =>
            if (comps == null) return None
            next = progressiveScan(p, seg, segEnd, comps, coefs, dcTabs, acTabs,
              mcusX, mcusY, restartInterval)
            sawScan = true
          case _ => () // APPn / COM / DNL: skip
        }
        i = next
      }
    }
    if (comps == null || !sawScan) return None
    if (!frameInScope(comps, width, height, hMax, vMax, adobeTransform,
      MAX_SAMPLES >> 2)) return None

    // dequantize + IDCT every block (dummy padded blocks render too —
    // they carry interleaved-scan DC state but no visible pixels)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = qt(c.tq)
      if (q == null) return None
      c.plane = new Array[Byte](c.blocksW * 8 * c.blocksH * 8)
      val stride = c.blocksW * 8
      val cf = coefs(ci)
      val block = new Array[Int](64)
      var by = 0
      while (by < c.blocksH) {
        var bx = 0
        while (bx < c.blocksW) {
          val off = (by * c.blocksW + bx) * 64
          var k = 0
          while (k < 64) { block(k) = cf(off + k) * q(k); k += 1 }
          idctBlock(block, c.plane, (by * 8) * stride + bx * 8, stride)
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    emit(comps, width, height, hMax, vMax)
  }

  /** One SOS of a progressive frame: returns the position immediately
    * after the scan's entropy-coded data. DC scans (Ss=0) may be
    * interleaved; AC scans are single-component by the standard.
    * First passes (Ah=0) decode magnitudes at the Al point transform
    * with EOB-run coding; refinement passes (Ah>0) add one correction
    * bit per already-nonzero coefficient and place ±2^Al at newly
    * nonzero positions (§G.1.2.3). */
  private def progressiveScan(p: Array[Byte], seg: Int, segEnd: Int,
      comps: Array[Component], coefs: Array[Array[Int]],
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      mcusX: Int, mcusY: Int, restartInterval: Int): Int = {
    val ns = u8(p, seg)
    if (ns < 1 || ns > comps.length || seg + 1 + 2 * ns + 3 > segEnd) bail()
    val scanComps = new Array[Int](ns) // indices into comps
    var sc = 0
    while (sc < ns) {
      val cid = u8(p, seg + 1 + 2 * sc)
      val ci = comps.indexWhere(_.id == cid)
      if (ci < 0) bail()
      val td = u8(p, seg + 2 + 2 * sc) >> 4
      val ta = u8(p, seg + 2 + 2 * sc) & 15
      if (td > 3 || ta > 3) bail()
      comps(ci).dcTab = dcTabs(td)
      comps(ci).acTab = acTabs(ta)
      scanComps(sc) = ci
      sc += 1
    }
    val o = seg + 1 + 2 * ns
    val ss = u8(p, o)
    val se = u8(p, o + 1)
    val ah = u8(p, o + 2) >> 4
    val al = u8(p, o + 2) & 15
    val dcScan = ss == 0
    if (dcScan && se != 0) bail() // DC band is exactly {0}
    if (!dcScan && (ns != 1 || ss > se || se > 63)) bail()
    if (al > 13 || ah > 13 || (ah != 0 && ah != al + 1)) bail()
    // table presence for what this scan actually reads (a DC
    // refinement scan is raw bits — no table needed)
    if (dcScan && ah == 0 && scanComps.exists(ci => comps(ci).dcTab == null)) bail()
    if (!dcScan && comps(scanComps(0)).acTab == null) bail()
    // scan-sequence legality (T.81 §G.1.1.1.1, round-13 ADVICE): a
    // component may appear only once per SOS; every band must be
    // decoded first-pass-then-refinements with contiguous points. The
    // old behavior — decoding an illegal script to Some(wrong
    // pixels) — broke the seam's "bad bytes are data → None" contract.
    var dup = 0
    while (dup < ns) {
      var dup2 = dup + 1
      while (dup2 < ns) {
        if (scanComps(dup) == scanComps(dup2)) bail()
        dup2 += 1
      }
      dup += 1
    }
    sc = 0
    while (sc < ns) {
      val comp = comps(scanComps(sc))
      if (dcScan) {
        if (ah == 0) { if (comp.dcAl >= 0) bail() } // duplicate first pass
        else if (comp.dcAl != ah) bail() // refinement off the current point
      } else {
        if (comp.dcAl < 0) bail() // AC before the component's DC first pass
        if (comp.acAl == null) comp.acAl = Array.fill(64)(-1)
        var k = ss
        while (k <= se) {
          if (ah == 0) { if (comp.acAl(k) >= 0) bail() }
          else if (comp.acAl(k) != ah) bail()
          k += 1
        }
      }
      sc += 1
    }
    // record the band points up front: a mid-scan bail aborts the
    // whole decode, so there is no partial-progress state to unwind
    sc = 0
    while (sc < ns) {
      val comp = comps(scanComps(sc))
      if (dcScan) comp.dcAl = al
      else { var k = ss; while (k <= se) { comp.acAl(k) = al; k += 1 } }
      sc += 1
    }

    comps.foreach(_.pred = 0)
    var eobrun = 0
    val br = new BitReader(p, segEnd)

    def refineAc(coef: Array[Int], at: Int, p1: Int, m1: Int): Unit = {
      val v = coef(at)
      if (br.bit() != 0 && (v & p1) == 0)
        coef(at) = v + (if (v >= 0) p1 else m1)
    }

    // decode THIS scan's contribution to one block at offset `off`
    def block(ci: Int, off: Int): Unit = {
      val comp = comps(ci)
      val coef = coefs(ci)
      if (dcScan) {
        if (ah == 0) {
          val s = br.decode(comp.dcTab)
          if (s > 11) bail()
          comp.pred += extend(br.bits(s), s)
          coef(off) = comp.pred << al
        } else if (br.bit() != 0) coef(off) |= (1 << al)
      } else if (ah == 0) { // AC first pass: EOB-run coding at Al
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          var open = true
          while (open && k <= se) {
            val rs = br.decode(comp.acTab)
            val r = rs >> 4
            val sz = rs & 15
            if (sz == 0) {
              if (r == 15) k += 16 // ZRL
              else {
                eobrun = (1 << r) - 1 // this block is run member 0
                if (r > 0) eobrun += br.bits(r)
                open = false
              }
            } else {
              k += r
              if (k > se || sz > 10) bail()
              coef(off + ZIGZAG(k)) = extend(br.bits(sz), sz) << al
              k += 1
            }
          }
        }
      } else { // AC refinement pass
        val p1 = 1 << al
        val m1 = -(1 << al)
        var k = ss
        if (eobrun == 0) {
          var open = true
          while (open && k <= se) {
            val rs = br.decode(comp.acTab)
            var r = rs >> 4
            val sz = rs & 15
            var newVal = 0
            if (sz == 0) {
              if (r != 15) { // EOBr: includes THIS block (closed below)
                eobrun = 1 << r
                if (r > 0) eobrun += br.bits(r)
                open = false
              }
            } else {
              if (sz != 1) bail() // refinement magnitudes are ±1 only
              newVal = if (br.bit() != 0) p1 else m1
            }
            if (open) {
              // advance over r zero-HISTORY coefficients, emitting a
              // correction bit at every nonzero one passed over
              var stop = false
              while (!stop && k <= se) {
                val at = off + ZIGZAG(k)
                if (coef(at) != 0) { refineAc(coef, at, p1, m1); k += 1 }
                else if (r == 0) stop = true
                else { r -= 1; k += 1 }
              }
              if (newVal != 0) {
                if (k > se) bail()
                coef(off + ZIGZAG(k)) = newVal
              }
              k += 1
            }
          }
        }
        if (eobrun > 0) {
          // inside an EOB run: only correction bits for nonzero history
          while (k <= se) {
            val at = off + ZIGZAG(k)
            if (coef(at) != 0) refineAc(coef, at, p1, m1)
            k += 1
          }
          eobrun -= 1
        }
      }
    }

    if (ns > 1) { // interleaved (DC-only by the header checks)
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart()
          comps.foreach(_.pred = 0)
          eobrun = 0
        }
        val my = mcu / mcusX
        val mx = mcu % mcusX
        var k = 0
        while (k < ns) {
          val ci = scanComps(k)
          val comp = comps(ci)
          var by = 0
          while (by < comp.v) {
            var bx = 0
            while (bx < comp.h) {
              block(ci, ((my * comp.v + by) * comp.blocksW + (mx * comp.h + bx)) * 64)
              bx += 1
            }
            by += 1
          }
          k += 1
        }
        mcu += 1
      }
    } else {
      // non-interleaved: raster over the component's OWN ceil grid
      // (§A.2.2 — the padded MCU grid's dummy blocks are not coded in
      // a single-component scan); one MCU = one block for restarts
      val ci = scanComps(0)
      val comp = comps(ci)
      val wb = (comp.compW + 7) / 8
      val hb = (comp.compH + 7) / 8
      var n = 0
      val total = wb * hb
      while (n < total) {
        if (restartInterval > 0 && n > 0 && n % restartInterval == 0) {
          br.restart()
          comps.foreach(_.pred = 0)
          eobrun = 0
        }
        block(ci, ((n / wb) * comp.blocksW + (n % wb)) * 64)
        n += 1
      }
    }
    br.pos
  }

  /** Component plane (padded block grid) → full-resolution w×h plane.
    * 1×1 crops; 2×1 and 2×2 use the centers-between-samples triangle
    * filter (3/4 nearer + 1/4 farther, edges replicated) — the
    * standard JFIF reconstruction for co-sited-at-center chroma. */
  private def upsample(c: Component, w: Int, h: Int, hMax: Int, vMax: Int): Array[Byte] = {
    val stride = c.blocksW * 8
    val hs = hMax / c.h // 1 or 2
    val vs = vMax / c.v
    if (hs == 1 && vs == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(c.plane, y * stride, out, y * w, w)
        y += 1
      }
      return out
    }
    val cw = c.compW
    val chh = c.compH
    // hs == 2 always here: the scope guard rejects 1×2 luma, so a
    // non-passthrough component is horizontally subsampled
    val sums = new Array[Int](cw)
    val wide = new Array[Byte](2 * cw) // horizontal pass output
    val out = new Array[Byte](w * h)
    var oy = 0
    while (oy < h) {
      if (vs == 2) {
        // 2×2: vertical triangle first (3·near + far per column, 4×
        // scale), then the horizontal triangle over the sums with
        // rounding +8 (left phase) / +7 (right phase) at the 16×
        // scale — the standard centers-between-samples reconstruction
        val iy = oy / 2
        val near = iy * stride
        val farRow = if ((oy & 1) == 0) math.max(iy - 1, 0) else math.min(iy + 1, chh - 1)
        val far = farRow * stride
        var x = 0
        while (x < cw) {
          sums(x) = (c.plane(near + x) & 0xff) * 3 + (c.plane(far + x) & 0xff)
          x += 1
        }
        if (cw == 1) {
          wide(0) = ((sums(0) * 4 + 8) >> 4).toByte
          wide(1) = ((sums(0) * 4 + 7) >> 4).toByte
        } else {
          wide(0) = ((sums(0) * 4 + 8) >> 4).toByte
          wide(1) = ((sums(0) * 3 + sums(1) + 7) >> 4).toByte
          var x2 = 1
          while (x2 < cw - 1) {
            wide(2 * x2) = ((sums(x2) * 3 + sums(x2 - 1) + 8) >> 4).toByte
            wide(2 * x2 + 1) = ((sums(x2) * 3 + sums(x2 + 1) + 7) >> 4).toByte
            x2 += 1
          }
          wide(2 * cw - 2) = ((sums(cw - 1) * 3 + sums(cw - 2) + 8) >> 4).toByte
          wide(2 * cw - 1) = ((sums(cw - 1) * 4 + 7) >> 4).toByte
        }
      } else {
        // 2×1: the horizontal-only triangle runs at the 4× scale with
        // its OWN rounding — +1 on the left-neighbor phase, +2 on the
        // right-neighbor phase, first/last output columns copied —
        // NOT the 2×2 constants quarter-scaled (+2/+1, which would be
        // off by one whenever 3·near + far lands on the tie; the
        // reference decoder's 4:2:2 path rounds +1/+2)
        val row = oy * stride
        def s(x: Int): Int = c.plane(row + x) & 0xff
        if (cw == 1) {
          wide(0) = s(0).toByte
          wide(1) = s(0).toByte
        } else {
          wide(0) = s(0).toByte
          wide(1) = ((s(0) * 3 + s(1) + 2) >> 2).toByte
          var x2 = 1
          while (x2 < cw - 1) {
            wide(2 * x2) = ((s(x2) * 3 + s(x2 - 1) + 1) >> 2).toByte
            wide(2 * x2 + 1) = ((s(x2) * 3 + s(x2 + 1) + 2) >> 2).toByte
            x2 += 1
          }
          wide(2 * cw - 2) = ((s(cw - 1) * 3 + s(cw - 2) + 1) >> 2).toByte
          wide(2 * cw - 1) = s(cw - 1).toByte
        }
      }
      System.arraycopy(wide, 0, out, oy * w, w)
      oy += 1
    }
    out
  }
}
