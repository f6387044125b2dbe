package graft.img

/** Minimal baseline JPEG/JFIF codec (ITU-T T.81), from scratch — the LOSSY
  * leg of the image pipeline's per-row invariant (BASELINE.json input_hint:
  * decoded-pixel PSNR ≥ 40 dB for lossy formats, bit-exact for lossless).
  * Like the PNG/BMP codecs in [[Codecs]], it is lock-free and
  * allocation-lean so executor threads never serialize on a shared
  * registry (the measured ImageIO ceiling — see ImageTable).
  *
  * Encoder: baseline sequential DCT, 8-bit, YCbCr 4:4:4 (one 8×8 block per
  * component per MCU), Annex K quantization tables scaled by the IJG
  * quality formula, Annex K.3 Huffman tables, single interleaved scan.
  * 4:4:4 keeps chroma full-resolution: on the synthetic gradient corpus the
  * quality-90 round trip stays comfortably above the 40 dB line.
  *
  * Decoder: baseline SOF0/SOF1 AND progressive SOF2 (spectral selection +
  * successive approximation, T.81 §G), 1–3 components, sampling factors
  * 1–2 in each axis (4:4:4 / 4:2:2 / 4:2:0), restart markers, 8-bit quant
  * tables, tables read FROM THE STREAM — so it decodes third-party files
  * (e.g. javax.imageio's 4:2:0 baseline or progressive output), not just
  * its own. Chroma upsampling is the libjpeg-family triangular filter;
  * IDCT is the exact separable double-precision transform (T.81 does not
  * mandate a bit-exact IDCT, so decoder outputs are compared by PSNR, not
  * equality).
  *
  * CodecsSpec cross-checks both directions against javax.imageio.
  */
object Jpeg {

  def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8

  // ——————————————————— shared tables (T.81 Annex K) ———————————————————

  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val Q_LUM: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val Q_CHROM: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // K.3 standard Huffman specs: (#codes of length 1..16, symbol values).
  // Correctness does not hinge on recall fidelity: both tables are WRITTEN
  // INTO the stream (DHT) and the decoder reads whatever the stream says;
  // a deviation would only shift compression ratio.
  private val DC_LUM_BITS = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DC_LUM_VALS = (0 to 11).map(_.toByte).toArray
  private val DC_CHROM_BITS = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DC_CHROM_VALS = (0 to 11).map(_.toByte).toArray

  private val AC_LUM_BITS = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AC_LUM_VALS: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA).map(_.toByte)

  private val AC_CHROM_BITS = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AC_CHROM_VALS: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA).map(_.toByte)

  // separable DCT basis: COS(u)(x) = c(u)/2 · cos((2x+1)uπ/16)
  private val COS: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** IJG quality (1..100) → scaled Annex K table, entries clamped 1..255. */
  private def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  // ——————————————————————————— encoder ———————————————————————————

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nBits = 0
    def put(bits: Int, n: Int): Unit = {
      acc = (acc << n) | (bits & ((1L << n) - 1))
      nBits += n
      while (nBits >= 8) {
        val b = ((acc >>> (nBits - 8)) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Unit = if (nBits > 0) put(0x7F, 8 - nBits) // pad with 1s
  }

  /** canonical (code,size) per symbol from a (bits, vals) spec */
  private def buildEncTable(bits: Array[Int], vals: Array[Byte]): (Array[Int], Array[Int]) = {
    require(bits.sum == vals.length, "huffman spec mismatch")
    val code = new Array[Int](256)
    val size = new Array[Int](256)
    var k = 0
    var c = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        val sym = vals(k) & 0xFF
        code(sym) = c
        size(sym) = len
        c += 1; k += 1; i += 1
      }
      c <<= 1
      len += 1
    }
    (code, size)
  }

  @inline private def clamp255(v: Double): Int =
    if (v < 0) 0 else if (v > 255) 255 else (v + 0.5).toInt

  /** magnitude category (0..11) of a coefficient value */
  @inline private def category(v: Int): Int = {
    var a = math.abs(v)
    var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** Encode RGB pixels (0xRRGGBB row-major) as baseline JFIF 4:4:4.
    * Default quality 97: the synthetic corpus is full of wrapping-band
    * discontinuities (worst case for DCT ringing) — measured over the full
    * 500-image sweep, quality 95 bottoms out at 37.97 dB while 97 keeps
    * every image ≥ 41.5 dB, clearing the 40 dB lossy invariant with margin
    * while still compressing ~5× vs raw.
    *
    * `restartInterval` > 0 emits DRI + RSTn markers every that many MCUs
    * (error-resilience islands; also what makes the decoder's restart
    * path testable against an independent decoder — ImageIO never writes
    * DRI on its own).
    */
  def encode(pixels: Array[Int], w: Int, h: Int, quality: Int = 97,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h, "bad dimensions")
    require(w <= 65535 && h <= 65535, s"jpeg: ${w}x$h exceeds the 16-bit SOF dimension limit")
    require(restartInterval >= 0 && restartInterval <= 65535,
      s"jpeg: restartInterval $restartInterval exceeds the 16-bit DRI field")
    val qLum = scaledQuant(Q_LUM, quality)
    val qChrom = scaledQuant(Q_CHROM, quality)
    val out = new java.io.ByteArrayOutputStream(1024 + pixels.length / 2)

    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }

    marker(0xD8) // SOI
    marker(0xE0); u16(16) // APP0 JFIF
    out.write(Array('J', 'F', 'I', 'F', 0).map(_.toByte), 0, 5)
    out.write(1); out.write(1) // version 1.1
    out.write(0); u16(1); u16(1) // aspect-ratio units, 1:1
    out.write(0); out.write(0) // no thumbnail

    // DQT: both tables in one segment, 8-bit precision, zigzag order
    marker(0xDB); u16(2 + 2 * 65)
    out.write(0x00); for (i <- 0 until 64) out.write(qLum(ZIGZAG(i)))
    out.write(0x01); for (i <- 0 until 64) out.write(qChrom(ZIGZAG(i)))

    // SOF0: 3 components, 1×1 sampling each (4:4:4)
    marker(0xC0); u16(8 + 3 * 3)
    out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write(0x11); out.write(0) // Y  → quant 0
    out.write(2); out.write(0x11); out.write(1) // Cb → quant 1
    out.write(3); out.write(0x11); out.write(1) // Cr → quant 1

    // DHT: all four standard tables in one segment
    def dht(clazz: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      out.write((clazz << 4) | id)
      bits.foreach(out.write)
      out.write(vals, 0, vals.length)
    }
    val dhtLen = 2 + 4 * 17 + DC_LUM_VALS.length + AC_LUM_VALS.length +
      DC_CHROM_VALS.length + AC_CHROM_VALS.length
    marker(0xC4); u16(dhtLen)
    dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
    dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)

    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }

    // SOS
    marker(0xDA); u16(6 + 2 * 3)
    out.write(3)
    out.write(1); out.write(0x00) // Y:  DC 0 / AC 0
    out.write(2); out.write(0x11) // Cb: DC 1 / AC 1
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl (baseline fixed)

    val (dcLumCode, dcLumSize) = buildEncTable(DC_LUM_BITS, DC_LUM_VALS)
    val (acLumCode, acLumSize) = buildEncTable(AC_LUM_BITS, AC_LUM_VALS)
    val (dcChromCode, dcChromSize) = buildEncTable(DC_CHROM_BITS, DC_CHROM_VALS)
    val (acChromCode, acChromSize) = buildEncTable(AC_CHROM_BITS, AC_CHROM_VALS)

    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)

    def fdctQuantize(q: Array[Int]): Unit = {
      // rows then columns, exact separable transform
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var x = 0
          while (x < 8) { s += block(v * 8 + x) * COS(u)(x); x += 1 }
          tmp(v * 8 + u) = s
          u += 1
        }
        v += 1
      }
      var u = 0
      while (u < 8) {
        var vv = 0
        while (vv < 8) {
          var s = 0.0
          var y = 0
          while (y < 8) { s += tmp(y * 8 + u) * COS(vv)(y); y += 1 }
          val z = s / q(vv * 8 + u)
          coef(vv * 8 + u) = math.round(z).toInt
          vv += 1
        }
        u += 1
      }
    }

    def emitBlock(dcPrev: Int, q: Array[Int], dcCode: Array[Int], dcSize: Array[Int],
        acCode: Array[Int], acSize: Array[Int]): Int = {
      fdctQuantize(q)
      val dc = coef(0)
      val diff = dc - dcPrev
      val cat = category(diff)
      bw.put(dcCode(cat), dcSize(cat))
      if (cat > 0) bw.put(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      var run = 0
      var i = 1
      while (i < 64) {
        val v = coef(ZIGZAG(i))
        if (v == 0) run += 1
        else {
          while (run > 15) { bw.put(acCode(0xF0), acSize(0xF0)); run -= 16 }
          val c = category(v)
          val sym = (run << 4) | c
          bw.put(acCode(sym), acSize(sym))
          bw.put(if (v >= 0) v else v + (1 << c) - 1, c)
          run = 0
        }
        i += 1
      }
      if (run > 0) bw.put(acCode(0x00), acSize(0x00)) // EOB
      dc
    }

    // 4:4:4 ⇒ one MCU = one 8×8 block per component; edge blocks replicate
    val mcuW = (w + 7) / 8
    val mcuH = (h + 7) / 8
    var dcY = 0; var dcCb = 0; var dcCr = 0
    val yCh = new Array[Double](64); val cbCh = new Array[Double](64); val crCh = new Array[Double](64)
    var mcuCount = 0
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        if (restartInterval > 0 && mcuCount > 0 && mcuCount % restartInterval == 0) {
          bw.flush() // pad to a byte boundary, then the restart marker
          marker(0xD0 + ((mcuCount / restartInterval - 1) & 7))
          dcY = 0; dcCb = 0; dcCr = 0
        }
        mcuCount += 1
        var yy = 0
        while (yy < 8) {
          val py = math.min(my * 8 + yy, h - 1)
          var xx = 0
          while (xx < 8) {
            val px = math.min(mx * 8 + xx, w - 1)
            val rgb = pixels(py * w + px)
            val r = (rgb >>> 16) & 0xFF; val g = (rgb >>> 8) & 0xFF; val b = rgb & 0xFF
            val i = yy * 8 + xx
            yCh(i) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            cbCh(i) = -0.168736 * r - 0.331264 * g + 0.5 * b
            crCh(i) = 0.5 * r - 0.418688 * g - 0.081312 * b
            xx += 1
          }
          yy += 1
        }
        System.arraycopy(yCh, 0, block, 0, 64)
        dcY = emitBlock(dcY, qLum, dcLumCode, dcLumSize, acLumCode, acLumSize)
        System.arraycopy(cbCh, 0, block, 0, 64)
        dcCb = emitBlock(dcCb, qChrom, dcChromCode, dcChromSize, acChromCode, acChromSize)
        System.arraycopy(crCh, 0, block, 0, 64)
        dcCr = emitBlock(dcCr, qChrom, dcChromCode, dcChromSize, acChromCode, acChromSize)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ——————————————————————————— decoder ———————————————————————————

  /** canonical decode table: (minCode, maxCode, valPtr per length, vals) */
  private final class DecTable(bits: Array[Int], val vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) == 0) { maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1)
          k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0

    def align(): Unit = { acc = 0; nBits = 0 }

    private def fill(): Boolean = {
      if (pos >= data.length) return false
      val b = data(pos) & 0xFF
      if (b == 0xFF) {
        val nxt = if (pos + 1 < data.length) data(pos + 1) & 0xFF else 0xD9
        if (nxt == 0x00) { pos += 2 } // stuffed FF
        else return false // real marker (RSTn/EOI): stop at it, pos untouched
      } else pos += 1
      // mask off already-consumed high bits before shifting — without this
      // the garbage accumulates left until it sign-poisons the extraction
      acc = ((acc & ((1 << nBits) - 1)) << 8) | b
      nBits += 8
      true
    }

    def bit(): Int = {
      // a complete scan never requests a bit it doesn't have (trailing pad
      // bits are never read), so running dry mid-block means the stream is
      // truncated or desynchronized — fail loudly like the PNG codec, never
      // fabricate zero bits into a plausible garbage image
      if (nBits == 0 && !fill())
        throw new IllegalArgumentException("jpeg: truncated or malformed entropy stream")
      nBits -= 1
      (acc >>> nBits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decodeHuff(t: DecTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16) {
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len) && code >= t.minCode(len))
          return t.vals(t.valPtr(len) + code - t.minCode(len)) & 0xFF
        code = (code << 1) | bit()
        len += 1
      }
      throw new IllegalArgumentException("jpeg: invalid huffman code")
    }
  }

  @inline private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0 else if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v

  /** discard entropy padding and position the reader just past the next
    * RSTn marker — shared by the baseline MCU loop and progressive scans
    */
  private def skipToRestart(br: BitReader, data: Array[Byte]): Unit = {
    br.align()
    var p = br.pos
    while (p + 1 < data.length &&
      !((data(p) & 0xFF) == 0xFF && (data(p + 1) & 0xFF) >= 0xD0 && (data(p + 1) & 0xFF) <= 0xD7))
      p += 1
    require(p + 1 < data.length, "jpeg: missing restart marker")
    br.pos = p + 2
  }

  private final case class Component(id: Int, hSamp: Int, vSamp: Int, quantId: Int,
      var dcTab: Int = 0, var acTab: Int = 0)

  /** Decode a baseline JPEG to RGB ints (row-major 0xRRGGBB). */
  def decode(data: Array[Byte]): (Array[Int], Int, Int) = {
    require(isJpeg(data), "not a JPEG")
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[DecTable](4)
    val acTabs = new Array[DecTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2

    def u16(p: Int): Int = ((data(p) & 0xFF) << 8) | (data(p + 1) & 0xFF)

    var scanStart = -1
    while (scanStart < 0) {
      require(pos + 4 <= data.length, "jpeg: truncated before SOS")
      require((data(pos) & 0xFF) == 0xFF, f"jpeg: expected marker at $pos")
      val m = data(pos + 1) & 0xFF
      if (m == 0xFF) { pos += 1 } // fill byte (T.81 B.1.1.2) — marker follows
      else {
      val segLen = u16(pos + 2)
      require(segLen >= 2 && pos + 2 + segLen <= data.length,
        f"jpeg: segment 0xFF$m%02X overruns the file")
      val body = pos + 4
      m match {
        case 0xC0 | 0xC1 => // baseline (extended-sequential C1 shares the wire shape)
          val (w0, h0, cs) = parseFrameHeader(data, body, pos + 2 + segLen)
          w = w0; h = h0; comps = cs
        case 0xC2 =>
          return decodeProgressive(data)
        case 0xC4 => parseDhtSeg(data, body, pos + 2 + segLen, dcTabs, acTabs)
        case sof if sof >= 0xC3 && sof <= 0xCF => // C4 handled above
          throw new IllegalArgumentException(
            f"jpeg: unsupported SOF/coding marker 0xFF$sof%02X (arithmetic/lossless/hierarchical)")
        case 0xDB => parseDqtSeg(data, body, pos + 2 + segLen, quant)
        case 0xDD =>
          restartInterval = u16(body)
        case 0xDA => // SOS
          require(comps != null, "jpeg: SOS before SOF")
          require(body < pos + 2 + segLen, "jpeg: empty SOS segment")
          val n = data(body) & 0xFF
          require(body + 1 + n * 2 + 3 <= pos + 2 + segLen,
            "jpeg: SOS header overruns its segment")
          require(n == comps.length, "jpeg: scan/frame component mismatch")
          var i = 0
          while (i < n) {
            val cid = data(body + 1 + i * 2) & 0xFF
            val tabs = data(body + 2 + i * 2) & 0xFF
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"jpeg: unknown scan component $cid"))
            c.dcTab = (tabs & 0xF0) >>> 4
            c.acTab = tabs & 0x0F
            require(c.dcTab <= 3 && c.acTab <= 3,
              s"jpeg: scan huffman table ids ${c.dcTab}/${c.acTab} out of range")
            i += 1
          }
          scanStart = body + 1 + n * 2 + 3
        case 0xD9 =>
          throw new IllegalArgumentException("jpeg: EOI before scan data")
        case _ => // APPn / COM / others: skip
      }
      if (scanStart < 0) pos += 2 + segLen
      }
    }

    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH

    // per-component plane at its own (subsampled) resolution, padded to MCU grid
    val planeW = comps.map(c => mcusX * 8 * c.hSamp)
    val planeH = comps.map(c => mcusY * 8 * c.vSamp)
    val planes = Array.tabulate(comps.length)(i => new Array[Int](planeW(i) * planeH(i)))

    val br = new BitReader(data, scanStart)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val px = new Array[Double](64)
    val tmp = new Array[Double](64)

    def decodeBlock(ci: Int, bx: Int, by: Int): Unit = {
      val c = comps(ci)
      val q = quant(c.quantId)
      require(q != null, "jpeg: missing quant table")
      val dcT = dcTabs(c.dcTab); val acT = acTabs(c.acTab)
      require(dcT != null && acT != null, "jpeg: missing huffman table")
      java.util.Arrays.fill(coef, 0)
      val cat = br.decodeHuff(dcT)
      dcPred(ci) += extend(br.bits(cat), cat)
      coef(0) = dcPred(ci) * q(0)
      var k = 1
      while (k < 64) {
        val rs = br.decodeHuff(acT)
        val run = rs >>> 4
        val sz = rs & 0x0F
        if (sz == 0) {
          if (run == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += run
          // a run carrying a coefficient past the block end means the
          // entropy stream is desynchronized — refuse rather than drift
          require(k < 64, "jpeg: AC run overflows block (corrupt entropy stream)")
          coef(ZIGZAG(k)) = extend(br.bits(sz), sz) * q(ZIGZAG(k))
          k += 1
        }
      }
      idctToPlane(coef, planes(ci), planeW(ci), bx, by, tmp, px)
    }

    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // previous interval ended at an RSTn marker: skip it, realign
          skipToRestart(br, data)
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var v = 0
          while (v < c.vSamp) {
            var u = 0
            while (u < c.hSamp) {
              decodeBlock(ci, mx * c.hSamp + u, my * c.vSamp + v)
              u += 1
            }
            v += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    (planesToRgb(comps, planes, planeW, planeH, w, h, hMax, vMax, mcusX * 8 * hMax), w, h)
  }

  private def parseDhtSeg(data: Array[Byte], body: Int, end: Int,
      dcTabs: Array[DecTable], acTabs: Array[DecTable]): Unit = {
    var p = body
    while (p < end) {
      require(p + 17 <= end, "jpeg: DHT table header overruns its segment")
      val clazz = (data(p) & 0xF0) >>> 4
      val id = data(p) & 0x0F
      require(id <= 3, s"jpeg: huffman table id $id out of range")
      val bits = Array.tabulate(16)(i => data(p + 1 + i) & 0xFF)
      val nVals = bits.sum
      require(p + 17 + nVals <= end, "jpeg: DHT symbol list overruns its segment")
      val vals = java.util.Arrays.copyOfRange(data, p + 17, p + 17 + nVals)
      val t = new DecTable(bits, vals)
      if (clazz == 0) dcTabs(id) = t else acTabs(id) = t
      p += 17 + nVals
    }
  }

  private def parseDqtSeg(data: Array[Byte], body: Int, end: Int,
      quant: Array[Array[Int]]): Unit = {
    var p = body
    while (p < end) {
      require(p + 65 <= end, "jpeg: DQT table overruns its segment")
      val prec = (data(p) & 0xF0) >>> 4
      val id = data(p) & 0x0F
      require(prec == 0, "jpeg: 16-bit quant tables unsupported")
      require(id <= 3, s"jpeg: quant table id $id out of range")
      val t = new Array[Int](64)
      var i = 0
      while (i < 64) { t(ZIGZAG(i)) = data(p + 1 + i) & 0xFF; i += 1 }
      quant(id) = t
      p += 65
    }
  }

  private def parseFrameHeader(data: Array[Byte], body: Int, end: Int): (Int, Int, Array[Component]) = {
    def u16(p: Int): Int = ((data(p) & 0xFF) << 8) | (data(p + 1) & 0xFF)
    require(body + 6 <= end, "jpeg: SOF header overruns its segment")
    require((data(body) & 0xFF) == 8, "jpeg: only 8-bit precision supported")
    val h = u16(body + 1); val w = u16(body + 3)
    val n = data(body + 5) & 0xFF
    require(n == 1 || n == 3, s"jpeg: $n components unsupported")
    require(body + 6 + 3 * n <= end, "jpeg: SOF component list overruns its segment")
    // pixel budget: w/h are attacker-controlled 16-bit fields, and plane
    // allocation is eager — an unchecked 65535×65535 header would try to
    // allocate gigabytes before any entropy data is validated
    require(w.toLong * h <= MaxDecodePixels,
      s"jpeg: ${w}x$h exceeds the decoder pixel budget ($MaxDecodePixels)")
    val comps = Array.tabulate(n) { i =>
      val o = body + 6 + i * 3
      val hs = (data(o + 1) & 0xF0) >>> 4
      val vs = data(o + 1) & 0x0F
      require(hs >= 1 && hs <= 2 && vs >= 1 && vs <= 2,
        s"jpeg: sampling ${hs}x$vs unsupported (1-2 only)")
      val qid = data(o + 2) & 0xFF
      require(qid <= 3, s"jpeg: quant table id $qid out of range")
      // T.81 §A.2: a single-component scan is NON-interleaved — sampling
      // factors describe the (absent) interleave and are ignored for data
      // layout, so normalize them; without this a grayscale file declaring
      // 2x2 factors (jpegtran color→gray keeps them) over-reads its scan
      if (n == 1) Component(data(o) & 0xFF, 1, 1, qid)
      else Component(data(o) & 0xFF, hs, vs, qid)
    }
    (w, h, comps)
  }

  /** decoder allocation guard — corrupt headers must fail loudly, not OOM
    * the executor. At 2^25 px (e.g. 8192×4096) the worst case is the
    * progressive path's Int coefficient grids + planes + output:
    * 3 comps × 2^25 × 4 B × 2 + 2^25 × 4 B ≈ 0.9 GiB.
    */
  val MaxDecodePixels: Long = 1L << 25

  /** Progressive JPEG (SOF2, T.81 §G): coefficients accumulate across
    * MULTIPLE scans — DC first/refinement (optionally interleaved), AC
    * first/refinement (single-component, spectral band [Ss,Se], successive
    * approximation Ah→Al with EOB-run coding) — then one dequantize+IDCT
    * pass renders the final planes through the same upsample/color path as
    * baseline. Coefficient values are stored UNQUANTIZED (scaled by
    * 1<<Al as bits arrive) exactly as the spec accumulates them.
    */
  private def decodeProgressive(data: Array[Byte]): (Array[Int], Int, Int) = {
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[DecTable](4)
    val acTabs = new Array[DecTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    // per component: padded block grid (bw × bh) of 64 natural-order coefs
    var coefs: Array[Array[Int]] = null
    var bw: Array[Int] = null
    var bh: Array[Int] = null
    val dcPred = new Array[Int](4)

    def u16(p: Int): Int = ((data(p) & 0xFF) << 8) | (data(p + 1) & 0xFF)

    /** skip from `p` to the next non-RST marker (consuming RSTn markers and
      * 0xFF fill-byte runs — T.81 B.1.1.2 allows any number of fill bytes
      * before a marker, so an FF FF D9 tail must resolve to the D9)
      */
    def nextMarker(p0: Int): Int = {
      var p = p0
      while (p + 1 < data.length) {
        if ((data(p) & 0xFF) == 0xFF) {
          val m = data(p + 1) & 0xFF
          if (m == 0x00) p += 2
          else if (m == 0xFF) p += 1 // fill byte: the marker starts later
          else if (m >= 0xD0 && m <= 0xD7) p += 2
          else return p
        } else p += 1
      }
      throw new IllegalArgumentException("jpeg: ran off the end looking for a marker")
    }

    /** decode one scan's entropy data; returns the position of the marker
      * that terminated it
      */
    def decodeScan(start: Int, scanCis: Array[Int], ss: Int, se: Int,
        ah: Int, al: Int): Int = {
      val br = new BitReader(data, start)
      var eobrun = 0

      def restart(): Unit = {
        skipToRestart(br, data)
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
      }

      def decodeDc(ci: Int, off: Int): Unit = {
        val cf = coefs(ci)
        if (ah == 0) {
          val dcT = dcTabs(comps(ci).dcTab)
          require(dcT != null, "jpeg: missing DC huffman table")
          val cat = br.decodeHuff(dcT)
          dcPred(ci) += extend(br.bits(cat), cat)
          cf(off) = dcPred(ci) << al
        } else if (br.bit() == 1) cf(off) |= (1 << al)
      }

      def decodeAcFirst(ci: Int, off: Int): Unit = {
        val cf = coefs(ci)
        val acT = acTabs(comps(ci).acTab)
        require(acT != null, "jpeg: missing AC huffman table")
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        var ended = false
        while (k <= se && !ended) {
          val rs = br.decodeHuff(acT)
          val r = rs >>> 4; val s = rs & 0x0F
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else { eobrun = (1 << r) - 1 + (if (r > 0) br.bits(r) else 0); ended = true }
          } else {
            k += r
            require(k <= se, "jpeg: AC run overflows spectral band")
            cf(off + ZIGZAG(k)) = extend(br.bits(s), s) << al
            k += 1
          }
        }
      }

      def decodeAcRefine(ci: Int, off: Int): Unit = {
        val cf = coefs(ci)
        val acT = acTabs(comps(ci).acTab)
        require(acT != null, "jpeg: missing AC huffman table")
        val p1 = 1 << al; val m1 = -1 << al
        var k = ss
        if (eobrun == 0) {
          var ended = false
          while (k <= se && !ended) {
            val rs = br.decodeHuff(acT)
            var r = rs >>> 4; val s = rs & 0x0F
            var put = 0
            if (s == 0) {
              if (r != 15) { eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0); ended = true }
              // r == 15: pass over 16 zero-history coefficients below
            } else {
              require(s == 1, "jpeg: refinement size must be 1")
              put = if (br.bit() == 1) p1 else m1
            }
            if (!ended) {
              var placed = false
              while (k <= se && !placed) {
                val idx = off + ZIGZAG(k)
                if (cf(idx) != 0) {
                  // correction bit for every nonzero-history coefficient
                  if (br.bit() == 1 && (cf(idx) & p1) == 0)
                    cf(idx) += (if (cf(idx) >= 0) p1 else m1)
                } else if (r == 0) {
                  if (put != 0) cf(idx) = put
                  placed = true
                } else r -= 1
                k += 1
              }
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) { // EOB band: corrections only
            val idx = off + ZIGZAG(k)
            if (cf(idx) != 0 && br.bit() == 1 && (cf(idx) & p1) == 0)
              cf(idx) += (if (cf(idx) >= 0) p1 else m1)
            k += 1
          }
          eobrun -= 1
        }
      }

      java.util.Arrays.fill(dcPred, 0)
      if (scanCis.length == 1 && ss > 0) {
        // AC scan: non-interleaved over the component's OWN block grid
        val ci = scanCis(0)
        val c = comps(ci)
        val cw = (w * c.hSamp + hMax - 1) / hMax
        val ch = (h * c.vSamp + vMax - 1) / vMax
        val nbx = (cw + 7) / 8; val nby = (ch + 7) / 8
        var unit = 0
        var by = 0
        while (by < nby) {
          var bx = 0
          while (bx < nbx) {
            if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) restart()
            val off = (by * bw(ci) + bx) * 64
            if (ah == 0) decodeAcFirst(ci, off) else decodeAcRefine(ci, off)
            unit += 1
            bx += 1
          }
          by += 1
        }
      } else if (scanCis.length == 1) {
        // non-interleaved DC scan over the component's own grid
        val ci = scanCis(0)
        val c = comps(ci)
        val cw = (w * c.hSamp + hMax - 1) / hMax
        val ch = (h * c.vSamp + vMax - 1) / vMax
        val nbx = (cw + 7) / 8; val nby = (ch + 7) / 8
        var unit = 0
        var by = 0
        while (by < nby) {
          var bx = 0
          while (bx < nbx) {
            if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) restart()
            decodeDc(ci, (by * bw(ci) + bx) * 64)
            unit += 1
            bx += 1
          }
          by += 1
        }
      } else {
        // interleaved scan: DC only (the spec forbids interleaved AC)
        require(ss == 0 && se == 0, "jpeg: interleaved progressive scan must be DC")
        var mcu = 0
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) restart()
            scanCis.foreach { ci =>
              val c = comps(ci)
              var v = 0
              while (v < c.vSamp) {
                var u = 0
                while (u < c.hSamp) {
                  decodeDc(ci, ((my * c.vSamp + v) * bw(ci) + mx * c.hSamp + u) * 64)
                  u += 1
                }
                v += 1
              }
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }
      }
      nextMarker(br.pos)
    }

    var pos = 2
    var sawEoi = false
    while (!sawEoi) {
      require(pos + 2 <= data.length, "jpeg: truncated before EOI")
      require((data(pos) & 0xFF) == 0xFF, f"jpeg: expected marker at $pos")
      val m = data(pos + 1) & 0xFF
      if (m == 0xD9) sawEoi = true
      else if (m == 0xFF) pos += 1 // fill byte (T.81 B.1.1.2)
      else {
        require(pos + 4 <= data.length, "jpeg: truncated segment header")
        val segLen = u16(pos + 2)
        require(segLen >= 2 && pos + 2 + segLen <= data.length,
          f"jpeg: segment 0xFF$m%02X overruns the file")
        val body = pos + 4
        var posOverride = -1
        m match {
          case 0xC2 =>
            val (pw0, ph0, cs) = parseFrameHeader(data, body, pos + 2 + segLen)
            w = pw0; h = ph0; comps = cs
            hMax = comps.map(_.hSamp).max; vMax = comps.map(_.vSamp).max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            bw = comps.map(c => mcusX * c.hSamp)
            bh = comps.map(c => mcusY * c.vSamp)
            coefs = comps.indices.map(i => new Array[Int](bw(i) * bh(i) * 64)).toArray
          case 0xC0 | 0xC1 | 0xC3 =>
            throw new IllegalArgumentException("jpeg: mixed/unsupported SOF in progressive stream")
          case 0xC4 => parseDhtSeg(data, body, pos + 2 + segLen, dcTabs, acTabs)
          case 0xDB => parseDqtSeg(data, body, pos + 2 + segLen, quant)
          case 0xDD => restartInterval = u16(body)
          case 0xDA =>
            require(comps != null, "jpeg: SOS before SOF2")
            require(body < pos + 2 + segLen, "jpeg: empty SOS segment")
            val ns0 = data(body) & 0xFF
            require(body + 1 + ns0 * 2 + 3 <= pos + 2 + segLen,
              "jpeg: SOS header overruns its segment")
            val ns = ns0
            val scanCis = Array.tabulate(ns) { i =>
              val cid = data(body + 1 + i * 2) & 0xFF
              val tabs = data(body + 2 + i * 2) & 0xFF
              val ci = comps.indexWhere(_.id == cid)
              require(ci >= 0, s"jpeg: unknown scan component $cid")
              comps(ci).dcTab = (tabs & 0xF0) >>> 4
              comps(ci).acTab = tabs & 0x0F
              require(comps(ci).dcTab <= 3 && comps(ci).acTab <= 3,
                s"jpeg: scan huffman table ids out of range")
              ci
            }
            val ss = data(body + 1 + ns * 2) & 0xFF
            val se = data(body + 2 + ns * 2) & 0xFF
            val ahal = data(body + 3 + ns * 2) & 0xFF
            require(ss <= 63 && se <= 63 && ss <= se, s"jpeg: bad spectral band $ss..$se")
            // T.81 G.1: a DC scan is exactly the band [0,0] — Ss=0 with
            // Se>0 would route AC data through the DC procedure and desync
            require(ss > 0 || se == 0, s"jpeg: invalid progressive band 0..$se")
            posOverride = decodeScan(body + 1 + ns * 2 + 3, scanCis, ss, se,
              (ahal & 0xF0) >>> 4, ahal & 0x0F)
          case _ => // APPn / COM: skip
        }
        pos = if (posOverride >= 0) posOverride else pos + 2 + segLen
      }
    }
    require(comps != null, "jpeg: no SOF2 frame before EOI")

    // final render: dequantize + IDCT every block into the planes
    val planeW = comps.map(c => mcusX * 8 * c.hSamp)
    val planeH = comps.map(c => mcusY * 8 * c.vSamp)
    val planes = Array.tabulate(comps.length)(i => new Array[Int](planeW(i) * planeH(i)))
    val block = new Array[Int](64)
    val tmp = new Array[Double](64)
    val px = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val q = quant(comps(ci).quantId)
      require(q != null, "jpeg: missing quant table")
      val cf = coefs(ci)
      var by = 0
      while (by < bh(ci)) {
        var bx = 0
        while (bx < bw(ci)) {
          val off = (by * bw(ci) + bx) * 64
          var k = 0
          while (k < 64) { block(k) = cf(off + k) * q(k); k += 1 }
          idctToPlane(block, planes(ci), planeW(ci), bx, by, tmp, px)
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    (planesToRgb(comps, planes, planeW, planeH, w, h, hMax, vMax, mcusX * 8 * hMax), w, h)
  }

  /** natural-order DEQUANTIZED coefficients → spatial 8×8 written into the
    * component plane at block (bx, by). Exact separable double IDCT.
    */
  private def idctToPlane(coef: Array[Int], plane: Array[Int], pw: Int,
      bx: Int, by: Int, tmp: Array[Double], px: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += COS(u)(x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += COS(v)(yy) * tmp(v * 8 + x); v += 1 }
        px(yy * 8 + x) = s + 128.0
        yy += 1
      }
      x += 1
    }
    val ox = bx * 8; val oy = by * 8
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        plane((oy + j) * pw + ox + i) = clamp255(px(j * 8 + i))
        i += 1
      }
      j += 1
    }
  }

  /** Component planes → RGB: triangular ("fancy") 2× upsampling per axis —
    * centered weights 3:1, the libjpeg-family filter, so our decode of
    * subsampled streams agrees closely with reference decoders instead of
    * diverging by the blocky sample-replication error. Separable h-then-v
    * gives the 9:3:3:1 kernel. Then JFIF YCbCr→RGB (or gray replication).
    */
  private def planesToRgb(comps: Array[Component], planes: Array[Array[Int]],
      planeW: Array[Int], planeH: Array[Int], w: Int, h: Int,
      hMax: Int, vMax: Int, fullW: Int): Array[Int] = {
    def upsample2xH(in: Array[Int], iw: Int, ih: Int): Array[Int] = {
      val out = new Array[Int](iw * 2 * ih)
      var y = 0
      while (y < ih) {
        var x = 0
        while (x < iw) {
          val c = in(y * iw + x)
          val l = in(y * iw + math.max(x - 1, 0))
          val r = in(y * iw + math.min(x + 1, iw - 1))
          out(y * iw * 2 + 2 * x) = (3 * c + l + 2) >> 2
          out(y * iw * 2 + 2 * x + 1) = (3 * c + r + 2) >> 2
          x += 1
        }
        y += 1
      }
      out
    }
    def upsample2xV(in: Array[Int], iw: Int, ih: Int): Array[Int] = {
      val out = new Array[Int](iw * ih * 2)
      var y = 0
      while (y < ih) {
        val up = math.max(y - 1, 0); val dn = math.min(y + 1, ih - 1)
        var x = 0
        while (x < iw) {
          val c = in(y * iw + x)
          out(2 * y * iw + x) = (3 * c + in(up * iw + x) + 2) >> 2
          out((2 * y + 1) * iw + x) = (3 * c + in(dn * iw + x) + 2) >> 2
          x += 1
        }
        y += 1
      }
      out
    }
    val full = Array.tabulate(comps.length) { ci =>
      var p = planes(ci)
      var pw = planeW(ci); var ph = planeH(ci)
      if (comps(ci).hSamp < hMax) { p = upsample2xH(p, pw, ph); pw *= 2 }
      if (comps(ci).vSamp < vMax) { p = upsample2xV(p, pw, ph); ph *= 2 }
      p
    }
    val out = new Array[Int](w * h)
    if (comps.length == 1) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = full(0)(y * fullW + x)
          out(y * w + x) = (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = full(0)(y * fullW + x)
          val cb = full(1)(y * fullW + x) - 128
          val cr = full(2)(y * fullW + x) - 128
          val r = clamp255(yv + 1.402 * cr)
          val g = clamp255(yv - 0.344136 * cb - 0.714136 * cr)
          val b = clamp255(yv + 1.772 * cb)
          out(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
    }
    out
  }
}
