package graft.img

import java.io.{ByteArrayOutputStream, IOException}

/** From-scratch GIF89a codec (CompuServe GIF89a spec, 1990 — public):
  * palette-indexed pixels, GIF-variant LZW with variable code width
  * (min+1 → 12 bits, clear-code resets), sub-block framing, and the
  * 4-pass interlace layout on both sides.
  *
  * Contract: GIF is a PALETTE format — [[encode]] requires ≤ 256 distinct
  * colors and throws otherwise; it does not silently quantize.
  * [[quantize332]] is the explicit 3-3-2 (8×8×4 = 256-level) quantizer a
  * caller composes in front when the source is full-color; a quantized
  * image round-trips EXACTLY (the q71 invariant), which is the honest
  * split between "lossless palette codec" and "lossy color reduction".
  *
  * Decode hardening mirrors the PNG/BMP/JPEG decoders: every length and
  * index is bounds-checked, truncation and out-of-range LZW codes raise
  * IOException (never OOB/OOM), and unknown extension blocks are skipped
  * per spec.
  */
object Gif {

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** Explicit 3-3-2 color quantization (top 3 bits R, 3 G, 2 B → exactly
    * ≤ 256 colors), alpha forced opaque — the standard fixed palette
    * reduction, kept OUT of encode so lossiness is always caller-visible.
    */
  def quantize332(pixels: Array[Int]): Array[Int] =
    pixels.map(p => 0xFF000000 | (p & 0x00E0E0C0))

  /** Interlace pass structure: (first row, row step) per pass. */
  private val Passes = Array((0, 8), (4, 8), (2, 4), (1, 2))

  private def interlacedRowOrder(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var n = 0
    Passes.foreach { case (first, step) =>
      var y = first
      while (y < h) { rows(n) = y; n += 1; y += step }
    }
    rows
  }

  // ——————————————————————— encode ———————————————————————

  def encode(pixels: Array[Int], w: Int, h: Int, interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF, s"bad dims ${w}x$h")
    require(pixels.length == w * h, s"pixels ${pixels.length} != ${w}x$h")
    // deterministic palette: distinct RGBs ascending
    val palette = pixels.map(_ & 0xFFFFFF).distinct.sorted
    if (palette.length > 256)
      throw new IllegalArgumentException(
        s"${palette.length} distinct colors > 256 — GIF is a palette format; " +
          "quantize first (e.g. Gif.quantize332)")
    // sorted palette -> index via binary search (the per-pixel hot path:
    // no boxing, no hash probes)
    def colorIndex(rgb: Int): Int = java.util.Arrays.binarySearch(palette, rgb)
    // GCT size: 2^(exp+1) entries, smallest power of two >= palette (min 2)
    var gctExp = 0
    while ((2 << gctExp) < palette.length) gctExp += 1
    val gctEntries = 2 << gctExp
    val minCodeSize = math.max(2, gctExp + 1)

    val out = new ByteArrayOutputStream(pixels.length / 2 + 64)
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0x80 | gctExp) // GCT present, colorRes 0, unsorted
    out.write(0)             // background index
    out.write(0)             // aspect
    var i = 0
    while (i < gctEntries) {
      val c = if (i < palette.length) palette(i) else 0
      out.write((c >>> 16) & 0xFF); out.write((c >>> 8) & 0xFF); out.write(c & 0xFF)
      i += 1
    }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0x00)
    out.write(minCodeSize)

    // index stream in storage order
    val rowOrder = if (interlaced) interlacedRowOrder(h) else Array.tabulate(h)(identity)
    val indices = new Array[Int](pixels.length)
    var n = 0
    rowOrder.foreach { y =>
      var x = 0
      while (x < w) { indices(n) = colorIndex(pixels(y * w + x) & 0xFFFFFF); n += 1; x += 1 }
    }

    // GIF-LZW (compress-derived): width bump is checked AFTER writing each
    // code against the count of entries registered so far — the ordering
    // that keeps encoder and decoder widths aligned read-for-read.
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val lzw = new ByteArrayOutputStream(pixels.length / 2 + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCodeSize + 1
    var nextCode = eoi + 1
    def writeCode(c: Int): Unit = {
      bitBuf |= c.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) { lzw.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; bitCnt -= 8 }
      if (nextCode > (1 << width) - 1 && width < 12) width += 1
    }
    val dict = new scala.collection.mutable.HashMap[Long, Int]
    writeCode(clear)
    var prefix = indices(0)
    i = 1
    while (i < indices.length) {
      val k = indices(i)
      val key = (prefix.toLong << 32) | k
      dict.get(key) match {
        case Some(code) => prefix = code
        case None =>
          writeCode(prefix)
          if (nextCode < 4096) { dict.update(key, nextCode); nextCode += 1 }
          else {
            writeCode(clear)
            dict.clear(); nextCode = eoi + 1; width = minCodeSize + 1
          }
          prefix = k
      }
      i += 1
    }
    writeCode(prefix)
    writeCode(eoi)
    if (bitCnt > 0) lzw.write((bitBuf & 0xFF).toInt)

    // sub-block framing
    val data = lzw.toByteArray
    var off = 0
    while (off < data.length) {
      val len = math.min(255, data.length - off)
      out.write(len)
      out.write(data, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  // ——————————————————————— decode ———————————————————————

  def decode(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    if (!isGif(bytes)) throw new IOException("not a GIF")
    var p = 6
    def need(k: Int): Unit =
      if (p + k > bytes.length) throw new IOException("truncated GIF")
    def u8(): Int = { need(1); val v = bytes(p) & 0xFF; p += 1; v }
    def le16(): Int = { need(2); val v = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8); p += 2; v }

    val sw = le16(); val sh = le16()
    val packed = u8(); u8(); u8() // bg index, aspect
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val nEntries = 2 << (packed & 7)
      need(3 * nEntries)
      gct = Array.tabulate(nEntries) { j =>
        ((bytes(p + 3 * j) & 0xFF) << 16) | ((bytes(p + 3 * j + 1) & 0xFF) << 8) | (bytes(p + 3 * j + 2) & 0xFF)
      }
      p += 3 * nEntries
    }

    // skip extensions until the first image descriptor
    var b = u8()
    while (b == 0x21) {
      u8() // label
      var len = u8()
      while (len != 0) { need(len); p += len; len = u8() }
      b = u8()
    }
    if (b != 0x2C) throw new IOException(f"expected image descriptor, got 0x$b%02x")
    val left = le16(); val top = le16()
    if (left != 0 || top != 0) // a cropped frame inside a larger screen
      throw new IOException(s"offset frame (+$left,+$top) unsupported (single full-frame decoder)")
    val w = le16(); val h = le16()
    if (w <= 0 || h <= 0 || w > sw || h > sh)
      throw new IOException(s"bad frame dims ${w}x$h in ${sw}x$sh screen")
    // corrupt headers must never drive allocation: 2^26 px = 256 MB ARGB,
    // far above any legitimate single GIF, far below an OOM
    if (w.toLong * h.toLong > (1L << 26))
      throw new IOException(s"frame ${w}x$h exceeds decoder pixel cap")
    val idPacked = u8()
    val interlaced = (idPacked & 0x40) != 0
    val palette =
      if ((idPacked & 0x80) != 0) {
        val nEntries = 2 << (idPacked & 7)
        need(3 * nEntries)
        val lct = Array.tabulate(nEntries) { j =>
          ((bytes(p + 3 * j) & 0xFF) << 16) | ((bytes(p + 3 * j + 1) & 0xFF) << 8) | (bytes(p + 3 * j + 2) & 0xFF)
        }
        p += 3 * nEntries
        lct
      } else if (gct != null) gct
      else throw new IOException("no color table")

    val minCodeSize = u8()
    if (minCodeSize < 2 || minCodeSize > 8) throw new IOException(s"bad LZW min code size $minCodeSize")

    // concatenate sub-blocks
    val data = new ByteArrayOutputStream(bytes.length - p)
    var len = u8()
    while (len != 0) { need(len); data.write(bytes, p, len); p += len; len = u8() }
    val lzw = data.toByteArray

    // LZW decompress into index stream
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val nPix = w * h
    val indices = new Array[Int](nPix)
    var outN = 0
    // table as (prefix code, appended index); roots are implicit
    val prefixOf = new Array[Int](4096)
    val suffixOf = new Array[Int](4096)
    var nextCode = eoi + 1
    var width = minCodeSize + 1
    var bitPos = 0
    var prev = -1
    val scratch = new Array[Int](4096)
    def emit(code: Int): Int = { // returns first index of the expansion
      var c = code
      var k = 0
      while (c >= clear + 2) { scratch(k) = suffixOf(c); k += 1; c = prefixOf(c) }
      val first = c
      if (outN + k + 1 > nPix) throw new IOException("LZW output exceeds frame")
      indices(outN) = first; outN += 1
      var j = k - 1
      while (j >= 0) { indices(outN) = scratch(j); outN += 1; j -= 1 }
      first
    }
    while (outN < nPix) {
      if (bitPos + width > lzw.length * 8) throw new IOException("truncated LZW stream")
      var v = 0
      var got = 0
      while (got < width) {
        val byte = lzw(bitPos >> 3) & 0xFF
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, width - got)
        v |= (((byte >> (bitPos & 7)) & ((1 << take) - 1)) << got)
        got += take; bitPos += take
      }
      if (v == clear) {
        nextCode = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (v == eoi) {
        throw new IOException(s"EOI before frame complete ($outN/$nPix pixels)")
      } else if (prev == -1) {
        if (v >= clear) throw new IOException(s"first code $v not a root")
        emit(v)
        prev = v
      } else if (v < nextCode) {
        val first = emit(v)
        if (nextCode < 4096) {
          prefixOf(nextCode) = prev; suffixOf(nextCode) = first
          nextCode += 1
          if (nextCode > (1 << width) - 1 && width < 12) width += 1
        }
        prev = v
      } else if (v == nextCode && nextCode < 4096) { // KwKwK: prev + first(prev)
        var c = prev
        while (c >= clear + 2) c = prefixOf(c)
        prefixOf(nextCode) = prev; suffixOf(nextCode) = c
        emit(nextCode)
        nextCode += 1
        if (nextCode > (1 << width) - 1 && width < 12) width += 1
        prev = v
      } else throw new IOException(s"LZW code $v beyond table ($nextCode)")
    }

    // map indices → pixels, undoing interlace
    val px = new Array[Int](nPix)
    val rowOrder = if (interlaced) interlacedRowOrder(h) else Array.tabulate(h)(identity)
    var n = 0
    rowOrder.foreach { y =>
      var x = 0
      while (x < w) {
        val idx = indices(n)
        if (idx >= palette.length) throw new IOException(s"palette index $idx >= ${palette.length}")
        px(y * w + x) = 0xFF000000 | palette(idx)
        n += 1; x += 1
      }
    }
    (px, w, h)
  }
}
