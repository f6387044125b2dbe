package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.img.{Codecs, Gif, ImageTable}

/** GIF89a codec pins: exact round trips (sequential and interlaced),
  * LZW table-overflow clear-code path, the ≤256-color palette contract,
  * ImageIO cross-validation, and corruption fuzzing.
  */
class GifSpec extends AnyFunSuite {

  /** Pixels drawn from a bounded palette (exactly GIF's domain). */
  private def palettePixels(seed: Long, w: Int, h: Int, nColors: Int): Array[Int] = {
    val pal = Array.tabulate(nColors)(i =>
      0xFF000000 | (ImageTable.splitmix64(seed * 31 + i) & 0xFFFFFF).toInt)
    Array.tabulate(w * h)(i =>
      pal(Math.floorMod(ImageTable.splitmix64(seed * 7919 + i), nColors.toLong).toInt))
  }

  test("round trip is exact across sizes and palette sizes") {
    for (seed <- 0 to 12) {
      val w = 1 + (seed * 13) % 40
      val h = 1 + (seed * 7) % 40
      val n = 1 + (seed * 37) % 256
      val px = palettePixels(seed, w, h, n)
      val (back, bw, bh) = Gif.decode(Gif.encode(px, w, h))
      assert(bw == w && bh == h)
      assert(back.sameElements(px), s"seed=$seed w=$w h=$h n=$n")
    }
  }

  test("interlaced round trip is exact (4-pass row layout on both sides)") {
    for (seed <- 0 to 8) {
      val w = 2 + (seed * 11) % 33
      val h = 1 + (seed * 17) % 29 // heights below/above every pass threshold
      val px = palettePixels(seed + 50, w, h, 64)
      val (back, bw, bh) = Gif.decode(Gif.encode(px, w, h, interlaced = true))
      assert(bw == w && bh == h)
      assert(back.sameElements(px), s"seed=$seed w=$w h=$h")
    }
  }

  test("LZW table overflow takes the clear-code path and stays exact") {
    // 256-color noise at 150x150 = 22.5k pixels registers far beyond 4096
    // dictionary entries, forcing the mid-stream clear + width reset
    val px = palettePixels(99, 150, 150, 256)
    val (back, bw, bh) = Gif.decode(Gif.encode(px, 150, 150))
    assert(bw == 150 && bh == 150 && back.sameElements(px))
    // and the highly-compressible opposite: one color, long runs
    val flat = Array.fill(150 * 150)(0xFF336699)
    val (fb, _, _) = Gif.decode(Gif.encode(flat, 150, 150))
    assert(fb.sameElements(flat))
  }

  test("palette contract: >256 distinct colors throws; quantize332 makes it encodable") {
    val full = Array.tabulate(20 * 20)(i => 0xFF000000 | (i * 41025 + i)) // 400 distinct
    assert(full.map(_ & 0xFFFFFF).distinct.length > 256)
    intercept[IllegalArgumentException](Gif.encode(full, 20, 20))
    val q = Gif.quantize332(full)
    assert(q.map(_ & 0xFFFFFF).distinct.length <= 256)
    assert(Gif.quantize332(q).sameElements(q)) // idempotent
    val (back, _, _) = Gif.decode(Gif.encode(q, 20, 20))
    assert(back.sameElements(q))
  }

  test("our GIF decodes identically via ImageIO (oracle)") {
    // interlaced heights start at 5: the JDK GIFImageReader mis-reconstructs
    // interlaced frames of height 2..4 (the empty-pass-2 cases — its
    // progressive row replication overwrites the pass-4 rows; the SAME byte
    // stream with only the interlace flag cleared, and row order equal to
    // sequential at those heights, reads back correctly — measured here, so
    // the divergence is the reader's). Our own round-trip test covers every
    // height including 1..4.
    for (seed <- 0 to 6; interlaced <- Seq(false, true)) {
      val w = 3 + seed * 5; val h = if (interlaced) 5 + seed * 3 else 2 + seed * 3
      val px = palettePixels(seed + 200, w, h, 100)
      val bytes = Gif.encode(px, w, h, interlaced)
      val (oPx, oW, oH) = ImageTable.decodeViaImageIO(bytes) // returns RGB-only ints
      assert(oW == w && oH == h)
      assert(oPx.sameElements(px.map(_ & 0xFFFFFF)), s"seed=$seed interlaced=$interlaced")
    }
  }

  test("we decode ImageIO-written GIF (foreign encoder, incl. extensions)") {
    for (seed <- 0 to 6) {
      val w = 4 + seed * 3; val h = 3 + seed * 4
      // ImageIO's GIF writer is lossless only for index-backed images; an
      // RGB source may be quantized, so feed it a small exact palette
      val px = palettePixels(seed + 300, w, h, 16)
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, px, 0, w)
      val bos = new java.io.ByteArrayOutputStream()
      assume(javax.imageio.ImageIO.write(img, "gif", bos)) // skip if no writer
      val (back, bw, bh) = Gif.decode(bos.toByteArray)
      assert(bw == w && bh == h)
      assert(back.sameElements(px), s"seed=$seed")
    }
  }

  test("Codecs dispatch routes gif both directions") {
    val px = palettePixels(7, 9, 9, 32)
    val bytes = Codecs.encode(px, 9, 9, "gif")
    assert(Gif.isGif(bytes))
    val (back, w, h) = Codecs.decode(bytes)
    assert(w == 9 && h == 9 && back.sameElements(px))
  }

  test("decoder survives corruption fuzzing: clean failure or success, never a crash") {
    // same ingest-robustness contract as the JPEG/PNG/BMP fuzz pins: any
    // byte corruption either decodes or raises IOException /
    // IllegalArgumentException — never an index error, NPE, or huge alloc
    val base = Gif.encode(palettePixels(5, 24, 20, 200), 24, 20)
    for (seed <- 0L until 1500L) {
      val b = base.clone()
      val k = 1 + (ImageTable.splitmix64(seed) & 3).toInt
      for (j <- 0 until k) {
        val p = Math.floorMod(ImageTable.splitmix64(seed * 7 + j), b.length.toLong).toInt
        b(p) = (ImageTable.splitmix64(seed * 13 + j) & 0xFF).toByte
      }
      try { Gif.decode(b); () }
      catch {
        case _: IllegalArgumentException | _: java.io.IOException => ()
      } // anything else fails the test
    }
    // plus every truncation prefix of a well-formed stream
    for (len <- 0 until base.length) {
      try { Gif.decode(java.util.Arrays.copyOf(base, len)); () }
      catch {
        case _: IllegalArgumentException | _: java.io.IOException => ()
      }
    }
  }
}
