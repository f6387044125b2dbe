package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.img.{Codecs, ImageTable}

/** Cross-validation of graft's own PNG/BMP codecs against javax.imageio as
  * an independent oracle, both directions, plus malformed-input behavior.
  */
class CodecsSpec extends AnyFunSuite {

  private def randomPixels(seed: Long, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (ImageTable.splitmix64(seed * 7919 + i) & 0xFFFFFF).toInt)

  test("our PNG decodes identically via ImageIO (oracle)") {
    for (seed <- 0 to 10) {
      val w = 1 + (seed * 7) % 40; val h = 1 + (seed * 11) % 40
      val px = randomPixels(seed, w, h)
      val bytes = Codecs.encodePng(px, w, h)
      val (oPx, oW, oH) = ImageTable.decodeViaImageIO(bytes)
      assert(oW == w && oH == h)
      assert(oPx.sameElements(px), s"seed=$seed w=$w h=$h")
    }
  }

  test("our BMP decodes identically via ImageIO (oracle)") {
    for (seed <- 0 to 10) {
      val w = 1 + (seed * 13) % 37; val h = 1 + (seed * 5) % 37 // exercises row padding
      val px = randomPixels(seed, w, h)
      val bytes = Codecs.encodeBmp(px, w, h)
      val (oPx, oW, oH) = ImageTable.decodeViaImageIO(bytes)
      assert(oW == w && oH == h)
      assert(oPx.sameElements(px), s"seed=$seed w=$w h=$h")
    }
  }

  test("we decode ImageIO-written PNG and BMP (foreign filters/variants)") {
    for (seed <- 0 to 10; fmt <- Seq("png", "bmp")) {
      val w = 3 + seed * 3; val h = 5 + seed * 2
      val px = randomPixels(seed + 100, w, h)
      val bytes = ImageTable.encodeViaImageIO(px, w, h, fmt)
      val (dPx, dW, dH) = Codecs.decode(bytes)
      assert(dW == w && dH == h)
      assert(dPx.sameElements(px), s"seed=$seed fmt=$fmt")
    }
  }

  test("roundtrip through our own encode+decode is exact for both formats") {
    for (seed <- 0 to 20; fmt <- Seq("png", "bmp")) {
      val w = 1 + seed; val h = 64 - seed
      val px = randomPixels(seed, w, h)
      val (d, dw, dh) = Codecs.decode(Codecs.encode(px, w, h, fmt))
      assert(dw == w && dh == h && d.sameElements(px))
    }
  }

  test("level-0 (stored) PNG decodes identically (and via ImageIO)") {
    val px = randomPixels(9, 23, 17)
    val bytes = Codecs.encodePngRegion(px, 23, 0, 0, 23, 17, level = 0)
    assert(Codecs.decodePng(bytes)._1.sameElements(px))
    assert(ImageTable.decodeViaImageIO(bytes)._1.sameElements(px))
    // size check needs COMPRESSIBLE content (random pixels compress to
    // nothing at any level); use the banded synthetic gradient
    val grad = ImageTable.renderPixels(5, 32, 32)
    val stored = Codecs.encodePngRegion(grad, 32, 0, 0, 32, 32, level = 0)
    assert(stored.length > Codecs.encodePng(grad, 32, 32).length)
    assert(Codecs.decodePng(stored)._1.sameElements(grad))
  }

  test("malformed inputs fail cleanly") {
    intercept[Exception](Codecs.decode(Array[Byte](1, 2, 3)))
    intercept[Exception](Codecs.decodePng(Codecs.encodeBmp(Array(1), 1, 1)))
    val truncated = Codecs.encodePng(randomPixels(1, 8, 8), 8, 8).take(30)
    intercept[Exception](Codecs.decodePng(truncated))
  }
}
