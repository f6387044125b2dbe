package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.img.{Codecs, ImageTable, Jpeg}

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

  // ——————————————————— JPEG (lossy leg of the invariant) ———————————————————

  private def imageIoEncodeJpeg(px: Array[Int], w: Int, h: Int, q: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(q)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("JPEG round trip meets the PSNR>=40dB lossy invariant on the image corpus") {
    for (i <- 0L to 8L) {
      val w = ImageTable.widthOf(i); val h = ImageTable.heightOf(i)
      val px = ImageTable.renderPixels(i, w, h) // incl. non-multiple-of-8 sizes
      val bytes = Jpeg.encode(px, w, h)
      assert(Jpeg.isJpeg(bytes))
      val (back, bw, bh) = Jpeg.decode(bytes)
      assert(bw == w && bh == h)
      val p = ImageTable.psnrDb(back, px)
      assert(p >= 40.0, s"image $i ${w}x$h psnr $p")
      // dispatch: fmt routing + container sniffing both reach the codec
      assert(Codecs.decode(Codecs.encode(px, w, h, "jpeg"))._1.sameElements(back))
    }
  }

  test("ImageIO decodes our JPEG (container validity oracle)") {
    for (i <- 0L to 5L) {
      val w = ImageTable.widthOf(i); val h = ImageTable.heightOf(i)
      val px = ImageTable.renderPixels(i, w, h)
      val bytes = Jpeg.encode(px, w, h)
      val (oPx, oW, oH) = ImageTable.decodeViaImageIO(bytes)
      assert(oW == w && oH == h)
      // vs the source: same lossy invariant the engine promises
      assert(ImageTable.psnrDb(oPx, px) >= 40.0, s"image $i")
      // vs our decoder: T.81 doesn't mandate a bit-exact IDCT, so two
      // correct decoders agree closely but not exactly
      val (ours, _, _) = Jpeg.decode(bytes)
      assert(ImageTable.psnrDb(oPx, ours) >= 45.0, s"decoder divergence image $i")
    }
  }

  test("our decoder reads third-party (ImageIO) JPEGs incl. subsampled chroma") {
    for (i <- 0L to 5L) {
      val w = ImageTable.widthOf(i); val h = ImageTable.heightOf(i)
      val px = ImageTable.renderPixels(i, w, h)
      val bytes = imageIoEncodeJpeg(px, w, h, 0.9f)
      val (ours, oW, oH) = Jpeg.decode(bytes)
      assert(oW == w && oH == h)
      val (ref, _, _) = ImageTable.decodeViaImageIO(bytes)
      // both decode the same 4:2:0 stream with the same triangular
      // upsampling family — they must agree closely (measured ~51 dB)
      assert(ImageTable.psnrDb(ours, ref) >= 45.0, s"image $i vs ImageIO decode")
      // absolute fidelity is bounded by the ENCODER's 4:2:0 chroma loss
      // (~22 dB on this worst-case corpus), not by either decoder: require
      // our decode to be as faithful to the source as the reference decode
      assert(ImageTable.psnrDb(ours, px) >= ImageTable.psnrDb(ref, px) - 1.0,
        s"image $i fidelity vs reference decoder")
    }
  }

  test("our decoder reads grayscale (1-component) JPEGs") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // write RAW gray samples via the raster — setRGB would route through
    // Java's nonlinear gray↔sRGB colorspace conversion and corrupt the ref
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w) raster.setSample(x, y, 0, (x * 5 + y * 3) & 0xFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val (ours, oW, oH) = Jpeg.decode(bos.toByteArray)
    assert(oW == w && oH == h)
    val ref = Array.tabulate(w * h) { i =>
      val g = (i % w * 5 + i / w * 3) & 0xFF
      (g << 16) | (g << 8) | g
    }
    assert(ImageTable.psnrDb(ours, ref) >= 40.0)
  }

  test("truncated JPEG entropy data fails loudly (no fabricated pixels)") {
    val px = ImageTable.renderPixels(3, 32, 32)
    val bytes = Jpeg.encode(px, 32, 32)
    val sos = bytes.indices.find(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xDA).get
    // cut mid-entropy (past SOS, well before EOI): the decoder must refuse,
    // like the PNG codec, instead of decoding fabricated zero bits
    intercept[Exception](Jpeg.decode(bytes.take((sos + bytes.length) / 2)))
    // 16-bit SOF dimension limit enforced at encode
    intercept[IllegalArgumentException](Jpeg.encode(new Array[Int](70000), 70000, 1))
  }

  test("our decoder reads PROGRESSIVE (SOF2) JPEGs from ImageIO") {
    for (i <- 0L to 5L) {
      val w = ImageTable.widthOf(i); val h = ImageTable.heightOf(i)
      val px = ImageTable.renderPixels(i, w, h)
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, px, 0, w)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.9f)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose(); ios.close()
      val bytes = bos.toByteArray
      // confirm the stream really is progressive (SOF2 present, no SOF0)
      assert(bytes.indices.exists(k =>
        (bytes(k) & 0xFF) == 0xFF && (bytes(k + 1) & 0xFF) == 0xC2), "ImageIO wrote baseline?")
      val (ours, oW, oH) = Jpeg.decode(bytes)
      assert(oW == w && oH == h)
      val (ref, _, _) = ImageTable.decodeViaImageIO(bytes)
      // both decoders on the same progressive stream must agree closely;
      // fidelity to the source is bounded by the encoder like baseline
      assert(ImageTable.psnrDb(ours, ref) >= 45.0, s"image $i vs ImageIO decode")
      assert(ImageTable.psnrDb(ours, px) >= ImageTable.psnrDb(ref, px) - 1.0,
        s"image $i fidelity vs reference decoder")
    }
  }

  test("JPEG restart intervals: DRI/RSTn streams round-trip and cross-decode via ImageIO") {
    val w = 48; val h = 40 // 6x5 = 30 MCUs at 4:4:4
    val px = ImageTable.renderPixels(11, w, h)
    for (interval <- Seq(1, 3, 7)) {
      val bytes = Jpeg.encode(px, w, h, restartInterval = interval)
      assert(bytes.indices.exists(k => (bytes(k) & 0xFF) == 0xFF && (bytes(k + 1) & 0xFF) == 0xDD),
        "no DRI segment written")
      val (ours, oW, oH) = Jpeg.decode(bytes)
      assert(oW == w && oH == h)
      assert(ImageTable.psnrDb(ours, px) >= 40.0, s"interval $interval round trip")
      // an independent decoder must accept the restart stream too
      val (ref, _, _) = ImageTable.decodeViaImageIO(bytes)
      assert(ImageTable.psnrDb(ref, ours) >= 45.0, s"interval $interval vs ImageIO")
    }
  }

  test("JPEG decoder survives corruption fuzzing: clean failure or success, never a crash") {
    // at ingest scale the decoder sees arbitrary bytes; every corruption
    // must decode or raise IllegalArgumentException — never an index error,
    // NPE, or unbounded allocation (30k-seed offline sweep found and fixed
    // 2,169 such crashes: unvalidated table ids, SOS-before-SOF, segment
    // lengths overrunning the file, 17 GB plane allocations from corrupt
    // SOF dims). This pin keeps a 3k-seed deterministic slice in CI.
    val base = Jpeg.encode(ImageTable.renderPixels(7, 32, 24), 32, 24)
    for (seed <- 0L until 3000L) {
      val b = base.clone()
      val n = 1 + (ImageTable.splitmix64(seed) & 3).toInt
      for (k <- 0 until n) {
        val p = Math.floorMod(ImageTable.splitmix64(seed * 7 + k), b.length.toLong).toInt
        b(p) = (ImageTable.splitmix64(seed * 13 + k) & 0xFF).toByte
      }
      try { Jpeg.decode(b); () }
      catch { case _: IllegalArgumentException => () } // anything else fails the test
    }
  }

  test("PNG/BMP decoders survive corruption fuzzing: clean failure or success, never a crash") {
    // same ingest-robustness contract as the JPEG fuzz pin. The offline
    // sweep found real failures in both: a negative PNG chunk length
    // walked the chunk cursor BACKWARD (infinite loop), corrupt deflate
    // raised unchecked DataFormatException, and corrupt BMP dims/offsets
    // indexed out of bounds or allocated gigabytes.
    val px = ImageTable.renderPixels(3, 24, 20)
    for ((base, n) <- Seq((Codecs.encodePng(px, 24, 20), 800), (Codecs.encodeBmp(px, 24, 20), 800))) {
      for (seed <- 0L until n.toLong) {
        val b = base.clone()
        val k = 1 + (ImageTable.splitmix64(seed) & 3).toInt
        for (j <- 0 until k) {
          val p = Math.floorMod(ImageTable.splitmix64(seed * 7 + j), b.length.toLong).toInt
          b(p) = (ImageTable.splitmix64(seed * 13 + j) & 0xFF).toByte
        }
        try { Codecs.decode(b); () }
        catch {
          case _: IllegalArgumentException | _: java.io.IOException => ()
        } // anything else fails the test
      }
    }
  }

  test("FLAC round trip is bit-exact for noise, tones, constants, and edge lengths") {
    import graft.img.Flac
    def tri(i: Long, len: Int): Array[Short] = {
      // integer triangle wave — the piecewise-linear class fixed predictors
      // are built for
      // long periods: slope changes (the only non-zero order-2 residuals)
      // every period/2 samples, so rice params stay tiny between peaks
      val period = 256 + (ImageTable.splitmix64(i * 3 + 1) & 0x1FF).toInt
      val amp = 4000 + (ImageTable.splitmix64(i * 3 + 2) & 0x1FFF).toInt
      Array.tabulate(len) { k =>
        val p = k % period
        val v = 2 * math.min(p, period - p) - period / 2
        (v.toLong * amp / period).toShort
      }
    }
    val cases: Seq[Array[Short]] = Seq(
      Array.tabulate(5000)(k => ((ImageTable.splitmix64(k.toLong) & 0xFFFF) - 32768).toShort), // noise
      tri(1, 9000), tri(2, 4096), // multi-frame + exactly one block
      Array.fill(3000)(1234.toShort), // constant
      Array.tabulate(3)(k => (k * 1000).toShort), // tiny (< any standard block)
      Array(Short.MinValue, Short.MaxValue, 0.toShort, -1.toShort), // extremes
      Array.tabulate(4097)(k => (k % 97).toShort)) // one sample past a block
    for ((pcm, ci) <- cases.zipWithIndex) {
      val enc = Flac.encode(pcm, 16000)
      val (dec, rate) = Flac.decode(enc)
      assert(rate == 16000)
      assert(dec.toSeq == pcm.toSeq, s"case $ci: lossless round trip broken")
    }
    // fixed predictors genuinely compress the piecewise-linear corpus
    val smooth = tri(7, 64000)
    val ratio = Flac.encode(smooth, 16000).length.toDouble / (smooth.length * 2)
    assert(ratio < 0.35, f"triangle corpus should compress well, got ratio $ratio%.3f")
    // and the container overhead on incompressible noise stays small
    val noise = Array.tabulate(64000)(k => ((ImageTable.splitmix64(k + 1L) & 0xFFFF) - 32768).toShort)
    val nratio = Flac.encode(noise, 16000).length.toDouble / (noise.length * 2)
    assert(nratio < 1.1, f"noise overhead too high: $nratio%.3f")
  }

  test("FLAC stereo round trips bit-exactly across all four channel assignments") {
    import graft.img.Flac
    def noise(seed: Long, n: Int) =
      Array.tabulate(n)(k => ((ImageTable.splitmix64(seed * 31 + k) & 0xFFFF) - 32768).toShort)
    def tone(seed: Long, n: Int) = {
      val period = 256 + (ImageTable.splitmix64(seed) & 0x1FF).toInt
      Array.tabulate(n) { k =>
        val p = k % period
        ((2 * math.min(p, period - p) - period / 2) * 20).toShort
      }
    }
    val n = 9000
    val cases: Seq[(Array[Short], Array[Short], String)] = Seq(
      (noise(1, n), noise(2, n), "independent noise"), // decorrelation can't help
      (tone(3, n), tone(3, n), "identical channels"), // side ≡ 0 → mid/side
      (tone(4, n), tone(4, n).map(v => (v + 3).toShort), "near-identical"), // tiny side
      (tone(5, n), noise(6, n), "tone left, noise right"),
      (noise(7, n), tone(8, n), "noise left, tone right"),
      (Array.tabulate(n)(k => (k % 327 * 100 - 16000).toShort),
        Array.tabulate(n)(k => (16000 - k % 327 * 100).toShort), "anti-correlated"),
      (noise(9, 3), noise(10, 3), "tiny"),
      (Array(Short.MinValue, Short.MaxValue), Array(Short.MaxValue, Short.MinValue),
        "extreme side range")) // side = ±65535 needs the full 17 bits
    for ((l, r, name) <- cases) {
      val enc = Flac.encodeStereo(l, r, 44100)
      val (chans, rate) = Flac.decodeMulti(enc)
      assert(rate == 44100 && chans.length == 2, name)
      assert(chans(0).toSeq == l.toSeq, s"$name: left broken")
      assert(chans(1).toSeq == r.toSeq, s"$name: right broken")
      // mono decode must refuse a stereo stream loudly
      intercept[IllegalArgumentException](Flac.decode(enc))
    }
    // decorrelation pays: identical channels compress far below 2x mono
    val t = tone(11, 64000)
    val ratio = Flac.encodeStereo(t, t, 16000).length.toDouble / (t.length * 4)
    assert(ratio < 0.25, f"mid/side should collapse identical channels, got $ratio%.3f")
    // stereo corruption fuzz: CRC/MD5 catch or the stream decodes exactly
    val good = Flac.encodeStereo(tone(12, 4000), noise(13, 4000), 16000)
    for (seed <- 0 until 400) {
      val b = good.clone()
      val p = Math.floorMod(ImageTable.splitmix64(seed + 7777L), b.length.toLong).toInt
      b(p) = (b(p) ^ (1 << (ImageTable.splitmix64(seed * 13L) & 7).toInt).toByte).toByte
      try Flac.decodeMulti(b)
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"seed $seed byte $p: unclean failure $e")
      }
    }
  }

  test("FLAC decoder verifies CRCs and MD5, rejects malformed streams, survives fuzzing") {
    import graft.img.Flac
    val pcm = Array.tabulate(6000)(k => ((ImageTable.splitmix64(k * 31L) & 0xFFFF) - 32768).toShort)
    val good = Flac.encode(pcm, 16000)
    // single-byte corruption anywhere must either fail loudly or decode to
    // the exact original (a flipped bit in padding can be benign) — never
    // crash, hang, or silently corrupt. CRC-8/CRC-16/MD5 make silent
    // corruption structurally hard.
    var failed = 0
    for (seed <- 0 until 1500) {
      val b = good.clone()
      val p = Math.floorMod(ImageTable.splitmix64(seed.toLong), b.length.toLong).toInt
      b(p) = (b(p) ^ (1 << (ImageTable.splitmix64(seed * 13L) & 7).toInt).toByte).toByte
      try {
        val (dec, _) = Flac.decode(b)
        assert(dec.toSeq == pcm.toSeq, s"seed $seed: silent corruption at byte $p")
      } catch {
        case _: IllegalArgumentException => failed += 1
        case e: Throwable => fail(s"seed $seed byte $p: unclean failure $e")
      }
    }
    assert(failed > 1200, s"CRC/MD5 should catch nearly all corruptions, caught $failed/1500")
    // truncations fail loudly at every length
    for (cut <- Seq(0, 3, 7, 41, good.length / 2, good.length - 1))
      intercept[IllegalArgumentException](Flac.decode(good.take(cut)))
    // non-FLAC bytes
    intercept[IllegalArgumentException](Flac.decode("RIFFxxxxWAVE".getBytes))
  }

  test("JPEG rejects unsupported shapes loudly") {
    val px = ImageTable.renderPixels(1, 16, 16)
    val bytes = Jpeg.encode(px, 16, 16)
    // arithmetic-coded SOF: rewrite SOF0 marker to SOF9
    val arith = bytes.clone()
    val sofAt = arith.indices.find(i => (arith(i) & 0xFF) == 0xFF && (arith(i + 1) & 0xFF) == 0xC0).get
    arith(sofAt + 1) = 0xC9.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(arith))
    assert(e.getMessage.contains("unsupported SOF"))
    intercept[IllegalArgumentException](Jpeg.decode(Array[Byte](0, 1, 2)))
  }
}
