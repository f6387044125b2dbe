package graft.img

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{Dataset, SparkSession}

/** The Iceberg-shaped image+caption table (BASELINE.json input_hint):
  *
  *   images(image_id STRING, bytes BINARY, w INT, h INT, fmt STRING,
  *          caption STRING, phash BIGINT)
  *
  * Synthesized deterministically (FIXTURES.md §2): pixels are a pure
  * function of (i, w, h); bytes are real PNG/BMP containers encoded by
  * graft's own lock-free codecs (`graft.img.Codecs`; both lossless → the
  * PSNR≥40dB invariant is exact equality, PSNR = ∞), cross-validated
  * against `javax.imageio` in tests. No Iceberg runtime in the sandbox — the manifest
  * table in graft.tile supplies snapshot/file metadata semantics.
  *
  * Scale: generation/decoding is a narrow `mapPartitions` over
  * `spark.range` — embarrassingly parallel, no shuffle.
  */
object ImageTable {

  // ImageIO's default disk-backed stream cache serializes concurrent
  // encode/decode on temp-file I/O (measured: 12k → 85k ops/s at 32 threads
  // with the cache off). Class-load runs once per executor JVM.
  javax.imageio.ImageIO.setUseCache(false)

  final case class ImageRow(image_id: String, bytes: Array[Byte], w: Int, h: Int,
      fmt: String, caption: String, phash: Long)

  /** splitmix64 — public-domain mixing function (Steele et al.). */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def widthOf(i: Long): Int = 16 + (splitmix64(i * 3 + 1) & 0x2F).toInt // 16..63
  def heightOf(i: Long): Int = 16 + (splitmix64(i * 3 + 2) & 0x2F).toInt
  def fmtOf(i: Long): String = if ((i & 1) == 0) "png" else "bmp"

  /** Deterministic RGB pixel at (x, y) for image i: banded gradient keyed by
    * the image's hash — distinct per image, cheap, and exactly reproducible
    * for the decode-verify pass.
    */
  @inline def pixel(i: Long, x: Int, y: Int): Int = {
    val h = splitmix64(i)
    val r = ((x * 7 + (h & 0xFF)) & 0xFF).toInt
    val g = ((y * 11 + ((h >>> 8) & 0xFF)) & 0xFF).toInt
    val b = (((x + y) * 3 + ((h >>> 16) & 0xFF)) & 0xFF).toInt
    (r << 16) | (g << 8) | b
  }

  def renderPixels(i: Long, w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = pixel(i, x, y); x += 1 }
      y += 1
    }
    out
  }

  /** Encode via graft's own lock-free codecs (graft.img.Codecs) — ImageIO's
    * synchronized registry + stream cache were the measured scalability
    * ceiling of the tile pipeline. ImageIO remains a decode ORACLE in tests.
    */
  def encode(pixels: Array[Int], w: Int, h: Int, fmt: String): Array[Byte] =
    Codecs.encode(pixels, w, h, fmt)

  /** Decode to RGB ints (alpha stripped) — the verify/tile path. */
  def decode(bytes: Array[Byte]): (Array[Int], Int, Int) =
    Codecs.decode(bytes)

  /** ImageIO-based decode — used by tests as an independent oracle. */
  def decodeViaImageIO(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < px.length) { px(i) = px(i) & 0xFFFFFF; i += 1 }
    (px, w, h)
  }

  /** ImageIO-based encode — used by tests to cross-check container parsing. */
  def encodeViaImageIO(pixels: Array[Int], w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, pixels, 0, w)
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, bos), s"no encoder for $fmt")
    bos.toByteArray
  }

  def makeRow(i: Long): ImageRow = {
    val w = widthOf(i); val h = heightOf(i); val fmt = fmtOf(i)
    val ph = splitmix64(i)
    ImageRow(
      image_id = f"img_$i%09d",
      bytes = encode(renderPixels(i, w, h), w, h, fmt),
      w = w, h = h, fmt = fmt,
      caption = s"caption_$i of cell ${math.abs(ph) % 97}",
      phash = ph)
  }

  /** n-row image table as a typed Dataset (narrow, partition-parallel). */
  def generate(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => makeRow(i))
  }

  /** Geotag derivation — same BIGINT arithmetic as
    * GraftFunctions.latOfKey/lonOfKey applied to the image index, so a SQL
    * oracle can reproduce it from `image_id`.
    */
  def latOf(i: Long): Double = (math.abs(i * 9973 + 12345) % 170000) / 1000.0 - 85.0
  def lonOf(i: Long): Double = (math.abs(i * 7919 + 54321) % 360000) / 1000.0 - 180.0

  /** Peak signal-to-noise ratio in dB between two equal-size RGB buffers;
    * Double.PositiveInfinity when identical — "PSNR ≥ 40dB" is then trivially
    * satisfied for lossless round trips.
    */
  def psnrDb(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length, s"size mismatch ${a.length} vs ${b.length}")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      var c = 0
      while (c < 3) {
        val d = ((a(i) >>> (8 * c)) & 0xFF) - ((b(i) >>> (8 * c)) & 0xFF)
        se += d.toDouble * d
        c += 1
      }
      i += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else {
      val mse = se / (a.length * 3.0)
      10.0 * math.log10(255.0 * 255.0 / mse)
    }
  }
}
