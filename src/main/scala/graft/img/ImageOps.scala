package graft.img

/** Pixel-array transforms for the image pipeline (augmentation /
  * thumbnailing primitives). All pure integer index arithmetic — no
  * resampling floats — so every op is bit-deterministic and q76's
  * thumbnail checksum replays closed-form in SQL.
  *
  * Layout contract: row-major ARGB/RGB ints, length w*h (the same layout
  * every graft codec produces).
  */
object ImageOps {

  /** Nearest-neighbor resize: destination (tx, ty) samples source
    * (tx·srcW div dstW, ty·srcH div dstH) — floor division, the standard
    * box-corner mapping. Upscale and downscale both work; identity when
    * dims match (tx·w div w = tx).
    */
  def resizeNearest(px: Array[Int], srcW: Int, srcH: Int, dstW: Int, dstH: Int): Array[Int] = {
    require(srcW > 0 && srcH > 0 && dstW > 0 && dstH > 0, s"dims $srcW x$srcH -> $dstW x$dstH")
    require(px.length == srcW * srcH, s"pixels ${px.length} != $srcW x$srcH")
    val out = new Array[Int](dstW * dstH)
    var ty = 0
    while (ty < dstH) {
      val sy = ty * srcH / dstH
      var tx = 0
      while (tx < dstW) {
        out(ty * dstW + tx) = px(sy * srcW + tx * srcW / dstW)
        tx += 1
      }
      ty += 1
    }
    out
  }

  def flipH(px: Array[Int], w: Int, h: Int): Array[Int] = {
    require(px.length == w * h, s"pixels ${px.length} != ${w}x$h")
    val out = new Array[Int](px.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = px(y * w + (w - 1 - x)); x += 1 }
      y += 1
    }
    out
  }

  def flipV(px: Array[Int], w: Int, h: Int): Array[Int] = {
    require(px.length == w * h, s"pixels ${px.length} != ${w}x$h")
    val out = new Array[Int](px.length)
    var y = 0
    while (y < h) {
      System.arraycopy(px, (h - 1 - y) * w, out, y * w, w)
      y += 1
    }
    out
  }

  /** 90° clockwise: output is h×w; out(x', y') = in(y = h-1-x', x = y'). */
  def rot90(px: Array[Int], w: Int, h: Int): Array[Int] = {
    require(px.length == w * h, s"pixels ${px.length} != ${w}x$h")
    val out = new Array[Int](px.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(x * h + (h - 1 - y)) = px(y * w + x); x += 1 }
      y += 1
    }
    out
  }

  def crop(px: Array[Int], w: Int, h: Int, x0: Int, y0: Int, cw: Int, ch: Int): Array[Int] = {
    require(x0 >= 0 && y0 >= 0 && cw > 0 && ch > 0 && x0 + cw <= w && y0 + ch <= h,
      s"crop ($x0,$y0 ${cw}x$ch) outside ${w}x$h")
    val out = new Array[Int](cw * ch)
    var y = 0
    while (y < ch) {
      System.arraycopy(px, (y0 + y) * w + x0, out, y * cw, cw)
      y += 1
    }
    out
  }

  /** Decode audit / quarantine: at 10^12 crawled images some bytes are
    * truncated, mislabeled, or hostile, and a pipeline that throws on
    * the first bad row never finishes. Each row decodes under a guard:
    * success emits ("ok", w, h), any decode failure emits ("corrupt",
    * NULL, NULL) and the row routes to quarantine instead of killing
    * the stage. Narrow mapPartitions, zero shuffle; the error CLASS is
    * coarse on purpose (decoder messages are not a stable contract).
    */
  def decodeAudit(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val (_, w, h) = Codecs.decode(bytes)
            (id, "ok", Option(w), Option(h))
          } catch {
            case _: Exception => (id, "corrupt", Option.empty[Int], Option.empty[Int])
          }
        }
      }
      .toDF("image_id", "status", "w", "h")
  }

  /** Integer Sobel gradient stats for one image: grayscale by the
    * BT.601 integer weights (r·299 + g·587 + b·114) div 1000 (floor —
    * exact, no float), then the 3×3 Sobel pair on INTERIOR pixels;
    * returns (Σ(|gx|+|gy|), max(|gx|+|gy|)). The edge-energy signal an
    * image-quality filter ranks with (flat/blank images score ~0,
    * detailed ones high) — pure integer, so it replays bit-exactly in
    * SQL from the synthetic pixel formula.
    */
  def sobelEnergy(px: Array[Int], w: Int, h: Int): (Long, Long) = {
    val gray = new Array[Int](w * h)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      gray(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      k += 1
    }
    var energy = 0L
    var gmax = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        @inline def g(xx: Int, yy: Int) = gray(yy * w + xx)
        val gx = g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1) -
          g(x - 1, y - 1) - 2 * g(x - 1, y) - g(x - 1, y + 1)
        val gy = g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1) -
          g(x - 1, y - 1) - 2 * g(x, y - 1) - g(x + 1, y - 1)
        val m = math.abs(gx).toLong + math.abs(gy).toLong
        energy += m
        if (m > gmax) gmax = m
        x += 1
      }
      y += 1
    }
    (energy, gmax)
  }

  /** (image_id, w, h, energy, gmax) per image: decode the binary column
    * with graft's own codecs, then [[sobelEnergy]]. Narrow mapPartitions
    * over (id, bytes) — no shuffle, the 100 TB shape of every per-image
    * feature extractor in this repo.
    */
  def sobelStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (energy, gmax) = sobelEnergy(px, w, h)
          (id, w, h, energy, gmax)
        }
      }
      .toDF("image_id", "w", "h", "energy", "gmax")
  }

  /** Column-major binary-mask RLE stats for one image — the COCO
    * segmentation-mask convention (column-major run-length encoding over
    * a 0/1 mask): grayscale by the same BT.601 integer weights as
    * [[sobelEnergy]], threshold at ≥ 128, walk pixels x-outer/y-inner
    * (ord = x·h + y) and count foreground pixels, foreground runs, and
    * the longest run. Pure integer → replays bit-exactly in SQL from the
    * synthetic pixel formula.
    */
  def rleMask(px: Array[Int], w: Int, h: Int): (Long, Long, Long) = {
    var fg = 0L
    var runs = 0L
    var longest = 0L
    var cur = 0L
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val p = px(y * w + x)
        val g = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
          (p & 255) * 114) / 1000
        if (g >= 128) {
          fg += 1
          if (cur == 0L) runs += 1
          cur += 1
          if (cur > longest) longest = cur
        } else cur = 0L
        y += 1
      }
      x += 1
    }
    (fg, runs, longest)
  }

  /** (image_id, w, h, fg, n_runs, longest) per image: decode the binary
    * column with graft's own codecs, then [[rleMask]]. Narrow
    * mapPartitions over (id, bytes) — no shuffle, the per-image feature
    * shape of this repo.
    */
  def rleMaskStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (fg, runs, longest) = rleMask(px, w, h)
          (id, w, h, fg, runs, longest)
        }
      }
      .toDF("image_id", "w", "h", "fg", "n_runs", "longest")
  }

  /** Otsu's automatic threshold (Otsu 1979) for one image, EXACT: build
    * the 256-bin BT.601 grayscale histogram, then pick the threshold t
    * (class 0 = g ≤ t, class 1 = g > t) maximizing the between-class
    * variance ω0·ω1·(μ0−μ1)², compared as the exact rational
    *
    *   f(t) = (S·c0(t) − N·s0(t))² / (c0(t)·(N − c0(t)))
    *
    * (N, S the pixel count and gray sum; c0, s0 the cumulative count and
    * gray sum through t). Candidates are the t with both classes
    * nonempty; comparisons cross-multiply in BigInt (the numerator
    * reaches ~2^88 — past Long), the strict `>` keeps the SMALLEST
    * argmax, and a constant image (no valid split) returns the (−1, 0)
    * sentinel. Returns (threshold, fg = pixels with g > threshold) — the
    * automatic-binarization front end of the mask pipeline ([[rleMask]]).
    */
  def otsu(px: Array[Int], w: Int, h: Int): (Int, Long) = {
    val hist = new Array[Long](256)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      val g = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      hist(g) += 1
      k += 1
    }
    val nTot = px.length.toLong
    var sTot = 0L
    var i = 0
    while (i < 256) { sTot += i.toLong * hist(i); i += 1 }
    var bestT = -1
    var bestA = BigInt(0)
    var bestB = BigInt(1)
    var c0 = 0L
    var s0 = 0L
    var t = 0
    while (t < 255) {
      c0 += hist(t); s0 += t.toLong * hist(t)
      if (c0 > 0 && c0 < nTot) {
        val a = BigInt(sTot) * c0 - BigInt(nTot) * s0
        val a2 = a * a
        val b = BigInt(c0) * (nTot - c0)
        if (bestT < 0 || a2 * bestB > bestA * b) { bestT = t; bestA = a2; bestB = b }
      }
      t += 1
    }
    var fg = 0L
    i = bestT + 1
    while (i < 256) { fg += hist(i); i += 1 }
    if (bestT < 0) (-1, 0L) else (bestT, fg)
  }

  /** (image_id, w, h, threshold, fg) per image: decode the binary column
    * with graft's own codecs, then [[otsu]]. Narrow mapPartitions over
    * (id, bytes) — no shuffle, the per-image feature shape of this repo.
    */
  def otsuStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (t, fg) = otsu(px, w, h)
          (id, w, h, t, fg)
        }
      }
      .toDF("image_id", "w", "h", "threshold", "fg")
  }

  /** Histogram equalization (the classic contrast-stretch), EXACT: with
    * the 256-bin BT.601 grayscale histogram, cumulative counts cdf(g),
    * N pixels and cdfmin = the first occupied bin's count, each occupied
    * level remaps to
    *
    *   out(g) = (cdf(g) − cdfmin) · 255 / (N − cdfmin)   (floor)
    *
    * — the standard integer formula (out(gmin) = 0, out(gmax) = 255). A
    * constant image (N = cdfmin) has no contrast to stretch and keeps
    * its level (identity — pinned, since the formula is 0/0 there).
    * Returns the exact remap summary (out_sum, out_min, out_max,
    * out_levels): enough to pin the whole mapping bit-for-bit without
    * shipping pixels.
    */
  def histEq(px: Array[Int], w: Int, h: Int): (Long, Int, Int, Int) = {
    val hist = new Array[Long](256)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      val g = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      hist(g) += 1
      k += 1
    }
    val n = px.length.toLong
    var cdfmin = 0L
    var i = 0
    while (i < 256 && hist(i) == 0) i += 1
    val gmin = i
    if (i < 256) cdfmin = hist(i)
    if (n == cdfmin) { // constant image: identity
      (n * gmin, gmin, gmin, 1)
    } else {
      var cdf = 0L
      var sum = 0L
      var outMin = 255
      var outMax = 0
      var levels = 0
      var last = -1
      i = 0
      while (i < 256) {
        if (hist(i) > 0) {
          cdf += hist(i)
          val out = ((cdf - cdfmin) * 255L / (n - cdfmin)).toInt
          sum += hist(i) * out
          if (out < outMin) outMin = out
          if (out > outMax) outMax = out
          if (out != last) { levels += 1; last = out }
        }
        i += 1
      }
      (sum, outMin, outMax, levels)
    }
  }

  /** (image_id, w, h, out_sum, out_min, out_max, out_levels) per image:
    * decode with graft's own codecs, then [[histEq]]. Narrow
    * mapPartitions, no shuffle.
    */
  def histEqStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (sum, mn, mx, lv) = histEq(px, w, h)
          (id, w, h, sum, mn, mx, lv)
        }
      }
      .toDF("image_id", "w", "h", "out_sum", "out_min", "out_max", "out_levels")
  }

  /** Gray-level co-occurrence texture features (Haralick 1973), EXACT:
    * quantize the BT.601 grayscale to 8 levels (g >> 5), count
    * horizontal co-occurrences (x, y)→(x+1, y) — the offset-(1,0)
    * GLCM — and reduce to the two integer Haralick features:
    * contrast = Σ (i−j)²·c_ij and the angular-second-moment numerator
    * asm_num = Σ c_ij² (the denominator n_pairs² is carried alongside,
    * n_pairs = (w−1)·h). Smooth images score low contrast / high ASM;
    * noisy ones the reverse — the texture signal an image-quality
    * filter ranks with.
    */
  def glcm(px: Array[Int], w: Int, h: Int): (Long, Long, Long) = {
    val q = new Array[Int](px.length)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      q(k) = ((((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000) >> 5
      k += 1
    }
    val c = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        c(q(y * w + x) * 8 + q(y * w + x + 1)) += 1
        x += 1
      }
      y += 1
    }
    var contrast = 0L
    var asm = 0L
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        val cij = c(i * 8 + j)
        contrast += (i - j).toLong * (i - j) * cij
        asm += cij * cij
        j += 1
      }
      i += 1
    }
    ((w - 1).toLong * h, contrast, asm)
  }

  /** (image_id, n_pairs, contrast, asm_num) per image: decode with
    * graft's own codecs, then [[glcm]]. Narrow mapPartitions, no shuffle.
    */
  def glcmStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (np, contrast, asm) = glcm(px, w, h)
          (id, np, contrast, asm)
        }
      }
      .toDF("image_id", "n_pairs", "contrast", "asm_num")
  }

  /** Binary 3×3 morphology counts, EXACT: threshold the BT.601 grayscale
    * at ≥ 128 (the [[rleMask]] mask convention), then per INTERIOR pixel
    * (border handling explicit, as in [[sobelEnergy]]) evaluate the two
    * structuring-element reductions — erosion (all 9 of the 3×3
    * neighborhood foreground) and dilation (any of the 9 foreground).
    * Returns (fg = total foreground, eroded = interior pixels surviving
    * erosion, dilated = interior pixels lit by dilation) — the
    * open/close building blocks of mask cleanup before RLE/blob steps.
    */
  def morphology(px: Array[Int], w: Int, h: Int): (Long, Long, Long) = {
    val m = new Array[Int](px.length)
    var fg = 0L
    var k = 0
    while (k < px.length) {
      val p = px(k)
      val g = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      if (g >= 128) { m(k) = 1; fg += 1 }
      k += 1
    }
    var eroded = 0L
    var dilated = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        var s = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) { s += m((y + dy) * w + (x + dx)); dx += 1 }
          dy += 1
        }
        if (s == 9) eroded += 1
        if (s >= 1) dilated += 1
        x += 1
      }
      y += 1
    }
    (fg, eroded, dilated)
  }

  /** (image_id, w, h, fg, eroded, dilated) per image: decode with
    * graft's own codecs, then [[morphology]]. Narrow mapPartitions, no
    * shuffle.
    */
  def morphologyStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (fg, er, di) = morphology(px, w, h)
          (id, w, h, fg, er, di)
        }
      }
      .toDF("image_id", "w", "h", "fg", "eroded", "dilated")
  }

  /** Dominant color per image, EXACT: quantize RGB to the 4×4×4 cube
    * (2 bits per channel → 64 bins), count, and take the most frequent
    * bin with the smallest-bin tie-break — the thumbnail-palette /
    * near-dup-prefilter signal. Returns (bin, count).
    */
  def dominantColor(px: Array[Int], w: Int, h: Int): (Int, Long) = {
    val c = new Array[Long](64)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      val bin = (((p >> 16) & 255) >> 6 << 4) | (((p >> 8) & 255) >> 6 << 2) |
        ((p & 255) >> 6)
      c(bin) += 1
      k += 1
    }
    var best = 0
    var i = 1
    while (i < 64) { if (c(i) > c(best)) best = i; i += 1 }
    (best, c(best))
  }

  /** (image_id, w, h, bin, cnt) per image: decode with graft's own
    * codecs, then [[dominantColor]]. Narrow mapPartitions, no shuffle.
    */
  def dominantColorStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (bin, cnt) = dominantColor(px, w, h)
          (id, w, h, bin, cnt)
        }
      }
      .toDF("image_id", "w", "h", "bin", "cnt")
  }

  /** Explode the binary image column into one row per pixel:
    * (image_id, x, y, g) with g the BT.601 integer grayscale (same
    * exact floor arithmetic as [[sobelEnergy]]/[[rleMask]]). This is
    * the raster leg of zonal statistics ([[graft.geom.Raster.zonalStats]])
    * — decode through graft's own codecs, then a narrow flatMap; the
    * output is pixel-sized by definition (that's what zonal stats
    * aggregates), but no shuffle happens here.
    */
  def grayPixels(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val (px, w, _) = Codecs.decode(bytes)
          Iterator.tabulate(px.length) { k =>
            val p = px(k)
            val g = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
              (p & 255) * 114) / 1000
            (id, k % w, k / w, g)
          }
        }
      }
      .toDF("image_id", "x", "y", "g")
  }

  /** Local binary pattern (Ojala et al., PAMI 2002 — the 8-neighbor
    * grayscale texture descriptor): at every INTERIOR pixel, bit k is
    * set when neighbor k's gray ≥ the center's gray, neighbors
    * enumerated clockwise from the top-left — k: (dx, dy) = 0:(−1,−1),
    * 1:(0,−1), 2:(1,−1), 3:(1,0), 4:(1,1), 5:(0,1), 6:(−1,1), 7:(−1,0).
    * Gray is the exact BT.601 floor integer ([[grayPixels]]). Returns
    * the 256-bin code histogram.
    */
  def lbp(px: Array[Int], w: Int, h: Int): Array[Long] = {
    val g = new Array[Int](px.length)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      g(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      k += 1
    }
    val dx = Array(-1, 0, 1, 1, 1, 0, -1, -1)
    val dy = Array(-1, -1, -1, 0, 1, 1, 1, 0)
    val hist = new Array[Long](256)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val c = g(y * w + x)
        var code = 0
        var b = 0
        while (b < 8) {
          if (g((y + dy(b)) * w + (x + dx(b))) >= c) code |= 1 << b
          b += 1
        }
        hist(code) += 1
        x += 1
      }
      y += 1
    }
    hist
  }

  /** (image_id, code, cnt) rows — the per-image LBP texture histogram,
    * non-zero bins only: the texture leg of near-dup prefiltering and
    * quality scoring (flat regions pile onto codes 0/255, edges spread).
    * Narrow mapPartitions decode + in-task histogram — the shuffle-free
    * [[dominantColorStats]] shape; output is ≤ 256 rows per image
    * regardless of resolution.
    */
  def lbpHistogram(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val hist = lbp(px, w, h)
          Iterator.range(0, 256).filter(hist(_) > 0L)
            .map(c => (id, c.toLong, hist(c)))
        }
      }
      .toDF("image_id", "code", "cnt")
  }

  /** Binomial half-resolution pyramid level, exact-integer invariants:
    * smooth the BT.601 gray with the 3×3 binomial kernel
    * [1,2,1]⊗[1,2,1]/16 (floor division, borders CLAMPED — GDAL edge
    * semantics), sample at even (x, y) — the anti-aliased 2× downsample
    * a thumbnail/pHash chain wants where nearest-neighbor would alias.
    * Emits per image: output pixel count, Σ of the smoothed samples,
    * and the position-weighted checksum Σ s·(ox+1)·(oy+3) (order-
    * sensitive — any misplaced sample breaks it). Narrow mapPartitions
    * decode, one row per image.
    */
  def binomialDown2(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val g = new Array[Int](px.length)
          var k = 0
          while (k < px.length) {
            val p = px(k)
            g(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
              (p & 255) * 114) / 1000
            k += 1
          }
          def at(x: Int, y: Int) =
            g(math.min(h - 1, math.max(0, y)) * w + math.min(w - 1, math.max(0, x)))
          var nPx, sSum, chk = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val s = (at(x - 1, y - 1) + 2 * at(x, y - 1) + at(x + 1, y - 1) +
                2 * at(x - 1, y) + 4 * at(x, y) + 2 * at(x + 1, y) +
                at(x - 1, y + 1) + 2 * at(x, y + 1) + at(x + 1, y + 1)) / 16
              nPx += 1
              sSum += s
              chk += s.toLong * (x / 2 + 1) * (y / 2 + 3)
              x += 2
            }
            y += 2
          }
          (id, nPx, sSum, chk)
        }
      }
      .toDF("image_id", "n_px", "s_sum", "checksum")
  }

  /** Exact bilinear 2× upsample, aggregated per image: the
    * (2w−1)×(2h−1) co-sited doubling grid, every output sample as its
    * EXACT ×4 numerator — 4·g at original samples, 2·(a+b) at edge
    * midpoints, a+b+c+d at cell centers; no division, no rounding, and
    * no clamping (X odd ⇒ x0+1 ≤ w−1 on this grid). Emits (image_id,
    * up_w, up_h, num4_sum, checksum) with the position-weighted
    * checksum Σ num4·(X+1)·(Y+2) pinning every sample's placement.
    * Narrow mapPartitions decode, aggregated in-task — no shuffle.
    */
  def bilinearUp2(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val g = new Array[Int](px.length)
          var k = 0
          while (k < px.length) {
            val p = px(k)
            g(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
              (p & 255) * 114) / 1000
            k += 1
          }
          def at(x: Int, y: Int) = g(y * w + x)
          var sm, chk = 0L
          var yy = 0
          while (yy < 2 * h - 1) {
            val y0 = yy / 2
            var xx = 0
            while (xx < 2 * w - 1) {
              val x0 = xx / 2
              val num4 =
                if (xx % 2 == 0 && yy % 2 == 0) 4 * at(x0, y0)
                else if (yy % 2 == 0) 2 * (at(x0, y0) + at(x0 + 1, y0))
                else if (xx % 2 == 0) 2 * (at(x0, y0) + at(x0, y0 + 1))
                else at(x0, y0) + at(x0 + 1, y0) + at(x0, y0 + 1) + at(x0 + 1, y0 + 1)
              sm += num4
              chk += num4.toLong * (xx + 1) * (yy + 2)
              xx += 1
            }
            yy += 1
          }
          (id, 2L * w - 1, 2L * h - 1, sm, chk)
        }
      }
      .toDF("image_id", "up_w", "up_h", "num4_sum", "checksum")
  }

  /** Exact per-image gray quantiles (discrete / lower-quantile
    * semantics): p_q = the smallest gray level whose cumulative pixel
    * count reaches ⌈q·n⌉ — no interpolation, no float, so both engines
    * agree bit-for-bit (the exact counterpart to the sketch-based
    * approx-percentile path). Computed from the in-task 256-bin
    * histogram — narrow decode, one row per image; the gray domain
    * being bounded is what makes exact distributed quantiles free here
    * (the general-domain exact form would need a sort or a
    * merge-able histogram, which IS this, bucketized).
    */
  def grayQuantiles(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val hist = new Array[Long](256)
          var k = 0
          while (k < px.length) {
            val p = px(k)
            hist((((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
              (p & 255) * 114) / 1000) += 1
            k += 1
          }
          val n = w.toLong * h
          def pick(kth: Long): Long = {
            var cum = 0L
            var g = 0
            while (g < 256) {
              cum += hist(g)
              if (cum >= kth) return g.toLong
              g += 1
            }
            255L
          }
          (id, pick((n + 3) / 4), pick((n + 1) / 2), pick((3 * n + 3) / 4))
        }
      }
      .toDF("image_id", "p25", "p50", "p75")
  }

  /** HOG-style gradient orientation histogram, exact-integer form: at
    * every interior pixel compute the 3×3 Sobel gradients (gx, gy) over
    * the BT.601 gray, drop zero-gradient pixels, and bin the rest into
    * 8 octants by PURE SIGN/MAGNITUDE COMPARISONS — no atan2, no float:
    * octant = (gx≥0, gy≥0, |gx|≥|gy|) → 0..7 counterclockwise from +x.
    * Per (image, octant): pixel count and the Σ(|gx|+|gy|) L1-magnitude
    * weight (the integer surrogate for HOG's √(gx²+gy²) vote). Narrow
    * mapPartitions decode, ≤ 8 rows per image.
    */
  def hogOctants(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val g = new Array[Int](px.length)
          var k = 0
          while (k < px.length) {
            val p = px(k)
            g(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
              (p & 255) * 114) / 1000
            k += 1
          }
          val cnt = new Array[Long](8)
          val wsum = new Array[Long](8)
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              def at(dx: Int, dy: Int) = g((y + dy) * w + (x + dx))
              val gx = -at(-1, -1) + at(1, -1) - 2 * at(-1, 0) + 2 * at(1, 0) -
                at(-1, 1) + at(1, 1)
              val gy = -at(-1, -1) - 2 * at(0, -1) - at(1, -1) +
                at(-1, 1) + 2 * at(0, 1) + at(1, 1)
              if (gx != 0 || gy != 0) {
                val ax = math.abs(gx); val ay = math.abs(gy)
                val oct =
                  if (gx >= 0 && gy >= 0) { if (ax >= ay) 0 else 1 }
                  else if (gx < 0 && gy >= 0) { if (ax < ay) 2 else 3 }
                  else if (gx < 0 && gy < 0) { if (ax >= ay) 4 else 5 }
                  else { if (ax < ay) 6 else 7 }
                cnt(oct) += 1L
                wsum(oct) += (ax + ay).toLong
              }
              x += 1
            }
            y += 1
          }
          Iterator.range(0, 8).filter(cnt(_) > 0L)
            .map(o => (id, o.toLong, cnt(o), wsum(o)))
        }
      }
      .toDF("image_id", "octant", "n_px", "w_sum")
  }

  /** Per-pixel form of [[lbp]]: (image_id, x, y, code) for every
    * INTERIOR pixel — the texture raster other layers join against
    * (e.g. [[graft.geom.Raster.zonalMode]] for majority-texture per map
    * zone). Narrow mapPartitions decode; pixel-sized output by
    * definition, no shuffle here.
    */
  def lbpPixels(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dxs = Array(-1, 0, 1, 1, 1, 0, -1, -1)
    val dys = Array(-1, -1, -1, 0, 1, 1, 1, 0)
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val g = new Array[Int](px.length)
          var k = 0
          while (k < px.length) {
            val p = px(k)
            g(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
              (p & 255) * 114) / 1000
            k += 1
          }
          for {
            y <- Iterator.range(1, h - 1)
            x <- Iterator.range(1, w - 1)
          } yield {
            val c = g(y * w + x)
            var code = 0L
            var b = 0
            while (b < 8) {
              if (g((y + dys(b)) * w + (x + dxs(b))) >= c) code |= 1L << b
              b += 1
            }
            (id, x, y, code)
          }
        }
      }
      .toDF("image_id", "x", "y", "code")
  }

  /** Haar-like 2-rectangle features (the Viola–Jones primitive) over
    * the fixed interior window x∈[4,11], y∈[2,9]: `haar_h` = (left
    * half − right half) gray sums with the split at x=7|8, `haar_v` =
    * (top − bottom) with the split at y=5|6. Computed the way a
    * detector computes them — O(1) SAT corner lookups over the same
    * two windowed prefix passes as [[integralStats]] (image-row/column
    * grained exchanges, never an image-global window) — while the
    * oracle derives the same integers from DIRECT conditional pixel
    * sums, so the two engines cross-validate the 4-corner algebra
    * itself, not just each other's arithmetic.
    */
  def haarStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rowW = Window.partitionBy(col("image_id"), col("y")).orderBy(col("x"))
    val colW = Window.partitionBy(col("image_id"), col("x")).orderBy(col("y"))
    val sat = grayPixels(spark, images)
      .withColumn("rs", sum(col("g").cast("long")).over(rowW))
      .withColumn("sat", sum(col("rs")).over(colW))
    def satAt(x: Int, y: Int) =
      coalesce(max(when(col("x") === x && col("y") === y, col("sat"))), lit(0L))
    // rect sum over [x0..x1]×[y0..y1] via the 4-corner identity
    def block(x0: Int, x1: Int, y0: Int, y1: Int) =
      satAt(x1, y1) - satAt(x0 - 1, y1) - satAt(x1, y0 - 1) + satAt(x0 - 1, y0 - 1)
    sat.groupBy(col("image_id"))
      .agg((block(4, 7, 2, 9) - block(8, 11, 2, 9)).as("haar_h"),
        (block(4, 11, 2, 5) - block(4, 11, 6, 9)).as("haar_v"))
  }

  /** Raw and central image moments over the exact BT.601 gray — the
    * translation-normalized shape signature (Hu 1962's first stage):
    * `m00` = Σg, `m10` = Σx·g, `m01` = Σy·g, and the central
    * second-moment NUMERATORS kept integer by clearing the m00
    * denominator — `mu20n` = m00·Σx²g − m10², `mu02n` = m00·Σy²g −
    * m01², `mu11n` = m00·Σxyg − m10·m01 (the orientation/eccentricity
    * numerators; consumers divide by m00² at the edge or compare
    * ratios exactly). Narrow mapPartitions decode, one row per image.
    */
  def momentStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, _) = Codecs.decode(bytes)
          var m00, m10, m01, m20, m11, m02 = 0L
          var k = 0
          while (k < px.length) {
            val p = px(k)
            val g = ((((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
              (p & 255) * 114) / 1000).toLong
            val x = (k % w).toLong; val y = (k / w).toLong
            m00 += g; m10 += x * g; m01 += y * g
            m20 += x * x * g; m11 += x * y * g; m02 += y * y * g
            k += 1
          }
          (id, m00, m10, m01,
            m00 * m20 - m10 * m10, m00 * m11 - m10 * m01, m00 * m02 - m01 * m01)
        }
      }
      .toDF("image_id", "m00", "m10", "m01", "mu20n", "mu11n", "mu02n")
  }

  /** Integral image (summed-area table) per image, reduced to exact
    * integer invariants: `total` = Σg, `corner` = sat(w−1, h−1) — must
    * equal `total` by the SAT's defining identity, and the oracle pins
    * both independently; `sat_sum` = Σ over all pixels of sat(x, y)
    * (order-sensitive — any misplaced prefix breaks it; equivalently
    * Σ g(x,y)·(w−x)·(h−y)); and `block_sum` = the O(1) 4-corner
    * rectangle query the SAT exists for, over the fixed interior
    * window x∈[4,11], y∈[2,9] (always in-bounds: [[ImageTable]] images
    * are ≥ 16×16).
    *
    * The SAT is built the way a 100-TB raster farm would: two windowed
    * prefix passes over the pixel table — rows cum-summed within
    * (image_id, y) ordered by x, then that column cum-summed within
    * (image_id, x) ordered by y. Each pass is ONE hash exchange on an
    * image-bounded key and a sort within image-row-sized partitions;
    * no per-image global sort ever happens (an image-global window
    * would serialize each image onto one task — rows/columns are the
    * scalable grain). Since g ≥ 0, sat is maximized at the far corner,
    * so `corner` is a plain max — no (w−1, h−1) lookup join needed.
    */
  def integralStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rowW = Window.partitionBy(col("image_id"), col("y")).orderBy(col("x"))
    val colW = Window.partitionBy(col("image_id"), col("x")).orderBy(col("y"))
    val sat = grayPixels(spark, images)
      .withColumn("rs", sum(col("g").cast("long")).over(rowW))
      .withColumn("sat", sum(col("rs")).over(colW))
    // sat at a fixed (x, y) — exactly one row matches per image
    def satAt(x: Int, y: Int) =
      coalesce(max(when(col("x") === x && col("y") === y, col("sat"))), lit(0L))
    sat.groupBy(col("image_id"))
      .agg(sum(col("g").cast("long")).as("total"),
        max(col("sat")).as("corner"),
        sum(col("sat")).as("sat_sum"),
        (satAt(11, 9) - satAt(3, 9) - satAt(11, 1) + satAt(3, 1)).as("block_sum"))
  }

  /** Integer Harris corner response (Harris & Stephens '88) for one
    * image: BT.601 floor grayscale, 3×3 Sobel gradients on interior
    * pixels, then at every doubly-interior pixel the structure tensor
    * summed over the 3×3 gradient window — Sxx = Σgx², Syy = Σgy²,
    * Sxy = Σgx·gy — and the response with k = 1/25 kept EXACT by
    * clearing the denominator: R = 25·(Sxx·Syy − Sxy²) − (Sxx+Syy)².
    * |gx| ≤ 1020 ⇒ window sums ≤ 9.4e6 ⇒ |R| ≤ ~2.2e15, comfortably a
    * Long. Returns (count of R > 0 — the corner pixels — and max R).
    */
  def harris(px: Array[Int], w: Int, h: Int): (Long, Long) = {
    val gray = new Array[Int](w * h)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      gray(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      k += 1
    }
    @inline def g(xx: Int, yy: Int) = gray(yy * w + xx)
    val gxs = new Array[Int](w * h)
    val gys = new Array[Int](w * h)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        gxs(y * w + x) = g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1) -
          g(x - 1, y - 1) - 2 * g(x - 1, y) - g(x - 1, y + 1)
        gys(y * w + x) = g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1) -
          g(x - 1, y - 1) - 2 * g(x, y - 1) - g(x + 1, y - 1)
        x += 1
      }
      y += 1
    }
    var nCorners = 0L
    var rMax = Long.MinValue
    y = 2
    while (y < h - 2) {
      var x = 2
      while (x < w - 2) {
        var sxx = 0L; var syy = 0L; var sxy = 0L
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val o = (y + dy) * w + (x + dx)
            val a = gxs(o).toLong; val b = gys(o).toLong
            sxx += a * a; syy += b * b; sxy += a * b
            dx += 1
          }
          dy += 1
        }
        val tr = sxx + syy
        val r = 25L * (sxx * syy - sxy * sxy) - tr * tr
        if (r > 0) nCorners += 1
        if (r > rMax) rMax = r
        x += 1
      }
      y += 1
    }
    (nCorners, rMax)
  }

  /** (image_id, n_corners, r_max) per image — [[harris]] over the
    * decoded binary column; narrow mapPartitions, no shuffle.
    */
  def harrisStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (n, rMax) = harris(px, w, h)
          (id, n, rMax)
        }
      }
      .toDF("image_id", "n_corners", "r_max")
  }

  /** 4-direction Hough line accumulator for one image: edge pixels are
    * interior pixels with Sobel |gx|+|gy| ≥ 300; each votes in four
    * quantized line families — dir 0: vertical (ρ = x), 1: horizontal
    * (ρ = y), 2: anti-diagonal (ρ = x+y), 3: diagonal (ρ = x−y) — the
    * exact-integer restriction of the (θ, ρ) Hough transform to the
    * four axis/diagonal angles (cos/sin ∈ {0, ±1} keeps ρ integral).
    * Returns, per direction with ≥ 1 vote, the winning line
    * (max votes, smallest ρ on ties).
    */
  def houghLines(px: Array[Int], w: Int, h: Int): Seq[(Int, Long, Long)] = {
    val gray = new Array[Int](w * h)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      gray(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      k += 1
    }
    @inline def g(xx: Int, yy: Int) = gray(yy * w + xx)
    // rho ranges: dir 0 → [0, w), 1 → [0, h), 2 → [0, w+h), 3 → (−h, w)
    val acc = Array.fill(4)(new java.util.HashMap[Long, Long]())
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val gx = g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1) -
          g(x - 1, y - 1) - 2 * g(x - 1, y) - g(x - 1, y + 1)
        val gy = g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1) -
          g(x - 1, y - 1) - 2 * g(x, y - 1) - g(x + 1, y - 1)
        if (math.abs(gx) + math.abs(gy) >= 300) {
          val rhos = Array(x.toLong, y.toLong, (x + y).toLong, (x - y).toLong)
          var d = 0
          while (d < 4) {
            acc(d).merge(rhos(d), 1L, (a, b) => a + b)
            d += 1
          }
        }
        x += 1
      }
      y += 1
    }
    (0 until 4).flatMap { d =>
      var bestRho = Long.MaxValue
      var bestVotes = 0L
      acc(d).forEach { (rho, v) =>
        if (v > bestVotes || (v == bestVotes && rho < bestRho)) {
          bestVotes = v; bestRho = rho
        }
      }
      if (bestVotes > 0) Some((d, bestRho, bestVotes)) else None
    }
  }

  /** (image_id, dir, rho, votes) — the winning Hough line per direction
    * per image ([[houghLines]]); narrow mapPartitions, no shuffle.
    */
  def houghStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          houghLines(px, w, h).map { case (d, rho, v) => (id, d, rho, v) }
        }
      }
      .toDF("image_id", "dir", "rho", "votes")
  }

  /** 3×3 median filter summary for one image: at every interior pixel
    * the median (5th smallest of the 9-neighborhood, exact integer) of
    * the BT.601 floor grayscale; returns (Σ median, count median ≠
    * center — the pixels the salt-and-pepper denoiser would change —
    * and max |median − center|).
    */
  def medianFilter3(px: Array[Int], w: Int, h: Int): (Long, Long, Long) = {
    val gray = new Array[Int](w * h)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      gray(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      k += 1
    }
    var medSum = 0L
    var nChanged = 0L
    var maxDev = 0L
    val buf = new Array[Int](9)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        var n = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            buf(n) = gray((y + dy) * w + (x + dx)); n += 1
            dx += 1
          }
          dy += 1
        }
        java.util.Arrays.sort(buf)
        val m = buf(4)
        val c = gray(y * w + x)
        medSum += m
        if (m != c) nChanged += 1
        val dev = math.abs(m - c).toLong
        if (dev > maxDev) maxDev = dev
        x += 1
      }
      y += 1
    }
    (medSum, nChanged, maxDev)
  }

  /** (image_id, med_sum, n_changed, max_dev) per image —
    * [[medianFilter3]] over the decoded binary column; narrow
    * mapPartitions, no shuffle.
    */
  def medianStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (ms, nc, md) = medianFilter3(px, w, h)
          (id, ms, nc, md)
        }
      }
      .toDF("image_id", "med_sum", "n_changed", "max_dev")
  }

  /** 3×3 binary morphology summary for one image: binarize b = [gray ≥
    * 128]; erosion/dilation = min/max over the 9-neighborhood (defined
    * on interior pixels), opening = dilation∘erosion and closing =
    * erosion∘dilation (defined on DOUBLY-interior pixels, where every
    * neighbor's erosion/dilation exists — no border extension rule to
    * argue about). Returns, over the doubly-interior region,
    * (n_fg, n_removed, n_added): foreground count, foreground pixels
    * the opening removes (speckle noise), background pixels the
    * closing fills (pinholes).
    */
  def morph3(px: Array[Int], w: Int, h: Int): (Long, Long, Long) = {
    val b = new Array[Int](w * h)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      val g = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      b(k) = if (g >= 128) 1 else 0
      k += 1
    }
    val er = new Array[Int](w * h)
    val di = new Array[Int](w * h)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        var mn = 1; var mx = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val v = b((y + dy) * w + (x + dx))
            if (v < mn) mn = v
            if (v > mx) mx = v
            dx += 1
          }
          dy += 1
        }
        er(y * w + x) = mn
        di(y * w + x) = mx
        x += 1
      }
      y += 1
    }
    var nFg = 0L; var nRemoved = 0L; var nAdded = 0L
    y = 2
    while (y < h - 2) {
      var x = 2
      while (x < w - 2) {
        var open = 0; var close = 1
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val o = (y + dy) * w + (x + dx)
            if (er(o) > open) open = er(o)
            if (di(o) < close) close = di(o)
            dx += 1
          }
          dy += 1
        }
        val c = b(y * w + x)
        if (c == 1) { nFg += 1; if (open == 0) nRemoved += 1 }
        else if (close == 1) nAdded += 1
        x += 1
      }
      y += 1
    }
    (nFg, nRemoved, nAdded)
  }

  /** (image_id, n_fg, n_removed, n_added) per image ([[morph3]]);
    * narrow mapPartitions, no shuffle.
    */
  def morphStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (fg, rm, ad) = morph3(px, w, h)
          (id, fg, rm, ad)
        }
      }
      .toDF("image_id", "n_fg", "n_removed", "n_added")
  }

  /** Gradient non-maximum suppression (the edge-thinning stage of a
    * Canny detector) for one image, all-integer: Sobel (gx, gy) on
    * interior pixels, L1 magnitude |gx|+|gy|, edge bar ≥ 300 (the
    * Hough bar). Direction quantized by exact comparisons —
    * 2|gy| ≤ |gx| → horizontal, 2|gx| ≤ |gy| → vertical, else
    * gx·gy > 0 → diagonal, else anti-diagonal (mutually exclusive for
    * any edge pixel: both "≤" branches together force gx = gy = 0).
    * An edge survives iff mag ≥ mag(prev) AND mag > mag(next) along
    * its direction, prev = the smaller-x (smaller-y for vertical)
    * neighbor; neighbors without a Sobel value (outside the interior)
    * count as −1 — a run of equals keeps exactly its last pixel.
    * Returns (n_edges, n_thin, mag_max) — raw edges, survivors, max
    * interior magnitude.
    */
  def nmsEdges(px: Array[Int], w: Int, h: Int): (Long, Long, Long) = {
    val gray = new Array[Int](w * h)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      gray(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      k += 1
    }
    @inline def g(xx: Int, yy: Int) = gray(yy * w + xx)
    val gxs = new Array[Int](w * h)
    val gys = new Array[Int](w * h)
    val mag = new Array[Int](w * h)
    java.util.Arrays.fill(mag, -1)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val gx = g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1) -
          g(x - 1, y - 1) - 2 * g(x - 1, y) - g(x - 1, y + 1)
        val gy = g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1) -
          g(x - 1, y - 1) - 2 * g(x, y - 1) - g(x + 1, y - 1)
        val o = y * w + x
        gxs(o) = gx; gys(o) = gy
        mag(o) = math.abs(gx) + math.abs(gy)
        x += 1
      }
      y += 1
    }
    @inline def m(xx: Int, yy: Int): Int =
      if (xx < 1 || xx > w - 2 || yy < 1 || yy > h - 2) -1 else mag(yy * w + xx)
    var nEdges = 0L; var nThin = 0L; var magMax = 0L
    y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val o = y * w + x
        val mm = mag(o)
        if (mm > magMax) magMax = mm
        if (mm >= 300) {
          nEdges += 1
          val gx = gxs(o); val gy = gys(o)
          val ax = math.abs(gx); val ay = math.abs(gy)
          val (pm, nm) =
            if (2 * ay <= ax) (m(x - 1, y), m(x + 1, y))
            else if (2 * ax <= ay) (m(x, y - 1), m(x, y + 1))
            else if (gx.toLong * gy > 0) (m(x - 1, y - 1), m(x + 1, y + 1))
            else (m(x - 1, y + 1), m(x + 1, y - 1))
          if (mm >= pm && mm > nm) nThin += 1
        }
        x += 1
      }
      y += 1
    }
    (nEdges, nThin, magMax)
  }

  /** (image_id, n_edges, n_thin, mag_max) per image ([[nmsEdges]]);
    * narrow mapPartitions, no shuffle.
    */
  def nmsStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (ne, nt, mx) = nmsEdges(px, w, h)
          (id, ne, nt, mx)
        }
      }
      .toDF("image_id", "n_edges", "n_thin", "mag_max")
  }

  /** Minimum vertical seam (Avidan & Shamir 2007, the content-aware
    * retargeting DP) for one image: energy e = |gx|+|gy| (Sobel L1) on
    * the interior grid x ∈ [1, w−2], y ∈ [1, h−2]; top row seeds the
    * DP, each next row adds min(E(x−1), E(x), E(x+1)) of the row above
    * (clamped to the grid). Returns (cost of the cheapest seam, its
    * bottom-row x — smallest on ties).
    */
  def minSeam(px: Array[Int], w: Int, h: Int): (Long, Long) = {
    val gray = new Array[Int](w * h)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      gray(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      k += 1
    }
    @inline def g(xx: Int, yy: Int) = gray(yy * w + xx)
    @inline def energy(x: Int, y: Int): Long = {
      val gx = g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1) -
        g(x - 1, y - 1) - 2 * g(x - 1, y) - g(x - 1, y + 1)
      val gy = g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1) -
        g(x - 1, y - 1) - 2 * g(x, y - 1) - g(x + 1, y - 1)
      (math.abs(gx) + math.abs(gy)).toLong
    }
    val lo = 1
    val hi = w - 2
    var prev = new Array[Long](w)
    var cur = new Array[Long](w)
    var x = lo
    while (x <= hi) { prev(x) = energy(x, 1); x += 1 }
    var y = 2
    while (y <= h - 2) {
      x = lo
      while (x <= hi) {
        var best = prev(x)
        if (x > lo && prev(x - 1) < best) best = prev(x - 1)
        if (x < hi && prev(x + 1) < best) best = prev(x + 1)
        cur(x) = energy(x, y) + best
        x += 1
      }
      val t = prev; prev = cur; cur = t
      y += 1
    }
    var bestCost = Long.MaxValue
    var bestX = -1L
    x = lo
    while (x <= hi) {
      if (prev(x) < bestCost) { bestCost = prev(x); bestX = x }
      x += 1
    }
    (bestCost, bestX)
  }

  /** FAST-9 segment-test corners (Rosten & Drummond 2006) for one
    * image, all-integer on the BT.601 floor grayscale: the 16-pixel
    * Bresenham circle of radius 3; a center (valid when the whole
    * circle is in range, x, y ∈ [3, w−4]×[3, h−4]) is a BRIGHT corner
    * iff some contiguous circular arc of ≥ 9 ring pixels are all
    * > c + 20, a DARK corner iff ≥ 9 contiguous are all < c − 20
    * (9 + 9 > 16 makes the two classes disjoint). Returns
    * (n_bright, n_dark).
    */
  private val fastRing: Array[(Int, Int)] = Array(
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3))

  def fast9(px: Array[Int], w: Int, h: Int): (Long, Long) = {
    val gray = new Array[Int](w * h)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      gray(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      k += 1
    }
    var nBright = 0L
    var nDark = 0L
    val bright = new Array[Boolean](16)
    val dark = new Array[Boolean](16)
    var y = 3
    while (y < h - 3) {
      var x = 3
      while (x < w - 3) {
        val c = gray(y * w + x)
        var i = 0
        while (i < 16) {
          val (dx, dy) = fastRing(i)
          val r = gray((y + dy) * w + (x + dx))
          bright(i) = r > c + 20
          dark(i) = r < c - 20
          i += 1
        }
        @inline def hasArc(a: Array[Boolean]): Boolean = {
          var run = 0
          var best = 0
          var j = 0
          while (j < 32) { // doubled scan covers circular wrap
            if (a(j % 16)) { run += 1; if (run > best) best = run }
            else run = 0
            j += 1
          }
          best >= 9
        }
        if (hasArc(bright)) nBright += 1
        else if (hasArc(dark)) nDark += 1
        x += 1
      }
      y += 1
    }
    (nBright, nDark)
  }

  /** (image_id, n_bright, n_dark) per image ([[fast9]]); narrow
    * mapPartitions, no shuffle.
    */
  def fastStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (nb, nd) = fast9(px, w, h)
          (id, nb, nd)
        }
      }
      .toDF("image_id", "n_bright", "n_dark")
  }

  /** (image_id, seam_cost, seam_end_x) per image ([[minSeam]]);
    * narrow mapPartitions, no shuffle.
    */
  def seamStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (c, sx) = minSeam(px, w, h)
          (id, c, sx)
        }
      }
      .toDF("image_id", "seam_cost", "seam_end_x")
  }

  /** Exact template matching for one image: slide the fixed 4×4 gray
    * template t(dx, dy) = (37·dx + 53·dy) mod 256 over every anchor
    * (x0 ≤ w−4, y0 ≤ h−4) and return the integer-SSD argmin as
    * (best_x, best_y, ssd), ties to the smallest (y, x) in row-major
    * order. All arithmetic is integer — gray ∈ [0,255], 16 terms of
    * ≤ 255² each, SSD ≤ 2^20 — so the argmin is oracle-exact.
    */
  def templateMatch(px: Array[Int], w: Int, h: Int): (Int, Int, Long) = {
    val gray = new Array[Int](w * h)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      gray(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
        (p & 255) * 114) / 1000
      k += 1
    }
    var bestX = 0
    var bestY = 0
    var bestSsd = Long.MaxValue
    var y0 = 0
    while (y0 <= h - 4) {
      var x0 = 0
      while (x0 <= w - 4) {
        var ssd = 0L
        var dy = 0
        while (dy < 4) {
          var dx = 0
          while (dx < 4) {
            val d = gray((y0 + dy) * w + (x0 + dx)) - (37 * dx + 53 * dy) % 256
            ssd += (d * d).toLong
            dx += 1
          }
          dy += 1
        }
        // strict < in (y outer, x inner) scan order keeps the smallest
        // (y, x) on ties
        if (ssd < bestSsd) { bestSsd = ssd; bestX = x0; bestY = y0 }
        x0 += 1
      }
      y0 += 1
    }
    (bestX, bestY, bestSsd)
  }

  /** (image_id, best_x, best_y, ssd) per image ([[templateMatch]]);
    * narrow mapPartitions, no shuffle — the classic where-is-the-patch
    * search made exact.
    */
  def templateStats(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (bx, by, ssd) = templateMatch(px, w, h)
          (id, bx, by, ssd)
        }
      }
      .toDF("image_id", "best_x", "best_y", "ssd")
  }

  /** Exact Otsu threshold (Otsu 1979) over the BT.601 gray histogram:
    * the t maximizing the between-class variance
    * σ²_B(t) = (s0·n − S·c0)² / (c0·(n − c0)), with c0/s0 the count/
    * gray-sum of the g ≤ t class, S/n the image totals. All comparisons
    * are EXACT integer cross-multiplications (BigInt — (s0·n − S·c0)²
    * overflows i64 at 63×63); ties go to the SMALLEST t, and since the
    * objective is constant between occupied gray levels, the argmax is
    * always an occupied level — which is what lets a histogram-only SQL
    * oracle reproduce it. Returns (image_id, thr, c0, c1); degenerate
    * single-level images (impossible for the 16..63-dim fixture) fall
    * back to thr = that level, c1 = 0.
    */
  /** Marching squares (Lorensen-style 2D cell classification) over the
    * image's OWN Otsu binarization — the raster→vector contour step
    * made exact: inside = gray > thr with thr from the [[otsu]] kernel
    * (the q150 binarization front end), and each interior 2×2 cell
    * gets the 4-bit case 8·TL + 4·TR + 2·BR + 1·BL (clockwise from
    * top-left). Emits one row per (image, case) present:
    * (image_id, thr, mcase, n_cells, n_segs) — n_segs counts the
    * contour segments the case contributes (0 for empty/full, 2 for
    * the two saddles 5/10, else 1). Images with no valid Otsu split
    * (constant gray — [[otsu]]'s −1 sentinel) emit nothing, matching
    * the oracle's candidate-less join. Narrow decode, ≤ 16 rows per
    * image.
    */
  def marchingSquares(spark: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val g = new Array[Int](px.length)
          var k = 0
          while (k < px.length) {
            val p = px(k)
            g(k) = (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
              (p & 255) * 114) / 1000
            k += 1
          }
          val (thr, _) = otsu(px, w, h)
          if (thr < 0) Iterator.empty
          else marchingCells(id, g, w, h, thr)
        }
      }
      .toDF("image_id", "thr", "mcase", "n_cells", "n_segs")
  }

  private def marchingCells(id: String, g: Array[Int], w: Int, h: Int,
      thr: Int): Iterator[(String, Long, Long, Long, Long)] = {
    val counts = new Array[Long](16)
    var y = 0
    while (y < h - 1) {
      var x = 0
      while (x < w - 1) {
        val tl = if (g(y * w + x) > thr) 1 else 0
        val tr = if (g(y * w + x + 1) > thr) 1 else 0
        val br = if (g((y + 1) * w + x + 1) > thr) 1 else 0
        val bl = if (g((y + 1) * w + x) > thr) 1 else 0
        counts(8 * tl + 4 * tr + 2 * br + bl) += 1
        x += 1
      }
      y += 1
    }
    Iterator.range(0, 16).filter(counts(_) > 0L).map { c =>
      val segs = c match {
        case 0 | 15 => 0L
        case 5 | 10 => 2L
        case _      => 1L
      }
      (id, thr.toLong, c.toLong, counts(c), counts(c) * segs)
    }
  }
}
