package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.img.{ImageOps, ImageTable}

/** ImageOps invariants: involutions, rotation group, resize identity and
  * sample-map determinism, crop/tile consistency.
  */
class ImageOpsSpec extends AnyFunSuite {

  private def img(i: Long): (Array[Int], Int, Int) = {
    val w = ImageTable.widthOf(i); val h = ImageTable.heightOf(i)
    (ImageTable.renderPixels(i, w, h), w, h)
  }

  test("flipH and flipV are involutions; rot90 has order 4") {
    for (i <- 0L to 5L) {
      val (px, w, h) = img(i)
      assert(ImageOps.flipH(ImageOps.flipH(px, w, h), w, h).sameElements(px))
      assert(ImageOps.flipV(ImageOps.flipV(px, w, h), w, h).sameElements(px))
      var r = px; var rw = w; var rh = h
      for (_ <- 0 until 4) { r = ImageOps.rot90(r, rw, rh); val t = rw; rw = rh; rh = t }
      assert(rw == w && rh == h && r.sameElements(px))
      // rot90 twice == flipH then flipV
      val r2 = ImageOps.rot90(ImageOps.rot90(px, w, h), h, w)
      assert(r2.sameElements(ImageOps.flipV(ImageOps.flipH(px, w, h), w, h)))
    }
  }

  test("resizeNearest: identity at same dims, exact sample map, up/down round trip") {
    val (px, w, h) = img(7L)
    assert(ImageOps.resizeNearest(px, w, h, w, h).sameElements(px))
    val thumb = ImageOps.resizeNearest(px, w, h, 16, 16)
    for (ty <- 0 until 16; tx <- 0 until 16)
      assert(thumb(ty * 16 + tx) == px((ty * h / 16) * w + (tx * w / 16)))
    // integer upscale then exact downscale is the identity
    val up = ImageOps.resizeNearest(px, w, h, w * 2, h * 2)
    assert(ImageOps.resizeNearest(up, w * 2, h * 2, w, h).sameElements(px))
  }

  test("rleMask: hand-computed column-major runs, cross-seam continuation") {
    val W = 0xFFFFFF // gray 255 -> fg
    val B = 0x000000 // gray 0 -> bg
    // row-major w=2 h=3: column walk visits px0,px2,px4 then px1,px3,px5
    // -> fg at ord 0,2 (two 1-runs) and ord 4,5 (one 2-run)
    assert(ImageOps.rleMask(Array(W, B, B, W, W, W), 2, 3) == ((4L, 3L, 2L)))
    // all-white: one run spanning every column seam
    assert(ImageOps.rleMask(Array.fill(6)(W), 2, 3) == ((6L, 1L, 6L)))
    // all-black: empty mask
    assert(ImageOps.rleMask(Array.fill(6)(B), 2, 3) == ((0L, 0L, 0L)))
    // threshold boundary: BT.601 gray of (128,128,128) is exactly 128 -> fg
    assert(ImageOps.rleMask(Array(0x808080), 1, 1) == ((1L, 1L, 1L)))
    assert(ImageOps.rleMask(Array(0x7F7F7F), 1, 1) == ((0L, 0L, 0L)))
  }

  test("rleMaskStats over decoded bytes equals rleMask over raw pixels") {
    val spark = SparkTestSession.spark
    val got = ImageOps.rleMaskStats(spark,
      ImageTable.generate(spark, 6, 2).toDF()).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.size == 6)
    for (i <- 0L until 6L) {
      val (px, w, h) = img(i)
      val (fg, runs, longest) = ImageOps.rleMask(px, w, h)
      assert(got(f"img_$i%09d") == ((w, h, fg, runs, longest)))
    }
  }

  test("crop matches manual indexing and composes with flips") {
    val (px, w, h) = img(3L)
    val c = ImageOps.crop(px, w, h, 2, 3, 5, 4)
    for (y <- 0 until 4; x <- 0 until 5)
      assert(c(y * 5 + x) == px((3 + y) * w + 2 + x))
    intercept[IllegalArgumentException](ImageOps.crop(px, w, h, w - 2, 0, 5, 2))
  }

  test("sobelEnergy: flat image scores zero, step edge hand-computed") {
    val flat = Array.fill(25)(0x808080)
    assert(ImageOps.sobelEnergy(flat, 5, 5) == ((0L, 0L)))
    // 5x5, left two columns black, right three white: gray = 0 | 255.
    // Interior: x=1 sees the edge with gx = 255*4 = 1020, x=2 also
    // (its x-1 is black), x=3 is all-white; gy = 0 everywhere
    val step = Array.tabulate(25)(k => if (k % 5 < 2) 0 else 0xFFFFFF)
    val (e, m) = ImageOps.sobelEnergy(step, 5, 5)
    assert(m == 1020L)
    assert(e == 3L * 2L * 1020L) // 3 interior rows x 2 edge-adjacent columns
  }

  test("sobelEnergy over decoded bytes equals sobelEnergy over raw pixels") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val got = ImageOps.sobelStats(spark,
        graft.img.ImageTable.generate(spark, 6, 2).toDF())
      .as[(String, Int, Int, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    (0L until 6L).foreach { i =>
      val w = graft.img.ImageTable.widthOf(i)
      val h = graft.img.ImageTable.heightOf(i)
      val (e, m) = ImageOps.sobelEnergy(
        graft.img.ImageTable.renderPixels(i, w, h), w, h)
      assert(got(f"img_$i%09d") == ((w, h, e, m)))
    }
  }

  test("otsu: bimodal splits at the low mode, constant image hits the sentinel") {
    def gray(v: Int) = v * 0x010101 // r=g=b=v → BT.601 gray exactly v
    // half 0 / half 255: every candidate t has (c0, s0) = (8, 0) → the
    // smallest-argmax tie-break must pick t = 0; fg = the 255-half
    val bimodal = Array.fill(8)(gray(0)) ++ Array.fill(8)(gray(255))
    assert(ImageOps.otsu(bimodal, 4, 4) === ((0, 8L)))
    // constant image: no valid split → (−1, 0)
    assert(ImageOps.otsu(Array.fill(16)(gray(77)), 4, 4) === ((-1, 0L)))
    // three-level: g ∈ {0, 0, 100, 255}; f at t<100 = 910²/4, at
    // t∈[100,254] = 965²/3 — the latter wins, smallest such t is 100
    val tri = Array(gray(0), gray(0), gray(100), gray(255))
    assert(ImageOps.otsu(tri, 2, 2) === ((100, 1L)))
  }

  test("histEq: hand-derived remap, constant image is identity") {
    def gray(v: Int) = v * 0x010101
    // constant: no contrast → identity level, one output level
    assert(ImageOps.histEq(Array.fill(6)(gray(42)), 3, 2) === ((6L * 42, 42, 42, 1)))
    // two levels 10 (×3) and 200 (×1): N=4, cdfmin=3;
    // out(10) = (3-3)*255/1 = 0, out(200) = (4-3)*255/1 = 255
    val two = Array(gray(10), gray(10), gray(10), gray(200))
    assert(ImageOps.histEq(two, 2, 2) === ((255L, 0, 255, 2)))
    // three levels 0(×2), 5(×1), 9(×1): N=4, cdfmin=2;
    // out(0)=0, out(5)=255/2=127, out(9)=2*255/2=255
    val tri = Array(gray(0), gray(0), gray(5), gray(9))
    assert(ImageOps.histEq(tri, 2, 2) === ((127L + 255L, 0, 255, 3)))
  }

  test("histEqStats over decoded bytes equals histEq over raw pixels") {
    val spark = SparkTestSession.spark
    val got = ImageOps.histEqStats(spark, ImageTable.generate(spark, 5, 2).toDF())
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    for (i <- 0L until 5L) {
      val (px, w, h) = img(i)
      val (s, mn, mx, lv) = ImageOps.histEq(px, w, h)
      assert(got(f"img_$i%09d") == ((w, h, s, mn, mx, lv)))
      assert(mn === 0 && mx === 255) // non-constant stretch hits both ends
    }
  }

  test("glcm: hand-derived co-occurrence on a 3×2 quantized pattern") {
    def gray(v: Int) = v * 0x010101
    // rows: [0, 32, 32] → q [0,1,1]; [255, 255, 0] → q [7,7,0]
    val px = Array(gray(0), gray(32), gray(32), gray(255), gray(255), gray(0))
    // pairs: (0,1), (1,1), (7,7), (7,0) → contrast = 1+0+0+49 = 50
    // counts all 1 → asm = 4; n_pairs = (3-1)*2 = 4
    assert(ImageOps.glcm(px, 3, 2) === ((4L, 50L, 4L)))
  }

  test("glcmStats over decoded bytes equals glcm over raw pixels") {
    val spark = SparkTestSession.spark
    val got = ImageOps.glcmStats(spark, ImageTable.generate(spark, 5, 2).toDF())
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (i <- 0L until 5L) {
      val (px, w, h) = img(i)
      assert(got(f"img_$i%09d") == (ImageOps.glcm(px, w, h)))
    }
  }

  test("morphology: hand-derived erosion/dilation on a 4×4 mask") {
    def gray(v: Int) = v * 0x010101
    // mask rows (1 = ≥128): 1110 / 1110 / 1110 / 0000
    // interior pixels: (1,1) nbrs all fg → eroded; (2,1) has the (3,*)
    // column 0s → not eroded but dilated; (1,2)/(2,2) see row-3 0s → dilated
    val v = Array(
      200, 200, 200, 0,
      200, 200, 200, 0,
      200, 200, 200, 0,
      0, 0, 0, 0).map(gray)
    assert(ImageOps.morphology(v, 4, 4) === ((9L, 1L, 4L)))
    // all-foreground: every interior survives erosion
    assert(ImageOps.morphology(Array.fill(16)(gray(255)), 4, 4) === ((16L, 4L, 4L)))
    // all-background: nothing anywhere
    assert(ImageOps.morphology(Array.fill(16)(gray(0)), 4, 4) === ((0L, 0L, 0L)))
  }

  test("morphologyStats over decoded bytes equals morphology over raw pixels") {
    val spark = SparkTestSession.spark
    val got = ImageOps.morphologyStats(spark, ImageTable.generate(spark, 5, 2).toDF())
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    for (i <- 0L until 5L) {
      val (px, w, h) = img(i)
      val (fg, er, di) = ImageOps.morphology(px, w, h)
      assert(got(f"img_$i%09d") == ((w, h, fg, er, di)))
    }
  }

  test("dominantColor: hand-binned cube, smallest-bin tie-break") {
    // rgb (200,10,10) → bin (3,0,0)=48 twice; (10,200,10) → (0,3,0)=12 once
    val px = Array(0xC80A0A, 0xC80A0A, 0x0AC80A, 0x0A0AC8)
    assert(ImageOps.dominantColor(px, 2, 2) === ((48, 2L)))
    // four distinct bins tie at 1 → smallest bin wins
    val tie = Array(0x000000, 0x0000C8, 0x00C800, 0xC80000)
    assert(ImageOps.dominantColor(tie, 2, 2) === ((0, 1L)))
  }

  test("dominantColorStats over decoded bytes equals dominantColor over raw pixels") {
    val spark = SparkTestSession.spark
    val got = ImageOps.dominantColorStats(spark, ImageTable.generate(spark, 5, 2).toDF())
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    for (i <- 0L until 5L) {
      val (px, w, h) = img(i)
      val (bin, cnt) = ImageOps.dominantColor(px, w, h)
      assert(got(f"img_$i%09d") == ((w, h, bin, cnt)))
    }
  }

  test("integralStats: brute-force SAT oracle, corner identity, block query") {
    val spark = SparkTestSession.spark
    val got = ImageOps.integralStats(spark, ImageTable.generate(spark, 6, 2).toDF())
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == 6)
    for (i <- 0L until 6L) {
      val (px, w, h) = img(i)
      val g = px.map { p =>
        ((((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 + (p & 255) * 114) / 1000).toLong
      }
      // brute-force SAT: sat(x,y) = Σ g over [0..x]×[0..y]
      val sat = Array.ofDim[Long](h, w)
      for (y <- 0 until h; x <- 0 until w)
        sat(y)(x) = g(y * w + x) +
          (if (x > 0) sat(y)(x - 1) else 0L) +
          (if (y > 0) sat(y - 1)(x) else 0L) -
          (if (x > 0 && y > 0) sat(y - 1)(x - 1) else 0L)
      val total = g.sum
      val satSum = sat.flatten.sum
      val block = sat(9)(11) - sat(9)(3) - sat(1)(11) + sat(1)(3)
      // the block query equals the direct window sum — the SAT's purpose
      val direct = (for (y <- 2 to 9; x <- 4 to 11) yield g(y * w + x)).sum
      assert(block == direct)
      assert(got(f"img_$i%09d") == ((total, sat(h - 1)(w - 1), satSum, block)))
      assert(sat(h - 1)(w - 1) == total) // defining identity
    }
  }

  test("lbpHistogram: independent neighborhood replay, mass = interior area") {
    val spark = SparkTestSession.spark
    val got = ImageOps.lbpHistogram(spark, ImageTable.generate(spark, 6, 2).toDF())
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dx = Array(-1, 0, 1, 1, 1, 0, -1, -1)
    val dy = Array(-1, -1, -1, 0, 1, 1, 1, 0)
    for (i <- 0L until 6L) {
      val (px, w, h) = img(i)
      val g = px.map { p =>
        (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 + (p & 255) * 114) / 1000
      }
      val want = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (y <- 1 until h - 1; x <- 1 until w - 1) {
        val c = g(y * w + x)
        val code = (0 until 8).map(b =>
          if (g((y + dy(b)) * w + (x + dx(b))) >= c) 1L << b else 0L).sum
        want(code) += 1L
      }
      val id = f"img_$i%09d"
      val gotI = got.collect { case ((`id`, code), cnt) => code -> cnt }.toMap
      assert(gotI === want.toMap)
      // histogram mass is exactly the interior pixel count
      assert(gotI.values.sum == (w - 2).toLong * (h - 2))
    }
  }

  test("lbpPixels aggregates exactly to lbpHistogram") {
    val spark = SparkTestSession.spark
    val images = ImageTable.generate(spark, 6, 2).toDF()
    val fromPixels = ImageOps.lbpPixels(spark, images)
      .groupBy("image_id", "code").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hist = ImageOps.lbpHistogram(spark, images)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fromPixels === hist)
  }

  test("binomialDown2: clamped-convolution replay; flat image is fixed point") {
    val spark = SparkTestSession.spark
    val got = ImageOps.binomialDown2(spark, ImageTable.generate(spark, 6, 2).toDF())
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (i <- 0L until 6L) {
      val (px, w, h) = img(i)
      val g = px.map { p =>
        (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 + (p & 255) * 114) / 1000
      }
      def at(x: Int, y: Int) =
        g(math.min(h - 1, math.max(0, y)) * w + math.min(w - 1, math.max(0, x)))
      var nPx, sSum, chk = 0L
      for (y <- 0 until h by 2; x <- 0 until w by 2) {
        val s = (at(x - 1, y - 1) + 2 * at(x, y - 1) + at(x + 1, y - 1) +
          2 * at(x - 1, y) + 4 * at(x, y) + 2 * at(x + 1, y) +
          at(x - 1, y + 1) + 2 * at(x, y + 1) + at(x + 1, y + 1)) / 16
        nPx += 1; sSum += s; chk += s.toLong * (x / 2 + 1) * (y / 2 + 3)
      }
      assert(got(f"img_$i%09d") === ((nPx, sSum, chk)))
    }
    // a constant image smooths to itself: kernel weights sum to 16
    import spark.implicits._
    val flat = Array.fill(16 * 16)(0xFF646464)
    val bytes = graft.img.Codecs.encodeBmp(flat, 16, 16)
    val one = Seq(("flat", bytes)).toDF("image_id", "bytes")
    val r = ImageOps.binomialDown2(spark, one).collect().head
    assert(r.getLong(1) == 64L && r.getLong(2) == 64L * 100L)
  }

  test("grayQuantiles: sorted-array oracle at the exact ceil thresholds") {
    val spark = SparkTestSession.spark
    val got = ImageOps.grayQuantiles(spark, ImageTable.generate(spark, 6, 2).toDF())
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (i <- 0L until 6L) {
      val (px, _, _) = img(i)
      val g = px.map { p =>
        ((((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 + (p & 255) * 114) / 1000).toLong
      }.sorted
      val n = g.length.toLong
      // k-th smallest (1-based) at k = ceil(q·n)
      def at(k: Long) = g((k - 1).toInt)
      assert(got(f"img_$i%09d") ===
        ((at((n + 3) / 4), at((n + 1) / 2), at((3 * n + 3) / 4))))
    }
  }

  test("hogOctants: per-pixel Sobel + octant replay, mass bounded by interior") {
    val spark = SparkTestSession.spark
    val got = ImageOps.hogOctants(spark, ImageTable.generate(spark, 6, 2).toDF())
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    for (i <- 0L until 6L) {
      val (px, w, h) = img(i)
      val g = px.map { p =>
        (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 + (p & 255) * 114) / 1000
      }
      val cnt = Array.fill(8)(0L); val wsum = Array.fill(8)(0L)
      for (y <- 1 until h - 1; x <- 1 until w - 1) {
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
          cnt(oct) += 1L; wsum(oct) += (ax + ay).toLong
        }
      }
      val id = f"img_$i%09d"
      val gotI = got.collect { case ((`id`, o), v) => o -> v }.toMap
      val want = (0 until 8).filter(cnt(_) > 0)
        .map(o => o.toLong -> ((cnt(o), wsum(o)))).toMap
      assert(gotI === want)
      assert(gotI.values.map(_._1).sum <= (w - 2).toLong * (h - 2))
    }
  }

  test("haarStats: SAT-corner features equal direct window sums") {
    val spark = SparkTestSession.spark
    val got = ImageOps.haarStats(spark, ImageTable.generate(spark, 6, 2).toDF())
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 6)
    for (i <- 0L until 6L) {
      val (px, w, _) = img(i)
      val g = px.map { p =>
        ((((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 + (p & 255) * 114) / 1000).toLong
      }
      def rect(x0: Int, x1: Int, y0: Int, y1: Int) =
        (for (y <- y0 to y1; x <- x0 to x1) yield g(y * w + x)).sum
      val want = (rect(4, 7, 2, 9) - rect(8, 11, 2, 9),
        rect(4, 11, 2, 5) - rect(4, 11, 6, 9))
      assert(got(f"img_$i%09d") == want)
    }
  }

  test("momentStats: raw sums and central numerators replayed per pixel") {
    val spark = SparkTestSession.spark
    val got = ImageOps.momentStats(spark, ImageTable.generate(spark, 6, 2).toDF())
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    for (i <- 0L until 6L) {
      val (px, w, _) = img(i)
      var m00, m10, m01, m20, m11, m02 = 0L
      for (k <- px.indices) {
        val p = px(k)
        val g = ((((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
          (p & 255) * 114) / 1000).toLong
        val x = (k % w).toLong; val y = (k / w).toLong
        m00 += g; m10 += x * g; m01 += y * g
        m20 += x * x * g; m11 += x * y * g; m02 += y * y * g
      }
      assert(got(f"img_$i%09d") == ((m00, m10, m01,
        m00 * m20 - m10 * m10, m00 * m11 - m10 * m01, m00 * m02 - m01 * m01)))
    }
  }

  test("otsuStats over decoded bytes equals otsu over raw pixels") {
    val spark = SparkTestSession.spark
    val got = ImageOps.otsuStats(spark, ImageTable.generate(spark, 6, 2).toDF())
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    for (i <- 0L until 6L) {
      val (px, w, h) = img(i)
      val (t, fg) = ImageOps.otsu(px, w, h)
      assert(got(f"img_$i%09d") == ((w, h, t, fg)))
      assert(t >= 0 && t < 255) // synthetic gradients always split
    }
  }

  test("templateMatch: planted exact patch is found with ssd 0; ties row-major") {
    // 10x8 flat image with the exact template written at (5, 3)
    val w = 10; val h = 8
    val px = Array.fill(w * h)(0xFFFFFF) // gray 255 everywhere else
    for (dy <- 0 until 4; dx <- 0 until 4) {
      val v = (37 * dx + 53 * dy) % 256
      px((3 + dy) * w + (5 + dx)) = (v << 16) | (v << 8) | v
    }
    // BT.601 of (v,v,v) is (v*299+v*587+v*114)/1000 = v exactly
    assert(ImageOps.templateMatch(px, w, h) == ((5, 3, 0L)))
    // uniform image: every anchor has the same ssd -> smallest (y, x)
    val flat = Array.fill(w * h)(0x808080)
    assert(ImageOps.templateMatch(flat, w, h)._1 == 0)
    assert(ImageOps.templateMatch(flat, w, h)._2 == 0)
  }

  test("templateStats over decoded bytes equals templateMatch over raw pixels") {
    val spark = SparkTestSession.spark
    val got = ImageOps.templateStats(spark, ImageTable.generate(spark, 6, 2).toDF())
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    for (i <- 0L until 6L) {
      val (px, w, h) = img(i)
      assert(got(f"img_$i%09d") == ImageOps.templateMatch(px, w, h))
    }
  }

  private def grayRef(px: Array[Int]): Array[Int] = px.map(p =>
    (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 + (p & 255) * 114) / 1000)

  test("marchingSquares: cell total, seg parity per case, brute-force equality") {
    val spark = SparkTestSession.spark
    val rows = ImageOps.marchingSquares(spark, ImageTable.generate(spark, 6, 2).toDF())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    for (i <- 0L until 6L) {
      val (px, w, h) = img(i)
      val mine = rows.filter(_._1 == f"img_$i%09d")
      assert(mine.map(_._4).sum == (w - 1).toLong * (h - 1),
        "per-image cell count must be (w-1)(h-1)")
      val thr = mine.head._2
      val g = grayRef(px)
      val ref = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (y <- 0 until h - 1; x <- 0 until w - 1) {
        def in(xx: Int, yy: Int) = if (g(yy * w + xx) > thr) 1 else 0
        ref(8 * in(x, y) + 4 * in(x + 1, y) + 2 * in(x + 1, y + 1) +
          in(x, y + 1)) += 1L
      }
      assert(mine.map(r => r._3 -> r._4).toMap == ref.toMap)
      mine.foreach { case (_, _, c, nc, ns) =>
        val expected = if (c == 0 || c == 15) 0L else if (c == 5 || c == 10) 2L else 1L
        assert(ns == nc * expected)
      }
    }
  }
}
