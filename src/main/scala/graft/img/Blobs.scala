package graft.img

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connected-component labeling over thresholded image masks — the blob
  * counter behind mask QA in a vision-training pipeline (how many
  * disjoint regions does a segmentation/foreground mask have, how big is
  * the largest, how much of the frame is covered). 4-connectivity, the
  * convention under which a pixel-thin diagonal does NOT connect.
  *
  * Per image the work is a classic two-pass union-find over the mask
  * (O(pixels) with inverse-Ackermann unions) inside `mapPartitions`;
  * across the corpus it is the same narrow zero-shuffle shape as
  * [[ImageOps.sobelStats]] — per-image feature extraction never needs an
  * exchange, at any corpus size.
  */
object Blobs {

  /** (blobCount, maxArea, onPixels) of the mask `gray >= thr`, where gray
    * is the BT.601 integer luma (r·299 + g·587 + b·114) div 1000 — the
    * same floor-exact grayscale as [[ImageOps.sobelEnergy]].
    */
  def labelStats(px: Array[Int], w: Int, h: Int, thr: Int): (Long, Long, Long) = {
    val on = new Array[Boolean](w * h)
    var k = 0
    while (k < px.length) {
      val p = px(k)
      val g = (((p >> 16) & 0xFF) * 299 + ((p >> 8) & 0xFF) * 587 + (p & 0xFF) * 114) / 1000
      on(k) = g >= thr
      k += 1
    }
    val parent = new Array[Int](w * h)
    java.util.Arrays.setAll(parent, (i: Int) => i)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x)) // path halving
        x = parent(x)
      }
      x
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        if (on(i)) {
          if (x > 0 && on(i - 1)) union(i, i - 1)
          if (y > 0 && on(i - w)) union(i, i - w)
        }
        x += 1
      }
      y += 1
    }
    val area = new java.util.HashMap[Int, Long]()
    var onPixels = 0L
    k = 0
    while (k < px.length) {
      if (on(k)) {
        onPixels += 1
        area.merge(find(k), 1L, (a, b) => a + b)
      }
      k += 1
    }
    var maxArea = 0L
    area.values.forEach(v => if (v > maxArea) maxArea = v)
    (area.size.toLong, maxArea, onPixels)
  }

  /** (image_id, n_blobs, max_area, on_pixels) per image: decode the real
    * binary column with graft's own codecs, threshold, label. Narrow
    * mapPartitions, no shuffle.
    */
  def blobStats(spark: SparkSession, images: DataFrame, thr: Int = 128): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    images.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = Codecs.decode(bytes)
          val (n, maxA, onPx) = labelStats(px, w, h, thr)
          (id, n, maxA, onPx)
        }
      }
      .toDF("image_id", "n_blobs", "max_area", "on_pixels")
  }

  /** Deterministic mask-image table for the blob oracle: a 32×32 black
    * frame where quadrant q ∈ 0..3 holds a solid white rectangle iff bit
    * q of splitmix64(i) is set; the rectangle's width/height each take
    * 2 more bits (8..11 px), anchored at offset (2,2) inside its 16×16
    * quadrant so no two rectangles touch (gap ≥ 2 everywhere). Blob
    * count, areas, and coverage are therefore closed-form in the same
    * bits — the oracle recomputes them relationally.
    */
  def maskTable(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 8).map { i =>
      val z = ImageTable.splitmix64(i)
      val px = new Array[Int](32 * 32)
      var q = 0
      while (q < 4) {
        if (((z >>> q) & 1L) == 1L) {
          val qx = (q % 2) * 16 + 2
          val qy = (q / 2) * 16 + 2
          val rw = 8 + (((z >>> (4 + 2 * q)) & 3L)).toInt
          val rh = 8 + (((z >>> (12 + 2 * q)) & 3L)).toInt
          var yy = 0
          while (yy < rh) {
            var xx = 0
            while (xx < rw) {
              px((qy + yy) * 32 + (qx + xx)) = 0xFFFFFF
              xx += 1
            }
            yy += 1
          }
        }
        q += 1
      }
      val fmt = if (i % 2 == 0) "png" else "bmp"
      (f"img_$i%09d", Codecs.encode(px, 32, 32, fmt))
    }.toDF("image_id", "bytes")
  }
}
