package graft.img

/** DCT-based perceptual hash (pHash) — the REAL algorithm behind the image
  * table's `phash` column concept: near-identical IMAGES (not byte
  * streams) collide at small Hamming distance, so lossy re-encodes dedup
  * against their originals while distinct images stay ~32 bits apart.
  * Public algorithm (Zauner, "Implementation and Benchmarking of
  * Perceptual Image Hash Functions", 2010; the classic pHash):
  *
  *   nearest-sample to 32×32 luma → 2-D DCT-II → top-left 8×8 coefficient
  *   block → threshold each coefficient against the mean of the 63 non-DC
  *   coefficients (bit k = v·8+u set when F(u,v) > mean).
  *
  * Every arithmetic step is ORDER-FIXED double math (nearest-neighbor
  * resample is integer index math; luma, DCT sums, and the mean accumulate
  * in a fixed sequence), so the whole hash is bit-replicable relationally:
  * q57's DuckDB oracle interpolates the SAME IEEE basis constants as
  * shortest-round-trip EXPONENT-notation literals (plain decimals would
  * double-round through DuckDB's DECIMAL path — see phashOracleSql) and
  * reproduces every phash exactly. Plain (unnormalized) DCT sums — the
  * mean threshold is scale-invariant, so normalization would be dead
  * arithmetic.
  *
  * Bit 0 (the DC coefficient vs the AC mean) is 1 for essentially every
  * real image — DC is the sum of all 1024 luma values — so the hash
  * carries 63 discriminating bits; the constant bit is kept so the bit
  * layout stays the plain k = v·8+u indexing of the 8×8 block (some
  * published variants drop DC and substitute another coefficient; the
  * Hamming-distance behavior is identical either way).
  */
object Phash {

  /** The 8 needed DCT-II frequencies × 32 spatial positions:
    * COS32(u)(x) = cos((2x+1)·u·π/64). `private[graft]` so the oracle
    * builder in SparkEntry interpolates the identical constants.
    */
  private[graft] val COS32: Array[Array[Double]] =
    Array.tabulate(8, 32)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 64))

  def phash64(px: Array[Int], w: Int, h: Int): Long = {
    require(w > 0 && h > 0 && px.length == w * h, "bad dimensions")
    // nearest-sample to 32×32 luma (integer index math — replicable; a box
    // filter would need fractional-coverage weights that are not)
    val gray = new Array[Double](1024)
    var y = 0
    while (y < 32) {
      val sy = y * h / 32
      var x = 0
      while (x < 32) {
        val sx = x * w / 32
        val p = px(sy * w + sx)
        gray(y * 32 + x) =
          0.299 * ((p >>> 16) & 0xFF) + 0.587 * ((p >>> 8) & 0xFF) + 0.114 * (p & 0xFF)
        x += 1
      }
      y += 1
    }
    // separable DCT-II restricted to the 8×8 low-frequency block
    val tmp = new Array[Double](8 * 32) // (u, y)
    var u = 0
    while (u < 8) {
      var yy = 0
      while (yy < 32) {
        var s = 0.0
        var x = 0
        while (x < 32) { s += gray(yy * 32 + x) * COS32(u)(x); x += 1 }
        tmp(u * 32 + yy) = s
        yy += 1
      }
      u += 1
    }
    val f = new Array[Double](64) // index k = v*8 + u
    var v = 0
    while (v < 8) {
      var uu = 0
      while (uu < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 32) { s += tmp(uu * 32 + yy) * COS32(v)(yy); yy += 1 }
        f(v * 8 + uu) = s
        uu += 1
      }
      v += 1
    }
    var mean = 0.0
    var k = 1
    while (k < 64) { mean += f(k); k += 1 } // ascending k — oracle matches
    mean /= 63.0
    var bits = 0L
    k = 0
    while (k < 64) { if (f(k) > mean) bits |= (1L << k); k += 1 }
    bits
  }
}
