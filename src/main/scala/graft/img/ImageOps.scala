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
}
