package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.img.{Codecs, ImageOps}

/** bilinearUp2 pinned on hand-computable images: a constant image (every
  * sample's ×4 numerator is 4c) and a 2×2 gradient (all four parity
  * cases hit with distinct corners).
  */
class BilinearUpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bmpOf(w: Int, h: Int, px: Array[Int]): Array[Byte] =
    Codecs.encodeBmp(px, w, h)

  private def run(id: String, w: Int, h: Int, px: Array[Int]) =
    ImageOps.bilinearUp2(spark,
        Seq((id, bmpOf(w, h, px))).toDF("image_id", "bytes"))
      .as[(String, Long, Long, Long, Long)].collect().head

  test("constant image: num4 = 4c at every doubled sample") {
    val c = 77 // gray of rgb(77,77,77) is 77 under BT.601 integer weights
    val (w, h) = (5, 4)
    val px = Array.fill(w * h)((c << 16) | (c << 8) | c)
    val (_, uw, uh, sum, chk) = run("img_000000001", w, h, px)
    assert(uw === 2 * w - 1 && uh === 2 * h - 1)
    assert(sum === 4L * c * uw * uh)
    // checksum: 4c · Σ(X+1) · Σ(Y+2)
    val sx = (1 to uw.toInt).map(_.toLong).sum
    val sy = (2 to uh.toInt + 1).map(_.toLong).sum
    assert(chk === 4L * c * sx * sy)
  }

  test("2x2 gradient: all four parity cases by hand") {
    // grays a=10 b=20 c=30 d=40 laid out [[a,b],[c,d]]
    def rgb(g: Int) = (g << 16) | (g << 8) | g
    val px = Array(rgb(10), rgb(20), rgb(30), rgb(40))
    val (_, uw, uh, sum, chk) = run("img_000000002", 2, 2, px)
    assert(uw === 3 && uh === 3)
    // 3×3 numerators: 40  60  80
    //                 80 100 120
    //                120 140 160
    val grid = Seq(
      (0, 0, 40), (1, 0, 60), (2, 0, 80),
      (0, 1, 80), (1, 1, 100), (2, 1, 120),
      (0, 2, 120), (1, 2, 140), (2, 2, 160))
    assert(sum === grid.map(_._3.toLong).sum)
    assert(chk === grid.map { case (x, y, n) => n.toLong * (x + 1) * (y + 2) }.sum)
  }
}
