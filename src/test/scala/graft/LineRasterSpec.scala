package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Raster

/** lineRaster pinned against a sequential midpoint/DDA walk — the
  * textbook per-step loop the column formula must reproduce, including
  * direction normalization, round-half-up, and degenerate (point)
  * segments. Randomized trials run as ONE Spark job over a batch of
  * seeded segments (a job per trial would dominate the suite).
  */
class LineRasterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Sequential reference: normalize direction lexicographically, then
    * per t in [0, L] step with round-half-up of the exact rational
    * t·d/L — floor((2·t·d + L) / (2·L)).
    */
  private def brute(ax: Long, ay: Long, bx: Long, by: Long): Seq[(Long, Long)] = {
    val (x0, y0, x1, y1) =
      if (bx < ax || (bx == ax && by < ay)) (bx, by, ax, ay) else (ax, ay, bx, by)
    val dx = x1 - x0; val dy = y1 - y0
    val len = math.max(math.abs(dx), math.abs(dy))
    if (len == 0) Seq((x0, y0))
    else (0L to len).map { t =>
      def halfUp(d: Long): Long = Math.floorDiv(2 * t * d + len, 2 * len)
      (x0 + halfUp(dx), y0 + halfUp(dy))
    }
  }

  private def run(segs: Seq[(Long, Long, Long, Long, Long)]): Map[Long, Seq[(Long, Long)]] =
    Raster.lineRaster(segs.toDF("seg_id", "ax", "ay", "bx", "by"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq.sorted).toMap

  test("hand cases: axis-aligned, diagonal, steep, point, reversed") {
    val segs = Seq(
      (1L, 0L, 0L, 5L, 0L),  // horizontal
      (2L, 0L, 0L, 0L, 4L),  // vertical
      (3L, 0L, 0L, 4L, 4L),  // diagonal
      (4L, 0L, 0L, 2L, 7L),  // steep
      (5L, 3L, 3L, 3L, 3L),  // degenerate point
      (6L, 5L, 2L, 0L, 0L),  // needs normalization
      (7L, 0L, 5L, 6L, 0L))  // negative dy after normalization
    val got = run(segs)
    segs.foreach { case (id, ax, ay, bx, by) =>
      assert(got(id) === brute(ax, ay, bx, by).sorted, s"segment $id")
    }
  }

  test("randomized batch: column formula equals the sequential walk") {
    val rnd = new scala.util.Random(0xBEEF)
    val segs = (1L to 200L).map { id =>
      (id, rnd.nextLong(301), rnd.nextLong(301), rnd.nextLong(301), rnd.nextLong(301))
    }
    val got = run(segs)
    segs.foreach { case (id, ax, ay, bx, by) =>
      assert(got(id) === brute(ax, ay, bx, by).sorted, s"segment $id ($ax,$ay)->($bx,$by)")
    }
  }

  test("cell count is exactly L + 1 and endpoints are hit") {
    val segs = Seq((1L, 2L, 9L, 31L, 1L), (2L, 7L, 3L, 7L, 44L))
    val got = run(segs)
    segs.foreach { case (id, ax, ay, bx, by) =>
      val len = math.max(math.abs(bx - ax), math.abs(by - ay))
      assert(got(id).size === len + 1)
      assert(got(id).contains((ax, ay)) && got(id).contains((bx, by)))
    }
  }
}
