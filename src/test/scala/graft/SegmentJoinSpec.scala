package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.geom.SegmentJoin

/** The grid + reference-point plan must equal a brute-force O(n²) pass of
  * the same integer predicate — on planted shapes that force every branch
  * (proper cross, endpoint touch, collinear overlap, disjoint) and on
  * random layers spanning negative coordinates and cell borders.
  */
class SegmentJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private type Seg = (Long, Long, Long, Long, Long) // id, x1, y1, x2, y2

  /** Scala-side ground truth: same predicate, exact integer math. */
  private def bruteIntersects(a: Seg, b: Seg): Boolean = {
    def orient(ax: Long, ay: Long, bx: Long, by: Long, px: Long, py: Long): Long =
      java.lang.Long.signum((bx - ax) * (py - ay) - (by - ay) * (px - ax))
    def onSeg(ax: Long, ay: Long, bx: Long, by: Long, px: Long, py: Long): Boolean =
      px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
        py >= math.min(ay, by) && py <= math.max(ay, by)
    val (_, ax1, ay1, ax2, ay2) = a
    val (_, bx1, by1, bx2, by2) = b
    val d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    val d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    val d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    val d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    (d1 * d2 < 0 && d3 * d4 < 0) ||
      (d1 == 0 && onSeg(ax1, ay1, ax2, ay2, bx1, by1)) ||
      (d2 == 0 && onSeg(ax1, ay1, ax2, ay2, bx2, by2)) ||
      (d3 == 0 && onSeg(bx1, by1, bx2, by2, ax1, ay1)) ||
      (d4 == 0 && onSeg(bx1, by1, bx2, by2, ax2, ay2))
  }

  private def run(as: Seq[Seg], bs: Seq[Seg], cell: Long): Set[(Long, Long)] =
    SegmentJoin.intersectingPairs(
        as.toDF("id", "x1", "y1", "x2", "y2"),
        bs.toDF("id", "x1", "y1", "x2", "y2"), cell)
      .as[(Long, Long)].collect().toSet

  private def expect(as: Seq[Seg], bs: Seq[Seg]): Set[(Long, Long)] =
    (for (a <- as; b <- bs if bruteIntersects(a, b)) yield (a._1, b._1)).toSet

  test("hand cases: cross, T-touch, collinear overlap, parallel disjoint, point") {
    val as = Seq[Seg](
      (0L, 0L, 0L, 10L, 10L),    // crosses b0
      (1L, 0L, 5L, 10L, 5L),     // b1 T-touches its interior
      (2L, 0L, 20L, 10L, 20L),   // collinear with b2, overlapping
      (3L, 0L, 30L, 10L, 30L),   // parallel to b3, disjoint
      (4L, 50L, 50L, 50L, 50L))  // degenerate point, lies on b4
    val bs = Seq[Seg](
      (100L, 0L, 10L, 10L, 0L),
      (101L, 5L, 5L, 5L, 15L),
      (102L, 5L, 20L, 15L, 20L),
      (103L, 0L, 31L, 10L, 31L),
      (104L, 40L, 40L, 60L, 60L))
    val got = run(as, bs, cell = 8L)
    assert(got === expect(as, bs))
    // cross-layer extras are real: b0 crosses a1 at (5,5)'s row and a0
    // passes through b1's lower endpoint (5,5) — touch counts
    assert(got === Set((0L, 100L), (1L, 101L), (2L, 102L), (4L, 104L),
      (1L, 100L), (0L, 101L)))
  }

  test("random layers incl. negative coords: grid plan equals brute force at several cell sizes") {
    val rnd = new scala.util.Random(20260818L)
    def layer(idBase: Long, n: Int): Seq[Seg] = (0 until n).map { i =>
      val x1 = rnd.nextInt(4000) - 2000L
      val y1 = rnd.nextInt(4000) - 2000L
      (idBase + i, x1, y1, x1 + rnd.nextInt(801) - 400L, y1 + rnd.nextInt(801) - 400L)
    }
    val as = layer(0L, 150)
    val bs = layer(10000L, 150)
    val want = expect(as, bs)
    assert(want.nonEmpty) // the layers must actually intersect to test anything
    for (cell <- Seq(64L, 500L, 10000L)) // sub-segment, comparable, whole-world
      assert(run(as, bs, cell) === want, s"cell=$cell")
  }
}
