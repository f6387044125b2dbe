package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.RectUnion

/** Union-of-rectangles area against brute-force grid fill: random
  * overlap patterns, exact containment, duplicates, disjoint unions.
  */
class RectUnionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def area(rs: Seq[(Long, Long, Long, Long, Long)]): Map[Long, Long] =
    RectUnion.areaByZone(spark, rs.toDF("zone", "x0", "x1", "y0", "y1"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap

  private def brute(rs: Seq[(Long, Long, Long, Long)]): Long = {
    val cells = scala.collection.mutable.Set.empty[(Long, Long)]
    rs.foreach { case (x0, x1, y0, y1) =>
      for (x <- x0 until x1; y <- y0 until y1) cells += ((x, y))
    }
    cells.size.toLong
  }

  test("known shapes: disjoint, nested, identical, cross overlap") {
    // zone 0: two disjoint 2x2 -> 8; zone 1: nested -> outer area 100
    // zone 2: two identical 3x3 -> 9; zone 3: cross overlap 2x4 + 4x2 -> 12
    val rs = Seq(
      (0L, 0L, 2L, 0L, 2L), (0L, 10L, 12L, 10L, 12L),
      (1L, 0L, 10L, 0L, 10L), (1L, 2L, 5L, 2L, 5L),
      (2L, 1L, 4L, 1L, 4L), (2L, 1L, 4L, 1L, 4L),
      (3L, 1L, 3L, 0L, 4L), (3L, 0L, 4L, 1L, 3L))
    assert(area(rs) == Map(0L -> 8L, 1L -> 100L, 2L -> 9L, 3L -> 12L))
  }

  test("random rect sets equal brute-force grid fill") {
    val rnd = new scala.util.Random(31L)
    val rs = for (z <- 0L until 3L; _ <- 0 until 25) yield {
      val x0 = rnd.nextInt(30).toLong; val y0 = rnd.nextInt(30).toLong
      (z, x0, x0 + 1 + rnd.nextInt(12), y0, y0 + 1 + rnd.nextInt(12))
    }
    val got = area(rs)
    for (z <- 0L until 3L) {
      val want = brute(rs.filter(_._1 == z).map(r => (r._2, r._3, r._4, r._5)))
      assert(got(z) == want, s"zone $z: ${got(z)} != $want")
    }
  }

  test("degenerate (zero-extent) boxes refuse loudly") {
    val e = intercept[Exception] {
      area(Seq((0L, 5L, 5L, 0L, 2L)))
    }
    assert(e.getMessage.contains("degenerate") ||
      e.getCause != null && e.getCause.getMessage.contains("degenerate"))
  }
}
