package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Skyline
import graft.geom.Hull

/** Skyline and diameter pinned against brute force — the O(n²)
  * definitions the distributed two-phase plans must reproduce,
  * including duplicate survival (skyline) and tie-break pairs
  * (diameter).
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bruteSkyline(items: Seq[(Long, Long, Long, Long)]) =
    items.filter { case (_, a, b, c) =>
      !items.exists { case (_, a2, b2, c2) =>
        a2 >= a && b2 >= b && c2 >= c && (a2 > a || b2 > b || c2 > c)
      }
    }.toSet

  test("skyline3 matches brute-force dominance, duplicates survive") {
    val rnd = new scala.util.Random(42)
    val items = (1L to 500L).map(i =>
      (i, rnd.nextLong(40), rnd.nextLong(40), rnd.nextLong(40))) ++
      // planted duplicated Pareto point — neither copy dominates the other
      Seq((9001L, 100L, 100L, 100L), (9002L, 100L, 100L, 100L))
    val got = Skyline.skyline3(spark,
        items.toDF("i", "c1", "c2", "c3"), idCol = "i")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === bruteSkyline(items))
    assert(got.exists(_._1 == 9001L) && got.exists(_._1 == 9002L))
  }

  test("skyline3 on an anticorrelated chain keeps the whole chain") {
    // (k, N-k, 0): pairwise incomparable — all are skyline
    val items = (0L to 60L).map(k => (k, k, 60L - k, 0L))
    val got = Skyline.skyline3(spark, items.toDF("i", "c1", "c2", "c3"),
      idCol = "i")
    assert(got.count() === 61L)
  }

  test("diameter2 matches brute force over all pairs, smallest witness") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 400).map(_ =>
      (rnd.nextInt(3).toLong, rnd.nextLong(2001) - 1000, rnd.nextLong(2001) - 1000))
    val byGrp = pts.distinct.groupBy(_._1)
    val expected = byGrp.flatMap { case (g, ps) =>
      val pairs = for {
        (_, x1, y1) <- ps; (_, x2, y2) <- ps
        if x1 < x2 || (x1 == x2 && y1 < y2)
      } yield (x1, y1, x2, y2, (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))
      if (pairs.isEmpty) None
      else {
        val mx = pairs.map(_._5).max
        val best = pairs.filter(_._5 == mx)
          .minBy(p => (p._1, p._2, p._3, p._4))
        Some(g -> (mx, best._1, best._2, best._3, best._4))
      }
    }
    val got = Hull.diameter2(spark, pts.toDF("grp", "x", "y"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(got === expected)
  }

  test("diameter2: single-point and duplicate-only groups emit nothing") {
    val pts = Seq((1L, 5L, 5L), (2L, 3L, 3L), (2L, 3L, 3L), (3L, 0L, 0L), (3L, 4L, 0L))
    val got = Hull.diameter2(spark, pts.toDF("grp", "x", "y"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet === Set(3L))
    assert(got.head === ((3L, 16L, 0L, 0L, 4L, 0L)))
  }
}
