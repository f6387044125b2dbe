package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Hull

class HullSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chain: square corners kept, interior and edge-collinear dropped") {
    val pts = Array[(Long, Long)]((0, 0), (10, 0), (10, 10), (0, 10),
      (5, 5), (5, 0), (10, 5), (3, 7), (0, 0)) // dup + collinear midpoints
    assert(Hull.chain(pts).toSet ==
      Set[(Long, Long)]((0, 0), (10, 0), (10, 10), (0, 10)))
  }

  test("chain: collinear set keeps only the endpoints") {
    val pts = Array[(Long, Long)]((1, 1), (2, 2), (3, 3), (7, 7), (5, 5))
    assert(Hull.chain(pts).toSet == Set[(Long, Long)]((1, 1), (7, 7)))
  }

  test("chain: 0/1/2 distinct points are all extreme") {
    assert(Hull.chain(Array.empty[(Long, Long)]).isEmpty)
    assert(Hull.chain(Array((3L, 4L), (3L, 4L))).toSet == Set((3L, 4L)))
    assert(Hull.chain(Array((3L, 4L), (5L, 6L))).toSet == Set((3L, 4L), (5L, 6L)))
  }

  test("chain: negative coordinates and a concave notch") {
    // diamond with a point pulled inside (notch candidate is NOT on hull)
    val pts = Array[(Long, Long)]((-10, 0), (0, -10), (10, 0), (0, 10), (4, 4))
    assert(Hull.chain(pts).toSet ==
      Set[(Long, Long)]((-10, 0), (0, -10), (10, 0), (0, 10)))
  }

  test("extremePoints: two-level reduction matches single-level chain exactly") {
    // deterministic pseudo-random points, 3 groups, salts split the work
    def mix(i: Long) = {
      var z = i + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z ^ (z >>> 27)
    }
    val rows = (0 until 600).map { i =>
      (i % 3L, math.abs(mix(i)) % 5001L - 2500L, math.abs(mix(i * 7 + 1)) % 5001L - 2500L)
    }
    val df = rows.toDF("grp", "x", "y")
    val got = Hull.extremePoints(spark, df, nSalt = 8)
      .as[(Long, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (g, ps) =>
      Hull.chain(ps.map(t => (t._2, t._3)).toArray).toSeq.map(p => (g, p._1, p._2))
    }.toSet
    assert(got == want && want.nonEmpty)
    // and the two-level result is independent of the salt count
    val got1 = Hull.extremePoints(spark, df, nSalt = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got1 == want)
  }

  test("extremePoints: out-of-range coordinate fails loudly") {
    val df = Seq((0L, 1L << 32, 5L)).toDF("grp", "x", "y")
    val e = intercept[Exception](Hull.extremePoints(spark, df).collect())
    assert(e.getMessage.contains("exact-arithmetic") ||
      e.getCause != null)
  }
}
