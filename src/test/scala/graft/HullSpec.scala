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

  test("orientedMbr: axis-aligned rectangle, canonical (den, num) rep") {
    // 4x3 rectangle + interior noise: min area 12, canonical direction
    // is the shorter side (0,3): d = 9, n = 9*12 = 108
    val df = Seq((0L, 0L, 0L), (0L, 4L, 0L), (0L, 4L, 3L), (0L, 0L, 3L),
      (0L, 2L, 1L), (0L, 1L, 2L)).toDF("grp", "x", "y")
    val got = Hull.orientedMbr(spark, df, nSalt = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 4L, 108L, 9L)))
    assert(108.0 / 9.0 == 12.0)
  }

  test("orientedMbr: rotated square beats the axis-aligned box") {
    // square rotated 45 deg, side sqrt(2): true min area 2 at direction
    // (1,1) or (1,-1) (d=2, n=4); the axis-aligned box would be 4
    val df = Seq((7L, 0L, 0L), (7L, 1L, 1L), (7L, 2L, 0L), (7L, 1L, -1L))
      .toDF("grp", "x", "y")
    val got = Hull.orientedMbr(spark, df, nSalt = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 4L, 4L, 2L)))
  }

  test("orientedMbr: collinear group has area 0; singleton emits nothing") {
    val df = Seq((1L, 0L, 0L), (1L, 3L, 3L), (1L, 6L, 6L), (2L, 5L, 5L))
      .toDF("grp", "x", "y")
    val got = Hull.orientedMbr(spark, df, nSalt = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L, 72L))) // dir (6,6): d=72, dcrs=0
  }

  test("orientedMbr: matches brute-force rational min over all pair directions") {
    def mix(i: Long) = {
      var z = i + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z ^ (z >>> 27)
    }
    val rows = (0 until 240).map { i =>
      (i % 3L, math.abs(mix(i)) % 32769L - 16384L,
        math.abs(mix(i * 13 + 5)) % 32769L - 16384L)
    }
    val got = Hull.orientedMbr(spark, rows.toDF("grp", "x", "y"), nSalt = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, (t._2, t._3, t._4))).toMap
    val want = rows.groupBy(_._1).map { case (g, ps) =>
      val hull = Hull.chain(ps.map(t => (t._2, t._3)).toArray)
      val dirs = for {
        a <- hull; b <- hull
        if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      } yield (b._1 - a._1, b._2 - a._2)
      val cands = dirs.distinct.map { case (dx, dy) =>
        val dots = hull.map(p => dx * p._1 + dy * p._2)
        val crss = hull.map(p => dx * p._2 - dy * p._1)
        val n = (dots.max - dots.min) * (crss.max - crss.min)
        (BigInt(n), BigInt(dx * dx + dy * dy))
      }
      // exact rational min with BigInt cross-compare, then (d, n) tiebreak
      val best = cands.filter { case (n, d) =>
        cands.forall { case (n2, d2) => n2 * d >= n * d2 } }
        .map { case (n, d) => (d.toLong, n.toLong) }.min
      (g, (hull.length.toLong, best._2, best._1))
    }
    assert(got == want && want.nonEmpty)
  }

  test("extremePoints: out-of-range coordinate fails loudly") {
    val df = Seq((0L, 1L << 32, 5L)).toDF("grp", "x", "y")
    val e = intercept[Exception](Hull.extremePoints(spark, df).collect())
    assert(e.getMessage.contains("exact-arithmetic") ||
      e.getCause != null)
  }
}
