package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.PointPattern

/** PointPattern: binned-join parity against the quadratic definition,
  * pair uniqueness across cell boundaries, the 2³¹ overflow guard, and
  * Ripley count monotonicity.
  */
class PointPatternSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic scatter incl. exact-boundary and same-cell cases
  private val pts: Seq[(Long, Long, Long)] =
    (0L until 40L).map { i =>
      (i, (i * 7919 + 13) % 1000 - 500, (i * 9973 + 7) % 1000 - 500)
    }

  private def brute(d2: Long): Set[(Long, Long, Long)] =
    (for {
      a <- pts; b <- pts if a._1 < b._1
      dx = a._2 - b._2; dy = a._3 - b._3
      dd = dx * dx + dy * dy if dd <= d2
    } yield (a._1, b._1, dd)).toSet

  test("distanceBand matches the quadratic definition, each pair once") {
    for (d2 <- Seq(1L, 10000L, 90000L, 4000000L)) {
      val got = PointPattern.distanceBand(pts.toDF("id", "x", "y"), d2)
        .as[(Long, Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at d2=$d2")
      assert(got.toSet === brute(d2), s"d2=$d2")
    }
  }

  test("distanceBand: exact boundary included, beyond excluded") {
    val df = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 3L, 5L)).toDF("id", "x", "y")
    val got = PointPattern.distanceBand(df, 25L).as[(Long, Long, Long)].collect().toSet
    // (1,2) at 25 (boundary), (2,3) at 1; (1,3) at 34 excluded
    assert(got === Set((1L, 2L, 25L), (2L, 3L, 1L)))
  }

  test("coordinate overflow guard raises in-plan") {
    val df = Seq((1L, 1L << 31, 0L), (2L, 0L, 0L)).toDF("id", "x", "y")
    val e = intercept[Exception] {
      PointPattern.distanceBand(df, 100L).collect()
    }
    assert(e.getMessage.contains("overflows") ||
      Option(e.getCause).exists(_.getMessage.contains("overflows")))
  }

  test("ripleyK: counts match brute force per radius, monotone, zero-radius row present") {
    val r2s = Seq(1L, 10000L, 90000L, 4000000L)
    val got = PointPattern.ripleyK(pts.toDF("id", "x", "y"), r2s)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === r2s.sorted)
    assert(got.forall(_._2 === 40L))
    val counts = got.map(_._3)
    for ((r2, c) <- got.map(r => (r._1, r._3))) assert(c === brute(r2).size.toLong, s"r2=$r2")
    assert(counts.sorted.toSeq === counts.toSeq) // monotone in r2
  }
}
