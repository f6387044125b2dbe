package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cell.{CellIndex, GridCluster}

class GridClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two blobs and an isolated point cluster separately, exact stats") {
    // res 4: 16x16 grid, cells are 22.5 x 11.25 degrees. Blob A: three
    // points in two ADJACENT cells; blob B: two points in one far cell;
    // C: one isolated point
    val pts = Seq(
      (1.0, 1.0), (2.0, 2.0), // same cell
      (1.0, 30.0), // adjacent cell (one step in x)
      (60.0, -100.0), (62.0, -101.0), // far cell pair (same cell)
      (-80.0, 170.0)).toDF("lat", "lon")
    val got = GridCluster.clusters(spark, pts, res = 4)
      .as[(Long, Long, Long)].collect().toSet
    val cA = Seq(CellIndex.cellOf(1.0, 1.0, 4), CellIndex.cellOf(1.0, 30.0, 4))
    val cB = Seq(CellIndex.cellOf(60.0, -100.0, 4), CellIndex.cellOf(62.0, -101.0, 4))
    assert(cA.distinct.size == 2 && cB.distinct.size == 1) // layout sanity
    assert(got == Set(
      (cA.min, 2L, 3L),
      (cB.min, 1L, 2L),
      (CellIndex.cellOf(-80.0, 170.0, 4), 1L, 1L)))
  }

  test("clusters merge across the antimeridian (x wraps)") {
    val pts = Seq((10.0, 179.9), (10.0, -179.9)).toDF("lat", "lon")
    val cells = Seq(CellIndex.cellOf(10.0, 179.9, 6), CellIndex.cellOf(10.0, -179.9, 6))
    assert(cells.distinct.size == 2) // distinct cells on either side
    val got = GridCluster.clusters(spark, pts, res = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((cells.min, 2L, 2L)))
  }

  test("diagonal touch merges (Chebyshev adjacency), gap does not") {
    // res 5: 32x32, cells 11.25 x 5.625 deg. Diagonal neighbors merge;
    // a two-cell gap stays separate
    val base = CellIndex.cellOf(0.5, 0.5, 5)
    val diag = CellIndex.cellOf(0.5 + 5.625, 0.5 + 11.25, 5)
    val far = CellIndex.cellOf(0.5 + 3 * 5.625, 0.5, 5)
    assert(Seq(base, diag, far).distinct.size == 3)
    val pts = Seq((0.5, 0.5), (0.5 + 5.625, 0.5 + 11.25), (0.5 + 3 * 5.625, 0.5))
      .toDF("lat", "lon")
    val got = GridCluster.clusters(spark, pts, res = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((math.min(base, diag), 2L, 2L), (far, 1L, 1L)))
  }

  test("heatmap pyramid: every level exact vs direct cellOf counts") {
    def mix(i: Long) = { // deterministic scatter incl. pole/antimeridian edges
      var z = i + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z ^ (z >>> 27)
    }
    val pts = (0 until 400).map { i =>
      ((math.abs(mix(i)) % 180000) / 1000.0 - 90.0,
        (math.abs(mix(i * 3 + 1)) % 360000) / 1000.0 - 180.0)
    }
    val got = graft.cell.Heatmap.pyramid(spark, pts.toDF("lat", "lon"), res = 6)
      .as[(Int, Long, Long)].collect().toSet
    val want = (0 to 6).flatMap { r =>
      pts.groupBy { case (la, lo) => CellIndex.cellOf(la, lo, r) }
        .map { case (c, ps) => (r, c, ps.size.toLong) }
    }.toSet
    assert(got == want)
    // and each level's counts total the point count
    assert((0 to 6).forall(r => got.toSeq.filter(_._1 == r).map(_._3).sum == 400L))
  }
}
