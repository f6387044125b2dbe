package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.geom.{PolyOverlap, PolyOverlapKernel, Pt, PolygonRow}

class PolyOverlapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def poly(id: Long, rings: Seq[Seq[(Int, Int)]]) =
    PolygonRow(s"p$id", rings.map(_.map { case (la, lo) => Pt(la.toFloat, lo.toFloat) }), id, 8L)

  test("properCross: strict crossing only") {
    import PolyOverlapKernel.properCross
    // X crossing
    assert(properCross(0, 0, 4, 4, 0, 4, 4, 0))
    // touching at an endpoint is not proper
    assert(!properCross(0, 0, 4, 4, 4, 4, 8, 0))
    // collinear overlap is not proper
    assert(!properCross(0, 0, 4, 0, 2, 0, 6, 0))
    // parallel disjoint
    assert(!properCross(0, 0, 4, 0, 0, 1, 4, 1))
    // T contact (endpoint on interior of the other) is not proper
    assert(!properCross(0, 0, 4, 0, 2, 0, 2, 4))
  }

  private def pairwise(polys: Seq[PolygonRow]): Set[(Long, Long)] = {
    // brute force through the same expression via a cross join — pins the
    // cover-based candidate stage against candidate loss
    val ds = spark.createDataset(polys)
    val rings = ds.map(p => (p.relation_id, p.rings)).toDF("rid", "rings")
    rings.toDF("id_a", "rings_a")
      .crossJoin(rings.toDF("id_b", "rings_b"))
      .filter(col("id_a") < col("id_b"))
      .filter(GraftFunctions.polyIntersects(col("rings_a"), col("rings_b")))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("semantic cases: containment, plus-sign cross, disjoint, hole-free union rings") {
    GraftFunctions.register(spark)
    val polys = Seq(
      poly(1, Seq(Seq((0, 0), (10, 0), (10, 10), (0, 10)))),   // big square
      poly(2, Seq(Seq((2, 2), (4, 2), (4, 4), (2, 4)))),       // inside 1 (containment)
      poly(3, Seq(Seq((4, -2), (6, -2), (6, 13), (4, 13)))),   // horizontal bar through 1: plus-sign
      poly(4, Seq(Seq((20, 20), (22, 20), (22, 22), (20, 22)))), // disjoint
      poly(5, Seq(Seq((-2, 4), (13, 4), (13, 6), (-2, 6)))))   // vertical bar: crosses 1 and 3
    val got = pairwise(polys)
    assert(got.contains((1L, 2L)), "containment via vertex-in")
    assert(got.contains((1L, 3L)), "plus-sign overlap via proper cross (no vertex inside)")
    assert(got.contains((1L, 5L)))
    assert(got.contains((3L, 5L)), "the two bars cross each other")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L), "disjoint polygon joins nothing")
  }

  test("grid-partitioned join ≡ brute force on a 24-polygon fixture, no cartesian in the plan") {
    val polys = (0 until 24).map { i =>
      val shapes = Seq(
        Seq(Seq((0, 0), (7, 0), (7, 2), (2, 2), (2, 6), (0, 6))),
        Seq(Seq((0, 4), (4, 8), (8, 4), (4, 0))),
        Seq(Seq((0, 0), (3, 7), (6, 0))),
        Seq(Seq((0, 0), (4, 0), (4, 4), (0, 4)), Seq((0, 6), (3, 6), (3, 9), (0, 9))))
      val dy = (i * 5) % 13; val dx = (i * 7) % 19
      poly(100L + i, shapes(i % shapes.length).map(_.map { case (la, lo) => (la + dy, lo + dx) }))
    }
    val ds = spark.createDataset(polys)
    val df = PolyOverlap.overlapSelfJoin(spark, ds, res = 6)
    val got = df.as[(Long, Long)].collect().toSet
    assert(got === pairwise(polys))
    assert(got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"candidates must come from the cell equi-join, plan:\n$plan")
  }

  test("finer candidate resolution never changes the result") {
    val polys = Seq(
      poly(1, Seq(Seq((0, 0), (10, 0), (10, 10), (0, 10)))),
      poly(2, Seq(Seq((5, 5), (15, 5), (15, 15), (5, 15)))),
      poly(3, Seq(Seq((40, 40), (45, 40), (45, 45), (40, 45)))))
    val ds = spark.createDataset(polys)
    val r4 = PolyOverlap.overlapSelfJoin(spark, ds, res = 4).as[(Long, Long)].collect().toSet
    val r7 = PolyOverlap.overlapSelfJoin(spark, ds, res = 7).as[(Long, Long)].collect().toSet
    assert(r4 === Set((1L, 2L)))
    assert(r7 === Set((1L, 2L)))
  }
}
