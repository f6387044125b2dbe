package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Dbscan

/** Dbscan: parity against a brute-force quadratic reference on a
  * deterministic scatter, the textbook edge cases (boundary distance,
  * edge-less core, deterministic border tie-break, minPts=1), and a
  * no-cartesian plan pin.
  */
class DbscanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Quadratic reference: (id → (role, cluster)) with the same
    * contracts — self counts toward minPts, core clusters labeled by
    * min reachable core id, borders take the min core-neighbor label.
    */
  private def brute(pts: Seq[(Long, Long, Long)], eps2: Long,
      minPts: Int): Map[Long, (String, Long)] = {
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val dx = a._2 - b._2; val dy = a._3 - b._3; dx * dx + dy * dy
    }
    val nbrs = pts.map(p => p._1 ->
      pts.filter(q => q._1 != p._1 && d2(p, q) <= eps2).map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size + 1 >= minPts).toSet
    // min-label fixpoint over the core-core subgraph
    var label = core.map(id => id -> id).toMap
    var changed = true
    while (changed) {
      changed = false
      for (id <- core; nb <- nbrs(id) if core(nb)) {
        val m = math.min(label(id), label(nb))
        if (label(id) != m) { label += id -> m; changed = true }
        if (label(nb) != m) { label += nb -> m; changed = true }
      }
    }
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> ("core", label(id))
      else {
        val coreNbrs = nbrs(id).filter(core)
        if (coreNbrs.nonEmpty) id -> ("border", coreNbrs.map(label).min)
        else id -> ("noise", -1L)
      }
    }.toMap
  }

  private def run(pts: Seq[(Long, Long, Long)], eps2: Long,
      minPts: Int): Map[Long, (String, Long)] =
    Dbscan.cluster(spark, pts.toDF("id", "x", "y"), eps2, minPts)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("matches the quadratic reference on a deterministic scatter") {
    // two dense knots + a sparse bridge + far outliers
    val pts =
      (0L until 25L).map(i => (i, (i * 31) % 40, (i * 17) % 40)) ++
      (25L until 50L).map(i => (i, 500 + (i * 13) % 40, 500 + (i * 7) % 40)) ++
      Seq((50L, 250L, 250L), (51L, 5000L, 5000L), (52L, -4000L, 4000L))
    for ((eps2, minPts) <- Seq((400L, 3), (2500L, 5), (100L, 2), (1000000L, 4)))
      assert(run(pts, eps2, minPts) === brute(pts, eps2, minPts),
        s"eps2=$eps2 minPts=$minPts")
  }

  test("exact eps boundary counts; one past does not") {
    // 1-2 at d2=25 exactly, 3 at d2=34 from 1
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 3L, 5L))
    val got = run(pts, 25L, 2)
    // 2 has both neighbors within... d2(2,3)=1 <= 25, d2(1,3)=34 > 25
    assert(got(1L) === ("core", 1L))
    assert(got(2L) === ("core", 1L))
    assert(got(3L) === ("core", 1L)) // via 2: transitive cluster, label min=1
  }

  test("edge-less core keeps its own cluster; minPts=1 makes all core") {
    val pts = Seq((10L, 0L, 0L), (20L, 10000L, 0L))
    val got = run(pts, 1L, 1)
    assert(got === Map(10L -> ("core", 10L), 20L -> ("core", 20L)))
  }

  test("border between two clusters takes the smaller label") {
    // two 4-point cores around x=0 and x=20; the bridge at (10,0) sees
    // one core from each side (2 neighbors + self = 3 < minPts 4) so it
    // stays border and must take the SMALLER cluster label
    val pts = Seq(
      (1L, 0L, 0L), (2L, 0L, 1L), (3L, 0L, -1L), (4L, 1L, 0L),
      (6L, 19L, 0L), (7L, 20L, 0L), (8L, 20L, 1L), (9L, 20L, -1L),
      (5L, 10L, 0L))
    val got = run(pts, 82L, 4)
    assert(got(5L) === ("border", 1L))
    assert(got(4L) === ("core", 1L))
    assert(got(6L) === ("core", 6L))
  }

  test("plan: no cartesian product — pairs ride the cell-binned equi-join") {
    val pts = (0L until 30L).map(i => (i, i * 3, i * 5))
    val plan = Dbscan.cluster(spark, pts.toDF("id", "x", "y"), 100L, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
