package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Simplify

/** Exact Douglas–Peucker pins: strict-inequality tolerance boundary,
  * collinear removal at tol 0, closed-ring anchors, BigInt exactness at
  * antimeridian-scale coordinates, duplicate collapse.
  */
class SimplifySpec extends AnyFunSuite {

  test("polyline: bump survives below tolerance, dies at exactly tolerance") {
    // bump of perpendicular height exactly 5 over a horizontal baseline
    val lat = Array(0, 5, 0)
    val lon = Array(0, 50, 100)
    val (k4, _) = Simplify.polyline(lat, lon, tolDm = 4)
    assert(k4.toSeq == Seq(0, 5, 0))
    // survival is strict >: height == tol is dropped
    val (k5, _) = Simplify.polyline(lat, lon, tolDm = 5)
    assert(k5.toSeq == Seq(0, 0))
  }

  test("polyline: collinear vertices vanish even at tolerance 0") {
    val lat = Array(0, 0, 0, 1, 2, 10)
    val lon = Array(0, 10, 20, 30, 40, 120)
    val (la, lo) = Simplify.polyline(lat, lon, tolDm = 0)
    // (0,10) and (0,20) are on the 0->?? chords only if intermediate kept;
    // DP keeps any vertex strictly off the current chord, so the bend
    // vertices stay and pure-collinear runs collapse
    assert(la.head == 0 && la.last == 10)
    assert(la.length < lat.length)
    // a fully collinear line collapses to its endpoints
    val (cl, _) = Simplify.polyline(Array(0, 1, 2, 3, 4), Array(0, 2, 4, 6, 8), 0)
    assert(cl.toSeq == Seq(0, 4))
  }

  test("ring: square with edge midpoints simplifies to 4 corners + closure, area intact") {
    // closed ring with collinear midpoints and a duplicated joint vertex
    val lat = Array(0, 0, 0, 50, 100, 100, 100, 50, 0)
    val lon = Array(0, 50, 100, 100, 100, 50, 0, 0, 0)
    val (la, lo) = Simplify.ring(lat, lon, tolDm = 10)
    assert(la.length == 5 && la.head == la.last && lo.head == lo.last)
    assert(math.abs(graft.geom.Geom.signedArea2Dm(la, lo)) == 2L * 100 * 100)
  }

  test("ring: exact decisions at antimeridian-scale coordinates (BigInt path)") {
    val b = 1790000000
    // 1-dm bump on the east edge of a huge square: cross products here
    // are ~1e19 — beyond Long — so only exact wide arithmetic can decide
    val lat = Array(-b, -b, 0, b, b, -b)
    val lon = Array(-b, b, b + 1, b, -b, -b)
    val (keep0, _) = Simplify.ring(lat, lon, tolDm = 0)
    assert(keep0.length == 6, s"tol 0 must keep the 1-dm bump: ${keep0.toSeq}")
    val (keep1, _) = Simplify.ring(lat, lon, tolDm = 1)
    assert(keep1.length == 5, s"tol 1 must drop the 1-dm bump: ${keep1.toSeq}")
  }

  test("consecutive duplicates collapse before any distance decision") {
    val lat = Array(0, 0, 0, 7, 7, 0)
    val lon = Array(0, 0, 50, 50, 50, 100)
    val (la, lo) = Simplify.polyline(lat, lon, tolDm = 2)
    assert(la.toSeq == Seq(0, 0, 7, 0) || la.toSeq == Seq(0, 7, 0),
      s"duplicates must not survive: ${la.toSeq} / ${lo.toSeq}")
  }

  test("staircase polyline: O(n) split depth runs in a 128 KiB stack") {
    // alternating 0/10 staircase makes DP split adjacent to an anchor at
    // every level — split depth ~n. The explicit work stack must survive
    // where call-stack recursion (with BigInt locals) would overflow a
    // small task-thread stack.
    val n = 3000
    val la = Array.tabulate(n + 1)(k => if (k % 2 == 1) 10 else 0)
    val lo = Array.tabulate(n + 1)(k => k * 2)
    @volatile var result: (Array[Int], Array[Int]) = null
    @volatile var err: Throwable = null
    val t = new Thread(null, () => {
      try result = Simplify.polyline(la, lo, tolDm = 1)
      catch { case e: Throwable => err = e }
    }, "dp-small-stack", 128 * 1024)
    t.start(); t.join()
    assert(err == null, s"dp failed in small stack: $err")
    // every step vertex deviates 10 > tol from any chord, so the
    // staircase is essentially incompressible
    assert(result._1.length > n / 2)
  }
}
