package graft.geom

/** Douglas–Peucker polyline/ring simplification (Douglas & Peucker 1973)
  * with EXACT integer decisions on decimicro coordinates: a vertex P
  * survives iff its distance from the anchor line AB exceeds the
  * tolerance, decided as cross(AB,AP)² > tol²·|AB|² — both sides exact in
  * BigInt (global-span deltas reach 3.6e9 dm, whose squares already
  * overflow Long, let alone the fourth-power cross²). No float enters, so
  * the simplification is bit-reproducible anywhere — the property q75's
  * closed-form oracle relies on.
  *
  * Ties and determinism: the farthest vertex of a span is the FIRST
  * index attaining the maximum; degenerate anchors (A == B) fall back to
  * point distance |AP|² > tol².
  */
object Simplify {

  private def big(l: Long): BigInt = BigInt(l)

  /** Simplify an OPEN polyline, keeping both endpoints. Inputs are
    * parallel (lat, lon) arrays; consecutive duplicates collapse first.
    */
  def polyline(latDm: Array[Int], lonDm: Array[Int], tolDm: Long): (Array[Int], Array[Int]) = {
    require(tolDm >= 0, s"tolDm=$tolDm")
    val (la, lo) = dedupConsecutive(latDm, lonDm)
    val n = la.length
    if (n <= 2) return (la, lo)
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    dp(la, lo, 0, n - 1, tolDm, keep)
    collect(la, lo, keep)
  }

  /** Simplify a CLOSED ring (first == last vertex allowed but not
    * required). The two anchors are vertex 0 and the vertex farthest from
    * it (exact squared distance, first-max tie-break) — the standard
    * closed-ring split, so no chord is privileged by input rotation
    * beyond the start vertex itself. Returns a closed ring (first ==
    * last) when ≥ 3 survivors remain.
    */
  def ring(latDm: Array[Int], lonDm: Array[Int], tolDm: Long): (Array[Int], Array[Int]) = {
    require(tolDm >= 0, s"tolDm=$tolDm")
    var (la, lo) = dedupConsecutive(latDm, lonDm)
    // drop the closing duplicate for the cyclic pass
    if (la.length >= 2 && la(0) == la(la.length - 1) && lo(0) == lo(la.length - 1)) {
      la = la.dropRight(1); lo = lo.dropRight(1)
    }
    val n = la.length
    if (n < 3) return (la, lo)
    // farthest vertex from vertex 0 (exact), first max wins
    var f = 1
    var best = BigInt(0)
    var i = 1
    while (i < n) {
      val dx = big(lo(i).toLong - lo(0)); val dy = big(la(i).toLong - la(0))
      val d2 = dx * dx + dy * dy
      if (d2 > best) { best = d2; f = i }
      i += 1
    }
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(f) = true
    dp(la, lo, 0, f, tolDm, keep)
    // wrap half: indices f..n-1..0 as a contiguous view
    val idx = (f until n).toArray :+ 0
    val wl = idx.map(la); val wo = idx.map(lo)
    val wkeep = new Array[Boolean](idx.length)
    wkeep(0) = true; wkeep(idx.length - 1) = true
    dp(wl, wo, 0, idx.length - 1, tolDm, wkeep)
    var j = 1
    while (j < idx.length - 1) { if (wkeep(j)) keep(idx(j)) = true; j += 1 }
    val (ra, ro) = collect(la, lo, keep)
    (ra :+ ra(0), ro :+ ro(0))
  }

  private def dedupConsecutive(la: Array[Int], lo: Array[Int]): (Array[Int], Array[Int]) = {
    require(la.length == lo.length, s"${la.length} vs ${lo.length}")
    if (la.isEmpty) return (la, lo)
    val ka = Array.newBuilder[Int]; val ko = Array.newBuilder[Int]
    ka += la(0); ko += lo(0)
    var pa = la(0); var po = lo(0)
    var i = 1
    while (i < la.length) {
      if (la(i) != pa || lo(i) != po) { ka += la(i); ko += lo(i); pa = la(i); po = lo(i) }
      i += 1
    }
    (ka.result(), ko.result())
  }

  private def collect(la: Array[Int], lo: Array[Int], keep: Array[Boolean]): (Array[Int], Array[Int]) = {
    val ka = Array.newBuilder[Int]; val ko = Array.newBuilder[Int]
    var i = 0
    while (i < la.length) { if (keep(i)) { ka += la(i); ko += lo(i) }; i += 1 }
    (ka.result(), ko.result())
  }

  /** Exact refine over span (i, j): mark the farthest interior vertex if
    * it clears the tolerance, then refine both halves. Driven by an
    * explicit work stack, not recursion — adjacent-split shapes
    * (staircases, spirals) make the split depth O(n), which would
    * overflow a task thread's call stack on 100k-vertex
    * coastline-following rings.
    */
  private def dp(la: Array[Int], lo: Array[Int], i0: Int, j0: Int, tol: Long,
      keep: Array[Boolean]): Unit = {
    val tol2 = big(tol) * big(tol)
    var stack: List[(Int, Int)] = (i0, j0) :: Nil
    while (stack.nonEmpty) {
      val (i, j) = stack.head
      stack = stack.tail
      if (j - i >= 2) {
        val ax = lo(i).toLong; val ay = la(i).toLong
        val bx = lo(j).toLong; val by = la(j).toLong
        val abx = big(bx - ax); val aby = big(by - ay)
        val len2 = abx * abx + aby * aby
        var bestK = -1
        var bestM = BigInt(-1)
        var k = i + 1
        while (k < j) {
          val apx = big(lo(k).toLong - ax); val apy = big(la(k).toLong - ay)
          val m =
            if (len2 == 0) apx * apx + apy * apy // degenerate anchors: point distance
            else { val c = abx * apy - aby * apx; c * c }
          if (m > bestM) { bestM = m; bestK = k }
          k += 1
        }
        if (bestK >= 0) {
          val clears =
            if (len2 == 0) {
              val apx = big(lo(bestK).toLong - ax); val apy = big(la(bestK).toLong - ay)
              apx * apx + apy * apy > tol2
            } else bestM > tol2 * len2
          if (clears) {
            keep(bestK) = true
            stack = (i, bestK) :: (bestK, j) :: stack
          }
        }
      }
    }
  }
}
