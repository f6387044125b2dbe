package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.geom.Terrain

/** Terrain kernels pinned against in-test brute force, independent of the
  * DuckDB oracle (the oracle replays the same lattice algebra; a
  * symmetric mistake — wrong Horn weight fold, a doubling round dropping
  * a path suffix, a reversed LOS inequality — would slip through it).
  * Brute force here is the textbook sequential form: explicit 8-neighbor
  * loops, per-cell path walks, per-ray angle scans.
  */
class TerrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** A 12×10 DEM with the SW-tilted-plane-plus-ripple law the q186–q189
    * fixture uses, minus a bite so the region is non-rectangular.
    */
  private def demCells: Seq[(Long, Long, Long, Long)] =
    for {
      cx <- 0L until 12L
      cy <- 0L until 10L
      if !(cx >= 8 && cy >= 7) // bite the NE corner
    } yield (1L, cx, cy, 2L * (cx + cy) + (cx * 7 + cy * 11) % 5)

  private def demDF = demCells.toDF("relation_id", "cx", "cy", "z")

  private def zAt: Map[(Long, Long), Long] =
    demCells.map { case (_, cx, cy, z) => (cx, cy) -> z }.toMap

  private val dirs = Terrain.Dirs

  /** Sequential D8: (dir, nx, ny) per cell, None for sinks. */
  private def bruteD8: Map[(Long, Long), Option[(Int, Long, Long)]] = {
    val z = zAt
    z.map { case ((cx, cy), zc) =>
      val drops = dirs.zipWithIndex.flatMap { case ((dx, dy), k) =>
        z.get((cx + dx, cy + dy)).filter(_ < zc)
          .map(zn => (zc - zn, k, cx + dx, cy + dy))
      }
      val best =
        if (drops.isEmpty) None
        else Some(drops.maxBy { case (drop, k, _, _) => (drop, -k) })
      (cx, cy) -> best.map { case (_, k, nx, ny) => (k, nx, ny) }
    }
  }

  test("slopeAspect matches a sequential Horn stencil") {
    val z = zAt
    val expected = (for {
      ((cx, cy), _) <- z
      nbrs = dirs.map { case (dx, dy) => z.get((cx + dx, cy + dy)) }
      if nbrs.forall(_.isDefined)
    } yield {
      def at(dx: Int, dy: Int) = z((cx + dx, cy + dy))
      val gx = at(1, 0) * 2 + at(1, 1) + at(1, -1) -
        (at(-1, 0) * 2 + at(-1, 1) + at(-1, -1))
      val gy = at(0, 1) * 2 + at(1, 1) + at(-1, 1) -
        (at(0, -1) * 2 + at(1, -1) + at(-1, -1))
      (cx, cy) -> (gx, gy)
    }).toMap
    val got = Terrain.slopeAspect(demDF)
      .select("cx", "cy", "gx", "gy", "slope2", "octant", "shade")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length === expected.size)
    got.foreach { case (cx, cy, gx, gy, slope2, octant, shade) =>
      val (egx, egy) = expected((cx, cy))
      assert((gx, gy) === (egx, egy), s"gradient at ($cx,$cy)")
      assert(slope2 === egx * egx + egy * egy)
      assert(shade === egy - egx)
      val (ax, ay) = (math.abs(egx), math.abs(egy))
      val eo =
        if (egx == 0 && egy == 0) -1L
        else if (egx >= 0 && egy >= 0) { if (ax >= ay) 0L else 1L }
        else if (egx < 0 && egy >= 0) { if (ax < ay) 2L else 3L }
        else if (egx < 0 && egy < 0) { if (ax >= ay) 4L else 5L }
        else { if (ax < ay) 6L else 7L }
      assert(octant === eo, s"octant at ($cx,$cy) gx=$egx gy=$egy")
    }
  }

  test("d8Flow matches the sequential steepest-descent pick") {
    val expected = bruteD8
    val got = Terrain.d8Flow(demDF)
      .select("cx", "cy", "dir", "nx", "ny")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    assert(got.size === expected.size)
    expected.foreach { case (c, e) =>
      val want = e.map { case (k, nx, ny) => (k.toLong, nx, ny) }
        .getOrElse((-1L, -1L, -1L))
      assert(got(c) === want, s"cell $c")
    }
  }

  test("flowAccumulation matches per-cell sequential path walks") {
    val d8 = bruteD8
    // acc(v) = 1 + #cells whose walk passes through v
    val acc = collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    d8.keys.foreach { start =>
      var cur = start
      acc(cur) += 1
      var hop = d8(cur)
      while (hop.isDefined) {
        val (_, nx, ny) = hop.get
        cur = (nx, ny)
        acc(cur) += 1
        hop = d8(cur)
      }
    }
    val got = Terrain.flowAccumulation(Terrain.d8Flow(demDF))
      .select("cx", "cy", "dir", "acc")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === d8.size)
    got.foreach { case (cx, cy, dir, a) =>
      assert(a === acc((cx, cy)), s"acc at ($cx,$cy)")
      assert(dir === d8((cx, cy)).map(_._1.toLong).getOrElse(-1L))
    }
  }

  test("sinkLabel matches the sequential walk to the pit") {
    val d8 = bruteD8
    def sinkOf(start: (Long, Long)): (Long, Long) = {
      var cur = start
      var hop = d8(cur)
      while (hop.isDefined) { cur = (hop.get._2, hop.get._3); hop = d8(cur) }
      cur
    }
    val got = Terrain.sinkLabel(Terrain.d8Flow(demDF))
      .select("cx", "cy", "sink_cx", "sink_cy")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === d8.size)
    got.foreach { case (cx, cy, sx, sy) =>
      assert((sx, sy) === sinkOf((cx, cy)), s"sink of ($cx,$cy)")
    }
  }

  test("lineOfSight matches the sequential per-ray angle scan") {
    val z = zAt
    val obs = z.toSeq.maxBy { case ((cx, cy), zv) => (zv, -cy, -cx) }
    val ((ox, oy), oz) = obs
    val observers = Seq((1L, ox, oy, oz)).toDF("relation_id", "ox", "oy", "oz")
    // sequential: walk each principal ray outward, tracking whether any
    // nearer cell's cross-multiplied angle dominates
    val expected = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    dirs.zipWithIndex.foreach { case ((dx, dy), ray) =>
      var d = 1L
      val seen = collection.mutable.ArrayBuffer.empty[(Long, Long)] // (rz, d)
      var cont = true
      while (cont) {
        val c = (ox + dx * d, oy + dy * d)
        z.get(c) match {
          case Some(zc) =>
            val rz = zc - oz
            val blocked = seen.exists { case (brz, bd) => brz * d >= rz * bd }
            expected(c) = (ray.toLong, if (blocked) 0L else 1L)
            seen += ((rz, d))
            d += 1
          case None =>
            // holes end the occupied ray prefix in this fixture? No —
            // the bite is a corner, so a miss can still be followed by
            // hits only outside the lattice; stop when out of bounds
            if (c._1 < -1 || c._1 > 12 || c._2 < -1 || c._2 > 10) cont = false
            else { d += 1 }
        }
        if (d > 32) cont = false
      }
    }
    val got = Terrain.lineOfSight(demDF, observers)
      .select("ray", "cx", "cy", "visible")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === expected.size)
    got.foreach { case (ray, cx, cy, vis) =>
      val (eray, evis) = expected((cx, cy))
      assert(ray === eray, s"ray at ($cx,$cy)")
      assert(vis === evis, s"visibility at ($cx,$cy)")
    }
  }

  test("flowAccumulation conserves total flow: sum(acc) = total path cells") {
    // Σ acc = Σ_cells (1 + path length downstream of the cell)
    val d8 = bruteD8
    var total = 0L
    d8.keys.foreach { start =>
      var cur = start; total += 1
      var hop = d8(cur)
      while (hop.isDefined) { total += 1; cur = (hop.get._2, hop.get._3); hop = d8(cur) }
    }
    val got = Terrain.flowAccumulation(Terrain.d8Flow(demDF))
      .agg(sum("acc")).as[Long].head()
    assert(got === total)
  }
}
