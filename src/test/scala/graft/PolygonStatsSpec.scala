package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.OsmScenes
import graft.geom.Geom
import graft.osm.BoundaryExtract

/** Exact integer polygon geometry: the decimicro shoelace kernel and the
  * polygonStats operator over the grid fixture (q74's sbt-side pin).
  */
class PolygonStatsSpec extends AnyFunSuite {

  test("signedArea2Dm: squares, orientation, duplicates, degenerate") {
    // unit square CCW: corners (0,0) (0,10) (10,10) (10,0) in (lat,lon)
    val lat = Array(0, 0, 10, 10)
    val lon = Array(0, 10, 10, 0)
    assert(Geom.signedArea2Dm(lat, lon) == 200L)
    assert(Geom.signedArea2Dm(lat.reverse, lon.reverse) == -200L)
    // closing duplicate and repeated vertices contribute zero
    assert(Geom.signedArea2Dm(lat :+ 0, lon :+ 0) == 200L)
    assert(Geom.signedArea2Dm(Array(0, 0, 0, 10, 10), Array(0, 10, 10, 10, 0)) == 200L)
    // fewer than 3 points is degenerate
    assert(Geom.signedArea2Dm(Array(1, 2), Array(3, 4)) == 0L)
  }

  test("signedArea2Dm: no overflow at antimeridian-scale coordinates") {
    // a 1000x1000-dm square at the far corner of the coordinate space;
    // untranslated cross products are ~3e18 PER TERM and the running sum
    // would wrap Long — the origin translation keeps every term tiny
    val big = 1790000000
    val lat = Array(big, big, big + 1000, big + 1000)
    val lon = Array(-(big), -(big) + 1000, -(big) + 1000, -(big))
    assert(Geom.signedArea2Dm(lat, lon) == 2000000L)
    // and a many-vertex version: 1024 collinear points along each edge
    // would previously accumulate overflow; area must stay exact
    val n = 256
    val lats = Array.tabulate(4 * n) { i =>
      val side = i / n; val t = i % n
      side match {
        case 0 => big
        case 1 => big + t * 4
        case 2 => big + n * 4
        case _ => big + (n - t) * 4
      }
    }
    val lons = Array.tabulate(4 * n) { i =>
      val side = i / n; val t = i % n
      side match {
        case 0 => -big + t * 4
        case 1 => -big + n * 4
        case 2 => -big + (n - t) * 4
        case _ => -big
      }
    }
    assert(Geom.signedArea2Dm(lats, lons) == 2L * (n * 4L) * (n * 4L))
  }

  test("centroidDm: exact rational centroid, half-up rounding, degenerate None") {
    // unit square centered at (5, 5)
    assert(Geom.centroidDm(Array(0, 0, 10, 10), Array(0, 10, 10, 0)).contains((5, 5)))
    // orientation doesn't change the centroid
    assert(Geom.centroidDm(Array(10, 10, 0, 0), Array(0, 10, 10, 0)).contains((5, 5)))
    // triangle (0,0)(0,3)(3,0): centroid (1, 1) exactly
    assert(Geom.centroidDm(Array(0, 0, 3), Array(0, 3, 0)).contains((1, 1)))
    // negative-coordinate triangle: (-3,0)(0,0)(0,-3) -> (-1,-1)
    assert(Geom.centroidDm(Array(-3, 0, 0), Array(0, 0, -3)).contains((-1, -1)))
    // inexact rationals round half-up: centroid (1/3, 1/3) -> (0, 0),
    // (-1/3, -1/3) -> (0, 0), and a true half (3/2) rounds UP to 2
    assert(Geom.centroidDm(Array(0, 0, 1), Array(0, 1, 0)).contains((0, 0)))
    assert(Geom.centroidDm(Array(0, 0, -1), Array(0, -1, 0)).contains((0, 0)))
    // degenerate: collinear ring has zero area
    assert(Geom.centroidDm(Array(0, 1, 2), Array(0, 1, 2)).isEmpty)
    // antimeridian-scale square: exact center, no overflow
    val b = 1790000000
    assert(Geom.centroidDm(Array(-b, -b, b, b), Array(-b, b, b, -b)).contains((0, 0)))
  }

  test("polygonStats over the grid: constant exact area, winding invariant, bbox") {
    val spark = SparkTestSession.spark
    val (n, w, r) = OsmScenes.grid(16, 8).toDFs(spark)
    val rows = BoundaryExtract.polygonStats(spark, r, w, n).collect()
    assert(rows.length == 128)
    rows.foreach { s =>
      val k = s.relation_id - 1000000L
      val ix = (k % 16).toInt; val iy = (k / 16).toInt
      assert(s.n_rings == 1 && s.n_points == 12)
      // 0.96 of a 15-degree span rounds to exactly 144,000,000 decimicro
      // in every cell; 2 * w * h is therefore constant
      assert(s.area2 == 41472000000000000L, s"k=$k")
      // the stitched ring preserves the FIRST member way's direction:
      // member perm k%4 leads, fixture flip bit (k >> perm) & 1
      val expected = if (((k >> (k % 4).toInt) & 1L) == 0L) "ccw" else "cw"
      assert(s.winding == expected, s"k=$k")
      assert(s.min_lat_dm == -600000000 + iy * 150000000)
      assert(s.min_lon_dm == -1200000000 + ix * 150000000)
      assert(s.max_lat_dm == s.min_lat_dm + 144000000)
      assert(s.max_lon_dm == s.min_lon_dm + 144000000)
    }
  }

  test("signedArea2Dm: near-Long-max C-ring exact, full-world ring throws") {
    // C-shaped ring: full world rectangle with a 3.0e9 x 0.8e9 bite cut
    // into the left edge, traversed AFTER the rectangle corners so the
    // running sum passes 1.296e19 (wraps a Long accumulator mid-way)
    // before the bite subtracts back under Long.MaxValue. The exact
    // area2 = 2*(3.6e9*1.8e9 - 3.0e9*0.8e9) = 8.16e18 must come out.
    val lat = Array(-900000000, -900000000, 900000000, 900000000,
      -900000000 + 1200000000, -900000000 + 1200000000,
      -900000000 + 400000000, -900000000 + 400000000)
    val lon = Array(-1800000000, 1800000000, 1800000000, -1800000000,
      -1800000000, 1200000000, // bite reaches x-delta 3.0e9 from the west edge
      1200000000, -1800000000)
    assert(Geom.signedArea2Dm(lat, lon) == 8160000000000000000L)
    // the full-world rectangle's TRUE area2 is 1.296e19 > Long.MaxValue:
    // a Long accumulator silently returns wrapped garbage; the 128-bit
    // path must refuse loudly instead
    val wl = Array(-900000000, -900000000, 900000000, 900000000)
    val wo = Array(-1800000000, 1800000000, 1800000000, -1800000000)
    intercept[ArithmeticException] { Geom.signedArea2Dm(wl, wo) }
  }

  test("contiguity: exact rook pairs on the flush grid, none on the disjoint grid") {
    val spark = SparkTestSession.spark
    val (n, w, r) = OsmScenes.sharedGrid(4, 3).toDFs(spark)
    val got = BoundaryExtract.contiguity(spark, r, w, n).collect()
      .map(row => (row.getLong(0), row.getLong(1)) -> row.getLong(2)).toMap
    // rook neighbors of a 4x3 flush grid: 3*3 horizontal + 4*2 vertical
    val expect = (for {
      k <- 0 until 12
      (da, ok) <- Seq((1, k % 4 != 3), (4, k < 8)) if ok
    } yield (3000000L + k, 3000000L + k + da) -> 2L).toMap
    assert(got == expect)
    // the 0.96-span grid never touches: zero adjacency
    val (n2, w2, r2) = OsmScenes.grid(4, 3).toDFs(spark)
    assert(BoundaryExtract.contiguity(spark, r2, w2, n2).isEmpty)
  }

  test("spatialLag: exact Moran integers vs brute force on the 4x3 flush gradient") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val (n, w, r) = OsmScenes.sharedGrid(4, 3).toDFs(spark)
    val adj = BoundaryExtract.contiguity(spark, r, w, n)
    // 4x3 grid: lonSpan 60 deg = 6e8 dm, latSpan 40 deg = 4e8 dm
    val values = BoundaryExtract.polygonStats(spark, r, w, n).toDF()
      .select(col("relation_id"),
        (((col("min_lon_dm").cast("long") + 1200000000L) / 600000000L).cast("long") +
         ((col("min_lat_dm").cast("long") + 600000000L) / 400000000L).cast("long")).as("x"))
    val got = BoundaryExtract.spatialLag(values, adj).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7))).toMap
    // brute-force reference on the known grid
    val xs = (0 until 12).map(k => ((k % 4) + (k / 4)).toLong)
    val nC = 12L; val s = xs.sum
    val cs = xs.map(x => nC * x - s)
    val und = for { k <- 0 until 12; (d, ok) <- Seq((1, k % 4 != 3), (4, k < 8)) if ok }
      yield (k, k + d)
    val dir = und ++ und.map(_.swap)
    val num = dir.map { case (i, j) => cs(i) * cs(j) }.sum
    val den = cs.map(c => c * c).sum
    val s0 = dir.size.toLong
    val expect = (0 until 12).map { k =>
      val nb = dir.filter(_._1 == k).map(_._2)
      (3000000L + k) -> (xs(k), nb.size.toLong, nb.map(xs).sum, num, den, s0, nC)
    }.toMap
    assert(got == expect)
    // the gradient is spatially smooth: Moran's I = n*num/(s0*den) > 0
    assert(num > 0 && den > 0)
  }

  test("spatialLag: isolated polygons keep degree 0 / lag 0, Moran num 0") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    // the 0.96-span grid never touches: empty adjacency, per-polygon rows kept
    val (n2, w2, r2) = OsmScenes.grid(2, 2).toDFs(spark)
    val adj = BoundaryExtract.contiguity(spark, r2, w2, n2)
    val values = BoundaryExtract.polygonStats(spark, r2, w2, n2).toDF()
      .select(col("relation_id"), col("n_points").cast("long").as("x"))
    val rows = BoundaryExtract.spatialLag(values, adj).collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getLong(4) == 0L && r.getLong(6) == 0L))
  }

  test("localMoran: brute-force parity + all four quadrants on the rough 4x3 grid") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val (n, w, r) = OsmScenes.sharedGrid(4, 3).toDFs(spark)
    val adj = BoundaryExtract.contiguity(spark, r, w, n)
    // rough attribute (ix + iy) % 5 so HH/HL/LH/LL all appear
    val ixC = (col("min_lon_dm").cast("long") + 1200000000L) / 600000000L
    val iyC = (col("min_lat_dm").cast("long") + 600000000L) / 400000000L
    val values = BoundaryExtract.polygonStats(spark, r, w, n).toDF()
      .select(col("relation_id"), ((ixC + iyC) % 5L).as("x"))
    val got = BoundaryExtract.localMoran(values, adj).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6), row.getString(7))).toMap
    val xs = (0 until 12).map(k => (((k % 4) + (k / 4)) % 5).toLong)
    val nC = 12L; val s = xs.sum
    val und = for { k <- 0 until 12; (d, ok) <- Seq((1, k % 4 != 3), (4, k < 8)) if ok }
      yield (k, k + d)
    val dir = und ++ und.map(_.swap)
    val expect = (0 until 12).map { k =>
      val nb = dir.filter(_._1 == k).map(_._2)
      val c = nC * xs(k) - s
      val lagC = nC * nb.map(xs).sum - nb.size * s
      val quad =
        if (nb.isEmpty) "ISO"
        else if (c > 0 && lagC > 0) "HH" else if (c > 0 && lagC < 0) "HL"
        else if (c < 0 && lagC > 0) "LH" else if (c < 0 && lagC < 0) "LL" else "NA"
      (3000000L + k) -> (xs(k), nb.size.toLong, nb.map(xs).sum, c, lagC, c * lagC, quad)
    }.toMap
    assert(got == expect)
    assert(Set("HH", "HL", "LH", "LL").subsetOf(got.values.map(_._7).toSet))
  }

  test("localMoran: isolated polygons classify ISO with zero lag") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val (n2, w2, r2) = OsmScenes.grid(2, 2).toDFs(spark)
    val adj = BoundaryExtract.contiguity(spark, r2, w2, n2)
    val values = BoundaryExtract.polygonStats(spark, r2, w2, n2).toDF()
      .select(col("relation_id"), col("n_points").cast("long").as("x"))
    val rows = BoundaryExtract.localMoran(values, adj).collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getLong(5) == 0L && r.getLong(6) == 0L && r.getString(7) == "ISO"))
  }

  test("globalAutocorr: one exact-integer row matching brute force; Geary/Moran consistency") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val (n, w, r) = OsmScenes.sharedGrid(4, 3).toDFs(spark)
    val adj = BoundaryExtract.contiguity(spark, r, w, n)
    val ixC = (col("min_lon_dm").cast("long") + 1200000000L) / 600000000L
    val iyC = (col("min_lat_dm").cast("long") + 600000000L) / 400000000L
    val values = BoundaryExtract.polygonStats(spark, r, w, n).toDF()
      .select(col("relation_id"), ((ixC + iyC) % 5L).as("x"))
    val rows = BoundaryExtract.globalAutocorr(values, adj).collect()
    assert(rows.length == 1)
    val row = rows.head
    val xs = (0 until 12).map(k => (((k % 4) + (k / 4)) % 5).toLong)
    val nC = 12L; val s = xs.sum
    val cs = xs.map(x => nC * x - s)
    val und = for { k <- 0 until 12; (d, ok) <- Seq((1, k % 4 != 3), (4, k < 8)) if ok }
      yield (k, k + d)
    val dir = und ++ und.map(_.swap)
    val moranNum = dir.map { case (i, j) => cs(i) * cs(j) }.sum
    val moranDen = cs.map(c => c * c).sum
    val gearyNum = dir.map { case (i, j) => (xs(i) - xs(j)) * (xs(i) - xs(j)) }.sum
    val ggNum = dir.map { case (i, j) => xs(i) * xs(j) }.sum
    val ggDen = s * s - xs.map(x => x * x).sum
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5), row.getLong(6)) ==
      ((nC, moranNum, moranDen, gearyNum, ggNum, ggDen, dir.size.toLong)))
    // identity: sum over directed edges (c_i - c_j)^2 = n^2 * geary_num,
    // and it also equals 2*(s0-per-node-weighted sum) — cross-check the
    // reconstruction path the engine uses (moran_den from n,S,Q only)
    assert(dir.map { case (i, j) => (cs(i) - cs(j)) * (cs(i) - cs(j)) }.sum ==
      nC * nC * gearyNum)
  }

  test("dissolve: contiguous same-attribute bands merge transitively; checkerboard stays singleton") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val (n, w, r) = OsmScenes.sharedGrid(4, 3).toDFs(spark)
    val adj = BoundaryExtract.contiguity(spark, r, w, n)
    val st = BoundaryExtract.polygonStats(spark, r, w, n).toDF()
    val ixC = (col("min_lon_dm").cast("long") + 1200000000L) / 600000000L
    val iyC = (col("min_lat_dm").cast("long") + 600000000L) / 400000000L
    // bands: g = iy → 3 regions of 4 cells each; the band ends are only
    // TRANSITIVELY connected, so this pins real closure, not direct pairs
    val bands = st.select(col("relation_id"), iyC.as("g"))
    val got = BoundaryExtract.dissolve(spark, bands, adj, st).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getInt(4), row.getInt(5), row.getInt(6), row.getInt(7))).toSet
    // 4x3 flush grid: cells 60°x40°, area2 = 2*6e8*4e8 = 4.8e17 per cell
    val cellArea2 = 2L * 600000000L * 400000000L
    val expect = (0 until 3).map { iy =>
      (3000000L + iy * 4L, iy.toLong, 4L, 4L * cellArea2,
        -600000000 + iy * 400000000, -1200000000,
        -200000000 + iy * 400000000, 1200000000)
    }.toSet
    assert(got == expect)
    // checkerboard: rook neighbors always differ in (ix+iy) parity, so no
    // same-attribute edge survives and every polygon is its own region
    val checker = st.select(col("relation_id"), ((ixC + iyC) % 2L).as("g"))
    val single = BoundaryExtract.dissolve(spark, checker, adj, st).collect()
    assert(single.length == 12)
    assert(single.forall(row => row.getLong(2) == 1L && row.getLong(3) == cellArea2))
    // region id of a singleton is the polygon itself
    assert(single.map(_.getLong(0)).toSet == (0 until 12).map(3000000L + _).toSet)
  }

  test("local G: brute-force parity on a path graph; isolated node is ISO") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // path 1–2–3–4 with x = 1,4,2,8; node 5 isolated with x = 3
    val xs = Map(1L -> 1L, 2L -> 4L, 3L -> 2L, 4L -> 8L, 5L -> 3L)
    val values = xs.toSeq.toDF("relation_id", "x")
    val adj = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("rel_a", "rel_b", "shared_edges")
    val got = BoundaryExtract.localG(values, adj).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap
    val nbrs = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L, 4L),
      4L -> Seq(3L), 5L -> Seq.empty[Long])
    val n = xs.size.toLong
    val s = xs.values.sum
    for ((id, x) <- xs) {
      val deg = nbrs(id).size.toLong
      val lag = nbrs(id).map(xs).sum
      val gNum = (n - 1) * lag - deg * (s - x)
      val spot = if (deg == 0) "ISO"
        else if (gNum > 0) "HOT" else if (gNum < 0) "COLD" else "EVEN"
      assert(got(id) == ((x, deg, lag, gNum, spot)), s"node $id")
    }
    // sanity on the fixture itself: 4 (x=8) heats its neighbor 3 via lag
    assert(got(3L)._5 == "HOT")
    assert(got(5L)._5 == "ISO")
  }

  test("join counts: hand-derived BB/BW/WW and expectations on the 4×3 grid") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val (n, w, r) = OsmScenes.sharedGrid(4, 3).toDFs(spark)
    val adj = BoundaryExtract.contiguity(spark, r, w, n)
    val iyC = (col("min_lat_dm").cast("long") + 600000000L) / 400000000L
    // b = 1 for the top two rows (8 cells), 0 for the bottom row (4):
    // m = 9 horizontal + 8 vertical = 17; BB = 6 horiz (rows 1,2) +
    // 4 vert (row1–row2) = 10; WW = 3 horiz (row 0); BW = 4 vert (row0–row1)
    val values = BoundaryExtract.polygonStats(spark, r, w, n).toDF()
      .select(col("relation_id"), when(iyC >= 1d, 1L).otherwise(0L).as("b"))
    val Array(row) = BoundaryExtract.joinCounts(values, adj).collect()
    assert(row.toSeq === Seq(12L, 8L, 17L, 10L, 4L, 3L,
      17L * 8 * 7, 2L * 17 * 8 * 4, 17L * 4 * 3, 12L * 11))
  }

  test("join counts: all-one attribute puts every edge in BB, zero in BW/WW") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val (n, w, r) = OsmScenes.sharedGrid(4, 3).toDFs(spark)
    val adj = BoundaryExtract.contiguity(spark, r, w, n)
    val values = BoundaryExtract.polygonStats(spark, r, w, n).toDF()
      .select(col("relation_id"), lit(1L).as("b"))
    val Array(row) = BoundaryExtract.joinCounts(values, adj).collect()
    assert(row.toSeq === Seq(12L, 12L, 17L, 17L, 0L, 0L,
      17L * 12 * 11, 0L, 0L, 12L * 11))
  }

  test("contiguity refuses an edge shared by more than two polygons") {
    val spark = SparkTestSession.spark
    import OsmScenes._
    // three relations over the SAME square way: every edge is 3-shared
    val square = Scene(
      nodes = Seq(NodeRow(1, 0, 0, Map.empty), NodeRow(2, 0, 100, Map.empty),
        NodeRow(3, 100, 100, Map.empty), NodeRow(4, 100, 0, Map.empty)),
      ways = Seq(WayRow(10, Seq(1L, 2L, 3L, 4L, 1L), Map.empty)),
      relations = (100L to 102L).map(id => RelationRow(id,
        Seq(Member("way", 10, "outer")),
        Map("boundary" -> "administrative", "admin_level" -> "8",
          "name" -> s"dup_$id"))))
    val (n, w, r) = square.toDFs(spark)
    val e = intercept[Exception] {
      BoundaryExtract.contiguity(spark, r, w, n).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("shared by >2 polygons"))
  }

  test("ringConvexity: convex square, dented reflex, collinear vertex, both windings") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    def ring(id: Long, pts: Seq[(Long, Long)]) =
      pts.zipWithIndex.map { case ((x, y), i) =>
        (id, i.toLong, pts.length.toLong, x, y) }
    // ring 1: ccw square; ring 2: same reversed (cw); ring 3: dent at
    // (5,5) -> 1 reflex; ring 4: collinear midpoint on the bottom edge
    val sq = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val dent = Seq((0L, 0L), (10L, 0L), (5L, 5L), (10L, 10L), (0L, 10L))
    val coll = Seq((0L, 0L), (5L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val verts = (ring(1, sq) ++ ring(2, sq.reverse) ++ ring(3, dent) ++
      ring(4, coll)).toDF("ring_id", "idx", "n", "x", "y")
    val got = Geom.ringConvexity(verts)
      .as[(Long, Long, Long, String, Long, Long, Int)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5, t._6, t._7)).toMap
    assert(got(1L) == (4L, 200L, "ccw", 0L, 0L, 1))
    assert(got(2L) == (4L, 200L, "cw", 0L, 0L, 1))
    // dent square: area 2*(100 - 25) = 150... shoelace of the dent ring:
    // (0,0)(10,0)(5,5)(10,10)(0,10): 2A = 150
    assert(got(3L) == (5L, 150L, "ccw", 1L, 0L, 0))
    assert(got(4L) == (5L, 200L, "ccw", 0L, 1L, 1))
  }

  test("chiSqPieces: marginals and deviations sum to zero by construction") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(("x", 0L), ("x", 0L), ("x", 1L), ("y", 0L), ("y", 1L),
      ("y", 1L), ("y", 1L)).toDF("a", "b")
    val got = graft.stats.Contingency.chiSqPieces(df)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 4 && got.forall(_._6 == 7L))
    // n sums to total; dev_num sums to zero over all cells (full table)
    assert(got.map(_._3).sum == 7L && got.map(_._7).sum == 0L)
    val m = got.map(t => (t._1, t._2) -> t).toMap
    // cell (x, 0): n=2, r=3, c=3 -> dev_num = 14 - 9 = 5, den = 63
    assert(m(("x", 0L))._7 == 5L && m(("x", 0L))._8 == 63L)
  }
}
