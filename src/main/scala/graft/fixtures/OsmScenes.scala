package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic OSM-triple fixtures (FIXTURES.md §1). Pure arithmetic — no
  * wall clock, no unseeded randomness. Schemas:
  *   nodes(id, decimicro_lat, decimicro_lon, tags)
  *   ways(id, node_ids, tags)
  *   relations(id, members[{member_type, member_id, role}], tags)
  */
object OsmScenes {

  final case class NodeRow(id: Long, decimicro_lat: Int, decimicro_lon: Int,
      tags: Map[String, String])
  final case class WayRow(id: Long, node_ids: Seq[Long], tags: Map[String, String])
  final case class Member(member_type: String, member_id: Long, role: String)
  final case class RelationRow(id: Long, members: Seq[Member], tags: Map[String, String])

  final case class Scene(nodes: Seq[NodeRow], ways: Seq[WayRow], relations: Seq[RelationRow]) {
    def toDFs(spark: SparkSession): (DataFrame, DataFrame, DataFrame) = {
      import spark.implicits._
      (nodes.toDF(), ways.toDF(), relations.toDF())
    }
  }

  private def adminTags(level: String, extra: (String, String)*): Map[String, String] =
    Map("boundary" -> "administrative", "admin_level" -> level) ++ extra

  /** The hand-built golden scenes S1–S7 (FIXTURES.md) in one triple.
    * Node ids are globally unique per scene block (1000*k offsets).
    */
  def golden: Scene = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[NodeRow]
    val ways = scala.collection.mutable.ArrayBuffer.empty[WayRow]
    val rels = scala.collection.mutable.ArrayBuffer.empty[RelationRow]

    def sq(base: Long, latDm0: Int, lonDm0: Int, sideDm: Int): Seq[Long] = {
      // 4 corner nodes of an axis-aligned square, ids base..base+3
      nodes += NodeRow(base, latDm0, lonDm0, Map.empty)
      nodes += NodeRow(base + 1, latDm0, lonDm0 + sideDm, Map.empty)
      nodes += NodeRow(base + 2, latDm0 + sideDm, lonDm0 + sideDm, Map.empty)
      nodes += NodeRow(base + 3, latDm0 + sideDm, lonDm0, Map.empty)
      Seq(base, base + 1, base + 2, base + 3)
    }
    def wayMembers(ids: Long*): Seq[Member] = ids.map(Member("way", _, "outer"))

    // S1 single ring, pre-ordered: square cut into 3 ways sharing endpoints
    val s1 = sq(1000, 480000000, 80000000, 1000000)
    ways += WayRow(110, Seq(s1(0), s1(1), s1(2)), Map.empty)
    ways += WayRow(111, Seq(s1(2), s1(3)), Map.empty)
    ways += WayRow(112, Seq(s1(3), s1(0)), Map.empty)
    rels += RelationRow(11, wayMembers(110, 111, 112), adminTags("8", "name" -> "Alpha"))

    // S2 shuffled + reversed: same square shape elsewhere; member order
    // permuted, middle way's node list reversed
    val s2 = sq(2000, 490000000, 90000000, 1000000)
    ways += WayRow(120, Seq(s2(0), s2(1), s2(2)), Map.empty)
    ways += WayRow(121, Seq(s2(3), s2(2)), Map.empty) // reversed orientation
    ways += WayRow(122, Seq(s2(3), s2(0)), Map.empty)
    rels += RelationRow(12, wayMembers(122, 120, 121), adminTags("8", "name" -> "Beta"))

    // S3 multi-ring exclave + "hole": two disjoint closed rings, roles
    // outer/inner — role ignored, both emitted free-standing
    val s3a = sq(3000, 500000000, 100000000, 2000000)
    val s3b = sq(3100, 505000000, 105000000, 500000)
    ways += WayRow(130, s3a :+ s3a.head, Map.empty) // closed way
    ways += WayRow(131, s3b :+ s3b.head, Map.empty)
    rels += RelationRow(13,
      Seq(Member("way", 130, "outer"), Member("way", 131, "inner"),
        Member("node", 3000, "admin_centre"), Member("relation", 99, "subarea")),
      adminTags("8", "name" -> "Gamma"))

    // S4 dangling refs: missing way 998 dropped; way 141 references missing
    // nodes (dropped from segment); way 142's nodes ALL missing (empty seg)
    val s4 = sq(4000, 510000000, 110000000, 1000000)
    ways += WayRow(140, Seq(s4(0), s4(1), s4(2)), Map.empty)
    ways += WayRow(141, Seq(s4(2), 99991L, s4(3), 99992L, s4(0)), Map.empty)
    ways += WayRow(142, Seq(99993L, 99994L), Map.empty)
    rels += RelationRow(14, wayMembers(140, 998L, 141, 142), adminTags("8", "name" -> "Delta"))

    // S5 tag defaults: no name → UNKNOWN_NAME; name:prefix joins; garbage
    // admin_level (filtered at 8..8 — included here at level 8 via a second
    // relation to keep one S5 row in output)
    val s5 = sq(5000, 520000000, 120000000, 1000000)
    ways += WayRow(150, s5 :+ s5.head, Map.empty)
    rels += RelationRow(15, wayMembers(150), adminTags("8", "name:prefix" -> "Stadt"))
    rels += RelationRow(151, wayMembers(150), adminTags("abc", "name" -> "GarbageLevel")) // filtered out (default 127)
    rels += RelationRow(152, wayMembers(150), Map("boundary" -> "administrative", "name" -> "NoLevel")) // filtered out

    // S6 name dedup: duplicates (case-insensitive) + forbidden chars
    val s6 = sq(6000, 530000000, 130000000, 1000000)
    ways += WayRow(160, s6 :+ s6.head, Map.empty)
    rels += RelationRow(161, wayMembers(160), adminTags("8", "name" -> "Vimianzo"))
    rels += RelationRow(162, wayMembers(160), adminTags("8", "name" -> "vimianzo"))
    rels += RelationRow(163, wayMembers(160), adminTags("8", "name" -> "Vimianzo"))
    rels += RelationRow(164, wayMembers(160), adminTags("8", "name" -> "Unique"))
    rels += RelationRow(165, wayMembers(160), adminTags("8", "name" -> "ab\\/&:<>|*c"))

    // S7 admin-level boundary cases around [min=8, max=8]
    val s7 = sq(7000, 540000000, 140000000, 1000000)
    ways += WayRow(170, s7 :+ s7.head, Map.empty)
    rels += RelationRow(171, wayMembers(170), adminTags("7", "name" -> "TooLow"))
    rels += RelationRow(172, wayMembers(170), adminTags("9", "name" -> "TooHigh"))
    rels += RelationRow(173, wayMembers(170), adminTags("8", "name" -> "Exact"))
    // non-administrative boundary → F1 drops
    rels += RelationRow(174, wayMembers(170), Map("boundary" -> "maritime", "admin_level" -> "8", "name" -> "Sea"))

    Scene(nodes.toSeq, ways.toSeq, rels.toSeq)
  }

  /** Scalable deterministic scene: an nx × ny grid of square admin-8
    * boundaries over [-60,60]°lat × [-120,120]°lon, each cut into 4 ways
    * with a k-dependent member permutation and orientation flips. Used for
    * bench + the flagship spatial join. ~9 nodes/4 ways/1 relation per cell.
    */
  def grid(nx: Int, ny: Int): Scene = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[NodeRow]
    val ways = scala.collection.mutable.ArrayBuffer.empty[WayRow]
    val rels = scala.collection.mutable.ArrayBuffer.empty[RelationRow]
    val latSpan = 120.0 / ny; val lonSpan = 240.0 / nx
    var k = 0L
    var iy = 0
    while (iy < ny) {
      var ix = 0
      while (ix < nx) {
        val lat0 = (-60.0 + iy * latSpan); val lon0 = (-120.0 + ix * lonSpan)
        val dm = (d: Double) => math.round(d * 1e7).toInt
        val base = 100000L + k * 8
        // 4 corners + 4 edge midpoints → 8 nodes, ring of 8
        val pts = Seq(
          (lat0, lon0), (lat0, lon0 + lonSpan / 2), (lat0, lon0 + lonSpan * 0.96),
          (lat0 + latSpan / 2, lon0 + lonSpan * 0.96), (lat0 + latSpan * 0.96, lon0 + lonSpan * 0.96),
          (lat0 + latSpan * 0.96, lon0 + lonSpan / 2), (lat0 + latSpan * 0.96, lon0),
          (lat0 + latSpan / 2, lon0))
        pts.zipWithIndex.foreach { case ((la, lo), i) =>
          nodes += NodeRow(base + i, dm(la), dm(lo), Map.empty)
        }
        val ids = (0 until 8).map(base + _)
        val w0 = WayRow(500000L + k * 4, Seq(ids(0), ids(1), ids(2)), Map.empty)
        val w1 = WayRow(500001L + k * 4, Seq(ids(2), ids(3), ids(4)), Map.empty)
        val w2 = WayRow(500002L + k * 4, Seq(ids(4), ids(5), ids(6)), Map.empty)
        val w3 = WayRow(500003L + k * 4, Seq(ids(6), ids(7), ids(0)), Map.empty)
        // deterministic orientation flip + member permutation by k
        val flipped = Seq(w0, w1, w2, w3).zipWithIndex.map { case (w, i) =>
          if (((k >> i) & 1L) == 1L) w.copy(node_ids = w.node_ids.reverse) else w
        }
        ways ++= flipped
        val perm = (k % 4).toInt
        val ordered = flipped.drop(perm) ++ flipped.take(perm)
        rels += RelationRow(1000000L + k,
          ordered.map(w => Member("way", w.id, "outer")),
          Map("boundary" -> "administrative", "admin_level" -> "8",
            "name" -> s"cell_${ix}_$iy", "name:prefix" -> (if (k % 7 == 0) "Stadt" else "")))
        k += 1; ix += 1
      }
      iy += 1
    }
    Scene(nodes.toSeq, ways.toSeq, rels.toSeq)
  }

  /** Flush variant of [[grid]]: cells tile [-60,60]°×[-120,120]° edge to
    * edge on one shared half-step node lattice, so adjacent cells
    * reference the SAME border nodes — the real-OSM shared-boundary shape
    * (neighboring admin areas traverse identical border geometry). Each
    * cell still owns its own 4 ways (3 lattice nodes each) with the same
    * k-dependent orientation flips and member permutation as [[grid]].
    * Node (gx, gy) of the (2nx+1)×(2ny+1) lattice has id
    * 100000 + gy·(2nx+1) + gx; cell k = iy·nx + ix has relation id
    * 3000000 + k and ways 700000 + 4k…+3.
    */
  def sharedGrid(nx: Int, ny: Int): Scene = {
    val latSpan = 120.0 / ny; val lonSpan = 240.0 / nx
    val dm = (d: Double) => math.round(d * 1e7).toInt
    val gw = 2 * nx + 1
    def nid(gx: Int, gy: Int): Long = 100000L + gy.toLong * gw + gx
    val nodes = for (gy <- 0 to 2 * ny; gx <- 0 to 2 * nx) yield
      NodeRow(nid(gx, gy), dm(-60.0 + gy * latSpan / 2), dm(-120.0 + gx * lonSpan / 2), Map.empty)
    val ways = scala.collection.mutable.ArrayBuffer.empty[WayRow]
    val rels = scala.collection.mutable.ArrayBuffer.empty[RelationRow]
    var k = 0L
    var iy = 0
    while (iy < ny) {
      var ix = 0
      while (ix < nx) {
        // ring of 8 lattice nodes, ccw from the SW corner (grid()'s order)
        val ring = Seq((2 * ix, 2 * iy), (2 * ix + 1, 2 * iy), (2 * ix + 2, 2 * iy),
          (2 * ix + 2, 2 * iy + 1), (2 * ix + 2, 2 * iy + 2), (2 * ix + 1, 2 * iy + 2),
          (2 * ix, 2 * iy + 2), (2 * ix, 2 * iy + 1))
        val ids = ring.map { case (gx, gy) => nid(gx, gy) }
        val raw = Seq(
          WayRow(700000L + k * 4, Seq(ids(0), ids(1), ids(2)), Map.empty),
          WayRow(700001L + k * 4, Seq(ids(2), ids(3), ids(4)), Map.empty),
          WayRow(700002L + k * 4, Seq(ids(4), ids(5), ids(6)), Map.empty),
          WayRow(700003L + k * 4, Seq(ids(6), ids(7), ids(0)), Map.empty))
        val flipped = raw.zipWithIndex.map { case (w, i) =>
          if (((k >> i) & 1L) == 1L) w.copy(node_ids = w.node_ids.reverse) else w
        }
        ways ++= flipped
        val perm = (k % 4).toInt
        val ordered = flipped.drop(perm) ++ flipped.take(perm)
        rels += RelationRow(3000000L + k,
          ordered.map(w => Member("way", w.id, "outer")),
          Map("boundary" -> "administrative", "admin_level" -> "8",
            "name" -> s"flush_${ix}_$iy"))
        k += 1; ix += 1
      }
      iy += 1
    }
    Scene(nodes.toSeq, ways.toSeq, rels.toSeq)
  }
}
