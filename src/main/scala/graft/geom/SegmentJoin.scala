package graft.geom

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-layer overlay: which segments of layer A intersect which segments
  * of layer B — the vector-overlay complement of the polygon-overlap join
  * (q88) for road/boundary/track layers. Reference scope: the reference
  * engine stitches ways into rings (converter.rs:35-105) but never asks
  * segment-level questions; this is the operator a crawl of geotagged
  * imagery needs to relate GPS tracks to boundary edges at 100 TB.
  *
  * Exactness: endpoints are integer (decimicro-style) coordinates and the
  * predicate is the classic four-orientation test with collinear on-segment
  * checks, evaluated in pure BIGINT column arithmetic — cross products of
  * coordinate deltas, no floats, no UDF — so DuckDB replays it bit-exactly
  * and the result is DEFINED by integer signs, not by epsilon.
  *
  * Scale shape: each segment explodes to the grid cells its bbox covers
  * (bounded by ceil(len/cell)+1 per axis — a constant for bounded-length
  * segments), candidates meet in an equi-join on the cell key, and the
  * duplicate candidates a pair produces in every shared cell are eliminated
  * WITHOUT a shuffle by the reference-point rule: a pair is kept only in
  * the single canonical cell holding the top-left corner of the two
  * bboxes' intersection (Patel & DeWitt's PBSM dedup). The exact predicate
  * then runs on candidates only. Plan: two narrow explodes, one shuffle
  * (the cell equi-join), zero dedup exchanges.
  */
object SegmentJoin {

  /** Inclusive intersection (touching endpoints count, collinear overlap
    * counts) of `a` × `b`, both with columns (id, x1, y1, x2, y2) as
    * BIGINTs. Coordinates must keep cross products in range: |coord| <
    * 2^30 guarantees (2^31)^2 < 2^63. Returns distinct (a_id, b_id).
    */
  def intersectingPairs(a: DataFrame, b: DataFrame, cellSize: Long): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    def prep(df: DataFrame, p: String): DataFrame = {
      val minx = least(col("x1"), col("x2"))
      val maxx = greatest(col("x1"), col("x2"))
      val miny = least(col("y1"), col("y2"))
      val maxy = greatest(col("y1"), col("y2"))
      df.select(
          col("id").as(s"${p}_id"),
          col("x1").as(s"${p}x1"), col("y1").as(s"${p}y1"),
          col("x2").as(s"${p}x2"), col("y2").as(s"${p}y2"),
          floorDiv(minx, cellSize).as(s"${p}cx0"),
          floorDiv(maxx, cellSize).as(s"${p}cx1"),
          floorDiv(miny, cellSize).as(s"${p}cy0"),
          floorDiv(maxy, cellSize).as(s"${p}cy1"))
        .withColumn("cx", explode(sequence(col(s"${p}cx0"), col(s"${p}cx1"))))
        .withColumn("cy", explode(sequence(col(s"${p}cy0"), col(s"${p}cy1"))))
    }
    val ca = prep(a, "a")
    val cb = prep(b, "b")
    val joined = ca.join(cb, Seq("cx", "cy"))
      // reference-point dedup: keep the pair only in the canonical cell of
      // the bbox intersection (cells meet in the join, so the overlap cell
      // range is non-empty for every surviving row)
      .filter(col("cx") === greatest(col("acx0"), col("bcx0")) &&
        col("cy") === greatest(col("acy0"), col("bcy0")))
    joined.filter(segIntersects(
        col("ax1"), col("ay1"), col("ax2"), col("ay2"),
        col("bx1"), col("by1"), col("bx2"), col("by2")))
      .select(col("a_id"), col("b_id"))
  }

  private def floorDiv(c: org.apache.spark.sql.Column, d: Long) =
    // floor division for possibly-negative coordinates; exact through a
    // double because the contract bounds |coord| < 2^30 << 2^53
    floor(c.cast("double") / d).cast("long")

  /** Ring-simplicity audit: every edge pair within a ring that violates
    * simple-polygon topology — the QA gate between ring assembly and the
    * `.poly`/GeoJSON sinks (the reference stitches rings,
    * converter.rs:35-105, but never validates them). Input `edges`:
    * (ring_id, idx, n, x1, y1, x2, y2) with idx ∈ [0, n) in ring order
    * and no zero-length edges. Flags:
    *  - NON-ADJACENT pairs that intersect at all (a shared point is a
    *    pinch, a crossing is a bowtie — both break simplicity);
    *  - ADJACENT pairs (idx j = i+1, or the (0, n−1) wrap) that overlap
    *    COLLINEARLY beyond their shared vertex (a spike): with shared
    *    vertex M between P→M and M→Q, flagged iff orient(P,M,Q) = 0 and
    *    (P−M)·(Q−M) > 0. Touching at M alone is what a ring IS.
    * Same plan as [[intersectingPairs]]: cell explode, equi-join on
    * (cell, ring_id), reference-point dedup, exact BIGINT predicate.
    * Returns (ring_id, i, j) with i < j.
    */
  def selfIntersections(edges: DataFrame, cellSize: Long): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    def prep(p: String): DataFrame = {
      val minx = least(col("x1"), col("x2"))
      val maxx = greatest(col("x1"), col("x2"))
      val miny = least(col("y1"), col("y2"))
      val maxy = greatest(col("y1"), col("y2"))
      edges.select(
          col("ring_id"),
          col("idx").as(s"${p}i"), col("n").as(s"${p}n"),
          col("x1").as(s"${p}x1"), col("y1").as(s"${p}y1"),
          col("x2").as(s"${p}x2"), col("y2").as(s"${p}y2"),
          floorDiv(minx, cellSize).as(s"${p}cx0"),
          floorDiv(maxx, cellSize).as(s"${p}cx1"),
          floorDiv(miny, cellSize).as(s"${p}cy0"),
          floorDiv(maxy, cellSize).as(s"${p}cy1"))
        .withColumn("cx", explode(sequence(col(s"${p}cx0"), col(s"${p}cx1"))))
        .withColumn("cy", explode(sequence(col(s"${p}cy0"), col(s"${p}cy1"))))
    }
    val joined = prep("a").join(prep("b"), Seq("cx", "cy", "ring_id"))
      .filter(col("ai") < col("bi"))
      .filter(col("cx") === greatest(col("acx0"), col("bcx0")) &&
        col("cy") === greatest(col("acy0"), col("bcy0")))
    val succAdj = col("bi") === col("ai") + 1
    val wrapAdj = col("ai") === 0 && col("bi") === col("an") - 1
    // spike test around the shared vertex M: P→M then M→Q retraces
    def spike(px: org.apache.spark.sql.Column, py: org.apache.spark.sql.Column,
        mx: org.apache.spark.sql.Column, my: org.apache.spark.sql.Column,
        qx: org.apache.spark.sql.Column, qy: org.apache.spark.sql.Column) =
      ((mx - px) * (qy - py) - (my - py) * (qx - px)) === 0 &&
        ((px - mx) * (qx - mx) + (py - my) * (qy - my)) > 0
    val verdict =
      when(succAdj, spike(col("ax1"), col("ay1"), col("ax2"), col("ay2"),
        col("bx2"), col("by2")))
      .when(wrapAdj, spike(col("bx1"), col("by1"), col("bx2"), col("by2"),
        col("ax2"), col("ay2")))
      .otherwise(segIntersects(
        col("ax1"), col("ay1"), col("ax2"), col("ay2"),
        col("bx1"), col("by1"), col("bx2"), col("by2")))
    joined.filter(verdict)
      .select(col("ring_id"), col("ai").as("i"), col("bi").as("j"))
  }

  /** sign((b-a) × (p-a)) as a BIGINT column: +1 left, -1 right, 0 collinear. */
  private def orient(ax: org.apache.spark.sql.Column, ay: org.apache.spark.sql.Column,
      bx: org.apache.spark.sql.Column, by: org.apache.spark.sql.Column,
      px: org.apache.spark.sql.Column, py: org.apache.spark.sql.Column) =
    signum((bx - ax) * (py - ay) - (by - ay) * (px - ax)).cast("long")

  /** collinear p on segment (a,b): bbox containment suffices. */
  private def onSeg(ax: org.apache.spark.sql.Column, ay: org.apache.spark.sql.Column,
      bx: org.apache.spark.sql.Column, by: org.apache.spark.sql.Column,
      px: org.apache.spark.sql.Column, py: org.apache.spark.sql.Column) =
    px.between(least(ax, bx), greatest(ax, bx)) &&
      py.between(least(ay, by), greatest(ay, by))

  /** The inclusive segment-intersection predicate as a pure Column. */
  def segIntersects(ax1: org.apache.spark.sql.Column, ay1: org.apache.spark.sql.Column,
      ax2: org.apache.spark.sql.Column, ay2: org.apache.spark.sql.Column,
      bx1: org.apache.spark.sql.Column, by1: org.apache.spark.sql.Column,
      bx2: org.apache.spark.sql.Column, by2: org.apache.spark.sql.Column) = {
    val d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    val d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    val d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    val d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    (d1 * d2 < 0 && d3 * d4 < 0) ||
      (d1 === 0 && onSeg(ax1, ay1, ax2, ay2, bx1, by1)) ||
      (d2 === 0 && onSeg(ax1, ay1, ax2, ay2, bx2, by2)) ||
      (d3 === 0 && onSeg(bx1, by1, bx2, by2, ax1, ay1)) ||
      (d4 === 0 && onSeg(bx1, by1, bx2, by2, ax2, ay2))
  }
}
