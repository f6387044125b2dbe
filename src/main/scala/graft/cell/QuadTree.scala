package graft.cell

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive quadtree partitioning over a point table — the layout
  * primitive that turns a SKEWED spatial corpus into balanced files:
  * where a fixed grid (Z-order/Hilbert at one resolution) leaves hot
  * cells million-row heavy and empty cells everywhere else, the
  * quadtree splits exactly the cells that are over capacity and stops
  * everywhere else (the "adaptive binning" step of a 10^12-image
  * geo-layout, and the classic PR-quadtree bulk load — Samet 1984).
  *
  * Semantics: points live in [0, 2^res)²; the root (level 0) covers the
  * whole domain; any node holding more than `cap` points splits into
  * its 4 children until `cap` is met or `maxDepth` is reached. Leaves
  * are the non-empty nodes that stop. Because a node's count is the sum
  * of its descendants', "every ancestor over cap" reduces to "the
  * immediate parent is over cap" — so the whole tree is CLOSED FORM,
  * no driver loop: one point-sized aggregation to level-`maxDepth`
  * counts (eagerly checkpointed — the only corpus-sized exchange),
  * then one cell-sized rollup per level and a broadcast parent join
  * per level for the leaf filter. At 100 TB the point table is huge
  * but every post-base frame is bounded by the number of OCCUPIED
  * cells at maxDepth.
  */
object QuadTree {

  /** Quadtree leaves of `points` (columns x, y — integers in
    * [0, 2^res)): (level, qx, qy, n) where (qx, qy) indexes the cell at
    * `level` (cell side 2^(res−level)). Out-of-domain coordinates fail
    * IN-PLAN via raise_error (filter pushdown can't skip the guard).
    * Invariants: leaves are disjoint, cover every point (Σn = points),
    * every leaf above `maxDepth` holds ≤ cap, every non-root leaf's
    * parent held > cap.
    */
  def leaves(points: DataFrame, res: Int, cap: Long, maxDepth: Int): DataFrame = {
    require(res >= 1 && res <= 31, s"res=$res out of [1, 31]")
    require(maxDepth >= 0 && maxDepth <= res, s"maxDepth=$maxDepth out of [0, res]")
    require(cap > 0, s"cap=$cap must be positive")
    val lim = 1L << res
    def guarded(c: String) =
      when(col(c) >= 0 && col(c) < lim, col(c).cast("long"))
        .otherwise(raise_error(concat(
          lit(s"QuadTree.leaves: $c out of [0, $lim): "), col(c))).cast("long"))
    val d = maxDepth
    // the ONE point-sized exchange: counts at the deepest level
    val base = points
      .select(shiftright(guarded("x"), res - d).as("qx"),
        shiftright(guarded("y"), res - d).as("qy"))
      .groupBy(col("qx"), col("qy")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    // cell-sized rollup of the checkpointed base to any level
    def lvl(l: Int): DataFrame =
      if (l == d) base
      else base.groupBy(shiftright(col("qx"), d - l).as("qx"),
          shiftright(col("qy"), d - l).as("qy"))
        .agg(sum(col("n")).as("n"))
    val parts = (0 to d).map { l =>
      val c = lvl(l)
      // at maxDepth a node stays a leaf even over cap (depth-capped)
      if (l == 0) { if (d == 0) c else c.filter(col("n") <= cap) }
      else {
        val par = broadcast(lvl(l - 1)
          .filter(col("n") > cap)
          .select(col("qx").as("px"), col("qy").as("py")))
        c.join(par, shiftright(col("qx"), 1) === col("px") &&
            shiftright(col("qy"), 1) === col("py"))
          .filter(col("n") <= cap || lit(l == d))
          .select(col("qx"), col("qy"), col("n"))
      }
    }
    parts.zipWithIndex
      .map { case (df, l) => df.select(lit(l).as("level"),
        col("qx"), col("qy"), col("n")) }
      .reduce(_.unionByName(_))
  }
}
