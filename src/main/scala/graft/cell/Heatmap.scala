package graft.cell

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-resolution heatmap pyramid — per-cell point counts at every
  * grid level 0..res, the density layer behind every map viewport and
  * the spatial analogue of a tile pyramid's mip chain.
  *
  * Scale shape — aggregate the AGGREGATE, never re-scan the corpus: the
  * corpus is touched exactly once (the finest-level groupBy, keyed on
  * cell — uniform for any non-adversarial point set); every coarser
  * level halves the previous level's GRID-SIZED counts (cx div 2,
  * cy div 2 — exactly [[CellIndex.parent]]) with a shuffle bounded by
  * 4^r rows. Exactness: floor composition makes the halved count equal
  * the direct count at the coarser level — floor(v·2^(r-1)) =
  * floor(floor(v·2^r)/2), and the edge clamp commutes with halving
  * ((2^r−1) div 2 = 2^(r-1)−1) — so every level is exact, not an
  * approximation of the finest one.
  */
object Heatmap {

  /** (res, cell, n) for every occupied cell at every level 0..res.
    * `points` needs (lat, lon).
    */
  def pyramid(spark: SparkSession, points: DataFrame, res: Int): DataFrame = {
    require(res >= 0 && res <= CellIndex.MaxRes, s"res=$res")
    val mask29 = (1L << 29) - 1L
    var lvl = points
      .select(graft.functions.GraftFunctions.cellOfCol(col("lat"), col("lon"), res).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
    var acc = lvl.withColumn("res", lit(res))
    var r = res - 1
    while (r >= 0) {
      val cx = shiftright(col("cell"), 29).bitwiseAND(lit(mask29))
      val cy = col("cell").bitwiseAND(lit(mask29))
      lvl = lvl
        .select((lit(r.toLong << 58) + shiftleft(shiftright(cx, 1), 29) +
          shiftright(cy, 1)).as("cell"), col("n"))
        .groupBy(col("cell")).agg(sum(col("n")).as("n"))
      acc = acc.unionByName(lvl.withColumn("res", lit(r)))
      r -= 1
    }
    acc.select(col("res"), col("cell"), col("n"))
  }
}
