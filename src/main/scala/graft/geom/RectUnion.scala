package graft.geom

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact union-of-rectangles area per zone — the classic sweep/strip
  * decomposition made relational: within each zone, the distinct x
  * boundaries of its rectangles cut the axis into vertical strips;
  * because strips never cross a boundary, a rectangle covers a strip
  * all-or-nothing, so per (zone, strip) the union reduces to a 1-D
  * interval union of the covering rectangles' y-extents (the
  * gaps-and-islands rollup [[graft.stats.Series.intervalUnion]] runs on
  * time ranges — the same island arithmetic on y ranges here), and the
  * union area is Σ strip_width · covered_y. All integer, so the result
  * is exact under any overlap/containment/duplicate pattern — the
  * coverage-accounting primitive (how much ground do these bounding
  * boxes actually cover?) that double-counting Σ w·h gets wrong.
  *
  * Scale shape: every window partitions by zone (boundary lists and
  * strip×rect fan-outs are zone-bounded, never corpus-wide); the
  * strip–rect pairing is a zone-keyed equi-join with a range residual.
  * A zone's boundary set is O(its rectangle count) — the operator's
  * contract is per-zone decomposition, exactly how a planetary tiling
  * runs it (zone = cell), so no global coordinate compression ever
  * happens.
  */
object RectUnion {

  /** `rects`: (zone, x0, x1, y0, y1) integer half-open boxes
    * (x0 < x1, y0 < y1). Returns (zone, n_rects, area).
    */
  def areaByZone(spark: SparkSession, rects: DataFrame): DataFrame = {
    val r = rects.select(col("zone").cast("long").as("zone"),
      col("x0").cast("long").as("x0"), col("x1").cast("long").as("x1"),
      col("y0").cast("long").as("y0"), col("y1").cast("long").as("y1"))
    val checked = r.withColumn("x0",
      when(col("x0") < col("x1") && col("y0") < col("y1"), col("x0"))
        .otherwise(raise_error(concat(lit("RectUnion: degenerate box in zone "),
          col("zone").cast("string"))).cast("long")))
    val bounds = checked.select(col("zone"), col("x0").as("x"))
      .unionByName(checked.select(col("zone"), col("x1").as("x")))
      .distinct()
    val wz = Window.partitionBy(col("zone")).orderBy(col("x"))
    val strips = bounds
      .withColumn("ex", lead(col("x"), 1).over(wz))
      .filter(col("ex").isNotNull)
      .select(col("zone"), col("x").as("sx"), col("ex"))
    // all-or-nothing coverage: rect covers strip iff x0 <= sx < x1
    val covering = strips.join(checked, Seq("zone"))
      .filter(col("x0") <= col("sx") && col("x1") >= col("ex"))
      .select(col("zone"), col("sx"), col("ex"),
        col("y0").as("s"), col("y1").as("e"))
    // island arithmetic per (zone, strip) — running max-end breaks
    val w = Window.partitionBy(col("zone"), col("sx"))
      .orderBy(col("s"), col("e"))
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    val covered = covering
      .withColumn("pmax", max(col("e")).over(prev))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("zone"), col("sx"), col("ex"), col("island"))
      .agg(min(col("s")).as("is_"), max(col("e")).as("ie"))
      .groupBy(col("zone"), col("sx"), col("ex"))
      .agg(sum(col("ie") - col("is_")).as("cov"))
    val area = covered
      .groupBy(col("zone"))
      .agg(sum((col("ex") - col("sx")) * col("cov")).as("area"))
    checked.groupBy(col("zone")).agg(count(lit(1)).as("n_rects"))
      .join(area, Seq("zone"), "left")
      .select(col("zone"), col("n_rects"),
        coalesce(col("area"), lit(0L)).as("area"))
  }
}
