package graft.geom

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverse-distance-weighted spatial interpolation (Shepard 1968), in
  * the EXACT integer form both engines can agree on bit-for-bit: for
  * each target, the samples within squared radius d² contribute weight
  * w = d² − dist² (the linear-decay kernel — the exact surrogate for
  * 1/dᵖ, which would drag floats and an undefined value at dist 0 into
  * the operator). Emits per target the neighbor count and the rational
  * estimate's two integers: `num` = Σ v·w and `den` = Σ w; consumers
  * divide at the edge or compare num·den' vs num'·den exactly. Targets
  * with no sample in radius keep (0, 0, 0) — "no data", not an error.
  *
  * Scale shape — the [[PointPattern]] discipline, asymmetric: samples
  * are binned ONCE to cells of pitch ceil(√d²), targets scatter to
  * their 3×3 cell neighborhood (narrow, ×9), ONE cell-keyed hash
  * equi-join, the exact dist² ≤ d² filter, one aggregation per target,
  * and a left join back so empty targets survive. Work is
  * Σ_cell |targets(cell)|·|samples(3×3 ring)| — never targets×samples.
  *
  * Overflow is closed out the PointPattern way: |x|, |y| < 2³¹ and
  * |v| < 2²⁰ are enforced IN-PLAN (raise_error conjuncts survive
  * pushdown), d² ≤ 2⁴⁰ by require — so dist² < 2⁴³ and every v·w term
  * is below 2⁶⁰.
  */
object Idw {

  private val CoordBound = 1L << 31
  private val ValueBound = 1L << 20
  private val MaxD2 = 1L << 40

  private def guarded(c: String, bound: Long) =
    when(abs(col(c)) < bound, col(c).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"Idw: |$c| >= $bound overflows the exact kernel at id "),
        col("id"))).cast("long"))

  /** `targets` (id, x, y) interpolated from `samples` (id, x, y, v):
    * one row per target — (id, n_nbrs, num, den).
    */
  def interpolate(targets: DataFrame, samples: DataFrame, d2: Long): DataFrame = {
    require(d2 > 0 && d2 <= MaxD2, s"d2=$d2 out of (0, 2^40]")
    val cell = math.max(1L, math.ceil(math.sqrt(d2.toDouble)).toLong)
    def binned(df: DataFrame): DataFrame = df
      .withColumn("cx", floor(col("x").cast("double") / cell.toDouble).cast("long"))
      .withColumn("cy", floor(col("y").cast("double") / cell.toDouble).cast("long"))
    val build = binned(samples.select(col("id").cast("long").as("id"),
        guarded("x", CoordBound).as("x"), guarded("y", CoordBound).as("y"),
        guarded("v", ValueBound).as("v")))
      .select(col("x").as("xb"), col("y").as("yb"), col("v"),
        col("cx"), col("cy"))
    val t = targets.select(col("id").cast("long").as("id"),
      guarded("x", CoordBound).as("x"), guarded("y", CoordBound).as("y"))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val probe = binned(t)
      .select(col("id"), col("x").as("xa"), col("y").as("ya"),
        explode(array(offsets.map { case (dx, dy) =>
          struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
        }: _*)).as("n"))
      .select(col("id"), col("xa"), col("ya"), col("n.cx"), col("n.cy"))
    val dist2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    val w = lit(d2) - col("dist2")
    val agg = probe.join(build, Seq("cx", "cy"))
      .select(col("id"), col("v"), dist2.as("dist2"))
      .filter(col("dist2") <= d2)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_nbrs"),
        sum(col("v") * w).as("num"),
        sum(w).as("den"))
    t.select(col("id")).join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_nbrs"), lit(0L)).as("n_nbrs"),
        coalesce(col("num"), lit(0L)).as("num"),
        coalesce(col("den"), lit(0L)).as("den"))
  }
}
