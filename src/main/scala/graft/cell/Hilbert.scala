package graft.cell

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering for lake layout — the locality upgrade over
  * Z-order ([[ZOrder]], q92): the Hilbert curve visits every cell of a
  * 2^res × 2^res grid with UNIT steps (adjacent d ⇒ adjacent cells), so
  * equal-size key ranges cut files whose cell sets are tighter blobs
  * than Morton's Z-shaped jumps — smaller per-file bounding boxes, so a
  * bbox scan reads fewer files at the same file count. The price:
  * Hilbert keys are not corner-monotone, so a query bbox's containing
  * d-interval is not [d(corner), d(corner)] — pruning runs against
  * per-file min/max STATS (x/y bounds), exactly what a manifest or
  * parquet footer stores, rather than against a closed-form interval.
  *
  * The key transform is the classic bit-level state machine (the
  * public-domain xy2d of Warren's Hacker's Delight / the Wikipedia
  * Hilbert-curve reference implementation): per level s = n/2 … 1,
  * quadrant digit (3·rx) xor ry joins the key and the lower bits rotate
  * — res levels of pure integer CASE/mask arithmetic, expressed here
  * THREE times from one parametrization: a scalar kernel (specs), a
  * Column chain (whole-stage codegen, no UDF), and generated oracle SQL
  * (SparkEntry) — all pinned equal.
  */
object Hilbert {

  /** Scalar Hilbert index of (x, y) on the 2^res grid. */
  def d(res: Int, x0: Long, y0: Long): Long = {
    require(res >= 1 && res <= 16, s"res=$res outside [1, 16]")
    val n = 1L << res
    require(x0 >= 0 && x0 < n && y0 >= 0 && y0 < n, s"($x0, $y0) outside $n-grid")
    var x = x0; var y = y0; var out = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      out += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    out
  }

  /** Column form of [[d]]: res unrolled levels of CASE/mask arithmetic
    * over (xCol, yCol) — codegen'd, bit-identical to the scalar kernel
    * (pinned in ZOrderSpec).
    */
  def dCol(xCol: Column, yCol: Column, res: Int): Column = {
    require(res >= 1 && res <= 16, s"res=$res outside [1, 16]")
    val n = 1L << res
    var x = xCol; var y = yCol
    var out: Column = lit(0L)
    var s = n >> 1
    while (s > 0) {
      val rx = when(x.bitwiseAND(lit(s)) > 0, lit(3L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      out = out + lit(s * s) * rx.bitwiseXOR(ry)
      val flipX = when(x.bitwiseAND(lit(s)) > 0, lit(n - 1) - y).otherwise(y)
      val flipY = when(x.bitwiseAND(lit(s)) > 0, lit(n - 1) - x).otherwise(x)
      val nx = when(y.bitwiseAND(lit(s)) > 0, x).otherwise(flipX)
      val ny = when(y.bitwiseAND(lit(s)) > 0, y).otherwise(flipY)
      x = nx; y = ny
      s >>= 1
    }
    out
  }

  /** [[dCol]] as one materialized projection per level: `dCol`'s single
    * expression references the previous level's x/y three times each, so
    * its tree QUADRUPLES per level — at res 7 that is a ~16k-node
    * expression whose analysis + codegen dominated the whole query
    * (measured 16.7 s at sf0.1, all constant plan-compile cost). Leveled
    * projections keep every expression level-sized; CollapseProject
    * leaves them alone (the aliases are non-cheap and multiply
    * referenced), and whole-stage codegen fuses the chain into local
    * variables — same single narrow stage, linearly-sized code.
    * Expects columns `x`, `y`; adds `d`.
    */
  /** Decompose a query bbox into maximal CONTIGUOUS Hilbert index
    * ranges at `res` — the planner-side pruning primitive over a
    * Hilbert-laid-out table (q113's layout, q125's stats skipping): a
    * scan needs only the files whose [min_d, max_d] intersects one of
    * these ranges, and the Hilbert curve's locality makes the range
    * count far smaller than the cell count (a Z-order bbox shatters
    * into many more runs — that difference IS the case for Hilbert).
    *
    * Output (d_start, d_end, n_cells), one row per contiguous run.
    * Scale note: the window + sort here are over the QUERY BBOX's cells
    * — a planner-side constant bounded by the query, never corpus data
    * — so the single-partition window the repo bans from corpus plans
    * is the honest shape for this one.
    */
  def bboxRanges(spark: SparkSession, res: Int,
      x0: Long, x1: Long, y0: Long, y1: Long): DataFrame = {
    val n = 1L << res
    require(res >= 1 && res <= 16, s"res=$res outside [1, 16]")
    require(0 <= x0 && x0 <= x1 && x1 < n && 0 <= y0 && y0 <= y1 && y1 < n,
      s"bbox ($x0..$x1, $y0..$y1) outside the $n-grid")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
    // withD (one projection per level), NOT dCol: the single-expression
    // form quadruples per level and its analysis + codegen alone cost
    // ~3 s at res 6 on a 128-cell bbox — all constant plan-compile
    // time. The leveled form is pinned bit-identical in ZOrderSpec.
    spark.range(y0, y1 + 1).select(col("id").as("y"),
        explode(sequence(lit(x0), lit(x1))).as("x"))
      .transform(withD(_, res))
      .select(col("d"))
      .withColumn("grp", col("d") - row_number().over(w))
      .groupBy(col("grp"))
      .agg(min(col("d")).as("d_start"), max(col("d")).as("d_end"),
        count(lit(1)).as("n_cells"))
      .drop("grp")
  }

  def withD(df: DataFrame, res: Int): DataFrame = {
    require(res >= 1 && res <= 16, s"res=$res outside [1, 16]")
    val n = 1L << res
    var cur = df.withColumn("__hx", col("x"))
      .withColumn("__hy", col("y"))
      .withColumn("__hd", lit(0L))
    var s = n >> 1
    while (s > 0) {
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, lit(3L)).otherwise(lit(0L))
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val flipX = when(col("__hx").bitwiseAND(lit(s)) > 0, lit(n - 1) - col("__hy"))
        .otherwise(col("__hy"))
      val flipY = when(col("__hx").bitwiseAND(lit(s)) > 0, lit(n - 1) - col("__hx"))
        .otherwise(col("__hx"))
      val swap = col("__hy").bitwiseAND(lit(s)) > 0
      cur = cur.withColumns(Map(
        "__hd" -> (col("__hd") + lit(s * s) * rx.bitwiseXOR(ry)),
        "__hx" -> when(swap, col("__hx")).otherwise(flipX),
        "__hy" -> when(swap, col("__hy")).otherwise(flipY)))
      s >>= 1
    }
    cur.withColumn("d", col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** Per-file layout stats under Hilbert clustering: file = top
    * `prefixBits` of the 2·res-bit key; per file the row count, key
    * range, and the CELL BOUNDING BOX (the manifest stats bbox pruning
    * reads at scale — and the locality metric that beats Z-order).
    * Same shuffle shape as [[ZOrder.layoutStats]]: narrow key
    * derivation + one bounded groupBy.
    */
  def layoutStats(points: DataFrame, latCol: String, lonCol: String,
      res: Int, prefixBits: Int): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 2 * res,
      s"prefixBits=$prefixBits outside [1, ${2 * res}]")
    val x = ZOrder.cellXCol(col(lonCol), res)
    val y = ZOrder.cellYCol(col(latCol), res)
    withD(points.withColumn("x", x).withColumn("y", y), res)
      .withColumn("file_key", shiftright(col("d"), 2 * res - prefixBits))
      .groupBy("file_key")
      .agg(count(lit(1)).as("n_rows"), min("d").as("min_d"), max("d").as("max_d"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
  }
}
