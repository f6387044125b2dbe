package graft.cell

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for lake layout — the standard answer to
  * "how do I prune a 100 TB table by a 2-D predicate": interleave the bits
  * of the (x, y) cell coordinates so spatially-near rows get numerically
  * near keys, write files keyed by a z-prefix, and a bbox query touches
  * only files whose z-range intersects the bbox's z-interval. Everything
  * here is pure column arithmetic (shift/and/or — codegen'd, no UDF), so
  * the layout decision replays bit-exactly in the ANSI oracle.
  *
  * The containing z-interval of a cell rectangle is [morton(x0,y0),
  * morton(x1,y1)]: bit-spreading is strictly order-preserving per
  * coordinate, so z is monotone in x (y fixed) and in y (x fixed). The
  * interval is a superset (the classic BIGMIN refinement would split it);
  * pruning with it is conservative — never skips a needed file.
  *
  * Scale shape: key derivation is narrow; the per-file stats are ONE
  * groupBy on the prefix (bounded by 2^prefixBits rows); the clustered
  * write is one hash exchange on the prefix + per-file sort. No global
  * sort anywhere — the prefix IS the file assignment, so the layout needs
  * no rank/ntile window over the corpus.
  */
object ZOrder {

  /** Bit-spread of a 16-bit value into the even bit positions (scalar
    * kernel, mirrors [[spreadCol]] for specs).
    */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton interleave of two 16-bit coords: x in even bits, y in odd. */
  def morton(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Column form of [[spread]] — the same five mask steps as shift/and/or
    * column arithmetic (whole-stage codegen; replays verbatim in SQL).
    */
  def spreadCol(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Wide column spread: every bit of a 32-bit input to the even bit
    * positions of a 64-bit key (the standard 64-bit Morton mask ladder).
    * [[spreadCol]]'s 16-bit masks silently DROP bits 16+ — callers whose
    * axis quantization exceeds 16 bits (geohash p=8 carries 20 per axis)
    * must use this form.
    */
  def spreadCol64(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val d = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val e = d.bitwiseOR(shiftleft(d, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val f = e.bitwiseOR(shiftleft(e, 2)).bitwiseAND(lit(0x3333333333333333L))
    f.bitwiseOR(shiftleft(f, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Column Morton key of two cell-coordinate columns. */
  def mortonCol(x: Column, y: Column): Column =
    spreadCol(x).bitwiseOR(shiftleft(spreadCol(y), 1))

  /** Equal-angle cell x coordinate at `res` (same clamped-floor arithmetic
    * as [[CellIndex]] / the q11 oracle).
    */
  def cellXCol(lon: Column, res: Int): Column = {
    // res > 16 would exceed spread's 16-bit mask: coords would WRAP, and
    // wrapped z keys break the corner-monotonicity pruning relies on —
    // silently dropping rows, the one failure a guard must make loud
    require(res >= 1 && res <= 16, s"res=$res outside [1, 16]")
    val n = (1L << res).toDouble
    least(greatest(floor((lon + lit(180.0)) / lit(360.0) * lit(n)).cast("long"),
      lit(0L)), lit((1L << res) - 1L))
  }

  def cellYCol(lat: Column, res: Int): Column = {
    require(res >= 1 && res <= 16, s"res=$res outside [1, 16]")
    val n = (1L << res).toDouble
    least(greatest(floor((lat + lit(90.0)) / lit(180.0) * lit(n)).cast("long"),
      lit(0L)), lit((1L << res) - 1L))
  }

  /** Morton key of a (lat, lon) pair at `res` (2·res bits). */
  def zCol(lat: Column, lon: Column, res: Int): Column =
    mortonCol(cellXCol(lon, res), cellYCol(lat, res))

  /** File key = top `prefixBits` bits of the z key: the deterministic,
    * data-independent file assignment (≤ 2^prefixBits files).
    */
  def zFileCol(z: Column, res: Int, prefixBits: Int): Column = {
    require(prefixBits >= 1 && prefixBits <= 2 * res,
      s"prefixBits=$prefixBits outside [1, ${2 * res}]")
    shiftright(z, 2 * res - prefixBits)
  }

  /** Per-file layout stats + bbox pruning verdict: for each z-prefix file,
    * its row count and exact z-range, and whether a scan for the given
    * cell rectangle must read it (z-range intersects the bbox's
    * containing z-interval). This is the pruning decision a manifest
    * (or parquet footer min/max) answers at scale — computed here as one
    * narrow map + one bounded groupBy.
    */
  def layoutStats(points: DataFrame, latCol: String, lonCol: String,
      res: Int, prefixBits: Int,
      qx0: Long, qy0: Long, qx1: Long, qy1: Long): DataFrame = {
    require(qx0 <= qx1 && qy0 <= qy1, s"bbox corners out of order")
    val zLo = morton(qx0, qy0)
    val zHi = morton(qx1, qy1)
    val z = zCol(col(latCol), col(lonCol), res)
    points
      .withColumn("z", z)
      .withColumn("file_key", zFileCol(col("z"), res, prefixBits))
      .groupBy("file_key")
      .agg(count(lit(1)).as("n_rows"), min("z").as("min_z"), max("z").as("max_z"))
      .withColumn("scanned", col("min_z") <= lit(zHi) && col("max_z") >= lit(zLo))
  }

  /** Physically write `df` z-clustered: one hash exchange on the file key,
    * rows sorted by z inside each file, `partitionBy(z_file)` so a bbox
    * read prunes statically on the partition column. The spec pins the
    * pruned plan; at cluster scale the same layout prunes via the
    * manifest instead of directory listing.
    */
  def clusteredWrite(df: DataFrame, latCol: String, lonCol: String,
      res: Int, prefixBits: Int, path: String): Unit = {
    val z = zCol(col(latCol), col(lonCol), res)
    df.withColumn("z", z)
      .withColumn("z_file", zFileCol(col("z"), res, prefixBits))
      .repartition(col("z_file"))
      .sortWithinPartitions("z")
      .write.partitionBy("z_file").mode("overwrite").parquet(path)
  }
}
