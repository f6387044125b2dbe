package graft.cell

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geohash cell naming (Niemeyer 2008, public domain): the base32
  * string form of the lon-first interleaved lat/lon quantization — the
  * third cell-naming scheme next to quadkeys (q78, Bing) and raw Morton
  * keys (q92), and the one most geo APIs exchange. A geohash prefix IS
  * a cell containment relation, so equality joins on truncated hashes
  * are grid joins — same machinery as CellIndex, different wire format.
  *
  * Pure column arithmetic end to end: quantize each axis to `5p/2`
  * bits, spread with the WIDE Morton masks ([[ZOrder.spreadCol64]] —
  * p=8 quantizes 20 bits per axis, past spreadCol's 16-bit masks; lon
  * lands on the odd bit positions because geohash starts with a
  * LONGITUDE bit at the MSB), then emit `p` base32 digits by 5-bit
  * slices. No UDF, codegen-friendly, SQL-replayable.
  */
object Geohash {

  val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Scalar reference (specs): standard geohash of precision `p` chars
    * (even `p` only — odd precisions split a bit across axes, which the
    * column form deliberately avoids; p ∈ {2, 4, 6, 8}).
    */
  def encode(lat: Double, lon: Double, p: Int): String = {
    require(p >= 2 && p <= 8 && p % 2 == 0, s"p=$p not an even precision in [2, 8]")
    val bitsPerAxis = 5 * p / 2
    val n = 1L << bitsPerAxis
    def q(v: Double, lo: Double, hi: Double): Long =
      math.min(n - 1, math.max(0L, math.floor((v - lo) / (hi - lo) * n).toLong))
    val lonQ = q(lon, -180, 180)
    val latQ = q(lat, -90, 90)
    var v = 0L
    for (j <- bitsPerAxis - 1 to 0 by -1)
      v = (v << 2) | (((lonQ >> j) & 1L) << 1) | ((latQ >> j) & 1L)
    (0 until p).map(k => Base32(((v >> (5 * (p - 1 - k))) & 31L).toInt)).mkString
  }

  /** Column form of [[encode]], bit-identical (pinned in ZOrderSpec). */
  def geohashCol(latCol: Column, lonCol: Column, p: Int): Column = {
    require(p >= 2 && p <= 8 && p % 2 == 0, s"p=$p not an even precision in [2, 8]")
    val bitsPerAxis = 5 * p / 2
    val n = (1L << bitsPerAxis).toDouble
    def q(c: Column, lo: Double, hi: Double): Column =
      least(lit((1L << bitsPerAxis) - 1),
        greatest(lit(0L), floor((c - lo) / (hi - lo) * n).cast("long")))
    val v = shiftleft(ZOrder.spreadCol64(q(lonCol, -180, 180)), 1)
      .bitwiseOR(ZOrder.spreadCol64(q(latCol, -90, 90)))
    val chars = array(Base32.map(ch => lit(ch.toString)): _*)
    concat((0 until p).map(k =>
      element_at(chars,
        (shiftright(v, 5 * (p - 1 - k)).bitwiseAND(lit(31L)) + 1).cast("int"))): _*)
  }
}
