package graft.emit

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** Shortest-round-trip decimal rendering of f32, matching Rust's
  * `Display for f32` (used by the reference's `.poly` writer at
  * `/root/reference/src/output/file_writer_poly.rs:20` via `format!("{}")`).
  *
  * JDK 17's `Float.toString` predates the shortest-repr rewrite (JDK 19) and
  * always emits a trailing ".0" for integral values where Rust prints "1", so
  * we do it ourselves: round the exact binary value to p significant digits
  * for p = 1..9 and return the first candidate that parses back to the same
  * f32 bits. Rounding the exact value half-even to p digits yields the
  * nearest p-digit decimal, so the first p that round-trips is the shortest —
  * the same contract as Rust's Grisu/Ryū output. Decimal notation only
  * (lat/lon magnitudes never hit Rust's exponent thresholds; guarded anyway).
  */
object FloatFmt {
  def fmtF32(f: Float): String = {
    if (f.isNaN) return "NaN"
    if (f == Float.PositiveInfinity) return "inf"
    if (f == Float.NegativeInfinity) return "-inf"
    if (f == 0.0f) return if ((java.lang.Float.floatToRawIntBits(f) >>> 31) == 1) "-0" else "0"
    val exact = new JBigDecimal(f.toDouble) // exact binary expansion
    var p = 1
    while (p <= 10) {
      val cand = exact.round(new MathContext(p, RoundingMode.HALF_EVEN)).stripTrailingZeros()
      if (cand.floatValue() == f) {
        return cand.toPlainString
      }
      p += 1
    }
    exact.stripTrailingZeros().toPlainString
  }
}
