package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact contingency-table statistics — the χ² independence pieces a
  * curation pipeline uses to test whether two categorical attributes
  * (language × license, event type × daypart) are associated before
  * trusting a stratified sample.
  */
object Contingency {

  /** χ² sufficient statistics per OBSERVED cell of the (a, b)
    * contingency table, all integer: (a, b, n, r, c, total, dev_num,
    * dev_den) with dev_num = n·N − r·c and dev_den = N·r·c, so the cell
    * contribution is dev_num²/dev_den and χ² = Σ over cells — no
    * division or float anywhere. Cells with zero count don't appear
    * (they contribute r·c/N... via the expected term; the standard
    * observed-cells decomposition is what a consumer reconstructs —
    * both engines agree by construction). Shape: three hash
    * aggregations (cell, row, column) + one broadcast single-row total;
    * keys are the categorical values, never skewed beyond category
    * cardinality.
    */
  def chiSqPieces(df: DataFrame): DataFrame = {
    val cells = df.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val rs = cells.groupBy(col("a")).agg(sum(col("n")).as("r"))
    val cs = cells.groupBy(col("b")).agg(sum(col("n")).as("c"))
    val tot = cells.agg(sum(col("n")).as("total"))
    cells.join(rs, Seq("a")).join(cs, Seq("b")).crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("n"), col("r"), col("c"), col("total"),
        (col("n") * col("total") - col("r") * col("c")).as("dev_num"),
        (col("total") * col("r") * col("c")).as("dev_den"))
  }
}
