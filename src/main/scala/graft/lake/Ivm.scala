package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance over a [[SnapshotTable.changes]] feed:
  * keep a (count, sum) aggregate current by applying the changelog delta
  * instead of recomputing the table — O(|delta| + |groups|) work per
  * refresh against O(table) for the rescan, which is the entire point of
  * maintaining a changelog on a 10^12-row corpus (a daily merge touches
  * thousandths of the table; the dashboard over it shouldn't re-read
  * 100 TB).
  *
  * (count, sum) is the self-maintainable core: avg derives from it, and
  * the same signed-delta shape extends to any abelian-group aggregate.
  * MIN/MAX are deliberately out — a delete can invalidate them without
  * the delta containing the new extremum (they need the rescan).
  */
object Ivm {

  /** Apply `changes` (columns `_change_type`, groupCol, valueCol — the
    * [[SnapshotTable.changes]] shape) to `prev` (columns groupCol, `cnt`,
    * `sm`). Inserts and update_post rows add; deletes and update_pre rows
    * subtract — an update thus contributes exactly its value difference.
    * Groups whose maintained count reaches zero leave the view; groups
    * first seen in the delta enter it. Plan: one delta-sized aggregation,
    * one full-outer merge join on the group key.
    */
  def maintainSumCount(prev: DataFrame, changes: DataFrame,
      groupCol: String, valueCol: String): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_post"), 1L)
      .when(col("_change_type").isin("delete", "update_pre"), -1L)
      .otherwise(lit(null).cast("long")) // unknown op: poison, fail loudly below
    val delta = changes
      .select(col(groupCol), sign.as("__sign"), col(valueCol).as("__v"))
      .groupBy(col(groupCol))
      .agg(sum(col("__sign")).as("__dc"),
        sum(col("__sign") * col("__v")).as("__ds"),
        sum(when(col("__sign").isNull, 1L).otherwise(0L)).as("__bad"))
    val merged = prev.join(delta, Seq(groupCol), "full_outer")
    // a silent NULL sign would corrupt the view forever — refuse IN-PLAN
    // (raise_error inside the final filter, which no consumer can prune),
    // so the function composes lazily and the delta is aggregated and
    // joined exactly once per refresh instead of once for an eager check
    // and again for the returned plan
    // guardZero is 0 on clean groups and raises otherwise; ADDING it into
    // the filter's comparison (rather than And-ing a separate conjunct)
    // makes every row evaluate the guard — conjuncts can be split and
    // reordered by the optimizer, arithmetic operands cannot
    val guardZero = when(coalesce(col("__bad"), lit(0L)) === 0, lit(0L))
      .otherwise(raise_error(concat(
        lit("changes feed contains an unknown _change_type for group "),
        col(groupCol).cast("string"))).cast("long"))
    merged.select(col(groupCol), col("__bad"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dc"), lit(0L))).as("cnt"),
        (coalesce(col("sm"), lit(0L)) + coalesce(col("__ds"), lit(0L))).as("sm"))
      .filter(col("cnt") + guardZero > 0)
      .select(col(groupCol), col("cnt"), col("sm"))
  }
}
