package graft.lineage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-skew diagnostics — the report that decides whether a join/groupBy
  * key needs salting BEFORE the job OOMs: per-key counts, discrete p50 /
  * p99 of the count distribution, the max/median skew ratio, and the salt
  * factor that would level the heaviest key to the median.
  *
  * Scale shape matters here more than anywhere: per-key counts are one
  * groupBy (the same shuffle the diagnosed job would do), but the
  * quantiles come from the HISTOGRAM OF COUNTS — `counts.groupBy(count)`
  * — whose size is bounded by the number of DISTINCT frequency values
  * (≤ √(2·rows) by sum bound), so the only window in the plan runs over
  * that tiny table, never over the key set. A row_number over millions of
  * distinct keys would itself be the single-partition bottleneck this
  * report exists to prevent.
  *
  * Everything is integer arithmetic (discrete quantiles, div-based
  * ratios), so the report hash-replays in the ANSI oracle (q98).
  */
object Skew {

  /** One-row report over `df`'s `key` column: n_keys, n_rows, max_count,
    * p50_count, p99_count (discrete: smallest count c with
    * #{keys: count ≤ c} ≥ ceil(q·n_keys)), skew_ratio_x100 =
    * (max·100) div p50, suggested_salt = ceil(max / p50).
    */
  def keyReport(df: DataFrame, key: Column): DataFrame = {
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
    val hist = counts.groupBy("c").agg(count(lit(1)).as("freq"))
    val cum = hist.withColumn("cum",
      sum("freq").over(Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cum.agg(
      sum("freq").as("n_keys"),
      sum(col("c") * col("freq")).cast("long").as("n_rows"),
      max("c").as("max_count"))
    val p = cum.crossJoin(broadcast(tot))
      .agg(
        min(when(col("cum") * 2 >= col("n_keys"), col("c"))).as("p50_count"),
        min(when(col("cum") * 100 >= col("n_keys") * 99, col("c"))).as("p99_count"))
    broadcast(tot).crossJoin(p)
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        col("p50_count"), col("p99_count"),
        expr("(max_count * 100L) div p50_count").as("skew_ratio_x100"),
        expr("(max_count + p50_count - 1L) div p50_count").as("suggested_salt"))
  }
}
