package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream interval join (the remaining Structured Streaming shape
  * after windowed agg, sessionization, and cross-batch dedup state):
  * clicks join purchases of the same user whose event time falls within
  * the trailing `windowMinutes` of the click.
  *
  * State-boundedness is the whole design: BOTH sides carry a watermark
  * and the join condition bounds purchase time to
  * [click − window, click], so Spark can evict buffered rows once the
  * watermark passes their latest possible match — without the time bound
  * a stream–stream inner join must buffer both streams forever. The
  * watermark delay (late-arrival tolerance) plus the join window is the
  * state horizon per key; state size is O(events inside that horizon),
  * independent of stream length.
  *
  * Scale shape: the join shuffles both streams once on `user_id` (the
  * equality key); the time predicate evaluates inside the state store,
  * no re-shuffle. One skewed user's horizon lives in one task — the same
  * per-key bound every keyed-state operator here documents.
  */
object StreamJoin {

  /** @param clicks    streaming frame with (event_id, ts, user_id, ...)
    * @param purchases streaming frame with (event_id, ts, user_id, value)
    * @return one row per (click, purchase-within-window) match
    */
  def clicksWithRecentPurchase(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 60, watermarkDelay: String = "10 minutes"): DataFrame = {
    val c = clicks
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id"))
    val p = purchases
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id").as("p_user_id"), col("value").as("purchase_value"))
    c.join(p,
      c("user_id") === p("p_user_id") &&
        p("purchase_ts") >= c("click_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        p("purchase_ts") <= c("click_ts"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        unix_timestamp(col("click_ts")).as("click_s"),
        unix_timestamp(col("purchase_ts")).as("purchase_s"),
        col("purchase_value"))
  }
}
