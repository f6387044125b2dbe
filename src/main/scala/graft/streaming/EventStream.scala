package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (driver prompt / SURVEY.md §2 "streaming"
  * gap): windowed aggregation with watermark, and custom sessionization
  * state via flatMapGroupsWithState. Batch-equivalent semantics of the
  * windowed agg are pinned by SparkEntry q17's DuckDB oracle; the streaming
  * path is exercised in StreamingSpec with a file source + AvailableNow.
  */
object EventStream {

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class SessionOut(user_id: Long, n_events: Int, first_s: Long, last_s: Long,
      total_value: Double)

  // not private: Spark's state encoder generates code that must reach the
  // constructor from another package
  final case class SessionState(n: Int, firstS: Long, lastS: Long, total: Double)

  /** 5-minute tumbling window counts/sums with a 10-minute watermark —
    * identical grouping semantics to the batch q17 query.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      // testdata writes TIMESTAMP_NTZ; watermarks need TIMESTAMP (session
      // tz is pinned UTC, so the instant is unchanged)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(unix_timestamp(col("w.start")).as("bucket_s"), col("event_type"),
        col("n"), col("value_cents"))

  /** Per-user sessionization with a gap timeout: a session closes when no
    * event arrives within `gapMinutes` of event time (driven by the state
    * timeout clock in the streaming runtime).
    */
  def sessionize(spark: SparkSession, events: Dataset[EventRow],
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.n, s.firstS, s.lastS, s.total))
          } else {
            val evs = rows.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime / 1000
              cur match {
                case Some(s) if t - s.lastS > gapMinutes * 60L =>
                  closed += SessionOut(userId, s.n, s.firstS, s.lastS, s.total)
                  cur = Some(SessionState(1, t, t, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.n + 1, s.firstS, math.max(s.lastS, t), s.total + e.value))
                case None =>
                  cur = Some(SessionState(1, t, t, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastS * 1000 + gapMinutes * 60000L)
            }
            closed.iterator
          }
      }
  }

  final case class AlertOut(user_id: Long, window_s: Long, n: Long,
      prev_n: Long, spike: Int)

  // window currently filling + the last CLOSED window's count
  final case class AlertState(winS: Long, n: Long, prevN: Long)

  /** Per-device spike alerting over event-time tumbling windows,
    * maintained in keyed state: each closed window emits
    * (window start, count, previous closed window's count, spike flag
    * when n > 3·prev and prev > 0). Windows close when a later-window
    * event for the key arrives, or on event-time timeout (watermark
    * past the window end) — so a device that goes silent still reports
    * its final window. The streaming counterpart of q221's batch
    * changepoint screen; integer thresholds, no floats in state.
    */
  def spikeAlerts(spark: SparkSession, events: Dataset[EventRow],
      windowMinutes: Int = 5): Dataset[AlertOut] = {
    import spark.implicits._
    val winMs = windowMinutes * 60000L
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AlertState, AlertOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[AlertState]) =>
          def alert(winS: Long, n: Long, prevN: Long) = AlertOut(userId,
            winS / 1000, n, prevN,
            if (prevN > 0 && n > 3 * prevN) 1 else 0)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(alert(s.winS, s.n, s.prevN))
          } else {
            val evs = rows.toSeq.sortBy(_.ts.getTime)
            val out = scala.collection.mutable.ArrayBuffer.empty[AlertOut]
            var cur = state.getOption
            evs.foreach { e =>
              val w = e.ts.getTime / winMs * winMs
              cur match {
                case Some(s) if w == s.winS =>
                  cur = Some(s.copy(n = s.n + 1))
                case Some(s) if w > s.winS =>
                  out += alert(s.winS, s.n, s.prevN)
                  cur = Some(AlertState(w, 1L, s.n))
                case Some(s) => // late event for an already-closed window:
                  // fold into the filling window's predecessor view is
                  // impossible append-only — count it in the current window
                  cur = Some(s.copy(n = s.n + 1))
                case None => cur = Some(AlertState(w, 1L, 0L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.winS + winMs)
            }
            out.iterator
          }
      }
  }
}
