package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis: for each key, the earliest event
  * chain stage₁ → stage₂ → … where each step happens at-or-after the
  * previous step's time and within `horizon` of it — the
  * view → click → purchase question every event pipeline answers.
  *
  * Semantics are the deterministic "earliest qualifying chain": t₁ =
  * min ts of stage₁; tₖ = min ts of stageₖ with tₖ₋₁ ≤ ts ≤ tₖ₋₁ +
  * horizon. Greedy-earliest is NOT maximal sequence matching (an early
  * t₁ can time-out a chain a later t₁ would complete) — the standard
  * funnel definition, stated.
  *
  * Scale shape: one filtered aggregate per stage (narrow filter + one
  * groupBy on the key), each next stage joining the previous stage's
  * per-key row — stage tables are ≤ one row per key, so the joins are
  * key-sized, never event-sized; no window over a user's full history,
  * no per-key event collection.
  */
object Funnel {

  /** Per-key funnel over `events` with columns `keyCol`, `tsCol`,
    * `stageCol`: returns (key, n_stages, t1 … tn) with nulls past the
    * deepest stage reached; keys with no stage₁ event report 0.
    */
  def funnel(events: DataFrame, stages: Seq[String], horizon: Column,
      keyCol: String = "user_id", tsCol: String = "ts",
      stageCol: String = "event_type"): DataFrame = {
    require(stages.size >= 2, s"funnel needs >= 2 stages, got $stages")
    val keys = events.select(col(keyCol).as("k")).distinct()
    val s1 = events.filter(col(stageCol) === stages.head)
      .groupBy(col(keyCol).as("k")).agg(min(tsCol).as("t1"))
    val chain = stages.tail.zipWithIndex.foldLeft(s1) { case (prev, (st, i)) =>
      val (pt, ct) = (s"t${i + 1}", s"t${i + 2}")
      val next = events.filter(col(stageCol) === st)
        .select(col(keyCol).as("k"), col(tsCol).as("ts"))
        .join(prev, Seq("k"))
        .filter(col("ts") >= col(pt) && col("ts") <= col(pt) + horizon)
        .groupBy((col("k") +: (1 to i + 1).map(n => col(s"t$n"))): _*)
        .agg(min("ts").as(ct))
      prev.join(next.select("k", ct), Seq("k"), "left")
    }
    val tCols = (1 to stages.size).map(n => col(s"t$n"))
    val nStages = tCols.map(_.isNotNull.cast("long")).reduce(_ + _).as("n_stages")
    keys.join(chain, Seq("k"), "left")
      .select(col("k").as(keyCol) +: nStages +: tCols: _*)
  }
}
