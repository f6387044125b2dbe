package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.join.Funnel

/** Funnel pins: complete chains, per-step horizon timeout, missing first
  * stage, simultaneous steps, and the documented greedy-earliest
  * semantics (an early t1 can time out a chain a later view would save).
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(h: Double): Timestamp =
    new Timestamp(1700000000000L + (h * 3600 * 1000).toLong)

  private def run(rows: Seq[(Long, String, Timestamp)]): Map[Long, (Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])] =
    Funnel.funnel(rows.toDF("user_id", "event_type", "ts"),
        Seq("view", "click", "purchase"), expr("INTERVAL 48 HOURS"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.getTimestamp(2)), Option(r.getTimestamp(3)),
          Option(r.getTimestamp(4))))).toMap

  test("complete chain, timeout, missing stage-1, simultaneity") {
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      (2L, "view", ts(0)), (2L, "click", ts(50)),          // click past 48h
      (3L, "click", ts(0)), (3L, "purchase", ts(1)),       // no view at all
      (4L, "view", ts(0)), (4L, "click", ts(0))            // click AT t1 counts
    )
    val r = run(events)
    assert(r(1L) == ((3L, Some(ts(0)), Some(ts(10)), Some(ts(20)))))
    assert(r(2L) == ((1L, Some(ts(0)), None, None)))
    assert(r(3L) == ((0L, None, None, None)))
    assert(r(4L) == ((2L, Some(ts(0)), Some(ts(0)), None)))
  }

  test("greedy-earliest: the FIRST stage-1 event anchors the chain") {
    // view@0 then view@10; the only click is at 55h — inside 48h of the
    // second view but outside the first. Greedy anchors at t1=0 -> 1 stage.
    val r = run(Seq(
      (7L, "view", ts(0)), (7L, "view", ts(10)), (7L, "click", ts(55))))
    assert(r(7L) == ((1L, Some(ts(0)), None, None)))
  }

  test("earliest qualifying step is chosen at every stage") {
    // two qualifying clicks: the earlier one (5h) anchors stage 3, so a
    // purchase at 54h (within 48h of click@30 but not of click@5) misses
    val r = run(Seq(
      (8L, "view", ts(0)), (8L, "click", ts(5)), (8L, "click", ts(30)),
      (8L, "purchase", ts(54))))
    assert(r(8L) == ((2L, Some(ts(0)), Some(ts(5)), None)))
  }
}
