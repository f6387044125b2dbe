package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.join.AsofJoin

/** Backward as-of join semantics on hand-built streams, plus the plan
  * property the implementation exists for: one shuffle total.
  */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def probe = Seq(
    (1L, 100L, 5L), (2L, 100L, 10L), (3L, 100L, 20L), (4L, 100L, 3L),
    (5L, 200L, 50L)
  ).toDF("event_id", "k", "t")

  private def build = Seq(
    (100L, 5L, "a"), (100L, 10L, "b"), (100L, 15L, "c")
  ).toDF("k", "t", "v")

  test("matches the greatest build time <= probe time, per key") {
    val got = AsofJoin.backward(probe, build, "k", "t", Seq("v"))
      .select("event_id", "asof_t", "asof_v")
      .as[(Long, Option[Long], Option[String])].collect().sortBy(_._1)
    assert(got(0) === ((1L, Some(5L), Some("a"))))   // tie: t=5 matches (<=)
    assert(got(1) === ((2L, Some(10L), Some("b")))) // tie at 10
    assert(got(2) === ((3L, Some(15L), Some("c")))) // latest before 20
    assert(got(3) === ((4L, None, None)))            // t=3 precedes all builds
    assert(got(4) === ((5L, None, None)))            // key with no build rows
  }

  test("probe columns all survive, including extras") {
    val p2 = probe.withColumn("extra", col("event_id") * 7)
    val got = AsofJoin.backward(p2, build, "k", "t", Seq("v"))
    assert(got.columns.toSeq ===
      Seq("event_id", "k", "t", "extra", "asof_t", "asof_v"))
    assert(got.filter(col("extra") =!= col("event_id") * 7).count() === 0)
  }

  test("plan has exactly one shuffle (union + key-window, no join)") {
    val plan = AsofJoin.backward(probe, build, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n$plan")
    assert(!plan.contains("Join"), "as-of must not plan a join")
  }
}
