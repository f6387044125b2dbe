package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.join.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic LCG-derived probes/intervals (no Random: reproducible)
  private def mix(i: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x * 0xBF58476D1CE4E5B9L
  }

  private val probes = (0L until 500L).map(i => (i, math.abs(mix(i)) % 10000L))
  private val intervals = (0L until 40L).map { i =>
    val s = math.abs(mix(i + 1000)) % 9500L
    (i, s, s + 1 + math.abs(mix(i + 2000)) % 900L) // lengths 1..900
  }

  private def naive(ps: Seq[(Long, Long)],
      ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, ts) <- ps
      (iid, s, e) <- ivs
      if ts >= s && ts < e
    } yield (pid, iid)).toSet

  test("bucketed equals the naive theta join, including bucket-edge hits") {
    // edge cases: ts exactly on start, exactly on end (excluded), exactly
    // on a bucket boundary (1024/2048 are multiples of every tested width)
    val allIv = intervals ++ Seq((90L, 1024L, 2048L))
    val allP = probes ++ Seq((9001L, 1024L), (9002L, 2047L), (9003L, 2048L))
    val iv = allIv.toDF("iid", "s", "e")
    val pAll = allP.toDF("pid", "ts")
    for (w <- Seq(64L, 512L, 4096L)) {
      val got = RangeJoin.bucketed(pAll, "ts", iv, "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == naive(allP, allIv), s"bucketWidth=$w")
    }
  }

  test("each matching pair appears exactly once (replication does not dup)") {
    val p = probes.toDF("pid", "ts")
    val iv = intervals.toDF("iid", "s", "e")
    val dups = RangeJoin.bucketed(p, "ts", iv, "s", "e", 64L)
      .groupBy("pid", "iid").count().filter(col("count") > 1).count()
    assert(dups == 0L)
  }

  test("empty and degenerate intervals match nothing") {
    val p = Seq((1L, 100L)).toDF("pid", "ts")
    val iv = Seq((1L, 100L, 100L), (2L, 200L, 150L)).toDF("iid", "s", "e")
    assert(RangeJoin.bucketed(p, "ts", iv, "s", "e", 64L).count() == 0L)
  }

  test("plan is a broadcast hash join on the bucket key — no nested loop") {
    val p = probes.toDF("pid", "ts")
    val iv = intervals.toDF("iid", "s", "e")
    val plan = RangeJoin.bucketed(p, "ts", iv, "s", "e", 512L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    // and the naive BETWEEN join IS the nested loop we are avoiding
    val naivePlan = p.join(iv, col("ts") >= col("s") && col("ts") < col("e"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
  }
}
