package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import graft.text.Bloom

/** Bloom-filter membership gate: the no-false-negative guarantee, a bounded
  * false-positive rate at the designed load, determinism across builds, and
  * the plan property the operator exists for — probing is a pure map-side
  * predicate (no join, no shuffle, no UDF on the probe side).
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val M = 1 << 16
  private val K = 4

  private def keysDf(ks: Seq[Long]) = ks.toDF("key")

  test("no false negatives: every inserted key passes") {
    val ks = (0 until 2000).map(i => i * 2654435761L % (1L << 60))
    val bloom = Bloom.build(spark, keysDf(ks), "key", M, K)
    val misses = keysDf(ks)
      .filter(!Bloom.contains(spark, bloom, col("key"), M, K)).count()
    assert(misses === 0L)
  }

  test("false-positive rate is near theory at the designed load") {
    val n = 2000 // kn/m = 0.122 -> p_fp ~ (1-e^-0.122)^4 ~ 1.75e-4
    val ks = (0 until n).map(i => i * 2654435761L % (1L << 60))
    val bloom = Bloom.build(spark, keysDf(ks), "key", M, K)
    val probeN = 200000
    val probes = (0 until probeN).map(i => (1L << 61) + i * 40503L)
    val fps = keysDf(probes)
      .filter(Bloom.contains(spark, bloom, col("key"), M, K)).count()
    // 10x theory headroom: tolerate clustering in the deterministic probes
    assert(fps <= (probeN * 1.75e-4 * 10).toLong + 1, s"fp count $fps")
  }

  test("build is deterministic (same keys -> same bitset, dupes harmless)") {
    val ks = (0 until 500).map(i => i * 7919L)
    val a = Bloom.build(spark, keysDf(ks), "key", M, K)
    val b = Bloom.build(spark, keysDf(ks ++ ks.take(100)), "key", M, K)
    assert(a.toSeq === b.toSeq)
  }

  test("probe plan is map-side only: no join, no exchange, no ScalaUDF") {
    val bloom = Bloom.build(spark, keysDf(Seq(1L, 2L, 3L)), "key", M, K)
    val plan: SparkPlan = keysDf((0L until 100L).map(identity))
      .filter(Bloom.contains(spark, bloom, col("key"), M, K))
      .queryExecution.executedPlan
    val txt = plan.toString
    assert(!txt.contains("Join"), "probe must not join")
    assert(!txt.contains("Exchange"), "probe must not shuffle")
    assert(!txt.contains("ScalaUDF"), "probe must stay codegen'd")
  }

  test("rejects a non-power-of-two width and out-of-range k") {
    intercept[IllegalArgumentException] {
      Bloom.build(spark, keysDf(Seq(1L)), "key", 1000, 4)
    }
    intercept[IllegalArgumentException] {
      Bloom.build(spark, keysDf(Seq(1L)), "key", 1 << 10, 0)
    }
  }
}
