package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Bfs

/** Bfs: hand-derived hop counts, multi-seed minimum, unreachable nodes
  * absent, loud non-convergence.
  */
class BfsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("path graph: hops count edges from the seed; unreachable absent") {
    // 1–2–3–4–5 plus isolated component 8–9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("rel_a", "rel_b")
    val got = Bfs.hops(spark, edges, Seq(1L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("two seeds: every node gets the MINIMUM distance; seed dedup") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("rel_a", "rel_b")
    val got = Bfs.hops(spark, edges, Seq(1L, 5L, 5L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("cycle: distances wrap both ways") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("rel_a", "rel_b")
    val got = Bfs.hops(spark, edges, Seq(1L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("non-convergence inside maxRounds throws loudly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("rel_a", "rel_b")
    val e = intercept[IllegalStateException] {
      Bfs.hops(spark, edges, Seq(1L).toDF("id"), maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("a graph converging in EXACTLY maxRounds label rounds succeeds") {
    // eccentricity 1 with maxRounds = 1: round 1 labels node 2, round 2
    // probes an empty frontier — no spurious non-convergence
    val edges = Seq((1L, 2L)).toDF("rel_a", "rel_b")
    val got = Bfs.hops(spark, edges, Seq(1L).toDF("id"), maxRounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L))
  }
}
