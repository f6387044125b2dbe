package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.PageRank

/** Integer PageRank pins: hand-computed tiny graphs (cycle fixed point,
  * star, multi-edges, dangling leak) and partition-layout determinism —
  * the bit-reproducibility the q94 oracle depends on.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val S = 1000000000000L

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(spark, edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("2-cycle is an exact fixed point: 0.15*s + 0.85*s = s in integers") {
    for (it <- Seq(1, 4)) {
      val r = run(Seq((1L, 2L), (2L, 1L)), it)
      assert(r === Map(1L -> S, 2L -> S), s"iters=$it")
    }
  }

  test("star: leaves decay to the base, hub collects damped contributions") {
    val edges = Seq((1L, 3L), (2L, 3L))
    val r1 = run(edges, 1)
    // leaves: no in-edges -> floor(0.15 * 1e12)
    assert(r1(1L) == 150000000000L && r1(2L) == 150000000000L)
    // hub after 1 round: 0.15e12 + (2e12 * 85)//100
    assert(r1(3L) == 150000000000L + 1700000000000L)
    // hub is dangling (no out-edges): its mass leaks, leaves stay at base
    val r2 = run(edges, 2)
    assert(r2(1L) == 150000000000L && r2(2L) == 150000000000L)
    assert(r2(3L) == 150000000000L + (2L * 150000000000L * 85L) / 100L)
  }

  test("multi-edges count multiply through outdeg and contributions") {
    val r = run(Seq((1L, 2L), (1L, 2L), (1L, 3L)), 1)
    val third = S / 3 // 333333333333
    assert(r(2L) == 150000000000L + (2 * third * 85L) / 100L)
    assert(r(3L) == 150000000000L + (third * 85L) / 100L)
  }

  test("HITS: hand-computed hubs/authorities with L-inf integer rescale") {
    // 1->3, 2->3, 3->4: 1,2 are pure hubs; 3 is the top authority AND a
    // weaker hub; 4 is a pure (weaker) authority
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = graft.graph.Hits.hubsAuthorities(spark, edges, iters = 2)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((1000000L, 0L)))
    assert(r(2L) == ((1000000L, 0L)))
    assert(r(3L) == ((500000L, 1000000L)))
    assert(r(4L) == ((0L, 250000L)))
  }

  test("result is identical under different partition layouts") {
    val edges = (0L until 300L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 300), (i, (i * i + 1) % 300)))
    val df1 = edges.toDF("src", "dst")
    val df8 = edges.toDF("src", "dst").repartition(8, col("dst"))
    val a = PageRank.ranks(spark, df1, 3).as[(Long, Long)].collect().toMap
    val b = PageRank.ranks(spark, df8, 3).as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.size == 300)
  }

  test("triangles: two triangles sharing an edge, hand-counted") {
    // {1,2,3} and {2,3,4}: nodes 2,3 sit in both; 5 dangles
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 3L), (4L, 5L))
      .toDF("src", "dst")
    val r = graft.graph.Triangles.perNode(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangles: direction, multi-edges and self-loops are erased") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 1L), (2L, 3L), (1L, 3L),
      (3L, 3L)).toDF("src", "dst")
    val r = graft.graph.Triangles.perNode(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: K6 clique gives each node C(5,2) = 10 triangles") {
    val edges = (for {
      i <- 0 until 6; j <- (i + 1) until 6
    } yield (i.toLong, j.toLong)).toDF("src", "dst")
    val r = graft.graph.Triangles.perNode(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(r.size == 6 && r.values.forall(_ == 10L))
  }
}
