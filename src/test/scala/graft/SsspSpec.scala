package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Sssp

/** Sssp: parity against an in-memory Dijkstra on deterministic weighted
  * graphs, multi-seed semantics, unreachable-absent contract, and the
  * in-plan positive-weight guard.
  */
class SsspSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dijkstra(edges: Seq[(Long, Long, Long)],
      seeds: Set[Long]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1, e._3)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(e => (e._2, e._3)) }
    val dist = scala.collection.mutable.Map[Long, Long](seeds.map(_ -> 0L).toSeq: _*)
    val pq = scala.collection.mutable.PriorityQueue[(Long, Long)](
      seeds.map(s => (0L, s)).toSeq: _*)(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (dist(u) == d)
        for ((v, w) <- adj.getOrElse(u, Nil))
          if (dist.get(v).forall(_ > d + w)) { dist(v) = d + w; pq.enqueue((d + w, v)) }
    }
    dist.toMap
  }

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long]): Map[Long, Long] =
    Sssp.distances(spark, edges.toDF("rel_a", "rel_b", "w"), seeds.toDF("id"))
      .as[(Long, Long)].collect().toMap

  test("matches Dijkstra on a deterministic dense-ish graph") {
    // 24 nodes, ring + chords, weights 1..9
    val edges = (0L until 24L).map(i => (i, (i + 1) % 24, 1 + (i * 7) % 9)) ++
      (0L until 8L).map(i => (i * 3, (i * 3 + 11) % 24, 1 + (i * 5) % 9))
    assert(run(edges, Seq(0L)) === dijkstra(edges, Set(0L)))
    assert(run(edges, Seq(0L, 13L)) === dijkstra(edges, Set(0L, 13L)))
  }

  test("unreachable nodes are absent; seed distance is 0") {
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 5L), (10L, 11L, 1L))
    val got = run(edges, Seq(1L))
    assert(got === Map(1L -> 0L, 2L -> 5L, 3L -> 10L))
  }

  test("the shorter of a heavy direct edge and a light detour wins") {
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 2L), (3L, 2L, 3L))
    assert(run(edges, Seq(1L)) === Map(1L -> 0L, 2L -> 5L, 3L -> 2L))
  }

  test("non-positive weight fails the job in-plan") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 0L))
    val e = intercept[Exception] { run(edges, Seq(1L)) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("non-positive weight")), e.toString)
  }
}
