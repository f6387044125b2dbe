package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Mst

/** Borůvka against scalar Kruskal under the same strict (w, a, b)
  * order: random graphs, disconnected forests, parallel edges,
  * uniform-weight ties.
  */
class MstSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val norm = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2), e._3))
      .groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq
    norm.sortBy { case (a, b, w) => (w, a, b) }
      .filter { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra == rb) false else { parent(ra) = rb; true }
      }.toSet
  }

  private def boruvka(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Mst.boruvka(spark, edges.toDF("src", "dst", "w"))
      .as[(Long, Long, Long)].collect().toSet

  test("random sparse graphs: forest equals Kruskal's, including disconnection") {
    val rnd = new scala.util.Random(41L)
    for (trial <- 0 until 3) {
      val n = 25
      val edges = (0 until 60).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          (1 + rnd.nextInt(50)).toLong)
      } ++ Seq((100L, 101L, 5L)) // guaranteed separate component
      assert(boruvka(edges) == kruskal(edges), s"trial $trial")
    }
  }

  test("uniform weights: the (w, a, b) tie order still yields Kruskal's forest") {
    val edges = for (i <- 0L until 10L; j <- i + 1 until 10L)
      yield (i, j, 7L) // complete graph, all ties
    val got = boruvka(edges)
    assert(got == kruskal(edges))
    assert(got.size == 9 && got.map(_._3).forall(_ == 7L))
  }

  test("parallel and self edges collapse; single edge and empty input") {
    val edges = Seq((1L, 2L, 9L), (2L, 1L, 3L), (1L, 1L, 1L), (2L, 2L, 1L))
    assert(boruvka(edges) == Set((1L, 2L, 3L)))
    assert(boruvka(Seq((5L, 5L, 1L))).isEmpty)
  }
}
