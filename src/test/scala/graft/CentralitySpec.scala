package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{Bfs, Centrality, LabelProp}

/** Stress centrality against hand-computed closed forms and a sequential
  * brute-force shortest-path enumerator; modularity against the textbook
  * two-triangles value; σ counts against a BFS-with-counting oracle.
  */
class CentralitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stressOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Centrality.stress(spark, edges.toDF("rel_a", "rel_b"))
      .as[(Long, Long)].collect().toMap

  /** Sequential σ via BFS-with-counting per origin. */
  private def bruteSigma(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Long)] = {
    val adj = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val nodes = adj.keys.toSeq
    nodes.flatMap { s =>
      val dist = scala.collection.mutable.Map(s -> 0L)
      val sig = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      var d = 1L
      while (frontier.nonEmpty) {
        val nextSig = scala.collection.mutable.Map.empty[Long, Long]
        frontier.foreach { v =>
          adj(v).foreach { w =>
            if (!dist.contains(w))
              nextSig(w) = nextSig.getOrElse(w, 0L) + sig(v)
          }
        }
        nextSig.foreach { case (w, c) => dist(w) = d; sig(w) = c }
        frontier = nextSig.keys.toSeq
        d += 1
      }
      dist.keys.map(v => (s, v) -> (dist(v), sig(v)))
    }.toMap
  }

  private def bruteStress(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ap = bruteSigma(edges)
    val nodes = ap.keys.map(_._1).toSeq.distinct
    nodes.map { v =>
      v -> (for {
        s <- nodes; t <- nodes
        if s < t && v != s && v != t
        (dsv, ssv) <- ap.get((s, v)); (dvt, svt) <- ap.get((v, t))
        (dst, _) <- ap.get((s, t)) if dsv + dvt == dst
      } yield ssv * svt).sum
    }.toMap
  }

  test("allPairsSigma: 4-cycle has two shortest paths between opposite corners") {
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val got = Bfs.allPairsSigma(spark, cyc.toDF("rel_a", "rel_b"))
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(got((0L, 2L)) == (2L, 2L))
    assert(got((1L, 3L)) == (2L, 2L))
    assert(got((0L, 1L)) == (1L, 1L))
    assert(got((0L, 0L)) == (0L, 1L))
    assert(got.size == 16)
  }

  test("stress: path interior counts pairs across it; star center is (k choose 2)") {
    // path 0-1-2-3: stress(1) = pairs {0,2},{0,3} = 2; stress(2) = 2
    assert(stressOf(Seq((0L, 1L), (1L, 2L), (2L, 3L))) ==
      Map(0L -> 0L, 1L -> 2L, 2L -> 2L, 3L -> 0L))
    // star center 9 with 4 leaves: C(4,2) = 6
    val star = (0L until 4L).map(i => (9L, i))
    assert(stressOf(star) ==
      Map(9L -> 6L, 0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
    // 4-cycle: each node carries one path for the opposite pair
    assert(stressOf(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))) ==
      (0L until 4L).map(_ -> 1L).toMap)
  }

  test("stress: random graph equals sequential brute force") {
    val rnd = new scala.util.Random(7L)
    val edges = (0 until 60).map(_ =>
      (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
      .filter(e => e._1 != e._2).distinct
    assert(stressOf(edges) == bruteStress(edges))
  }

  test("modularity: two triangles + one bridge give Q = 70/196") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L))
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L),
      (3L, 3L), (4L, 3L), (5L, 3L))
    val got = Centrality.modularity(spark, labels.toDF("id", "label"),
        edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5, t._6)).toMap
    // m = 7; each community: 3 nodes, L_c = 3, D_c = 7,
    // contrib = 4*7*3 - 49 = 35, den = 196
    assert(got == Map(0L -> (3L, 3L, 7L, 35L, 196L),
      3L -> (3L, 3L, 7L, 35L, 196L)))
    assert(got.values.map(_._4).sum.toDouble / 196.0 == 70.0 / 196.0)
  }

  test("modularity: everything in one community scores 4mL - (2m)^2 = 0 for a clique-sum") {
    // single community holding ALL edges: L = m, D_tot = 2m,
    // contrib = 4m*m - 4m^2 = 0 (Q = 0, the null partition)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
    val labels = (0L until 4L).map(i => (i, 0L))
    val got = Centrality.modularity(spark, labels.toDF("id", "label"),
        edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 4L, 5L, 10L, 0L, 100L)))
  }

  test("modularity: duplicate and reversed edges collapse to one undirected edge") {
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 2L))
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 2L))
    val got = Centrality.modularity(spark, labels.toDF("id", "label"),
        edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5, t._6)).toMap
    // m = 2; c0: {0,1}, L=1, D=3, contrib = 8-9 = -1; c2: {2}, L=0, D=1,
    // contrib = -1; den = 16
    assert(got == Map(0L -> (2L, 1L, 3L, -1L, 16L),
      2L -> (1L, 0L, 1L, -1L, 16L)))
  }
}
