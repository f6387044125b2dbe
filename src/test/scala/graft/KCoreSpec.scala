package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.KCore

/** Peeling must equal a sequential brute-force decomposition, survive the
  * adversarial two-nodes-per-round path, and fail loudly when capped.
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int,
      maxRounds: Int = 1000): Map[Long, Long] =
    KCore.kCore(spark, edges.toDF("src", "dst"), k, maxRounds)
      .as[(Long, Long)].collect().toMap

  /** Sequential ground truth: peel until stable. */
  private def brute(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    var done = false
    while (!done) {
      val deg = und.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
      val peel = deg.collect { case (n, d) if d < k => n }.toSet
      if (peel.isEmpty) done = true
      else und = und.filterNot(e => peel(e._1) || peel(e._2))
    }
    und.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
  }

  test("path at k=2 unravels two endpoints per round to empty; cycle survives whole") {
    val path = (0L until 11L).map(i => (i, i + 1))
    assert(run(path, 2) === Map.empty)
    val cycle = (0L until 8L).map(i => (i, (i + 1) % 8))
    assert(run(cycle, 2) === (0L until 8L).map(_ -> 2L).toMap)
  }

  test("random graph equals sequential peeling at k=2..4") {
    val rnd = new scala.util.Random(42L)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    for (k <- 2 to 4)
      assert(run(edges, k) === brute(edges, k), s"k=$k")
  }

  test("self-loops and parallel/reverse duplicates do not inflate degrees") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
    // triangle 1-2-3; the self-loop and duplicates add nothing
    assert(run(edges, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(run(edges, 3) === Map.empty)
  }

  test("maxRounds cap throws instead of returning a truncated core") {
    val path = (0L until 20L).map(i => (i, i + 1))
    intercept[IllegalStateException](run(path, 2, maxRounds = 2))
  }
}
