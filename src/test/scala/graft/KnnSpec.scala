package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.join.Knn

class KnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bruteTopK(probes: Seq[(Long, Double, Double)],
      corpus: Seq[(Long, Double, Double)], k: Int): Set[(Long, Long, Int)] =
    probes.flatMap { case (pid, la, lo) =>
      corpus.map { case (nid, cla, clo) =>
        (nid, math.sqrt((la - cla) * (la - cla) + (lo - clo) * (lo - clo)))
      }.sortBy { case (nid, d) => (d, nid) }.take(k).zipWithIndex
        .map { case ((nid, _), i) => (pid, nid, i + 1) }
    }.toSet

  test("ring-expansion kNN equals brute force on clustered + sparse corpus") {
    // corpus: a dense cluster near (10, 10) plus isolated far points —
    // exercises both early ring certification and the brute-force fallback
    val corpus = (0L until 40L).map(i =>
      (i, 10.0 + (i % 7) * 0.3, 10.0 + (i / 7) * 0.4)) ++
      Seq((100L, 80.0, 170.0), (101L, -80.0, -170.0), (102L, 0.0, -90.0))
    val probes = (0L until 60L).map { i =>
      (1000L + i, graft.img.ImageTable.latOf(i), graft.img.ImageTable.lonOf(i))
    } ++ Seq((2000L, 10.5, 10.5), (2001L, 79.0, 169.0))

    val pDf = probes.toDF("probe_id", "lat", "lon")
    val cDf = corpus.toDF("nid", "clat", "clon")
    for (k <- Seq(1, 3, 5)) {
      // threshold 0 forces the ring-expansion path (the default cutover
      // would route this 43-point corpus to the brute twin)
      val got = Knn.knnPoints(spark, pDf, cDf, k, res = 5, bruteCorpusThreshold = 0)
        .select("probe_id", "nid", "rank").as[(Long, Long, Int)].collect().toSet
      assert(got == bruteTopK(probes, corpus, k), s"k=$k")
    }
    // and the default small-corpus cutover returns the identical result
    val viaCutover = Knn.knnPoints(spark, pDf, cDf, 3, res = 5)
      .select("probe_id", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(viaCutover == bruteTopK(probes, corpus, 3))
  }

  test("ringCandidates is bit-identical to CellIndex.kRing and contains no UDF") {
    import graft.cell.CellIndex
    // cells spanning poles and the antimeridian at two resolutions
    val pts = Seq((1L, 89.9, 179.9), (2L, -89.9, -179.9), (3L, 0.0, 0.0),
      (4L, 45.0, -179.99), (5L, -89.99, 10.0), (6L, 30.0, 100.0))
    for (res <- Seq(3, 6); r <- Seq(1, 2, 4, 8, 16)) {
      val pending = pts.toDF("probe_id", "lat", "lon")
        .withColumn("cell", graft.functions.GraftFunctions.cellOfCol(col("lat"), col("lon"), res))
      val got = Knn.ringCandidates(spark, pending, r, res)
        .select("probe_id", "ccell").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      val want = pts.map { case (id, la, lo) =>
        id -> CellIndex.kRing(CellIndex.cellOf(la, lo, res), r)
      }.toMap
      assert(got == want, s"res=$res r=$r")
      // every kRing duplicate-producing case (wrap-around at res=3, r>=4)
      // must still be exact — and the plan must carry no ScalaUDF
      val plan = Knn.ringCandidates(spark, pending, r, res)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"), s"UDF in ring plan (res=$res r=$r):\n$plan")
    }
  }

  test("k larger than corpus returns whole corpus ranked") {
    val corpus = Seq((1L, 0.0, 0.0), (2L, 1.0, 1.0))
    val probes = Seq((9L, 0.2, 0.2))
    val got = Knn.knnPoints(spark, probes.toDF("probe_id", "lat", "lon"),
      corpus.toDF("nid", "clat", "clon"), k = 5, res = 5)
      .select("probe_id", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((9L, 1L, 1), (9L, 2L, 2)))
  }

  test("deterministic under repartitioning") {
    val corpus = (0L until 20L).map(i => (i, (i * 7 % 13).toDouble, (i * 11 % 17).toDouble))
    val probes = (0L until 30L).map(i => (i + 500, (i % 9).toDouble + 0.1, (i % 6).toDouble + 0.2))
    val a = Knn.knnPoints(spark, probes.toDF("probe_id", "lat", "lon").repartition(7),
      corpus.toDF("nid", "clat", "clon"), 3, res = 6, bruteCorpusThreshold = 0)
      .select("probe_id", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a == bruteTopK(probes, corpus, 3))
  }
}
