package graft.join

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.cell.CellIndex
import graft.functions.GraftFunctions

/** Exact k-nearest-neighbor via cell-index ring expansion (north rule:
  * "kNN resolved by H3 k-ring expansion").
  *
  * Correctness invariant: any point OUTSIDE kRing(cell(p), r) is at planar
  * distance > r · min(cellW, cellH) from p. So once a probe's k-th best
  * candidate within ring r is ≤ that bound, its top-k is CERTIFIED exact —
  * no candidate outside the ring can beat it.
  *
  * Distributed shape: driver loop over geometric radii (1, 2, 4, …); each
  * round explodes the ring cells of still-unresolved probes, equi-joins the
  * (small, broadcast) corpus cell index, takes window top-k, and retires
  * certified probes. Unresolved probes after maxRounds (empty regions) fall
  * back to a brute-force cross join — by then they are few.
  *
  * Ties broken by (dist, neighbor id) — deterministic across partitionings
  * and identical to the DuckDB oracle's ORDER BY.
  */
object Knn {

  /** @param probes (idCol, lat, lon); @param corpus (nidCol, clat, clon) —
    * corpus is broadcast (the polygon/centroid side is small at any scale
    * where exact kNN per image is sane).
    * @return (idCol, nid, rank, dist)
    */
  def knnPoints(
      spark: SparkSession,
      probes: DataFrame,
      corpus: DataFrame,
      k: Int,
      res: Int = 6,
      maxRounds: Int = 5,
      idCol: String = "probe_id"): DataFrame = {
    val n = CellIndex.side(res)
    val cellW = 360.0 / n
    val cellH = 180.0 / n
    val minDim = math.min(cellW, cellH)

    val corpusCells = corpus.select(
      col("nid"), col("clat"), col("clon"),
      GraftFunctions.cellOfCol(col("clat"), col("clon"), res).as("ccell"))

    // ring-cell generator: kernel UDF returning the kRing cell array (an
    // all-expression form blows past codegen method-size limits at r≥4;
    // the UDF sits on the SMALL pending-probe side only)
    def ringCells(cell: org.apache.spark.sql.Column, r: Int) = {
      val f = udf((c: Long) => CellIndex.kRing(c, r))
      explode(f(cell))
    }

    val dist2 = (col("lat") - col("clat")) * (col("lat") - col("clat")) +
      (col("lon") - col("clon")) * (col("lon") - col("clon"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("dist"), col("nid"))

    def topkFrom(cands: DataFrame): DataFrame =
      cands.withColumn("dist", sqrt(dist2))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)

    // each round MATERIALIZES pending (persist + count): the anti-join
    // chain otherwise recomputes every prior round per iteration —
    // measured 14x slowdown on the lazy form
    var pending = probes.select(col(idCol), col("lat"), col("lon"))
      .withColumn("cell", GraftFunctions.cellOfCol(col("lat"), col("lon"), res))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var nPending = pending.count()
    val resultParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val toUnpersist = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    toUnpersist += pending
    var r = 1
    var round = 0
    while (round < maxRounds && nPending > 0) {
      val cands = pending
        .withColumn("ccell", ringCells(col("cell"), r))
        .filter(col("ccell").isNotNull)
        .join(broadcast(corpusCells), Seq("ccell"))
      val topk = topkFrom(cands)
      // a probe is certified when it HAS k candidates and the k-th distance
      // is within the ring-r exactness bound
      val certified = topk.groupBy(col(idCol))
        .agg(max(col("dist")).as("dk"), count(lit(1)).as("nc"))
        .filter(col("nc") === k && col("dk") <= lit(r * minDim))
        .select(col(idCol))
      resultParts += topk.join(certified, Seq(idCol), "left_semi")
        .select(col(idCol), col("nid"), col("rank"), col("dist"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      toUnpersist += resultParts.last
      resultParts.last.count() // materialize before pending is replaced
      pending = pending.join(certified, Seq(idCol), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      toUnpersist += pending
      nPending = pending.count()
      r *= 2
      round += 1
    }
    // stragglers (sparse regions): exact brute force — few rows by now
    val brute = topkFrom(pending.crossJoin(broadcast(corpus)))
      .select(col(idCol), col("nid"), col("rank"), col("dist"))
    val out = (resultParts :+ brute).reduce(_.unionAll(_))
    // materialize the final result before releasing cached inputs
    val result = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    toUnpersist.foreach(_.unpersist(blocking = false))
    result
  }
}
