package graft.join

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.cell.CellIndex
import graft.geom.PolygonRow
import graft.functions.GraftFunctions

/** Cell-indexed point-in-polygon join (SURVEY.md §4 custom-physical item 1).
  *
  * Logical form `points ⋈ polygons ON contains(poly, pt)` is a theta join
  * Catalyst would nested-loop; we rewrite it BY CONSTRUCTION:
  *
  *   build side:  polygons → flatMap cover(rings, res) → (cell, polygon)
  *   probe side:  points.withColumn("cell", cellOf(lat, lon, res))
  *   equi-join on cell  →  exact ray-cast refine (native Expression)
  *
  * Scale paths:
  *  - `broadcast = true` (default): polygon×cell rows broadcast; the probe
  *    table (the 10^12-row image table) streams map-side — NO shuffle of the
  *    big side at all. Right whenever Σ|cover| fits an executor (the
  *    reference's whole output is "a few hundred" boundaries).
  *  - `broadcast = false`: shuffle hash/SMJ on cell with AQE skew splitting;
  *    add `saltBuckets > 1` to split hot cells (dense cities): probe gets a
  *    random-but-deterministic salt from pmod(hash(id),S), build side is
  *    replicated ×S.
  */
object SpatialJoin {

  final case class CellPoly(cell: Long, relation_id: Long, name: String)

  /** Build side: one row per (cover cell, polygon id). Rings are NOT
    * duplicated per cover cell — a detailed polygon (10⁵ vertices) covering
    * 10³ cells would otherwise put vertices×cells into the broadcast, a
    * scale-killer. They ride in a second, per-polygon-unique frame
    * (`polygonRings`) attached after the cell match.
    *
    * Multi-resolution: each polygon covers at the FINEST res ≤ `res` whose
    * cover stays under `maxCells` (CellIndex.coverAuto) — small polygons
    * get fine cells, a continent gets coarse ones, and nothing throws. The
    * probe side must then encode at every res present (assign does).
    */
  def polygonCells(spark: SparkSession, polys: Dataset[PolygonRow], res: Int,
      maxCells: Int = 4096): Dataset[CellPoly] = {
    import spark.implicits._
    polys.flatMap { p =>
      CellIndex.coverAuto(p.rings, res, maxCells)._2.map(c =>
        CellPoly(c, p.relation_id, p.name))
    }
  }

  /** One row per polygon: (relation_id, rings) — the exact-refine side. */
  def polygonRings(spark: SparkSession, polys: Dataset[PolygonRow]): DataFrame = {
    import spark.implicits._
    polys.map(p => (p.relation_id, p.rings)).toDF("relation_id", "rings")
  }

  /** Assign each probe row its containing polygons.
    *
    * @param probes must contain `idCol`, `latCol`, `lonCol`
    * @return probe id + lat/lon + (relation_id, name) per containing polygon
    *         (inner: unassigned probes dropped)
    */
  def assign(
      spark: SparkSession,
      probes: DataFrame,
      polys: Dataset[PolygonRow],
      res: Int,
      idCol: String = "image_id",
      latCol: String = "lat",
      lonCol: String = "lon",
      useBroadcast: Boolean = true,
      saltBuckets: Int = 1): DataFrame = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rings0 = polygonRings(spark, polys)
    // The probe must encode one cell per distinct cover resolution present
    // on the build side (usually 1, occasionally 2-3 with mixed polygon
    // sizes) so every polygon is matchable at ITS cover resolution. That
    // res list and the build rows must come from ONE cover computation —
    // coverAuto's bbox descent + per-cell ring intersection is the
    // expensive part for detailed polygons, and a naive metadata collect
    // would re-run it per assign call.
    val (cells0, resList) =
      if (useBroadcast) {
        // build side is broadcast-sized by design: collect it once on the
        // driver and serve both the res list and the broadcast from the
        // same array (the executors then receive it via the broadcast —
        // the cover flatMap runs exactly once per assign)
        val arr = polygonCells(spark, polys, res).collect()
        val rs = arr.iterator.map(c => (c.cell >>> 58).toInt).toSet.toSeq.sorted
        (spark.createDataset(arr.toIndexedSeq).toDF()
          .withColumnRenamed("name", "polygon_name"),
          if (rs.isEmpty) Seq(res) else rs)
      } else {
        // shuffle path: the build side may exceed driver memory — persist
        // so the res-list collect and the join read one cover computation.
        // Stays cached for the query's lifetime (callers running many
        // assigns release via spark.catalog.clearCache()).
        val df = polygonCells(spark, polys, res).toDF()
          .withColumnRenamed("name", "polygon_name")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rs = df.select(shiftright(col("cell"), 58).cast("int"))
          .distinct().as[Int].collect().sorted.toSeq
        (df, if (rs.isEmpty) Seq(res) else rs)
      }
    val p = probes.withColumn("cell", explode(array(
      resList.map(r => GraftFunctions.cellOfCol(col(latCol), col(lonCol), r)): _*)))

    val joined =
      if (useBroadcast) {
        p.join(broadcast(cells0), Seq("cell"))
      } else if (saltBuckets > 1) {
        // replicate build rows ×S; probe picks one deterministic salt
        val salted = cells0.withColumn("salt",
          explode(array((0 until saltBuckets).map(lit): _*)))
        val ps = p.withColumn("salt",
          pmod(hash(col(idCol)), lit(saltBuckets)))
        ps.join(salted, Seq("cell", "salt")).drop("salt")
      } else {
        p.join(cells0, Seq("cell"))
      }

    // all probe columns pass through — the big side is read ONCE (an extra
    // self-join to re-attach payloads would double the 100 TB scan). Rings
    // attach here via a second broadcast keyed per polygon (unique — one
    // copy each regardless of cover size); the broadcast hint keeps the
    // probe side map-side-only even when the candidate join shuffled.
    joined
      .join(broadcast(rings0), Seq("relation_id"))
      .filter(GraftFunctions.rayCastContains(col("rings"), col(latCol), col(lonCol)))
      .drop("rings")
  }
}
