package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.TileIngest

class TileIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def worldPolys = spark.createDataset(Seq(graft.geom.PolygonRow("world",
    Seq(Seq(graft.geom.Pt(-89f, -179f), graft.geom.Pt(-89f, 179f),
      graft.geom.Pt(89f, 179f), graft.geom.Pt(89f, -179f))), 1L, 8L)))

  private def writeImages(dir: String, from: Long, until: Long): Unit =
    graft.img.ImageTable.generate(spark, until, 2).filter(col("image_id") >=
        f"img_$from%09d")
      .coalesce(1).write.mode("append").parquet(dir)

  test("streaming ingest tiles every image once and resumes from checkpoint") {
    val base = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val imagesDir = s"$base/images"
    val outDir = s"$base/out"
    val ckpt = s"$base/ckpt"

    // two input files → with maxFilesPerTrigger=1, at least two micro-batches
    writeImages(imagesDir, 0, 12)
    writeImages(imagesDir, 12, 20)

    // default res 7: the world-sized polygon exceeds the fine-res cover cap
    // and must auto-coarsen (coverAuto) instead of throwing
    val q1 = TileIngest.run(spark, imagesDir, worldPolys, outDir, ckpt)
    q1.awaitTermination(120000)
    assert(!q1.isActive)

    val tiles1 = spark.read.parquet(s"$outDir/tiles")
    val imgs1 = tiles1.select("image_id").distinct().count()
    assert(imgs1 == 20, s"all 20 images tiled, got $imgs1")
    // every image tiled exactly once (level-0 origin tile unique per image)
    val dup = tiles1.filter(col("level") === 0 && col("tx") === 0 && col("ty") === 0)
      .groupBy("image_id").count().filter(col("count") > 1).count()
    assert(dup == 0, "no image tiled twice across micro-batches")
    val batches1 = TileIngest.committedBatches(outDir)
    assert(batches1.size >= 2, s"expected ≥2 micro-batches, got $batches1")

    // land a NEW file and restart with the SAME checkpoint: only the new
    // file is processed (old batches keep their manifests; new batch id)
    writeImages(imagesDir, 20, 26)
    val q2 = TileIngest.run(spark, imagesDir, worldPolys, outDir, ckpt)
    q2.awaitTermination(120000)
    assert(!q2.isActive)

    val tiles2 = spark.read.parquet(s"$outDir/tiles")
    assert(tiles2.select("image_id").distinct().count() == 26)
    val dup2 = tiles2.filter(col("level") === 0 && col("tx") === 0 && col("ty") === 0)
      .groupBy("image_id").count().filter(col("count") > 1).count()
    assert(dup2 == 0, "resume must not re-tile committed input files")
    assert(TileIngest.committedBatches(outDir).size > batches1.size)

    // tile content parity with the batch path for one image
    val batchTiles = graft.tile.Tiling.pyramid("img_000000003", 1L,
      graft.img.ImageTable.makeRow(3L).bytes)
    val streamed = tiles2.filter(col("image_id") === "img_000000003")
      .orderBy("level", "ty", "tx")
      .select("level", "tx", "ty", "tile_bytes")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq))
    val expected = batchTiles.sortBy(t => (t.level, t.ty, t.tx))
      .map(t => (t.level, t.tx, t.ty, t.tile_bytes.toSeq))
    assert(streamed.toSeq == expected)
  }
}
