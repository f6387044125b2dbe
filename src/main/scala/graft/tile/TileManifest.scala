package graft.tile

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lineage.Lineage

/** Checkpoint-resumable tiling job (north rule).
  *
  * The image set is split into `nBatches` deterministic batches
  * (`pmod(hash(image_id), n)` — the same split at any cluster size). Each
  * batch is tiled and written to `outDir/tiles/batch=<b>/`, then a manifest
  * entry `outDir/_manifest/batch-<b>.json` is committed atomically
  * (temp-file + rename). Restart skips every batch with a committed
  * manifest entry — Iceberg-snapshot-like semantics on plain Parquet
  * (no Iceberg runtime in the sandbox, SURVEY.md §7.1). Per-batch lineage
  * rows (task-level IO/timing) append to `outDir/_lineage/`.
  */
object TileManifest {

  final case class BatchResult(batch: Int, images: Long, tiles: Long, skipped: Boolean)

  def completedBatches(outDir: String): Set[Int] = {
    val dir = Paths.get(outDir, "_manifest")
    if (!Files.isDirectory(dir)) Set.empty
    else {
      val s = Files.list(dir) // close the directory stream — fd leak otherwise
      try {
        val it = s.iterator()
        val out = scala.collection.mutable.Set.empty[Int]
        while (it.hasNext) {
          val f = it.next().getFileName.toString
          if (f.startsWith("batch-") && f.endsWith(".json"))
            out += f.stripPrefix("batch-").stripSuffix(".json").toInt
        }
        out.toSet
      } finally s.close()
    }
  }

  private def commitManifest(outDir: String, batch: Int, images: Long, tiles: Long): Unit = {
    val dir = Paths.get(outDir, "_manifest")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".batch-$batch.json.tmp")
    val fin = dir.resolve(s"batch-$batch.json")
    Files.writeString(tmp,
      s"""{"batch":$batch,"images":$images,"tiles":$tiles,"schema_v":1}""")
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Run (or resume) the tiling job. `assigned` needs image_id, relation_id,
    * bytes. Returns per-batch results including skips.
    */
  def run(spark: SparkSession, assigned: DataFrame, outDir: String,
      nBatches: Int = 8): Seq[BatchResult] = {
    val done = completedBatches(outDir)
    val withBatch = assigned.withColumn("batch", pmod(hash(col("image_id")), lit(nBatches)))
    (0 until nBatches).map { b =>
      if (done.contains(b)) BatchResult(b, 0, 0, skipped = true)
      else {
        val slice = withBatch.filter(col("batch") === b).drop("batch")
        val ((nImages, nTiles), lineage) = Lineage.capture(spark, s"tile-batch-$b") {
          val n = slice.count()
          val tiles = Tiling.tile(spark, slice)
          tiles.write.mode("overwrite").parquet(s"$outDir/tiles/batch=$b")
          val t = spark.read.parquet(s"$outDir/tiles/batch=$b").count()
          (n, t)
        }
        lineage.write.mode("append").parquet(s"$outDir/_lineage")
        commitManifest(outDir, b, nImages, nTiles)
        BatchResult(b, nImages, nTiles, skipped = false)
      }
    }
  }
}
