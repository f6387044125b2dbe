package graft.emit

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.DataFrame

/** K3/K4 — file sink semantics (`/root/reference/src/output/file_creator.rs`,
  * `output_handler.rs:22-98`): one `.poly` (and optionally `.geojson`) file
  * per boundary, named by the deduped safe name, with per-file overwrite
  * policy and skip-and-continue error tolerance, returning the count of
  * files written. The interactive "Ask" mode has no batch equivalent
  * (SURVEY.md §2 K3) — config chooses Overwrite or Skip.
  *
  * Distributed shape: `foreachPartition`-style export via a per-partition
  * write (executors write their rows directly — no driver collect).
  */
object BoundaryWriter {

  sealed trait OverwriteMode
  case object OverwriteAll extends OverwriteMode
  case object SkipAll extends OverwriteMode

  /** @param df needs columns out_name, poly_text, geojson (geojson nullable)
    * @return number of files written (reference counts per-file successes,
    *         output_handler.rs:48-78)
    */
  def write(df: DataFrame, folder: String, mode: OverwriteMode,
      geojson: Boolean = false): Long = {
    Files.createDirectories(Paths.get(folder))
    val rows = df.select("out_name", "poly_text", "geojson")
    // local[(N)] → executors share the driver FS; on a cluster this targets
    // a shared mount. Count successes with an accumulator-free reduce.
    rows.rdd.mapPartitions { it =>
      var written = 0L
      it.foreach { r =>
        val name = r.getString(0)
        def put(ext: String, content: String): Unit = {
          val p = Paths.get(folder, s"$name.$ext")
          val exists = Files.exists(p)
          val proceed = mode match {
            case OverwriteAll => true
            case SkipAll      => !exists
          }
          if (proceed) {
            try {
              Files.writeString(p, content,
                StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
              written += 1
            } catch {
              // per-file error → skip and continue (output_handler.rs:86-96)
              case e: Throwable => System.err.println(s"$p: ${e.getMessage}")
            }
          }
        }
        put("poly", r.getString(1))
        if (geojson && !r.isNullAt(2)) put("geojson", r.getString(2))
      }
      Iterator.single(written)
    }.sum().toLong
  }
}
