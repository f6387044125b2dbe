package graft.emit

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.DataFrame

/** K3/K4 — file sink semantics (`/root/reference/src/output/file_creator.rs`,
  * `output_handler.rs:22-98`): one `.poly` (and optionally `.geojson`) file
  * per boundary, named by the deduped safe name, with per-file overwrite
  * policy and skip-and-continue error tolerance, returning the count of
  * files written.
  *
  * All three reference policies are supported, including the interactive
  * Ask mode (`file_creator.rs:32-63`): per conflicting file, prompt
  * `[s]kip, [o]verwrite, s[k]ip all, overwrite [a]ll` with the all-answers
  * sticky for the rest of the run. Batch adaptation: stdin lives on the
  * DRIVER, so the conflict set (metadata-sized — one candidate path per
  * boundary; the reference's whole output is "a few hundred" files) is
  * resolved up front in sorted path order and the decisions ride into the
  * distributed write as a plain broadcast-sized map. The reference prompts
  * lazily in nondeterministic HashMap iteration order; sorted-upfront asks
  * the same questions with a deterministic transcript.
  *
  * Distributed shape: `foreachPartition`-style export via a per-partition
  * write (executors write their rows directly — no driver collect).
  */
object BoundaryWriter {

  sealed trait OverwriteMode
  case object OverwriteAll extends OverwriteMode
  case object SkipAll extends OverwriteMode

  /** Interactive per-file policy (reference Ask). `in`/`out` are injectable
    * for tests; defaults talk to the process console.
    */
  final case class Ask(
      in: java.io.BufferedReader =
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
      out: java.io.PrintStream = System.out) extends OverwriteMode

  /** One prompt round for `path`; loops until a valid answer, exactly like
    * file_creator.rs:40-62. Returns (overwrite?, sticky-upgrade).
    * EOF on stdin degrades to skip-all (the reference panics there — a
    * crashed export has no row-for-row parity to preserve).
    */
  @annotation.tailrec
  private def promptOne(ask: Ask, path: String): (Boolean, Option[Boolean]) = {
    ask.out.println(s"WARNING! graft wanted to create the file $path, " +
      "but it exists already. [s]kip, [o]verwrite, s[k]ip all, overwrite [a]ll?")
    Option(ask.in.readLine()).map(_.trim) match {
      case Some("s") => (false, None)
      case Some("o") => (true, None)
      case Some("k") => (false, Some(false))
      case Some("a") => (true, Some(true))
      case None      => (false, Some(false))
      case _         => promptOne(ask, path)
    }
  }

  /** @param df needs columns out_name, poly_text, geojson (geojson nullable)
    * @return number of files written (reference counts per-file successes,
    *         output_handler.rs:48-78)
    */
  def write(df: DataFrame, folder: String, mode: OverwriteMode,
      geojson: Boolean = false): Long = {
    Files.createDirectories(Paths.get(folder))
    val rows0 = df.select("out_name", "poly_text", "geojson")
    // Ask needs two passes (conflict scan + write) — persist so an
    // uncached upstream extraction isn't executed twice
    val rows = mode match {
      case _: Ask => rows0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case _      => rows0
    }

    // (per-file decisions, default for conflicts discovered only at write
    // time — e.g. a file created after the driver's scan). Ask's default is
    // the sticky answer if one was given, else skip (never clobber a file
    // nobody was asked about).
    val (decisions, conflictDefault): (Map[String, Boolean], Boolean) = mode match {
      case OverwriteAll => (Map.empty, true)
      case SkipAll      => (Map.empty, false)
      case ask: Ask =>
        val names = rows.select("out_name").distinct().collect().map(_.getString(0))
        val candidates = names.flatMap(n =>
          Seq(s"$n.poly") ++ (if (geojson) Seq(s"$n.geojson") else Nil))
        val existing = candidates.filter(f => Files.exists(Paths.get(folder, f))).sorted
        var sticky: Option[Boolean] = None
        val m = existing.map { f =>
          val d = sticky match {
            case Some(s) => s
            case None =>
              val (d0, up) = promptOne(ask, Paths.get(folder, f).toString)
              up.foreach(s => sticky = Some(s))
              d0
          }
          f -> d
        }.toMap
        (m, sticky.getOrElse(false))
    }

    // local[(N)] → executors share the driver FS; on a cluster this targets
    // a shared mount. Count successes with an accumulator-free reduce.
    val nWritten = rows.rdd.mapPartitions { it =>
      var written = 0L
      it.foreach { r =>
        val name = r.getString(0)
        def put(ext: String, content: String): Unit = {
          val file = s"$name.$ext"
          val p = Paths.get(folder, file)
          val proceed =
            if (!Files.exists(p)) true
            else decisions.getOrElse(file, conflictDefault)
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
    mode match {
      case _: Ask => rows.unpersist(blocking = false)
      case _      =>
    }
    nWritten
  }
}
