package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.emit.BoundaryWriter

class MainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("CLI validation mirrors the reference (main.rs:98-112)") {
    assert(Main.parse(List("--input", "x", "--min-admin", "9", "--max-admin", "8")).isLeft)
    assert(Main.parse(List("--input", "x", "--overwrite", "--skip")).isLeft)
    assert(Main.parse(List()).isLeft)
    assert(Main.parse(List("--bogus")).isLeft)
    val ok = Main.parse(List("--input", "/d", "--min-admin", "2", "--max-admin", "6", "--geojson"))
    assert(ok == Right(Main.Config("/d", 2, 6, None, overwrite = false, skip = false, geojson = true)))
  }

  test("default output path is {input}_polygons (main.rs:131)") {
    val c = Main.parse(List("--input", "/data/osm/")).toOption.get
    assert(c.path.getOrElse(s"${c.input.stripSuffix("/")}_polygons") == "/data/osm_polygons")
  }

  test("BoundaryWriter writes one file per boundary, counts, and honors skip/overwrite") {
    val (n, w, r) = graft.fixtures.OsmScenes.golden.toDFs(spark)
    val df = graft.osm.BoundaryExtract.extractWithSinks(spark, r, w, n, 8, 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-out").toString

    val n1 = BoundaryWriter.write(df, dir, BoundaryWriter.OverwriteAll, geojson = true)
    val polyFiles = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".poly"))
    val geoFiles = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".geojson"))
    assert(polyFiles.length == 11) // golden scene boundary count
    assert(geoFiles.length == 11)
    assert(n1 == 22)

    // skip mode: nothing rewritten
    val n2 = BoundaryWriter.write(df, dir, BoundaryWriter.SkipAll, geojson = true)
    assert(n2 == 0)

    // content is the exact emitter output; dedup-suffixed names appear
    val names = polyFiles.map(_.getName).toSet
    assert(names.contains("Vimianzo_161.poly") && names.contains("Unique.poly"))
    val alpha = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "Alpha.poly")))
    assert(alpha.startsWith("Alpha\narea_1\n") && alpha.endsWith("END\nEND\n"))
  }

  test("Ask mode mirrors file_creator.rs:32-63: per-file prompt, sticky all-answers") {
    import java.nio.file.{Files, Paths}
    val (n, w, r) = graft.fixtures.OsmScenes.golden.toDFs(spark)
    val df = graft.osm.BoundaryExtract.extractWithSinks(spark, r, w, n, 8, 8)
    val dir = Files.createTempDirectory("graft-ask").toString

    def ask(script: String): (BoundaryWriter.Ask, java.io.ByteArrayOutputStream) = {
      val outBuf = new java.io.ByteArrayOutputStream()
      (BoundaryWriter.Ask(
        new java.io.BufferedReader(new java.io.StringReader(script)),
        new java.io.PrintStream(outBuf, true, "UTF-8")), outBuf)
    }

    // no conflicts → Ask never prompts, writes everything
    val (a0, out0) = ask("")
    assert(BoundaryWriter.write(df, dir, a0) == 11)
    assert(out0.size() == 0)

    // plant stale content so overwrites are observable
    val sortedNames = new java.io.File(dir).listFiles().map(_.getName).sorted
    sortedNames.foreach(f => Files.writeString(Paths.get(dir, f), "STALE"))

    // prompts arrive in sorted path order; answers: skip the 1st, an invalid
    // token then overwrite the 2nd, then sticky overwrite-[a]ll for the rest
    val (a1, out1) = ask("s\nbogus\no\na\n")
    val n1 = BoundaryWriter.write(df, dir, a1)
    assert(n1 == 10, s"wrote $n1") // all but the skipped first
    val prompts = new String(out1.toByteArray, "UTF-8").linesIterator.toSeq
    assert(prompts.length == 4) // 1st + invalid-retry + 2nd + 3rd (then sticky)
    assert(prompts.head.contains(sortedNames.head))
    val first = new String(Files.readAllBytes(Paths.get(dir, sortedNames.head)))
    assert(first == "STALE") // skipped
    val second = new String(Files.readAllBytes(Paths.get(dir, sortedNames(1))))
    assert(second != "STALE") // overwritten

    // s[k]ip all after the first answer: only one prompt, nothing written
    sortedNames.foreach(f => Files.writeString(Paths.get(dir, f), "STALE2"))
    val (a2, out2) = ask("k\n")
    assert(BoundaryWriter.write(df, dir, a2) == 0)
    assert(new String(out2.toByteArray, "UTF-8").linesIterator.size == 1)

    // EOF degrades to skip-all instead of crashing mid-export
    val (a3, _) = ask("")
    assert(BoundaryWriter.write(df, dir, a3) == 0)
  }
}
