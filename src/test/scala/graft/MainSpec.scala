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
}
