package graft

import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact golden pin of the full golden-scene sink output (the CI-MD5
  * precedent of the reference, `branch-verify.yml:27-31`). The fixture was
  * generated once from the pipeline AFTER its row values were independently
  * verified against hand-traced reference semantics (BoundaryExtractSpec);
  * from then on it freezes every byte — float rendering, ring order,
  * dedup suffixes, JSON layout — against regressions.
  */
class GoldenFileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("golden scene sink output is byte-identical to the pinned fixture") {
    val (n, w, r) = graft.fixtures.OsmScenes.golden.toDFs(spark)
    val df = graft.osm.BoundaryExtract.extractWithSinks(spark, r, w, n, 8, 8)
      .select("relation_id", "out_name", "poly_text", "geojson").orderBy("relation_id")
    val sb = new StringBuilder
    df.collect().foreach { row =>
      sb.append("### relation ").append(row.getLong(0)).append(" file ").append(row.getString(1)).append('\n')
      sb.append("--- poly\n").append(row.getString(2))
      sb.append("--- geojson\n").append(if (row.isNullAt(3)) "NULL" else row.getString(3)).append('\n')
    }
    val expected = new String(
      getClass.getResourceAsStream("/golden/golden_scene.txt").readAllBytes(), "UTF-8")
    assert(sb.toString == expected)
  }
}
