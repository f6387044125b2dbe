package graft.emit

import graft.geom.{Pt, PolygonRow}
import FloatFmt.fmtF32

/** Row emitters for the two sinks. The reference writes one FILE per
  * boundary; distributed parity is one ROW per boundary (SURVEY.md §3.3) —
  * these produce the file CONTENT as a string column, byte-identical to what
  * the reference would write.
  */
object Emitters {

  /** Osmosis `.poly` format — `/root/reference/src/output/file_writer_poly.rs:9-31`.
    * name\n, then per ring: `area_{i+1}\n`, per point `\t{lon} \t{lat}\n`,
    * `END\n`; final `END\n`. Rings written exactly as stitched: NOT explicitly
    * closed, no `!` hole prefix.
    */
  def polyText(p: PolygonRow): String = {
    val sb = new StringBuilder
    sb.append(p.name).append('\n')
    p.rings.zipWithIndex.foreach { case (ring, i) =>
      sb.append("area_").append(i + 1).append('\n')
      ring.foreach { pt =>
        sb.append('\t').append(fmtF32(pt.lon)).append(" \t").append(fmtF32(pt.lat)).append('\n')
      }
      sb.append("END\n")
    }
    sb.append("END\n")
    sb.toString
  }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.toString
  }

  /** Ring auto-closure as performed by geo_types::Polygon::new in the
    * reference (`file_writer_geojson.rs:53-60`): append the first coord when
    * last != first (compared on f32 values).
    */
  def closeRing(ring: Seq[Pt]): Seq[Pt] =
    if (ring.nonEmpty && (ring.head.lat != ring.last.lat || ring.head.lon != ring.last.lon))
      ring :+ ring.head
    else ring

  private def ringJson(ring: Seq[Pt]): String =
    closeRing(ring)
      .map(pt => s"[${fmtF32(pt.lon)},${fmtF32(pt.lat)}]")
      .mkString("[", ",", "]")

  /** GeoJSON Feature — `/root/reference/src/output/file_writer_geojson.rs:14-64`.
    * geometry: `Polygon` for exactly 1 ring, `MultiPolygon` for >1 (each ring
    * a free-standing exterior with zero holes — roles ignored, no hole
    * subtraction, no RFC7946 rewind), None (error in the reference) for 0
    * rings → we return None. Keys serialized in sorted order (serde_json's
    * default BTreeMap ordering); coordinates are [lon, lat] with shortest-
    * round-trip f32 rendering, rings auto-closed.
    */
  def geoJson(p: PolygonRow): Option[String] = {
    if (p.rings.isEmpty) return None
    val geometry =
      if (p.rings.length == 1)
        s"""{"coordinates":[${ringJson(p.rings.head)}],"type":"Polygon"}"""
      else {
        val polys = p.rings.map(r => s"[${ringJson(r)}]").mkString(",")
        s"""{"coordinates":[$polys],"type":"MultiPolygon"}"""
      }
    val props =
      s"""{"admin_level":${p.admin_level},"name":"${jsonEscape(p.name)}","relation_id":${p.relation_id}}"""
    Some(s"""{"geometry":$geometry,"properties":$props,"type":"Feature"}""")
  }
}
