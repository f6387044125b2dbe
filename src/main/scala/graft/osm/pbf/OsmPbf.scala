package graft.osm.pbf

import java.util.zip.{Deflater, Inflater}
import graft.fixtures.OsmScenes.{Member, NodeRow, RelationRow, WayRow}

/** OSM PBF block codec over the hand-rolled wire reader (PbfWire).
  *
  * Container layout (fileformat.proto): a stream of
  * `[int32-BE length][BlobHeader][Blob]` where BlobHeader.type is
  * "OSMHeader" (once) or "OSMData"; Blob payload is raw or zlib. Each
  * OSMData blob is one osmformat.proto PrimitiveBlock: a string table plus
  * PrimitiveGroups of dense nodes / plain nodes / ways / relations with
  * delta-coded sint64 streams.
  *
  * Coordinate semantics match the reference's osmpbfreader usage
  * (`/root/reference/src/osm_reader.rs:83-152`):
  * decimicro = (lat_offset + granularity · delta-decoded value) / 100 with
  * truncation toward zero (Rust i64 and Scala Long division agree).
  */
object OsmPbf {

  final val MemberTypes = Array("node", "way", "relation")

  /** What one PrimitiveBlock decodes to. */
  final case class Block(nodes: Seq[NodeRow], ways: Seq[WayRow], relations: Seq[RelationRow])

  /** Which entity kinds to materialize; the others are field-skipped at the
    * wire level (cheap — no string/array building), so a per-kind pass over
    * a planet file does ~1/3 of the decode work.
    */
  final case class Want(nodes: Boolean, ways: Boolean, relations: Boolean)
  object Want { val all: Want = Want(nodes = true, ways = true, relations = true) }

  // ————————————————— decode —————————————————

  def inflate(data: Array[Byte], rawSize: Int): Array[Byte] = {
    require(rawSize >= 0, s"blob missing/negative raw_size ($rawSize)")
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](rawSize)
    var off = 0
    try {
      while (off < rawSize && !inf.finished()) {
        val n = inf.inflate(out, off, rawSize - off)
        // zero progress + not finished = truncated/corrupt stream; fail
        // loudly instead of spinning the task forever
        require(n > 0 || inf.finished(),
          s"truncated/corrupt zlib stream at $off of $rawSize bytes")
        off += n
      }
    } catch {
      // zlib's checked exception would escape as a raw crash — rethrow in
      // the decoder's loud-failure vocabulary (measured: corrupt blob
      // bytes raise this on nearly every bitflip inside the deflate data)
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt zlib blob data: ${e.getMessage}")
    } finally inf.end()
    require(off == rawSize, s"inflate produced $off of $rawSize bytes")
    out
  }

  /** Blob → uncompressed payload (raw or zlib). */
  def decodeBlob(blob: Array[Byte]): Array[Byte] = {
    val r = new PbfReader(blob)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: Array[Byte] = null
    while (r.hasRemaining) r.readTag() match {
      case (1, 2) => raw = r.readBytes()
      case (2, 0) => rawSize = r.readVarint().toInt
      case (3, 2) => zlib = r.readBytes()
      case (_, w) => r.skipField(w)
    }
    if (raw != null) raw
    else {
      require(zlib != null, "blob has neither raw nor zlib_data (unsupported codec)")
      inflate(zlib, rawSize)
    }
  }

  /** One PrimitiveBlock → typed rows (subset selected by `want`). */
  def decodePrimitiveBlock(payload: Array[Byte], want: Want = Want.all): Block = {
    val r = new PbfReader(payload)
    var strings: Array[String] = Array("")
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    val groups = scala.collection.mutable.ArrayBuffer.empty[PbfReader]
    while (r.hasRemaining) r.readTag() match {
      case (1, 2) => // StringTable{repeated bytes s = 1}
        val st = r.readMessage()
        val ss = scala.collection.mutable.ArrayBuffer.empty[String]
        while (st.hasRemaining) st.readTag() match {
          case (1, 2) => ss += st.readString()
          case (_, w) => st.skipField(w)
        }
        strings = ss.toArray
      case (2, 2)  => groups += r.readMessage()
      case (17, 0) => granularity = r.readVarint()
      case (19, 0) => latOffset = r.readVarint()
      case (20, 0) => lonOffset = r.readVarint()
      case (_, w)  => r.skipField(w)
    }
    def toDecimicroLat(v: Long): Int = ((latOffset + granularity * v) / 100L).toInt
    def toDecimicroLon(v: Long): Int = ((lonOffset + granularity * v) / 100L).toInt
    // every string reference comes from untrusted varints — a corrupt
    // index must fail loudly, not throw a raw ArrayIndexOutOfBounds
    def str(i: Long): String = {
      require(i >= 0 && i < strings.length,
        s"corrupt PBF: string-table index $i out of range (${strings.length} entries)")
      strings(i.toInt)
    }
    def tagsOf(keys: Array[Long], vals: Array[Long]): Map[String, String] = {
      require(keys.length == vals.length,
        s"corrupt PBF: ${keys.length} tag keys vs ${vals.length} values")
      keys.indices.map(i => str(keys(i)) -> str(vals(i))).toMap
    }

    val nodes = scala.collection.mutable.ArrayBuffer.empty[NodeRow]
    val ways = scala.collection.mutable.ArrayBuffer.empty[WayRow]
    val rels = scala.collection.mutable.ArrayBuffer.empty[RelationRow]

    groups.foreach { g =>
      while (g.hasRemaining) g.readTag() match {
        case (1, 2) if want.nodes => // plain Node
          val n = g.readMessage()
          var id = 0L; var lat = 0L; var lon = 0L
          var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
          while (n.hasRemaining) n.readTag() match {
            case (1, 0) => id = n.readZigzag()
            case (2, 2) => keys = n.packedVarints()
            case (3, 2) => vals = n.packedVarints()
            case (8, 0) => lat = n.readZigzag()
            case (9, 0) => lon = n.readZigzag()
            case (_, w) => n.skipField(w)
          }
          nodes += NodeRow(id, toDecimicroLat(lat), toDecimicroLon(lon), tagsOf(keys, vals))
        case (2, 2) if want.nodes => // DenseNodes
          val d = g.readMessage()
          var ids = Array.emptyLongArray; var lats = Array.emptyLongArray
          var lons = Array.emptyLongArray; var kvs = Array.emptyLongArray
          while (d.hasRemaining) d.readTag() match {
            case (1, 2)  => ids = d.packedZigzags()
            case (8, 2)  => lats = d.packedZigzags()
            case (9, 2)  => lons = d.packedZigzags()
            case (10, 2) => kvs = d.packedVarints()
            case (_, w)  => d.skipField(w)
          }
          // the three delta streams must be parallel — corrupt blocks can
          // truncate one of them and the walk below would index past it
          require(lats.length == ids.length && lons.length == ids.length,
            s"corrupt PBF: dense node streams disagree (${ids.length} ids, " +
              s"${lats.length} lats, ${lons.length} lons)")
          var id = 0L; var la = 0L; var lo = 0L; var k = 0
          var i = 0
          while (i < ids.length) {
            id += ids(i); la += lats(i); lo += lons(i)
            var tags = Map.empty[String, String]
            if (kvs.nonEmpty) {
              while (k < kvs.length && kvs(k) != 0L) {
                require(k + 1 < kvs.length, "corrupt PBF: dangling dense key without value")
                tags += str(kvs(k)) -> str(kvs(k + 1))
                k += 2
              }
              k += 1 // the 0 separator
            }
            nodes += NodeRow(id, toDecimicroLat(la), toDecimicroLon(lo), tags)
            i += 1
          }
        case (3, 2) if want.ways => // Way
          val wr = g.readMessage()
          var id = 0L
          var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
          var refs = Array.emptyLongArray
          while (wr.hasRemaining) wr.readTag() match {
            case (1, 0) => id = wr.readVarint()
            case (2, 2) => keys = wr.packedVarints()
            case (3, 2) => vals = wr.packedVarints()
            case (8, 2) => refs = wr.packedZigzags()
            case (_, w) => wr.skipField(w)
          }
          var acc = 0L
          val nodeIds = refs.map { d => acc += d; acc }.toSeq
          ways += WayRow(id, nodeIds, tagsOf(keys, vals))
        case (4, 2) if want.relations => // Relation
          val rr = g.readMessage()
          var id = 0L
          var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
          var roles = Array.emptyLongArray; var memids = Array.emptyLongArray
          var types = Array.emptyLongArray
          while (rr.hasRemaining) rr.readTag() match {
            case (1, 0)  => id = rr.readVarint()
            case (2, 2)  => keys = rr.packedVarints()
            case (3, 2)  => vals = rr.packedVarints()
            case (8, 2)  => roles = rr.packedVarints()
            case (9, 2)  => memids = rr.packedZigzags()
            case (10, 2) => types = rr.packedVarints()
            case (_, w)  => rr.skipField(w)
          }
          // the member streams must be parallel too (same corruption mode
          // as the dense-node streams)
          require(types.length == memids.length && roles.length == memids.length,
            s"corrupt PBF: relation $id member streams disagree (${memids.length} ids, " +
              s"${types.length} types, ${roles.length} roles)")
          var acc = 0L
          val members = memids.indices.map { i =>
            acc += memids(i)
            val t = types(i).toInt
            require(t >= 0 && t < MemberTypes.length,
              s"relation $id: unknown member type id $t at member $i")
            Member(MemberTypes(t), acc, str(roles(i)))
          }
          rels += RelationRow(id, members, tagsOf(keys, vals))
        case (_, w) => g.skipField(w)
      }
    }
    Block(nodes.toSeq, ways.toSeq, rels.toSeq)
  }

  // ————————————————— encode (test/fixture writer) —————————————————

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](data.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** A mutable string table builder (index 0 reserved = ""). */
  private final class StringTable {
    private val idx = scala.collection.mutable.LinkedHashMap("" -> 0)
    def id(s: String): Int = idx.getOrElseUpdate(s, idx.size)
    def strings: Seq[String] = idx.keys.toSeq
  }

  private def encodePrimitiveBlock(body: (PbfWriter, StringTable) => Unit): Array[Byte] = {
    val st = new StringTable
    val groups = new PbfWriter
    body(groups, st)
    val block = new PbfWriter
    block.message(1) { w => st.strings.foreach(s => w.string(1, s)) }
    // groups were written with field tag 2 already
    block.raw(groups.result())
    block.int(17, 100L) // granularity (explicit, = default)
    block.result()
  }

  private def blob(payload: Array[Byte], zlib: Boolean): Array[Byte] = {
    val b = new PbfWriter
    if (zlib) { b.int(2, payload.length.toLong); b.bytes(3, deflate(payload)) }
    else b.bytes(1, payload)
    b.result()
  }

  private def frame(headerType: String, blobBytes: Array[Byte]): Array[Byte] = {
    val h = new PbfWriter
    h.string(1, headerType)
    h.int(3, blobBytes.length.toLong)
    val hb = h.result()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]((hb.length >>> 24).toByte, (hb.length >>> 16).toByte,
      (hb.length >>> 8).toByte, hb.length.toByte))
    out.write(hb)
    out.write(blobBytes)
    out.toByteArray
  }

  /** Encode a full .osm.pbf byte stream: OSMHeader + one OSMData blob per
    * entity-kind chunk (dense nodes / ways / relations), `chunk` entities
    * per blob so multi-blob indexing and parallel decode are exercised.
    */
  def encode(nodes: Seq[NodeRow], ways: Seq[WayRow], relations: Seq[RelationRow],
      zlib: Boolean = true, chunk: Int = 8000,
      requiredFeatures: Seq[String] = Seq("OsmSchema-V0.6", "DenseNodes")): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val header = {
      val w = new PbfWriter
      requiredFeatures.foreach(w.string(4, _)) // required_features
      w.string(16, "graft-fixture-writer") // writingprogram
      w.result()
    }
    out.write(frame("OSMHeader", blob(header, zlib)))

    nodes.grouped(math.max(chunk, 1)).foreach { ns =>
      out.write(frame("OSMData", blob(encodePrimitiveBlock { (g, st) =>
        g.message(2) { grp =>
          grp.message(2) { d => // DenseNodes
            var pid = 0L; var pla = 0L; var plo = 0L
            d.packedZigzags(1, ns.map { n => val v = n.id - pid; pid = n.id; v })
            d.packedZigzags(8, ns.map { n =>
              val nano = n.decimicro_lat.toLong * 100L
              val v = nano / 100L - pla; pla = nano / 100L; v
            })
            d.packedZigzags(9, ns.map { n =>
              val nano = n.decimicro_lon.toLong * 100L
              val v = nano / 100L - plo; plo = nano / 100L; v
            })
            val kvs = ns.flatMap(n =>
              n.tags.toSeq.flatMap { case (k, v) => Seq(st.id(k).toLong, st.id(v).toLong) } :+ 0L)
            if (ns.exists(_.tags.nonEmpty)) d.packedVarints(10, kvs)
          }
        }
      }, zlib)))
    }

    ways.grouped(math.max(chunk, 1)).foreach { ws =>
      out.write(frame("OSMData", blob(encodePrimitiveBlock { (g, st) =>
        g.message(2) { grp =>
          ws.foreach { wy =>
            grp.message(3) { w =>
              w.int(1, wy.id)
              w.packedVarints(2, wy.tags.keys.map(st.id(_).toLong))
              w.packedVarints(3, wy.tags.values.map(st.id(_).toLong))
              var prev = 0L
              w.packedZigzags(8, wy.node_ids.map { n => val v = n - prev; prev = n; v })
            }
          }
        }
      }, zlib)))
    }

    relations.grouped(math.max(chunk, 1)).foreach { rs =>
      out.write(frame("OSMData", blob(encodePrimitiveBlock { (g, st) =>
        g.message(2) { grp =>
          rs.foreach { rel =>
            grp.message(4) { w =>
              w.int(1, rel.id)
              w.packedVarints(2, rel.tags.keys.map(st.id(_).toLong))
              w.packedVarints(3, rel.tags.values.map(st.id(_).toLong))
              w.packedVarints(8, rel.members.map(m => st.id(m.role).toLong))
              var prev = 0L
              w.packedZigzags(9, rel.members.map { m =>
                val v = m.member_id - prev; prev = m.member_id; v
              })
              w.packedVarints(10, rel.members.map { m =>
                val t = MemberTypes.indexOf(m.member_type)
                require(t >= 0, s"relation ${rel.id}: member_type '${m.member_type}' " +
                  "must be node|way|relation")
                t.toLong
              })
            }
          }
        }
      }, zlib)))
    }
    out.toByteArray
  }
}
