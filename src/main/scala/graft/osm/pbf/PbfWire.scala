package graft.osm.pbf

/** Minimal protobuf wire-format reader/writer — just enough for the OSM PBF
  * container (fileformat.proto + osmformat.proto, both public domain /
  * published with the format). Hand-rolled because the sandbox resolves no
  * protobuf runtime; the OSM subset uses only varint (0), 64-bit (1),
  * length-delimited (2) and 32-bit (5) wire types.
  *
  * Reference behavior being matched: `/root/reference/src/osm_reader.rs:83-152`
  * reads the same container through the osmpbfreader crate.
  */
final class PbfReader(val buf: Array[Byte], var pos: Int, val end: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)

  def hasRemaining: Boolean = pos < end

  /** unsigned LEB128 varint (up to 10 bytes). */
  def readVarint(): Long = {
    var shift = 0
    var out = 0L
    var b = 0
    do {
      require(pos < end, s"varint runs past message end $end")
      b = buf(pos) & 0xFF
      pos += 1
      out |= (b & 0x7FL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    out
  }

  def readZigzag(): Long = {
    val v = readVarint()
    (v >>> 1) ^ -(v & 1)
  }

  /** Returns (fieldNumber, wireType). */
  def readTag(): (Int, Int) = {
    val k = readVarint()
    ((k >>> 3).toInt, (k & 7).toInt)
  }

  /** A sub-reader over a length-delimited field's payload; advances this
    * reader past it. Shares the backing array — no copy.
    */
  def readMessage(): PbfReader = {
    val len = readVarint().toInt
    require(len >= 0 && pos + len <= end, s"message length $len overruns end $end at $pos")
    val r = new PbfReader(buf, pos, pos + len)
    pos += len
    r
  }

  def readBytes(): Array[Byte] = {
    val len = readVarint().toInt
    require(len >= 0 && pos + len <= end, s"bytes length $len overruns end $end at $pos")
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
    pos += len
    out
  }

  def readString(): String = new String(readBytes(), "UTF-8")

  def skipField(wireType: Int): Unit = wireType match {
    case 0 => readVarint()
    case 1 => pos += 8
    case 2 =>
      // NOT `pos += readVarint().toInt`: Scala evaluates the old `pos`
      // before the call, silently dropping the varint's own bytes
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= end, s"skip length $len overruns end $end at $pos")
      pos += len
    case 5 => pos += 4
    case w => throw new IllegalArgumentException(s"unsupported wire type $w at $pos")
  }

  def packedVarints(): Array[Long] = {
    val m = readMessage()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (m.hasRemaining) out += m.readVarint()
    out.toArray
  }

  def packedZigzags(): Array[Long] = {
    val m = readMessage()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (m.hasRemaining) out += m.readZigzag()
    out.toArray
  }
}

/** Writer counterpart — used to SYNTHESIZE deterministic .osm.pbf fixtures
  * for tests and benchmarks (no external data enters the sandbox).
  */
final class PbfWriter {
  private val out = new java.io.ByteArrayOutputStream()

  def writeVarint(v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def writeZigzagVal(v: Long): Unit = writeVarint((v << 1) ^ (v >> 63))

  def tag(field: Int, wireType: Int): Unit = writeVarint((field.toLong << 3) | wireType)

  def int(field: Int, v: Long): Unit = { tag(field, 0); writeVarint(v) }

  def zigzag(field: Int, v: Long): Unit = { tag(field, 0); writeZigzagVal(v) }

  def bytes(field: Int, b: Array[Byte]): Unit = {
    tag(field, 2); writeVarint(b.length.toLong); out.write(b)
  }

  def string(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))

  def message(field: Int)(body: PbfWriter => Unit): Unit = {
    val w = new PbfWriter
    body(w)
    bytes(field, w.result())
  }

  /** Append pre-encoded (already tagged) fields verbatim. */
  def raw(b: Array[Byte]): Unit = out.write(b)

  def packedVarints(field: Int, vs: Iterable[Long]): Unit =
    if (vs.nonEmpty) {
      val w = new PbfWriter
      vs.foreach(w.writeVarint)
      bytes(field, w.result())
    }

  def packedZigzags(field: Int, vs: Iterable[Long]): Unit =
    if (vs.nonEmpty) {
      val w = new PbfWriter
      vs.foreach(w.writeZigzagVal)
      bytes(field, w.result())
    }

  def result(): Array[Byte] = out.toByteArray
}
