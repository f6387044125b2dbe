package graft.osm.pbf

import java.io.RandomAccessFile
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.fixtures.OsmScenes.{NodeRow, RelationRow, WayRow}

/** Distributed .osm.pbf ingestion: the container the reference consumes
  * directly (`/root/reference/src/osm_reader.rs:83-152`), turned into the
  * engine's (relations, ways, nodes) DataFrame triple.
  *
  * Scale design: blobs are the PBF's own parallelism unit (≤ 32 MiB
  * uncompressed by spec, typically 8 MiB). The driver does ONE cheap
  * sequential walk of the 4-byte-length + BlobHeader frames — no payload
  * is read — to build a (path, offset, length) index, then executors
  * decode blobs in parallel with `mapPartitions`, each opening the file
  * and reading only its ranges. A planet-scale directory of .pbf files
  * parallelizes across files × blobs. Per-kind reads wire-skip the other
  * entity kinds (OsmPbf.Want), mirroring the reference's three typed
  * passes without three full decodes.
  */
object PbfSource {

  /** One OSMData blob: where to read it and how to frame it. */
  final case class BlobRef(path: String, offset: Long, length: Int)

  /** Feature set this decoder implements. The OSM PBF contract
    * (osmformat.proto HeaderBlock.required_features) is that a reader MUST
    * reject a file requiring a feature it does not understand — e.g.
    * `HistoricalInformation` changes entity semantics, so decoding it
    * silently-wrong is worse than erroring (the reference's osmpbfreader
    * enforces the same).
    */
  val SupportedFeatures: Set[String] = Set("OsmSchema-V0.6", "DenseNodes")

  // spec limits (OSM PBF fileformat): BlobHeader ≤ 64 KiB, blob ≤ 32 MiB.
  // Validated BEFORE allocation — a corrupt 4-byte frame length would
  // otherwise drive a NegativeArraySizeException or a ~2 GiB allocation
  // deep inside readFully.
  private val MaxBlobHeader = 64 * 1024
  private val MaxBlobSize = 32 * 1024 * 1024

  /** HeaderBlock.required_features (field 4, repeated string). */
  private def requiredFeaturesOf(headerPayload: Array[Byte]): Seq[String] = {
    val r = new PbfReader(headerPayload)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (r.hasRemaining) r.readTag() match {
      case (4, 2) => out += r.readString()
      case (_, w) => r.skipField(w)
    }
    out.toSeq
  }

  /** Driver-side index walk: reads only the framing (4-byte length +
    * BlobHeader, tens of bytes per ~8 MiB blob) — plus the one OSMHeader
    * blob, whose required_features are validated against
    * [[SupportedFeatures]].
    */
  def blobIndex(path: String): Seq[BlobRef] = {
    val f = new RandomAccessFile(path, "r")
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[BlobRef]
      var pos = 0L
      val len = f.length()
      while (pos + 4 <= len) {
        f.seek(pos)
        val hlen = f.readInt()
        require(hlen > 0 && hlen <= MaxBlobHeader,
          s"corrupt BlobHeader length $hlen at offset $pos in $path (spec max $MaxBlobHeader)")
        val hbytes = new Array[Byte](hlen)
        f.readFully(hbytes)
        val r = new PbfReader(hbytes)
        var htype = ""
        var datasize = -1
        while (r.hasRemaining) r.readTag() match {
          case (1, 2) => htype = r.readString()
          case (3, 0) => datasize = r.readVarint().toInt
          case (_, w) => r.skipField(w)
        }
        require(datasize >= 0, s"BlobHeader without datasize at $pos in $path")
        require(datasize <= MaxBlobSize,
          s"corrupt blob datasize $datasize at offset $pos in $path (spec max $MaxBlobSize)")
        val dataOff = pos + 4 + hlen
        if (htype == "OSMData") out += BlobRef(path, dataOff, datasize)
        else if (htype == "OSMHeader") {
          val hb = new Array[Byte](datasize)
          f.seek(dataOff)
          f.readFully(hb)
          val unknown = requiredFeaturesOf(OsmPbf.decodeBlob(hb))
            .filterNot(SupportedFeatures.contains)
          require(unknown.isEmpty,
            s"$path requires unsupported PBF feature(s) ${unknown.mkString(", ")} " +
              s"(supported: ${SupportedFeatures.toSeq.sorted.mkString(", ")}) — " +
              "decoding would be silently wrong, refusing")
        }
        pos = dataOff + datasize
      }
      out.toSeq
    } finally f.close()
  }

  /** All .osm.pbf blobs under `path` (file or directory). */
  def indexAll(path: String): Seq[BlobRef] = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory) f.listFiles().filter(_.getName.endsWith(".pbf")).sortBy(_.getName)
      else Array(f)
    files.flatMap(x => blobIndex(x.getPath)).toSeq
  }

  private def readBlob(ref: BlobRef): Array[Byte] = {
    val f = new RandomAccessFile(ref.path, "r")
    try {
      f.seek(ref.offset)
      val b = new Array[Byte](ref.length)
      f.readFully(b)
      b
    } finally f.close()
  }

  private def blocks(spark: SparkSession, path: String, want: OsmPbf.Want,
      partitions: Int): Dataset[OsmPbf.Block] = {
    import spark.implicits._
    val refs = indexAll(path)
    val p = math.max(1, math.min(partitions, refs.size))
    spark.createDataset(refs).repartition(p)
      .mapPartitions(_.map(ref => OsmPbf.decodePrimitiveBlock(OsmPbf.decodeBlob(readBlob(ref)), want)))
  }

  def nodes(spark: SparkSession, path: String, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    blocks(spark, path, OsmPbf.Want(nodes = true, ways = false, relations = false), partitions)
      .flatMap(_.nodes).toDF()
  }

  def ways(spark: SparkSession, path: String, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    blocks(spark, path, OsmPbf.Want(nodes = false, ways = true, relations = false), partitions)
      .flatMap(_.ways).toDF()
  }

  def relations(spark: SparkSession, path: String, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    blocks(spark, path, OsmPbf.Want(nodes = false, ways = false, relations = true), partitions)
      .flatMap(_.relations).toDF()
  }

  /** The triple in the engine's canonical order: (relations, ways, nodes). */
  def readTriple(spark: SparkSession, path: String,
      partitions: Int = 32): (DataFrame, DataFrame, DataFrame) =
    (relations(spark, path, partitions), ways(spark, path, partitions),
      nodes(spark, path, partitions))

  /** Write a .osm.pbf fixture file (test/bench synthesis only).
    * `requiredFeatures` is injectable so tests can exercise the
    * unsupported-feature rejection path.
    */
  def writeFixture(path: String, nodes: Seq[NodeRow], ways: Seq[WayRow],
      relations: Seq[RelationRow], zlib: Boolean = true, chunk: Int = 8000,
      requiredFeatures: Seq[String] = Seq("OsmSchema-V0.6", "DenseNodes")): Unit = {
    val bytes = OsmPbf.encode(nodes, ways, relations, zlib, chunk, requiredFeatures)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
  }
}
