package graft.img

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** "Iceberg-shaped" table layout on plain Parquet (SURVEY.md §7.1 — no
  * Iceberg runtime in the sandbox): bucket-partitioned data files plus an
  * explicit snapshot manifest giving the metadata Iceberg would —
  * snapshot id, file list with per-file row counts, and schema fingerprint.
  * Reads VERIFY the manifest against the files (row-count equality), the
  * property Iceberg snapshots guarantee; writes commit the manifest
  * atomically last (temp + rename), so a torn write is invisible.
  */
object IcebergShaped {

  final case class FileEntry(path: String, rows: Long)
  final case class Snapshot(snapshot_id: Long, files: Seq[FileEntry],
      total_rows: Long, schema_json: String)

  private def manifestPath(dir: String) = Paths.get(dir, "_snapshot.json")

  def write(spark: SparkSession, df: DataFrame, dir: String, buckets: Int = 8,
      bucketCol: String = "image_id"): Snapshot = {
    df.withColumn("__bucket", pmod(hash(col(bucketCol)), lit(buckets)))
      .write.mode("overwrite").partitionBy("__bucket").parquet(s"$dir/data")
    // per-file row counts from the written files themselves
    val files = spark.read.parquet(s"$dir/data")
      .select(input_file_name().as("path"))
      .groupBy("path").agg(count(lit(1)).as("rows"))
      .collect().map(r => FileEntry(r.getString(0), r.getLong(1))).toSeq.sortBy(_.path)
    val snap = Snapshot(
      snapshot_id = files.map(f => f.path.hashCode.toLong * 31 + f.rows).sum, // content-derived, deterministic
      files = files,
      total_rows = files.map(_.rows).sum,
      schema_json = df.schema.json)
    val json = {
      val fs = snap.files.map(f => s"""{"path":"${f.path}","rows":${f.rows}}""").mkString(",")
      s"""{"snapshot_id":${snap.snapshot_id},"total_rows":${snap.total_rows},"files":[$fs],"schema":${escape(snap.schema_json)}}"""
    }
    val tmp = Paths.get(dir, "._snapshot.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE)
    snap
  }

  private def escape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Read with verification: manifest must exist and its total row count
    * must match the files. Returns (data, snapshot total).
    */
  def readVerified(spark: SparkSession, dir: String): (DataFrame, Long) = {
    require(Files.exists(manifestPath(dir)), s"no committed snapshot in $dir")
    val json = Files.readString(manifestPath(dir))
    val total = """"total_rows":(\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    val df = spark.read.parquet(s"$dir/data").drop("__bucket")
    val actual = df.count()
    require(actual == total, s"snapshot says $total rows, files have $actual")
    (df, total)
  }
}
