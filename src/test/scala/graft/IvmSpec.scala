package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.{Ivm, SnapshotTable}

/** The maintained view must equal a from-scratch aggregate after every
  * kind of commit, including groups leaving and entering the view.
  */
class IvmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("ivm").toFile
    d.delete(); d.getAbsolutePath
  }
  private val bucketOf = pmod(hash(col("k")), lit(8))

  private def agg(df: org.apache.spark.sql.DataFrame) = df
    .groupBy((col("k") % 7).as("grp"))
    .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sm"))

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("maintained view tracks merge, delete, and compaction exactly") {
    val dir = tmp()
    def rows(lo: Int, hi: Int, mul: Long) =
      (lo until hi).map(i => (i.toLong, i * mul)).toDF("k", "v")
    SnapshotTable.create(spark, rows(0, 200, 3L), dir, 8, bucketOf)
    var view = agg(SnapshotTable.read(spark, dir, Some(1L)))
    // v2: update every 5th value, insert 40 new keys
    val upd = rows(0, 200, 11L).filter(col("k") % 5 === 0)
      .union(rows(200, 240, 3L))
    SnapshotTable.merge(spark, upd, dir, "k", bucketOf)
    view = Ivm.maintainSumCount(view,
      SnapshotTable.changes(spark, dir, 1L, 2L, "k").withColumn("grp", col("k") % 7),
      "grp", "v")
    assert(asMap(view) === asMap(agg(SnapshotTable.read(spark, dir, Some(2L)))))
    // v3: delete a slice; v4: append (fragments buckets); v5: a real
    // compaction, which must contribute nothing to the delta
    SnapshotTable.delete(spark, dir, col("k") % 4 === 1, bucketOf)
    SnapshotTable.append(spark, rows(240, 260, 3L), dir, bucketOf)
    val m5 = SnapshotTable.compact(spark, dir)
    assert(m5.version === 5L) // the compaction really happened
    view = Ivm.maintainSumCount(view,
      SnapshotTable.changes(spark, dir, 2L, 5L, "k").withColumn("grp", col("k") % 7),
      "grp", "v")
    assert(asMap(view) === asMap(agg(SnapshotTable.read(spark, dir))))
  }

  test("a group fully deleted leaves the view; a new group enters it") {
    val prev = Seq((1L, 2L, 30L)).toDF("grp", "cnt", "sm")
    val cdc = Seq(
      ("delete", 1L, 10L), ("delete", 1L, 20L), // group 1 drained
      ("insert", 9L, 5L)).toDF("_change_type", "grp", "v")
    val got = asMap(Ivm.maintainSumCount(prev, cdc, "grp", "v"))
    assert(got === Map(9L -> ((1L, 5L))))
  }

  test("an unknown _change_type is refused, not silently ignored") {
    val prev = Seq((1L, 1L, 1L)).toDF("grp", "cnt", "sm")
    val cdc = Seq(("upsert", 1L, 1L)).toDF("_change_type", "grp", "v")
    // the refusal is IN-PLAN (raise_error) so the function composes
    // lazily — it fires at execution, possibly wrapped by the scheduler
    val ex = intercept[Exception] {
      Ivm.maintainSumCount(prev, cdc, "grp", "v").collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("unknown _change_type")), msgs.mkString(" | "))
  }
}
