package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.img.{IcebergShaped, ImageTable}

class IcebergShapedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("write → readVerified round trip; snapshot counts match; torn write invisible") {
    val dir = java.nio.file.Files.createTempDirectory("graft-iceberg").toString
    val imgs = ImageTable.generate(spark, 200, 8).toDF()
    val snap = IcebergShaped.write(spark, imgs, dir, buckets = 4)
    assert(snap.total_rows == 200)
    assert(snap.files.nonEmpty && snap.files.map(_.rows).sum == 200)

    val (df, total) = IcebergShaped.readVerified(spark, dir)
    assert(total == 200 && df.count() == 200)
    assert(df.columns.toSet == imgs.columns.toSet) // __bucket stripped

    // corrupting the data (drop a file) must fail verification
    val dataFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "data"))
      .filter(p => p.toString.endsWith(".parquet")).toArray.map(_.toString)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dataFiles.head))
    intercept[Exception](IcebergShaped.readVerified(spark, dir))

    // no manifest → refuse to read
    val dir2 = java.nio.file.Files.createTempDirectory("graft-iceberg2").toString
    imgs.write.mode("overwrite").parquet(s"$dir2/data")
    intercept[Exception](IcebergShaped.readVerified(spark, dir2))
  }

  test("snapshot id is deterministic for identical content") {
    val d1 = java.nio.file.Files.createTempDirectory("gi1").toString
    val d2 = java.nio.file.Files.createTempDirectory("gi2").toString
    val imgs = ImageTable.generate(spark, 64, 4).toDF()
    val s1 = IcebergShaped.write(spark, imgs, d1, buckets = 2)
    val s2 = IcebergShaped.write(spark, imgs, d2, buckets = 2)
    assert(s1.total_rows == s2.total_rows)
    assert(s1.files.map(_.rows).sorted == s2.files.map(_.rows).sorted)
  }
}
