package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lineage.Skew

/** Key-skew report pins: crafted hot-key and uniform distributions with
  * hand-computed discrete quantiles, ratios, and salt factors.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hot key: p50/p99 from the count histogram, salt levels the max") {
    // key 0 -> 1000 rows; keys 1..99 -> 10 rows each
    val rows = (0 until 1000).map(_ => 0L) ++
      (1 until 100).flatMap(k => Seq.fill(10)(k.toLong))
    val r = Skew.keyReport(rows.toDF("k"), col("k")).collect().head
    assert(r.getAs[Long]("n_keys") == 100L)
    assert(r.getAs[Long]("n_rows") == 1990L)
    assert(r.getAs[Long]("max_count") == 1000L)
    assert(r.getAs[Long]("p50_count") == 10L)
    assert(r.getAs[Long]("p99_count") == 10L)
    assert(r.getAs[Long]("skew_ratio_x100") == 10000L)
    assert(r.getAs[Long]("suggested_salt") == 100L)
  }

  test("uniform keys: ratio 100, salt 1") {
    val rows = (0 until 50).flatMap(k => Seq.fill(7)(k.toLong))
    val r = Skew.keyReport(rows.toDF("k"), col("k")).collect().head
    assert(r.getAs[Long]("p50_count") == 7L && r.getAs[Long]("p99_count") == 7L)
    assert(r.getAs[Long]("skew_ratio_x100") == 100L)
    assert(r.getAs[Long]("suggested_salt") == 1L)
  }

  test("p99 lands above p50 on a graded distribution") {
    // counts 1..100, one key each: p50 = 50, p99 = 99
    val rows = (1 to 100).flatMap(c => Seq.fill(c)(c.toLong))
    val r = Skew.keyReport(rows.toDF("k"), col("k")).collect().head
    assert(r.getAs[Long]("p50_count") == 50L)
    assert(r.getAs[Long]("p99_count") == 99L)
    assert(r.getAs[Long]("max_count") == 100L)
  }
}
