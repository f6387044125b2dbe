package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.img.{ImageTable, Jpeg, Phash}

/** The perceptual-hash contract: IMAGE identity survives lossy re-encoding
  * (small Hamming distance) while distinct images stay far apart — the
  * property that makes phash-based image dedup work at all. The corpus is
  * deterministic, so these are exact assertions, not statistical floors.
  */
class PhashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def corpus(n: Int) = (0L until n.toLong).map { i =>
    val w = ImageTable.widthOf(i); val h = ImageTable.heightOf(i)
    val px = ImageTable.renderPixels(i, w, h)
    (i, px, w, h)
  }

  test("pHash separates JPEG re-encodes (<=4 bits) from distinct images (>=5 bits)") {
    val hashes = corpus(30).map { case (i, px, w, h) =>
      val re = Jpeg.decode(Jpeg.encode(px, w, h))._1
      (i, Phash.phash64(px, w, h), Phash.phash64(re, w, h))
    }
    hashes.foreach { case (i, orig, reenc) =>
      val d = java.lang.Long.bitCount(orig ^ reenc)
      assert(d <= 4, s"image $i: re-encode moved phash by $d bits")
    }
    for (a <- hashes; b <- hashes if b._1 < a._1) {
      val d = java.lang.Long.bitCount(a._2 ^ b._2)
      assert(d >= 5, s"images ${a._1}/${b._1}: distinct images only $d bits apart")
    }
  }

  test("hammingPairs over pHashes dedups JPEG re-encodes with zero false pairs") {
    import spark.implicits._
    val rows = corpus(30).flatMap { case (i, px, w, h) =>
      val re = Jpeg.decode(Jpeg.encode(px, w, h))._1
      Seq((i, Phash.phash64(px, w, h)), (i + 100000L, Phash.phash64(re, w, h)))
    }
    val fps = rows.toDF("id", "fp")
    // 8×8-bit bands: the pigeonhole guarantee covers Hamming <= 7, so at
    // maxHamming=4 EVERY planted pair must surface — total recall, not a floor
    val pairs = graft.dedup.Dedup.hammingPairs(spark, fps, maxHamming = 4, bands = 8)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val got = pairs.map(p => (p._1, p._2)).toSet
    val planted = (0L until 30L).map(i => (i, i + 100000L)).toSet
    assert(planted.subsetOf(got), s"missed planted pairs: ${planted -- got}")
    // the corpus' distinct images sit >=5 bits apart, so nothing else may pair
    assert(got.subsetOf(planted), s"false pairs: ${got -- planted}")
  }
}
