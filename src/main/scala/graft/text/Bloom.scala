package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Distributed Bloom filter over a BIGINT key column — the broadcast-side
  * scale path for membership tests against a bounded reference set (eval-set
  * decontamination, blocklists, already-seen ids).
  *
  * Contrast with the join form (q67): joining corpus n-grams against eval
  * n-grams shuffles the CORPUS gram stream on the join key — at 100 TB that
  * exchange dwarfs everything else in the job. The Bloom form pays one tiny
  * job over the reference set (narrow flatMap → m/64-row bit_or aggregate →
  * driver collect of the bitset, 8 KB at m=2^16), then membership is a pure
  * map-side column predicate on the corpus: zero corpus shuffle, zero joins.
  * The price is a bounded false-positive rate (~(1-e^(-kn/m))^k, no false
  * negatives) — the right trade for a KEEP/DROP gate; q67 stays the exact
  * audit. Both the build and the probe use splitmix64(key + j) — native
  * codegen'd expression, term-for-term replayable in the DuckDB oracle, so
  * even the false positives are deterministic and bit-identical cross-engine.
  *
  * Probe j's bit position is `(splitmix64(key + j) >>> 32) % m`: the high
  * word of the mix, uniform, and nonnegative in both engines' arithmetic
  * (unsigned-shift on the JVM, integer-div in the HUGEINT oracle domain).
  */
object Bloom {

  /** Build the filter: returns the bitset as Array[Long] of length mBits/64.
    * @param keys DataFrame with LongType column `keyCol` (dupes fine)
    * @param mBits filter width in bits — power of two, ≤ 2^31, mult. of 64
    * @param k     probes per key (1 ≤ k ≤ 16)
    */
  def build(spark: SparkSession, keys: DataFrame, keyCol: String,
      mBits: Int, k: Int): Array[Long] = {
    require(mBits >= 64 && Integer.bitCount(mBits) == 1,
      s"mBits must be a power of two >= 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    val words = spark.range(k).crossJoin(keys.select(col(keyCol).as("__key")))
      .select((col("__key") + col("id")).as("seed"))
      .select(pmod(shiftrightunsigned(
        GraftFunctions.splitmixCol(spark, col("seed")), 32), lit(mBits.toLong)).as("pos"))
      .select((col("pos") / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("mask"))
      .groupBy("word").agg(bit_or(col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership predicate column: true iff all k probe bits for `key` are
    * set. The bitset ships as an array literal inside the generated code —
    * no UDF, no join; the k probes unroll to a codegen'd conjunction.
    */
  def contains(spark: SparkSession, bloom: Array[Long], key: Column,
      mBits: Int, k: Int): Column = {
    val bl = typedLit(bloom.toSeq)
    (0 until k).map { j =>
      val pos = pmod(shiftrightunsigned(
        GraftFunctions.splitmixCol(spark, key + lit(j.toLong)), 32), lit(mBits.toLong))
      val word = element_at(bl, (pos / 64).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }
}
