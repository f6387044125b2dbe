package graft.dedup

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, typedLit}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sim.{QuantExpr, QuantKernelExpression}

/** Native Catalyst forms of the MinHash kernels — the
  * [[graft.sim.QuantExpr]] recipe applied to the dedup hot path.
  *
  * `minhash_bands(text, k, bands)` fuses shingle → k-permutation
  * signature → per-band LSH key into ONE scalar loop per document,
  * returning the `bands` (band, bkey) rows ready to explode. The typed
  * flatMap it replaces deserialized every (id, text) row to a Scala
  * tuple and re-encoded `bands` tuples per document — per-row encoder
  * round trips on the corpus-sized side of q23/q51/q134.
  *
  * `jaccard_shingles(a, b)` fuses the exact verification kernel
  * (shingle both texts, Jaccard) — candidate-pair-sized, fused for
  * uniformity: no ScalaUDF anywhere in the dedup surface.
  *
  * Parity: both call the SAME scalar kernels ([[Dedup.shingles]],
  * [[Dedup.minhashSig]], [[Dedup.bandKey]], [[Dedup.jaccard]]) that the
  * q23 DuckDB oracle replays constant-for-constant — one copy of the
  * math, so column-vs-scalar drift is impossible by construction.
  *
  * Null contract ([[graft.sim.QuantExpr]] convention): a null document
  * yields null — `explode` then drops it from banding, and a null
  * Jaccard fails every threshold filter — so corrupt rows neither
  * bucket nor verify. This is a DELIBERATE contract change: the typed
  * forms treated a null document as empty text (`shingles(null)` = ∅,
  * `simhash(null)` = 0L), so a null doc banded with every empty doc and
  * "verified" against it at Jaccard 1.0 — a nonsense duplicate. A null
  * document is corrupt input, not an empty one; it never pairs.
  */
object DedupExpr {

  /** Register the fused dedup kernels (idempotent). */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("minhash_bands",
      e => MinhashBands(e(0), e(1), e(2)), "built-in")
    r.createOrReplaceTempFunction("jaccard_shingles",
      e => JaccardShingles(e(0), e(1)), "built-in")
    r.createOrReplaceTempFunction("simhash64",
      e => Simhash64(e(0)), "built-in")
  }

  /** array<struct<band:int, bkey:bigint>> of a document's LSH band keys. */
  def minhashBandsCol(spark: SparkSession, text: Column, k: Int,
      bands: Int): Column = {
    register(spark)
    call_function("minhash_bands", text, typedLit(k), typedLit(bands))
  }

  /** Exact shingle-Jaccard of two documents. */
  def jaccardShinglesCol(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("jaccard_shingles", a, b)
  }

  /** 64-bit SimHash of a document — [[Dedup.simhash]] fused. */
  def simhash64Col(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("simhash64", text)
  }
}

/** fused shingle → minhash → band keys — see [[DedupExpr]]. */
case class MinhashBands(text: Expression, kL: Expression, bandsL: Expression)
    extends QuantKernelExpression {
  override def children: Seq[Expression] = Seq(text, kL, bandsL)
  override protected def rowChildren: Seq[Expression] = Seq(text)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bkey", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "minhash_bands"
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType)
  @transient private lazy val k = QuantExpr.decodeInt(kL)
  @transient private lazy val bands = QuantExpr.decodeInt(bandsL)
  override def compute(rv: Array[Any]): Any = {
    val rows = k / bands
    val sig = Dedup.minhashSig(
      Dedup.shingles(rv(0).asInstanceOf[UTF8String].toString), k)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      out(b) = new GenericInternalRow(
        Array[Any](b, Dedup.bandKey(sig, b, rows)))
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1), c(2))
}

/** fused 64-bit SimHash — see [[DedupExpr]]. */
case class Simhash64(text: Expression) extends QuantKernelExpression {
  override def children: Seq[Expression] = Seq(text)
  override protected def rowChildren: Seq[Expression] = Seq(text)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def compute(rv: Array[Any]): Any =
    java.lang.Long.valueOf(
      Dedup.simhash(rv(0).asInstanceOf[UTF8String].toString))
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0))
}

/** fused exact shingle-Jaccard verify — see [[DedupExpr]]. */
case class JaccardShingles(a: Expression, b: Expression)
    extends QuantKernelExpression {
  override def children: Seq[Expression] = Seq(a, b)
  override protected def rowChildren: Seq[Expression] = Seq(a, b)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_shingles"
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def compute(rv: Array[Any]): Any =
    java.lang.Double.valueOf(Dedup.jaccard(
      Dedup.shingles(rv(0).asInstanceOf[UTF8String].toString),
      Dedup.shingles(rv(1).asInstanceOf[UTF8String].toString)))
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1))
}
