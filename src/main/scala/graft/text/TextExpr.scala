package graft.text

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, typedLit}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sim.{QuantExpr, QuantKernelExpression}

/** Native Catalyst forms of the per-document text kernels (language ID,
  * Gopher repetition metrics) — the [[graft.sim.QuantExpr]] recipe applied
  * to the text surface: ONE fused scalar kernel per row inside whole-stage
  * codegen, replacing the last corpus-sized ScalaUDFs (per-row encoder
  * round trips on every document of the table).
  *
  * Parity: each expression calls the SAME scalar kernel in [[TextOps]]
  * that the DuckDB oracles replay (q26's stopword-profile scoring, q58's
  * exact dup-word / top-bigram fractions) — there is exactly one copy of
  * the math, so column-vs-scalar drift is impossible by construction.
  *
  * Null contract: a null document yields null (the engine-wide quarantine
  * convention, [[graft.sim.QuantExpr]]) — a deliberate change from the
  * retired UDF forms, which treated null as empty text: `langId(null)`
  * returned "und" and `repetitionKernel(null)` returned zero metrics
  * (keep=true). A null text is corrupt input: it now never scores,
  * filters, or counts as a kept document.
  */
object TextExpr {

  /** Register the fused text kernels in the session's function registry
    * (idempotent, same route as [[graft.sim.QuantExpr.register]]).
    */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("lang_id",
      e => LangIdExpr(e(0)), "built-in")
    r.createOrReplaceTempFunction("repetition_metrics",
      e => RepetitionExpr(e(0)), "built-in")
    r.createOrReplaceTempFunction("winnow_fps",
      e => WinnowFps(e(0), e(1), e(2)), "built-in")
    r.createOrReplaceTempFunction("cdc_chunks",
      e => CdcChunksExpr(e(0), e(1), e(2)), "built-in")
    r.createOrReplaceTempFunction("tok_ngrams",
      e => TokNgrams(e(0), e(1)), "built-in")
  }

  /** n-gram-profile language prediction — [[TextOps.langId]] fused. */
  def langIdCol(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("lang_id", text)
  }

  /** (n_tokens, dup_word_frac, top_bigram_frac) struct —
    * [[TextOps.repetitionKernel]] fused. */
  def repetitionCol(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("repetition_metrics", text)
  }

  /** Winnowing fingerprint array — [[TextOps.winnow]] fused, ready to
    * explode (one row per fingerprint). */
  def winnowCol(spark: SparkSession, text: Column, k: Int = 8,
      w: Int = 4): Column = {
    register(spark)
    call_function("winnow_fps", text, typedLit(k), typedLit(w))
  }

  /** CDC chunk array — [[TextOps.cdcChunks]] fused: one
    * (chunk_idx, chunk_start, chunk_len, chunk) struct per chunk over the
    * normalized text, ready to explode. */
  def cdcChunksCol(spark: SparkSession, text: Column, k: Int,
      mask: Long): Column = {
    register(spark)
    call_function("cdc_chunks", text, typedLit(k), typedLit(mask))
  }

  /** Exact-n token n-grams over [[TextOps.tokenize]], in position order —
    * a SHORT document (fewer than n tokens) yields an EMPTY array, unlike
    * [[GramExpr.wordGrams]]'s SQL-split semantics (raw single-space split
    * keeping empties, one truncated window for short docs). posexplode's
    * index is the gram's token position. The decontamination and
    * duplicate-span queries (q67/q68/q81) need exactly these semantics.
    */
  def tokNgramsCol(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    call_function("tok_ngrams", text, typedLit(n))
  }
}

/** language-ID — see [[TextOps.langId]]. */
case class LangIdExpr(text: Expression) extends QuantKernelExpression {
  override def children: Seq[Expression] = Seq(text)
  override protected def rowChildren: Seq[Expression] = Seq(text)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def compute(rv: Array[Any]): Any =
    UTF8String.fromString(TextOps.langId(rv(0).asInstanceOf[UTF8String].toString))
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0))
}

/** winnowing fingerprints — see [[TextOps.winnow]]. */
case class WinnowFps(text: Expression, kL: Expression, wL: Expression)
    extends QuantKernelExpression {
  override def children: Seq[Expression] = Seq(text, kL, wL)
  override protected def rowChildren: Seq[Expression] = Seq(text)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType)
  @transient private lazy val k = QuantExpr.decodeInt(kL)
  @transient private lazy val w = QuantExpr.decodeInt(wL)
  override def compute(rv: Array[Any]): Any =
    new GenericArrayData(
      TextOps.winnow(rv(0).asInstanceOf[UTF8String].toString, k, w))
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1), c(2))
}

/** CDC chunk spans + content — see [[TextOps.cdcChunks]]. */
case class CdcChunksExpr(text: Expression, kL: Expression, maskL: Expression)
    extends QuantKernelExpression {
  override def children: Seq[Expression] = Seq(text, kL, maskL)
  override protected def rowChildren: Seq[Expression] = Seq(text)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk_start", IntegerType, nullable = false),
    StructField("chunk_len", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks"
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, LongType)
  @transient private lazy val k = QuantExpr.decodeInt(kL)
  @transient private lazy val mask = maskL.eval(null).asInstanceOf[Long]
  override def compute(rv: Array[Any]): Any = {
    val s = TextOps.normalizeWs(rv(0).asInstanceOf[UTF8String].toString)
    val bs = TextOps.cdcBoundaries(s, k, mask)
    val out = new Array[Any](bs.length)
    var i = 0
    while (i < bs.length) {
      val (st, len) = bs(i)
      out(i) = new GenericInternalRow(Array[Any](i, st, len,
        UTF8String.fromString(s.substring(st, st + len))))
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1), c(2))
}

/** exact-n token n-grams — see [[TextExpr.tokNgramsCol]]. */
case class TokNgrams(text: Expression, nL: Expression)
    extends QuantKernelExpression {
  override def children: Seq[Expression] = Seq(text, nL)
  override protected def rowChildren: Seq[Expression] = Seq(text)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tok_ngrams"
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  @transient private lazy val n = QuantExpr.decodeInt(nL)
  override def compute(rv: Array[Any]): Any = {
    val toks = TextOps.tokenize(rv(0).asInstanceOf[UTF8String].toString)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1))
}

/** Gopher repetition metrics — see [[TextOps.repetitionKernel]]. */
case class RepetitionExpr(text: Expression) extends QuantKernelExpression {
  override def children: Seq[Expression] = Seq(text)
  override protected def rowChildren: Seq[Expression] = Seq(text)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("dup_word_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))
  override def prettyName: String = "repetition_metrics"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def compute(rv: Array[Any]): Any = {
    val (n, dup, top) =
      TextOps.repetitionKernel(rv(0).asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](n, dup, top))
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0))
}
