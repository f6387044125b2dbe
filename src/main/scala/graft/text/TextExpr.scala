package graft.text

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sim.QuantKernelExpression

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
  * convention, [[graft.sim.QuantExpr]]) — note the difference from the
  * retired UDF forms: `langId(null)` returned "und" through the UDF and
  * the repetition UDF threw; a null text now never scores or filters.
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
}

/** language-ID — see [[TextOps.langId]]. */
case class LangIdExpr(text: Expression) extends QuantKernelExpression {
  override def children: Seq[Expression] = Seq(text)
  override protected def rowChildren: Seq[Expression] = Seq(text)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def compute(rv: Array[Any]): Any =
    UTF8String.fromString(TextOps.langId(rv(0).asInstanceOf[UTF8String].toString))
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0))
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
  override def compute(rv: Array[Any]): Any = {
    val (n, dup, top) =
      TextOps.repetitionKernel(rv(0).asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](n, dup, top))
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0))
}
