package graft.text

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, typedLit}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst forms of the corpus-shingling kernels — the text
  * counterpart of [[graft.sim.QuantExpr]] and the same lesson: the
  * `explode(transform(sequence(...), i -> f(text, i)))` higher-order
  * form dispatches an INTERPRETED lambda once per window per row (plus
  * re-evaluating `split()` under it), which made the three inverted-
  * index joins (q103/q104/q112) the most expensive non-durable queries
  * in the sweep. Each expression here runs ONE fused scalar loop per
  * document inside whole-stage codegen (`addReferenceObj` + a kernel
  * call), tokenizing once.
  *
  * Parity contract (pinned in GramExprSpec against the original HOF
  * columns): every kernel reproduces the built-in composition it
  * replaces element by element —
  *
  *  - `word_shingles_md5(t, n)` ≡ `array_distinct(transform(
  *    sequence(1, greatest(size(toks)-(n-1), 1)),
  *    i -> md5(concat_ws(" ", slice(toks, i, n)))))` over
  *    `toks = split(t, " ", -1)`: windows truncate at the end, a doc
  *    shorter than n words yields its whole text as one shingle, md5 is
  *    lowercase hex over UTF-8 bytes, distinct keeps first occurrence.
  *  - `word_grams(t, n)` ≡ the same window walk WITHOUT md5/distinct
  *    (term-frequency semantics — multiplicity is the tf signal).
  *  - `char_trigrams(t)` ≡ `when(length(t) >= 3, array_distinct(
  *    transform(sequence(1, length(t)-2), i -> substr(t, i, 3))))
  *    .otherwise(array())`: code-point windows via UTF8String.substringSQL
  *    (NOT Java UTF-16 chars), distinct keeps first occurrence.
  *
  * Null contract: null text yields null (explode then emits no rows,
  * exactly as the HOF forms' split(null)/when(null) paths did).
  */
object GramExpr {

  /** Register in the session's function registry (the engine's standard
    * Column-construction route since Spark 4 hides Column(expr)).
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("word_shingles_md5",
      e => WordShinglesMd5(e(0), e(1)), "built-in")
    r.createOrReplaceTempFunction("word_grams",
      e => WordGrams(e(0), e(1)), "built-in")
    r.createOrReplaceTempFunction("char_trigrams",
      e => CharTrigrams(e(0)), "built-in")
  }

  /** Distinct md5-hex word n-shingles of `text` — [[graft.dedup.Containment]]'s
    * shingle set as one fused loop. */
  def wordShinglesMd5(spark: SparkSession, text: Column, n: Int): Column = {
    require(n >= 2, s"n=$n must be >= 2")
    register(spark)
    call_function("word_shingles_md5", text, typedLit(n))
  }

  /** Word n-grams WITH multiplicity (tf semantics) — [[graft.sim.SparseCosine]]'s
    * term list as one fused loop. */
  def wordGrams(spark: SparkSession, text: Column, n: Int): Column = {
    require(n >= 2, s"n=$n must be >= 2")
    register(spark)
    call_function("word_grams", text, typedLit(n))
  }

  /** Distinct character trigrams (code-point windows) — [[Trigram]]'s
    * index rows as one fused loop; < 3 chars yields an empty array. */
  def charTrigrams(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("char_trigrams", text)
  }
}

/** The fused per-document loops. Tokenization matches `split(t, " ", -1)`
  * (single-space regex, trailing empties kept: "a  b" -> ["a","","b"],
  * "" -> [""]); windows and joins match `slice`/`concat_ws` exactly.
  */
object GramKernel {

  private def tokens(t: UTF8String): Array[String] =
    t.toString.split(" ", -1)

  /** Window walk shared by the two word-gram kernels: emit the space-join
    * of toks[i, min(i+n, len)) for i = 0 until max(len-n+1, 1). */
  private def windows(toks: Array[String], n: Int): Array[String] = {
    val len = toks.length
    val count = math.max(len - n + 1, 1)
    val out = new Array[String](count)
    var i = 0
    while (i < count) {
      val hi = math.min(i + n, len)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < hi) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  def wordShinglesMd5(t: UTF8String, n: Int): GenericArrayData = {
    val ws = windows(tokens(t), n)
    // distinct by md5 string == distinct by window (collision-free in
    // practice), first occurrence kept — array_distinct's order
    val seen = new java.util.LinkedHashSet[UTF8String](ws.length * 2)
    var i = 0
    while (i < ws.length) {
      seen.add(UTF8String.fromString(
        DigestUtils.md5Hex(ws(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }

  def wordGrams(t: UTF8String, n: Int): GenericArrayData = {
    val ws = windows(tokens(t), n)
    val out = new Array[AnyRef](ws.length)
    var i = 0
    while (i < ws.length) { out(i) = UTF8String.fromString(ws(i)); i += 1 }
    new GenericArrayData(out)
  }

  def charTrigrams(t: UTF8String): GenericArrayData = {
    val len = t.numChars()
    if (len < 3) return new GenericArrayData(new Array[AnyRef](0))
    val seen = new java.util.LinkedHashSet[UTF8String](len * 2)
    var i = 1 // substringSQL is 1-based, windows 1 .. len-2
    while (i <= len - 2) {
      seen.add(t.substringSQL(i, 3))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }
}

/** Shared shape: one row-varying string child (+ foldable literals),
  * null in -> null out, boxed kernel call from both eval and codegen
  * (the [[graft.sim.QuantExpr]] / CosineF32 recipe). Implicit input
  * casting mirrors the analyzer behavior the retired UDF/HOF forms had —
  * a non-string text child coerces instead of ClassCastException. */
private[text] trait GramKernelExpression extends Expression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def nullable: Boolean = true
  /** The single row-varying string child. */
  protected def textChild: Expression
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  /** Boxed compute over the evaluated text child. */
  def compute(t: UTF8String): Any

  override def eval(input: InternalRow): Any = {
    val t = textChild.eval(input)
    if (t == null) null else compute(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gramKernel", this,
      classOf[GramKernelExpression].getName)
    val gen = textChild.genCode(ctx)
    val boxed = ctx.freshName("gramRes")
    val javaTy = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    val boxedTy = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .boxedType(dataType)
    val code =
      code"""
        ${gen.code}
        boolean ${ev.isNull} = true;
        $javaTy ${ev.value} = ${org.apache.spark.sql.catalyst.expressions.codegen
          .CodeGenerator.defaultValue(dataType)};
        if (!${gen.isNull}) {
          Object $boxed = $self.compute(${gen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = ($boxedTy) $boxed;
          }
        }
      """
    ev.copy(code = code)
  }
}

/** distinct md5-hex word n-shingles — see [[GramKernel.wordShinglesMd5]]. */
case class WordShinglesMd5(text: Expression, nL: Expression)
    extends GramKernelExpression {
  override def children: Seq[Expression] = Seq(text, nL)
  override protected def textChild: Expression = text
  override def prettyName: String = "word_shingles_md5"
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  @transient private lazy val n = nL.eval(null).asInstanceOf[Int]
  override def compute(t: UTF8String): Any = GramKernel.wordShinglesMd5(t, n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1))
}

/** word n-grams with multiplicity — see [[GramKernel.wordGrams]]. */
case class WordGrams(text: Expression, nL: Expression)
    extends GramKernelExpression {
  override def children: Seq[Expression] = Seq(text, nL)
  override protected def textChild: Expression = text
  override def prettyName: String = "word_grams"
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  @transient private lazy val n = nL.eval(null).asInstanceOf[Int]
  override def compute(t: UTF8String): Any = GramKernel.wordGrams(t, n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1))
}

/** distinct character trigrams — see [[GramKernel.charTrigrams]]. */
case class CharTrigrams(text: Expression) extends GramKernelExpression {
  override def children: Seq[Expression] = Seq(text)
  override protected def textChild: Expression = text
  override def prettyName: String = "char_trigrams"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def compute(t: UTF8String): Any = GramKernel.charTrigrams(t)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0))
}
