package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.GramExpr

/** Parity pins for the fused shingling kernels (graft.text.GramExpr):
  * each fused column must equal the higher-order-function composition it
  * replaced, element by element and in order, on a corpus that covers
  * every edge the kernels special-case — empty string, single word,
  * consecutive spaces (empty tokens), fewer words than n, exactly n,
  * duplicated windows (distinct order), unicode incl. a supplementary
  * (non-BMP) code point, and a doc shorter than 3 chars.
  */
class GramExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val edgeDocs = Seq(
    "",
    " ",
    "one",
    "one two",
    "one two three four five",
    "one two three four five six seven",
    "a  b   c", // empty tokens from split(" ", -1)
    "dup dup dup dup dup dup dup dup", // duplicate windows -> distinct order
    "héllo wörld ünïcode tëxt hërë ågain",
    "emoji 😀 mid token stream here", // supplementary code point
    "ab",
    "abc",
    "abcd",
    "x y z x y z x y z"
  )
  private lazy val rnd = new scala.util.Random(0x5EED)
  private lazy val randDocs = Seq.fill(60) {
    val words = Seq.fill(rnd.nextInt(12))(s"w${rnd.nextInt(9)}")
    words.mkString(" ")
  }
  private lazy val docs =
    (edgeDocs ++ randDocs).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[String])] =
    df.orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq

  test("word_shingles_md5 == array_distinct(transform(md5(concat_ws(slice))))") {
    for (n <- Seq(2, 5)) {
      val toks = split(col("text"), " ", -1)
      val hof = docs.select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
          i => md5(concat_ws(" ", slice(toks, i, lit(n)))))).as("g"))
      val fused = docs.select(col("doc_id"),
        GramExpr.wordShinglesMd5(spark, col("text"), n).as("g"))
      assert(collectPairs(fused) == collectPairs(hof), s"n=$n")
    }
  }

  test("word_grams == transform(concat_ws(slice)) with multiplicity") {
    for (n <- Seq(2, 3)) {
      val toks = split(col("text"), " ", -1)
      val hof = docs.select(col("doc_id"),
        transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
          i => concat_ws(" ", slice(toks, i, lit(n)))).as("g"))
      val fused = docs.select(col("doc_id"),
        GramExpr.wordGrams(spark, col("text"), n).as("g"))
      assert(collectPairs(fused) == collectPairs(hof), s"n=$n")
    }
  }

  test("char_trigrams == distinct substr windows; < 3 chars -> empty") {
    val t = col("text")
    val hof = docs.select(col("doc_id"),
      when(length(t) >= 3,
        array_distinct(transform(sequence(lit(1), length(t) - 2),
          i => t.substr(i, lit(3)))))
        .otherwise(array().cast("array<string>")).as("g"))
    val fused = docs.select(col("doc_id"),
      GramExpr.charTrigrams(spark, col("text")).as("g"))
    assert(collectPairs(fused) == collectPairs(hof))
  }

  test("null text yields no exploded rows, like the HOF forms") {
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(0L, null: String),
        org.apache.spark.sql.Row(1L, "one two three"))),
      docs.schema)
    assert(withNull.select(explode(GramExpr.wordShinglesMd5(spark, col("text"), 2)))
      .count() == 2)
    assert(withNull.select(explode(GramExpr.wordGrams(spark, col("text"), 2)))
      .count() == 2)
    assert(withNull.select(explode(GramExpr.charTrigrams(spark, col("text"))))
      .count() == 11) // "one two three" has 13 chars -> 11 windows, all distinct
  }

  test("q103/q104/q112/q46 plans carry no interpreted lambdafunction") {
    val sfDir = "/root/testdata/sf0.001"
    for (q <- Seq("q103_trigram_search", "q104_containment", "q112_sparse_cosine",
        "q46_ngram_jaccard")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("lambdafunction"), s"$q plan:\n$plan")
    }
  }
}
