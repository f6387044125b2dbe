package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.img.ImageTable.splitmix64

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword/script heuristic), quality scoring, token counting, and
  * winnowing document fingerprints. All narrow column/map work — no
  * shuffles beyond what the caller aggregates.
  */
object TextOps {

  /** Tiny per-language stopword profiles (public common-word lists). */
  val Profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "en", "que", "de", "un"),
    "fr" -> Set("le", "la", "les", "et", "est", "en", "que", "un", "une", "des"),
    "it" -> Set("il", "la", "di", "e", "che", "un", "per", "con", "del", "sono"))

  /** Heuristic language ID: CJK script share first, else argmax stopword
    * hits (ties broken by language code order — deterministic). "und" when
    * nothing matches.
    */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if ((c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3040 && c <= 0x30FF)) cjk += 1
      i += 1
    }
    if (cjk * 5 > text.length) return "zh"
    val toks = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (toks.isEmpty) return "und"
    val scores = Profiles.view.mapValues(p => toks.count(p.contains)).toMap
    val (best, hits) = scores.toSeq.sortBy { case (l, h) => (-h, l) }.head
    if (hits == 0) "und" else best
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): k-gram
    * rolling hashes, minimum per sliding window w, rightmost-min rule.
    * Shared fingerprints across documents ⇒ shared content.
    */
  def winnow(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    val s = text.toLowerCase.replaceAll("\\s+", " ")
    if (s.length < k) return if (s.isEmpty) Array.empty else Array(splitmix64(s.hashCode.toLong))
    val n = s.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 1125899906842597L
      var j = 0
      while (j < k) { h = h * 31 + s.charAt(i + j); j += 1 }
      hs(i) = splitmix64(h)
      i += 1
    }
    if (n <= w) Array(hs.min)
    else {
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      i = 0
      while (i + w <= n) {
        var mi = i
        var j = i + 1
        while (j < i + w) { if (hs(j) <= hs(mi)) mi = j; j += 1 }
        out += hs(mi)
        i += 1
      }
      out.toArray
    }
  }

  /** BPE-ish token count as a codegen'd column (letters runs, digit runs,
    * single punctuation) — SQL-parity with DuckDB regexp_extract_all.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distributed language-ID over a documents table. */
  def withLang(spark: SparkSession, docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val f = udf((t: String) => langId(t))
    docs.withColumn("predicted_lang", f(col(textCol)))
  }

  /** Repetition metrics per document (Gopher quality rules, Rae et al.
    * 2021, arXiv:2112.11446 §A1.1): the fraction of tokens that repeat an
    * earlier token and the fraction of characters covered by the single
    * most frequent word BIGRAM — boilerplate and generation loops light
    * both up long before perplexity filters notice. Every value is exact
    * integer math plus ONE double division, so the whole operator is
    * driver-oracled bit-exactly (q58); the top-bigram tie-break is
    * (count desc, then lexicographic pair), matching the oracle's window
    * ORDER BY.
    *
    * @return (token_count, dup_word_frac, top_bigram_frac)
    */
  def repetitionKernel(text: String): (Int, Double, Double) = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return (0, 0.0, 0.0)
    val totalChars = toks.iterator.map(_.length).sum
    val distinct = toks.toSet.size
    val dupFrac = 1.0 - distinct.toDouble / toks.length
    var topFrac = 0.0
    if (toks.length >= 2) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Int]
      var i = 0
      while (i + 1 < toks.length) {
        val k = (toks(i), toks(i + 1))
        counts(k) = counts.getOrElse(k, 0) + 1
        i += 1
      }
      val ((w1, w2), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      topFrac = (c.toLong * (w1.length + w2.length)).toDouble / totalChars
    }
    (toks.length, dupFrac, topFrac)
  }

  /** Gopher-style repetition filter over a documents table: metrics plus a
    * keep flag at the given thresholds (defaults tuned to split the
    * synthetic corpus non-trivially; production thresholds are the
    * paper's). Narrow map — no shuffle.
    */
  def withRepetition(spark: SparkSession, docs: DataFrame, maxDupWordFrac: Double = 0.6,
      maxTopBigramFrac: Double = 0.08, textCol: String = "text"): DataFrame = {
    val f = udf((t: String) => repetitionKernel(t))
    docs.withColumn("m", f(col(textCol)))
      .withColumn("n_tokens", col("m._1"))
      .withColumn("dup_word_frac", col("m._2"))
      .withColumn("top_bigram_frac", col("m._3"))
      .withColumn("keep",
        col("dup_word_frac") <= maxDupWordFrac && col("top_bigram_frac") <= maxTopBigramFrac)
      .drop("m")
  }
}
