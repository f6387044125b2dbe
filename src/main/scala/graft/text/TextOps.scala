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
}
