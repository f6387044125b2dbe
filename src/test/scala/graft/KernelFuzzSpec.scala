package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Dedup, DedupExpr}
import graft.sim.QuantExpr
import graft.text.{TextExpr, TextOps}

/** Randomized parity sweep for every fused string/vector kernel: one
  * seeded adversarial corpus (unicode, surrogate pairs, whitespace runs,
  * control chars, empties, a 10k-char doc), ONE Spark job per family,
  * every row compared against the scalar kernel the expression wraps.
  * The fixed-fixture specs pin known shapes; this sweep pins the
  * UTF8String/ArrayData plumbing on inputs nobody thought to write down
  * — the only layer where the "one copy of the math" argument can't
  * help, because the copy is in the conversion, not the math.
  */
class KernelFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(0xF0CC1A)
  private val fragments = Array(
    "the", "und", "la", "perturbed", "QQ", "x1", "émigré", "naïve",
    "中文", "句子", "日本語", "😀", "𝒜𝒷", "a-b", "it's", "3.14", "<tag>",
    "word" + "y" * 40)
  private val seps = Array(" ", "  ", "\t", "\n", " \t ", " ")
  private def randDoc(): String = {
    val n = rnd.nextInt(30)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(seps(rnd.nextInt(seps.length)))
      sb.append(fragments(rnd.nextInt(fragments.length)))
      i += 1
    }
    sb.toString
  }
  private val docs: Seq[(Long, String)] =
    (0L until 200L).map(i => (i, randDoc())) ++ Seq(
      (200L, ""), (201L, " "), (202L, "solo"), (203L, "\t\n"),
      (204L, Seq.fill(2000)(fragments(3)).mkString(" ")),
      (205L, (0 until 2500).map(j => s"w${j % 97}").mkString(" ")))

  test("fused text/dedup kernels match the scalar kernels on the fuzz corpus") {
    val df = docs.toDF("doc_id", "text")
    val got = df.select(col("doc_id"), col("text"),
        TextExpr.tokNgramsCol(spark, col("text"), 3).as("g3"),
        TextExpr.tokNgramsCol(spark, col("text"), 13).as("g13"),
        TextExpr.winnowCol(spark, col("text")).as("wf"),
        TextExpr.langIdCol(spark, col("text")).as("lang"),
        TextExpr.repetitionCol(spark, col("text")).as("rep"),
        DedupExpr.simhash64Col(spark, col("text")).as("sh"),
        DedupExpr.minhashBandsCol(spark, col("text"), 64, 16).as("mb"),
        DedupExpr.jaccardShinglesCol(spark, col("text"),
          reverse(col("text"))).as("jr"))
      .collect()
    assert(got.length === docs.length)
    got.foreach { r =>
      val id = r.getLong(0); val t = r.getString(1)
      val toks = TextOps.tokenize(t)
      def ngrams(n: Int) =
        (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
      assert(r.getSeq[String](2) === ngrams(3), s"doc $id g3")
      assert(r.getSeq[String](3) === ngrams(13), s"doc $id g13")
      assert(r.getSeq[Long](4) === TextOps.winnow(t).toSeq, s"doc $id winnow")
      assert(r.getString(5) === TextOps.langId(t), s"doc $id lang")
      val (rn, rd, rt) = TextOps.repetitionKernel(t)
      val rep = r.getStruct(6)
      assert((rep.getInt(0), rep.getDouble(1), rep.getDouble(2)) ===
        ((rn, rd, rt)), s"doc $id repetition")
      assert(r.getLong(7) === Dedup.simhash(t), s"doc $id simhash")
      val sig = Dedup.minhashSig(Dedup.shingles(t), 64)
      val mb = r.getSeq[org.apache.spark.sql.Row](8)
        .map(b => (b.getInt(0), b.getLong(1)))
      assert(mb === (0 until 16).map(b => (b, Dedup.bandKey(sig, b, 4))),
        s"doc $id minhash bands")
      val rev = t.reverse
      assert(r.getDouble(9) ===
        Dedup.jaccard(Dedup.shingles(t), Dedup.shingles(rev)), s"doc $id jacc")
    }
  }

  test("fused cdc_chunks matches the scalar spans and substrings on the fuzz corpus") {
    val df = docs.toDF("doc_id", "text")
    val got = df.select(col("doc_id"), col("text"),
        TextExpr.cdcChunksCol(spark, col("text"), 8, 63L).as("c"))
      .collect()
    got.foreach { r =>
      val id = r.getLong(0); val t = r.getString(1)
      val s = t.toLowerCase.replaceAll("\\s+", " ")
      // chunk spans are CODE-UNIT offsets (the scalar kernel's contract),
      // so a boundary can split a surrogate pair; the resulting lone
      // surrogate cannot survive Spark's UTF-8 string storage — compare
      // through the same UTF8String round trip the engine stores through
      // (mangling is deterministic, so chunk_md5 dedup stays consistent)
      def stored(x: String): String =
        org.apache.spark.unsafe.types.UTF8String.fromString(x).toString
      val ref = TextOps.cdcChunks(t).zipWithIndex.map { case ((st, len), idx) =>
        (idx, st, len, stored(s.substring(st, st + len)))
      }
      val cs = r.getSeq[org.apache.spark.sql.Row](2)
        .map(c => (c.getInt(0), c.getInt(1), c.getInt(2), c.getString(3)))
      assert(cs === ref, s"doc $id cdc")
    }
  }

  test("fused sign_sig matches the scalar signature on random float vectors") {
    val vecs: Seq[(Long, Seq[Float])] = (0L until 150L).map { i =>
      val dim = 1 + rnd.nextInt(40)
      (i, Seq.fill(dim)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(9) - 4)).toFloat))
    } ++ Seq(
      (150L, Seq.empty[Float]),
      (151L, Seq(0f, -0f, Float.MinPositiveValue)),
      (152L, Seq(Float.MaxValue, Float.MinValue, 1e-30f)))
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        QuantExpr.signSig(spark, col("embedding"), 16).as("sig"))
      .as[(Long, Int)].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === graft.sim.Similarity.signature(v.toArray, 16),
        s"vec $id")
    }
  }
}
