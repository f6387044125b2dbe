package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Trigram
import graft.dedup.{Containment, Snm}

/** Trigram-indexed regex search, shingle containment, and
  * sorted-neighborhood dedup.
  */
class SearchSnmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ————————————————— trigram search —————————————————

  test("requiredTrigrams: every window of every literal segment, deduped") {
    assert(Trigram.requiredTrigrams("abcd") == Seq("abc", "bcd"))
    assert(Trigram.requiredTrigrams("abc.*cde") == Seq("abc", "cde"))
    assert(Trigram.requiredTrigrams("abc.*abc") == Seq("abc"))
    // sub-3-char segments cannot prune but don't poison the rest
    assert(Trigram.requiredTrigrams("ab.*wxyz") == Seq("wxy", "xyz"))
    intercept[IllegalArgumentException](Trigram.literalSegments("a(b"))
    intercept[IllegalArgumentException](Trigram.literalSegments(".*"))
    // all-short segments leave nothing to prune with: search refuses
    // loudly rather than silently scanning the corpus
    assert(Trigram.requiredTrigrams("ab.*cd").isEmpty)
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Trigram.search(spark, docs, "ab.*cd"))
  }

  test("trigram index: distinct trigrams, short texts contribute nothing") {
    val docs = Seq((1L, "abab"), (2L, "xy"), (3L, "abc")).toDF("doc_id", "text")
    val idx = Trigram.index(docs).as[(Long, String)].collect().toSet
    assert(idx == Set((1L, "aba"), (1L, "bab"), (3L, "abc")))
  }

  test("search: candidates prune, verify is exact, result = plain rlike") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick fox runs past the brown dog"),
      (3L, "brown then quick - wrong order for the regex"),
      (4L, "nothing relevant here at all"),
      (5L, "quic truncated bro segments only")).toDF("doc_id", "text")
    val pat = "quick.*brown"
    val cand = Trigram.candidates(spark, docs, pat).as[Long].collect().toSet
    // doc 3 contains every trigram of both literals (order-blind index);
    // docs 4, 5 are pruned without ever running the regex
    assert(cand == Set(1L, 2L, 3L))
    val got = Trigram.search(spark, docs, pat).as[Long].collect().toSet
    val brute = docs.filter(col("text").rlike(pat))
      .select("doc_id").as[Long].collect().toSet
    assert(got == brute && got == Set(1L, 2L))
  }

  // ————————————————— containment —————————————————

  test("containment: embedded doc found at c=1; Jaccard would miss it") {
    val small = (1 to 12).map(i => s"w$i").mkString(" ") // 12 words, 8 5-shingles
    val filler = (100 to 160).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, small),
      (2L, s"$filler $small"), // quotes doc 1 whole
      (3L, (200 to 240).map(i => s"g$i").mkString(" "))).toDF("doc_id", "text")
    val got = Containment.containedPairs(spark, docs, n = 5, num = 8, den = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // S(1) = 8 shingles, all present in doc 2 -> inter = 8 = min(n_a,n_b)
    assert(got.size == 1)
    val (a, b, inter, na, nb) = got.head
    assert((a, b) == (1L, 2L) && inter == 8L && na == 8L)
    // resemblance for the same pair is far below the 0.8 bar: the wrapper
    // adds ~60 words of shingles
    assert(inter.toDouble / (na + nb - inter) < 0.2)
  }

  test("containment: hot-bucket cap cuts boilerplate pair fan-out") {
    // 10 docs sharing one boilerplate line (bucket size 10 > cap 4):
    // with the cap no pairs survive; raising the cap finds them all
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = (1 to 10).map(i => (i.toLong, boiler)).toDF("doc_id", "text")
    val capped = Containment.containedPairs(spark, docs, n = 5, maxBucket = 4)
    assert(capped.count() == 0)
    val uncapped = Containment.containedPairs(spark, docs, n = 5, maxBucket = 64)
    assert(uncapped.count() == 45) // all 10-choose-2 identical pairs
  }

  test("containment: integer threshold is exact at the boundary") {
    // inter*den >= num*min: 4 of 5 shingles shared = 0.8 passes at 8/10,
    // fails at 81/100
    val a = "a b c d e f g h i" // 9 words -> 5 shingles
    val b = "a b c d e f g h X" // shares the first 4 shingles
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    assert(Containment.containedPairs(spark, docs, n = 5, num = 8, den = 10)
      .count() == 1)
    assert(Containment.containedPairs(spark, docs, n = 5, num = 81, den = 100)
      .count() == 0)
  }

  // ————————————————— sparse cosine —————————————————

  test("sparse cosine: exact threshold at cos = 0.8, no floats anywhere") {
    // "a b a b" -> tf(a b)=2, tf(b a)=1; "b a b a" -> (1, 2).
    // dot = 4, norms 5 and 5 -> cos = 4/5 exactly
    val docs = Seq((1L, "a b a b"), (2L, "b a b a")).toDF("doc_id", "text")
    val at80 = graft.sim.SparseCosine.similarPairs(spark, docs, num = 4, den = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(at80.toSeq == Seq((1L, 2L, 4L, 5L, 5L)))
    // one notch above the exact value -> excluded
    assert(graft.sim.SparseCosine.similarPairs(spark, docs, num = 81, den = 100)
      .count() == 0)
  }

  test("sparse cosine: identical docs score 1, disjoint docs never pair") {
    val docs = Seq(
      (1L, "x y z x y"), (2L, "x y z x y"), // identical
      (3L, "p q r s t")).toDF("doc_id", "text")
    val got = graft.sim.SparseCosine.similarPairs(spark, docs)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, got.head._4, got.head._4, got.head._4)))
    assert(got.head._3 * got.head._3 == got.head._4 * got.head._5) // cos = 1 exactly
  }

  test("sparse cosine: hot-term df cap cuts stopword fan-out") {
    // 10 identical docs: every bigram has df 10; cap 4 leaves no
    // candidate terms, raising the cap finds all 45 pairs
    val docs = (1 to 10).map(i => (i.toLong, "s t s t s")).toDF("doc_id", "text")
    assert(graft.sim.SparseCosine.similarPairs(spark, docs, maxDf = 4).count() == 0)
    assert(graft.sim.SparseCosine.similarPairs(spark, docs, maxDf = 64).count() == 45)
  }

  // ————————————————— sorted neighborhood —————————————————

  private def bruteSnm(rows: Seq[(Long, String)], key: String => String,
      w: Int, maxDist: Int): Set[(Long, Long, Long)] = {
    val sorted = rows.sortBy { case (id, t) => (key(t), id) }
    (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + w, sorted.length)
      d = levDist(sorted(i)._2, sorted(j)._2) if d <= maxDist
    } yield (sorted(i)._1, sorted(j)._1, d.toLong)).toSet
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("snm: matches brute-force sliding window incl. cross-partition pairs") {
    // 40 docs in 4 partitions -> 3 partition boundaries the rank
    // equi-join must pair across; several planted near-identical runs
    val rows = (0 until 40).map { i =>
      val base = s"prefix${"%02d".format(i / 2)} body ${"x" * (i % 7)} tail"
      (i.toLong, if (i % 2 == 1) base + " z" else base)
    }
    val docs = rows.toDF("doc_id", "text")
    val got = Snm.neighborPairs(spark, docs, substring(col("text"), 1, 32),
        w = 3, maxDist = 8, numPartitions = 4)
      .as[(Long, Long, Long)].collect().toSet
    val want = bruteSnm(rows, _.take(32), w = 3, maxDist = 8)
    assert(got == want && want.nonEmpty)
  }

  test("snm: no single-partition exchange or global sort in the plan") {
    val docs = (0 until 20).map(i => (i.toLong, s"text number $i")).toDF("doc_id", "text")
    val out = Snm.neighborPairs(spark, docs, substring(col("text"), 1, 8), w = 4, maxDist = 50)
    out.count() // materialize (the offsets pre-job runs here)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(plan.contains("rangepartitioning"), plan) // the ONE ordered exchange
  }

  test("snm: deterministic under repartitioned input") {
    val rows = (0 until 30).map(i => (i.toLong, s"doc ${i % 5} content $i"))
    val a = Snm.neighborPairs(spark, rows.toDF("doc_id", "text"),
      substring(col("text"), 1, 16), w = 4, maxDist = 20)
      .as[(Long, Long, Long)].collect().toSet
    val b = Snm.neighborPairs(spark, rows.toDF("doc_id", "text").repartition(7),
      substring(col("text"), 1, 16), w = 4, maxDist = 20, numPartitions = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
