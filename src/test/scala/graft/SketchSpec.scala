package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.img.ImageTable
import graft.text.{MisraGries, TextOps}

/** Misra–Gries frequent-items pins (the N/(k+1) guarantee, mergeability)
  * and the span/TF-IDF/top-terms operators on crafted corpora.
  */
class SketchSpec extends AnyFunSuite {

  /** Zipf-ish deterministic stream over a small vocabulary. */
  private def stream(n: Int, seed: Long): Seq[String] =
    (0 until n).map { i =>
      val z = Math.floorMod(ImageTable.splitmix64(seed + i), 100L).toInt
      if (z < 30) "alpha" else if (z < 50) "beta" else if (z < 62) "gamma"
      else s"tail_${z % 17}"
    }

  test("estimate is within [true - N/(k+1), true] for every item") {
    for (k <- Seq(2, 5, 10, 50); seed <- Seq(1L, 7L)) {
      val s = stream(5000, seed)
      val mg = new MisraGries(k)
      s.foreach(mg.add)
      val exact = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = s.size.toLong / (k + 1)
      (exact.keySet ++ mg.items.map(_._1)).foreach { t =>
        val e = mg.estimate(t)
        val tr = exact.getOrElse(t, 0L)
        assert(e <= tr, s"k=$k $t: est $e > true $tr")
        assert(e >= tr - bound, s"k=$k $t: est $e < ${tr - bound}")
      }
      // guarantee: anything above the threshold holds a counter
      exact.filter(_._2 > bound).keys.foreach { t =>
        assert(mg.estimate(t) > 0, s"k=$k frequent '$t' missing from sketch")
      }
    }
  }

  test("merged sketches keep the additive bound (mergeable-summaries rule)") {
    val k = 8
    val parts = (0 until 6).map(p => stream(1000, 100L + p))
    val merged = parts.map { s =>
      val mg = new MisraGries(k); s.foreach(mg.add); mg
    }.reduce(_ merge _)
    val all = parts.flatten
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(merged.n == all.size.toLong)
    val bound = all.size.toLong / (k + 1)
    exact.foreach { case (t, tr) =>
      val e = merged.estimate(t)
      assert(e <= tr && e >= tr - bound, s"$t: est $e vs true $tr bound $bound")
    }
    assert(merged.items.size <= k)
  }

  test("distributed ofTerms finds every term the exact top-k ranks highly") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = (0 until 400).map { i =>
      (i.toLong, stream(40, 7000L + i).mkString(" "))
    }.toDF("doc_id", "text").repartition(5)
    val mg = MisraGries.ofTerms(spark, docs, k = 12)
    val exact = TextOps.topTerms(spark, docs, k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the three dominant terms are each far above N/(k+1) of the merged
    // stream, so the sketch must hold all of them
    exact.keys.foreach { t =>
      assert(mg.estimate(t) > 0, s"dominant term '$t' missing")
      assert(mg.estimate(t) <= exact(t))
    }
  }

  test("KLL quantile sketch: rank error bounded on adversarial stream orders") {
    import graft.text.KllSketch
    val n = 100000
    val streams: Map[String, Seq[Double]] = Map(
      "uniform" -> (0 until n).map(i => Math.floorMod(ImageTable.splitmix64(i.toLong), 1000000L).toDouble),
      "sorted" -> (0 until n).map(_.toDouble),
      "reversed" -> (0 until n).map(i => (n - i).toDouble),
      "zipf-ish" -> (0 until n).map(i => math.pow(Math.floorMod(ImageTable.splitmix64(7L * i), 1000L).toDouble + 1, 2)))
    for ((name, s) <- streams) {
      val sk = new KllSketch(200)
      s.foreach(sk.add)
      assert(sk.n == n.toLong)
      val sorted = s.sorted
      for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val est = sk.quantile(q)
        // true rank of the estimate must be within 2% of the target rank
        val trueRank = sorted.search(est) match {
          case scala.collection.Searching.Found(i) => i + 1
          case scala.collection.Searching.InsertionPoint(i) => i
        }
        val target = q * n
        assert(math.abs(trueRank - target) <= 0.02 * n,
          s"$name q=$q: est=$est trueRank=$trueRank target=$target")
      }
    }
  }

  test("KLL merge keeps the bound and is weight-exact") {
    import graft.text.KllSketch
    val parts = (0 until 8).map(p =>
      (0 until 20000).map(i => Math.floorMod(ImageTable.splitmix64(p * 1000003L + i), 1000000L).toDouble))
    val merged = parts.map { s =>
      val sk = new KllSketch(200); s.foreach(sk.add); sk
    }.reduce(_ merge _)
    val all = parts.flatten.sorted
    assert(merged.n == all.size.toLong)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.quantile(q)
      val trueRank = all.count(_ <= est)
      assert(math.abs(trueRank - q * all.size) <= 0.02 * all.size,
        s"q=$q est=$est trueRank=$trueRank")
    }
    // determinism: same inputs, same merge order -> identical estimates
    val merged2 = parts.map { s =>
      val sk = new KllSketch(200); s.foreach(sk.add); sk
    }.reduce(_ merge _)
    for (q <- Seq(0.25, 0.5, 0.75)) assert(merged.quantile(q) == merged2.quantile(q))
  }

  test("distributed KLL matches the exact percentile within the bound") {
    import graft.text.KllSketch
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = (0 until 50000).map(i =>
      Math.floorMod(ImageTable.splitmix64(31L + i), 100000L).toDouble).toDF("v").repartition(7)
    val sk = KllSketch.ofColumn(spark, df, "v", k = 200)
    val exact = df.stat.approxQuantile("v", Array(0.5), 0.0).head // rel 0 = exact
    assert(math.abs(sk.quantile(0.5) - exact) <= 0.03 * 100000,
      s"median est ${sk.quantile(0.5)} vs exact $exact")
  }

  test("dupSpans merges overlapping grams into maximal islands, exact integers") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val boiler = (1 to 15).map(i => s"b$i").mkString(" ") // 15 shared words
    val docs = Seq(
      // doc 0/1 share the 15-word boilerplate mid-document at different
      // offsets; 15 words of 13-grams = 3 gram starts -> ONE merged island
      (0L, s"u00 u01 u02 $boiler z00 z01 z02 z03 z04 z05 z06 z07 z08 z09 z10"),
      (1L, s"v00 $boiler w00 w01 w02 w03 w04 w05 w06 w07 w08 w09 w10 w11 w12"),
      // doc 2: no duplicated content
      (2L, (1 to 30).map(i => s"q$i").mkString(" ")),
      // doc 3: TWO separated islands (boilerplate at both ends)
      (3L, s"$boiler m00 m01 m02 m03 m04 m05 m06 m07 m08 m09 m10 m11 m12 m13 m14 $boiler")
    ).toDF("doc_id", "text")
    val out = TextOps.dupSpans(spark, docs, n = 13).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc0: words 3..17 duplicated -> 1 island of 15 words
    assert(out(0L) == ((29L, 1L, 15L)))
    assert(out(1L) == ((29L, 1L, 15L)))
    assert(out(2L) == ((30L, 0L, 0L)))
    // doc3: islands [0,15) and [30,45) -> 2 islands, 30 words
    assert(out(3L) == ((45L, 2L, 30L)))
  }

  test("tfidf ranking is the documented floor-division order with term tie-break") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(
      (0L, "x x x common rare common"),
      (1L, "common common y rare"),
      (2L, "common z z")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopK(spark, docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(5)) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // doc0: x tf=3 df=1 -> 3e6; rare tf=1 df=2 -> 500000; common tf=2 df=3 -> 666666
    assert(out((0L, 1)) == (("x", 3L, 1L, 3000000L)))
    assert(out((0L, 2)) == (("common", 2L, 3L, 666666L)))
    // doc2: z tf=2 df=1 -> 2e6; common tf=1 df=3 -> 333333
    assert(out((2L, 1)) == (("z", 2L, 1L, 2000000L)))
    assert(out((2L, 2)) == (("common", 1L, 3L, 333333L)))
  }

  test("lmSurprisal: hand-computed add-one bigram bits, short docs unscored") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // corpus model: cab = {(a,b):3, (b,a):1, (b,c):1}; left marginal
    // ca = {a:3, b:2}; V = 3 distinct tokens. Instance bits:
    //   (a,b): (3+3) div (3+1) = 1 -> 0 bits
    //   (b,a): (2+3) div (1+1) = 2 -> 1 bit
    //   (b,c): (2+3) div (1+1) = 2 -> 1 bit
    val docs = Seq(
      (0L, "a b a b"), // bigrams (a,b),(b,a),(a,b) -> sum 1, n 3, mbits 333
      (1L, "a b c"),   // bigrams (a,b),(b,c)       -> sum 1, n 2, mbits 500
      (2L, "c"),       // < 2 tokens: unscored
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextOps.lmSurprisal(spark, docs, keepMbits = 400).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L) == ((3L, 1L, 333L, true)))
    assert(out(1L) == ((2L, 1L, 500L, false)))
  }

  test("positional postings: tf and sorted positions per (term, doc)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((1L, "b a b  c a"), (2L, "a")).toDF("doc_id", "text")
    val out = graft.text.TextOps.positionalPostings(spark, docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getSeq[Long](3))))
      .toMap
    // double space collapses: positions index the FILTERED token array
    assert(out(("b", 1L)) == ((2L, Seq(0L, 2L))))
    assert(out(("a", 1L)) == ((2L, Seq(1L, 4L))))
    assert(out(("c", 1L)) == ((1L, Seq(3L))))
    assert(out(("a", 2L)) == ((1L, Seq(0L))))
    assert(out.size == 4)
  }

  test("phrase search: adjacency, overlaps, cross-doc, no match") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "x a b y a b"),   // two non-overlapping occurrences of "a b"
      (2L, "a a a"),          // overlapping occurrences of "a a"
      (3L, "b a")             // reversed: no "a b"
    ).toDF("doc_id", "text")
    val ab = graft.text.TextOps.phraseSearch(spark, docs, Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(ab == Map(1L -> ((2L, 1L))))
    val aa = graft.text.TextOps.phraseSearch(spark, docs, Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(aa == Map(2L -> ((2L, 0L))))
    val aby = graft.text.TextOps.phraseSearch(spark, docs, Seq("a", "b", "y"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(aby == Map(1L -> ((1L, 1L))))
  }

  test("bm25: hand-computed integer scores on a 3-doc corpus") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "table fast table"), (2L, "table slow"), (3L, "merge")
    ).toDF("doc_id", "text")
    val got = graft.text.TextOps.bm25(spark, docs, Seq("table", "fast", "merge"))
      .as[(Long, Long)].collect().toMap
    // D=6 n=3; idf_s: table (3e6)//5=600000, fast/merge (5e6)//3=1666666
    // ratio_s = (132e6*tf)//(60tf+18+27dl):
    //   (1,table) 264e6//219=1205479; (1,fast) 132e6//159=830188
    //   (2,table) 132e6//132=1000000; (3,merge) 132e6//105=1257142
    // s = (idf*ratio)//1e6, summed per doc
    assert(got == Map(1L -> 2106933L, 2L -> 600000L, 3L -> 2095235L), got.toString)
  }

  test("count-min: estimates never undercount, exact keys stay exact") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.text.CountMin
    // zipf-ish longs: key = floorMod(mix, 40)^2 / 40 skews mass low
    val keys = (0 until 8000).map { i =>
      val z = Math.floorMod(ImageTable.splitmix64(99L + i), 40L)
      z * z / 40L
    }
    val df = keys.toDF("k")
    val sk = CountMin.counters(spark, df, "k", depth = 4, width = 64)
    val est = CountMin.estimate(spark, sk, df, "k", depth = 4, width = 64)
      .as[(Long, Long)].collect().toMap
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = keys.size.toLong
    exact.foreach { case (k, tr) =>
      val e = est(k)
      assert(e >= tr, s"key $k: est $e under true $tr")
      // deterministic data, generous theory-shaped ceiling: e*N/width
      assert(e - tr <= math.ceil(math.E * n / 64).toLong, s"key $k err ${e - tr}")
    }
    // a never-seen key resolves through empty cells or collisions, never null
    val unseen = CountMin.estimate(spark, sk, Seq(999999L).toDF("k"), "k", 4, 64)
      .as[(Long, Long)].collect().head._2
    assert(unseen >= 0L)
  }

  test("count-min: counters are linear — sketch(A ∪ B) = sketch(A) + sketch(B)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.text.CountMin
    val a = (0 until 500).map(i => Math.floorMod(ImageTable.splitmix64(3L + i), 30L))
    val b = (0 until 700).map(i => Math.floorMod(ImageTable.splitmix64(77L + i), 30L))
    def cells(xs: Seq[Long]) =
      CountMin.counters(spark, xs.toDF("k"), "k", depth = 3, width = 32)
        .as[(Long, Long, Long)].collect().map { case (i, c, n) => (i, c) -> n }.toMap
    val merged = {
      val ca = cells(a); val cb = cells(b)
      (ca.keySet ++ cb.keySet).map(k => k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))).toMap
    }
    assert(cells(a ++ b) === merged)
  }

  test("count-min: cells are in range and the plan has no UDF") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.text.CountMin
    val df = (0L until 200L).toDF("k")
    val sk = CountMin.counters(spark, df, "k", depth = 4, width = 128)
    val rows = sk.as[(Long, Long, Long)].collect()
    assert(rows.forall { case (i, c, _) => i >= 0 && i < 4 && c >= 0 && c < 128 })
    assert(rows.map(_._3).sum == 200L * 4)
    val plan = sk.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
