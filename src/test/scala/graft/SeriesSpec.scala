package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.stats.Series

/** The series battery against closed forms and sequential brute force:
  * autocorrelation pieces, the CUSUM argmax with its tie rule, doubled
  * midranks under ties, and Kendall pair counts.
  */
class SeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("lagAutocorr: perfectly linear series has r_num^2 = da*db (r = 1)") {
    val df = (0L until 6L).map(i => (1L, i, 2 * i + 3)).toDF("grp", "x", "y")
    val got = Series.lagAutocorr(df)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.length == 1)
    val (_, n, rn, da, db) = got.head
    assert(n == 5 && rn > 0 && rn * rn == da * db)
  }

  test("lagAutocorr: alternating series is perfectly anti-correlated at lag 1") {
    val ys = Seq(0L, 10L, 0L, 10L, 0L, 10L)
    val df = ys.zipWithIndex.map { case (y, i) => (2L, i.toLong, y) }
      .toDF("grp", "x", "y")
    val Seq((_, n, rn, da, db)) = Series.lagAutocorr(df)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(n == 5 && rn < 0 && rn * rn == da * db)
    // and lag 2 is perfectly positive
    val Seq((_, n2, rn2, da2, db2)) = Series.lagAutocorr(df, 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(n2 == 4 && rn2 > 0 && rn2 * rn2 == da2 * db2)
    // short group (<= k points) emits nothing
    assert(Series.lagAutocorr(Seq((9L, 0L, 5L)).toDF("grp", "x", "y"))
      .count() == 0)
  }

  test("cusumChangepoint: step series splits at the step; ties take smallest k") {
    // 4 zeros then 4 tens: S_n = 40, n = 8; stat_k = |8 S_k - 40 k|
    // k=4: |0 - 160| = 160 is the max, at day x = 13
    val df = (0L until 8L).map(i => (1L, 10L + i, if (i < 4) 0L else 10L))
      .toDF("grp", "x", "y")
    val got = Series.cusumChangepoint(df)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 13L, 4L, 160L, 8L, 40L)))
    // constant series: every stat is 0, tie -> k = 1
    val const = (0L until 5L).map(i => (2L, i, 7L)).toDF("grp", "x", "y")
    val g2 = Series.cusumChangepoint(const)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(g2 == Seq((2L, 0L, 1L, 0L, 5L, 35L)))
    // single observation: no interior split
    assert(Series.cusumChangepoint(Seq((3L, 0L, 1L)).toDF("grp", "x", "y"))
      .count() == 0)
  }

  test("cusumChangepoint: random series equals sequential argmax") {
    val rnd = new scala.util.Random(11L)
    val rows = for (g <- 0L until 4L; i <- 0L until 30L)
      yield (g, i, rnd.nextInt(20).toLong)
    val got = Series.cusumChangepoint(rows.toDF("grp", "x", "y"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val ys = rs.sortBy(_._2).map(_._3)
      val n = ys.length.toLong
      val sn = ys.sum
      val cands = ys.scanLeft(0L)(_ + _).tail.zipWithIndex.init.map {
        case (s, i) => (math.abs(n * s - (i + 1) * sn), (i + 1).toLong)
      }
      val best = cands.maxBy(c => (c._1, -c._2))
      g -> (best._2 - 1, best._2, best._1) // x = k-1 here since x = 0..29
    }
    assert(got == want)
  }

  test("rankSumU: textbook no-tie case and doubled midranks under ties") {
    // side1 = {1, 4, 5}, side0 = {2, 3}: ranks of side1 = 1, 4, 5,
    // R1 = 10, U1 = n1 n2 + n1(n1+1)/2 - R1 = 6 + 6 - 10 = 2
    val df = Seq((1L, 1L, 1L), (1L, 0L, 2L), (1L, 0L, 3L), (1L, 1L, 4L),
      (1L, 1L, 5L)).toDF("grp", "side", "v")
    val got = Series.rankSumU(df)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 20L, 4L)))
    // ties: side1 = {3, 3}, side0 = {3}: all midrank 2 -> R1 = 4,
    // U1 = 2*1 + 3 - 4 = 1 (doubled: r1_x2 = 8, u1_x2 = 2)
    val t = Seq((2L, 1L, 3L), (2L, 1L, 3L), (2L, 0L, 3L)).toDF("grp", "side", "v")
    assert(Series.rankSumU(t)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq((2L, 2L, 1L, 8L, 2L)))
  }

  test("rankSumU: U1 + U2 = n1*n2 on random data (doubled: sums to 2 n1 n2)") {
    val rnd = new scala.util.Random(3L)
    val rows = (0 until 200).map(i =>
      (i % 3L, rnd.nextInt(2).toLong, rnd.nextInt(12).toLong))
    val got = Series.rankSumU(rows.toDF("grp", "side", "v"))
      .as[(Long, Long, Long, Long, Long)].collect()
    got.foreach { case (_, n1, n2, r1x2, u1x2) =>
      // U2 = n1 n2 - U1; also recompute R1 doubled by brute force
      assert(u1x2 == 2 * n1 * n2 + n1 * (n1 + 1) - r1x2)
      assert(u1x2 >= 0 && u1x2 <= 2 * n1 * n2)
    }
    // brute midranks
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.map(_._3).sorted
      def rank2(v: Long): Long =
        (sorted.indexOf(v) + 1).toLong + sorted.lastIndexOf(v) + 1
      g -> rs.filter(_._2 == 1).map(r => rank2(r._3)).sum
    }
    assert(got.map(t => t._1 -> t._4).toMap == want)
  }

  test("mad: lower medians on odd and even n; brute parity on random data") {
    // odd: y = {1,3,9}: med = 3 (rank 2), devs {2,0,6} -> mad = 2
    val odd = Seq((1L, 0L, 1L), (1L, 1L, 3L), (1L, 2L, 9L)).toDF("grp", "x", "y")
    assert(Series.mad(odd).as[(Long, Long, Long, Long)].collect().toSeq ==
      Seq((1L, 3L, 3L, 2L)))
    // even: y = {1,2,8,9}: lower median = rank 2 -> 2; devs {1,0,6,7}
    // sorted {0,1,6,7} -> lower median = 1
    val even = Seq((2L, 0L, 1L), (2L, 1L, 2L), (2L, 2L, 8L), (2L, 3L, 9L))
      .toDF("grp", "x", "y")
    assert(Series.mad(even).as[(Long, Long, Long, Long)].collect().toSeq ==
      Seq((2L, 4L, 2L, 1L)))
    // brute parity
    val rnd = new scala.util.Random(21L)
    val rows = for (g <- 0L until 5L; i <- 0L until (7 + g * 3))
      yield (g, i, rnd.nextInt(15).toLong)
    val got = Series.mad(rows.toDF("grp", "x", "y"))
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      def lm(vs: Seq[Long]): Long = vs.sorted.apply((vs.length + 1) / 2 - 1)
      val med = lm(rs.map(_._3))
      g -> (rs.length.toLong, med, lm(rs.map(r => math.abs(r._3 - med))))
    }
    assert(got == want)
  }

  test("runsTest: alternating signs give max runs; all-equal group gives zeros") {
    // median of {0,10,0,10,0} = 0 (lower); zeros dropped, +1 runs only
    val alt = Seq(0L, 10L, 0L, 10L, 0L).zipWithIndex
      .map { case (y, i) => (1L, i.toLong, y) }.toDF("grp", "x", "y")
    assert(Series.runsTest(alt).as[(Long, Long, Long, Long)].collect().toSeq ==
      Seq((1L, 2L, 0L, 1L))) // zeros drop, the two +1s become ONE run
    // values strictly alternating around the median
    val pm = Seq(1L, 9L, 1L, 9L, 1L, 9L, 5L).zipWithIndex
      .map { case (y, i) => (2L, i.toLong, y) }.toDF("grp", "x", "y")
    // median of {1,1,1,5,9,9,9} = 5 -> signs -,+,-,+,-,+ (the 5 drops)
    assert(Series.runsTest(pm).as[(Long, Long, Long, Long)].collect().toSeq ==
      Seq((2L, 3L, 3L, 6L)))
    val const = (0L until 4L).map(i => (3L, i, 7L)).toDF("grp", "x", "y")
    assert(Series.runsTest(const).as[(Long, Long, Long, Long)].collect().toSeq ==
      Seq((3L, 0L, 0L, 0L)))
  }

  test("spearman: monotone series is exactly +1; brute midrank parity under ties") {
    val up = (0L until 7L).map(i => (1L, i, i * 3 + 1)).toDF("grp", "x", "y")
    val Seq((_, n, num, da, db)) = Series.spearman(up)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(n == 7 && num > 0 && num * num == da * db && num == da)
    // brute with ties
    val rnd = new scala.util.Random(31L)
    val rows = for (g <- 0L until 4L; i <- 0L until 20L)
      yield (g, i, rnd.nextInt(5).toLong)
    val got = Series.spearman(rows.toDF("grp", "x", "y"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val n = rs.length.toLong
      val sorted = rs.sortBy(_._2)
      val rx2 = sorted.indices.map(i => 2L * (i + 1))
      val ys = sorted.map(_._3)
      val ysorted = ys.sorted
      def ry2(v: Long): Long =
        (ysorted.indexOf(v) + 1).toLong + ysorted.lastIndexOf(v) + 1
      val ry = ys.map(ry2)
      val (sa, sb) = (rx2.sum, ry.sum)
      val sab = rx2.zip(ry).map { case (a, b) => a * b }.sum
      val saa = rx2.map(a => a * a).sum
      val sbb = ry.map(b => b * b).sum
      g -> (n, n * sab - sa * sb, n * saa - sa * sa, n * sbb - sb * sb)
    }
    assert(got == want)
  }

  test("weightedMedian: half-mass day lands where the doubled cumsum crosses") {
    // masses 1,2,3,4 over days 10..13: total 10, cum 1,3,6,10 ->
    // first 2*cum >= 10 at day 12 (cum 6)
    val df = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L))
      .toDF("grp", "x", "y")
    assert(Series.weightedMedian(df)
      .as[(Long, Long, Long, Long)].collect().toSeq == Seq((1L, 12L, 6L, 10L)))
    // all mass on the first day
    val front = Seq((2L, 5L, 9L), (2L, 6L, 0L)).toDF("grp", "x", "y")
    assert(Series.weightedMedian(front)
      .as[(Long, Long, Long, Long)].collect().toSeq == Seq((2L, 5L, 9L, 9L)))
    intercept[Exception](
      Series.weightedMedian(Seq((3L, 0L, -2L)).toDF("grp", "x", "y")).collect())
  }

  test("intervalUnion: disjoint, chained-overlap, and contained intervals") {
    // grp 1: [0,10) [5,20) [30,40): two islands, covered 20+10 = 30
    // grp 2: [0,100) contains [10,20): one island, covered 100
    // grp 3: touching [0,10) [10,20): s = pmax (NOT >) merges -> covered 20
    val df = Seq((1L, 0L, 10L), (1L, 5L, 20L), (1L, 30L, 40L),
      (2L, 0L, 100L), (2L, 10L, 20L),
      (3L, 0L, 10L), (3L, 10L, 20L)).toDF("grp", "s", "e")
    val got = Series.intervalUnion(df)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(got == Map(1L -> (3L, 2L, 30L), 2L -> (2L, 1L, 100L),
      3L -> (2L, 1L, 20L)))
  }

  test("intervalUnion: random intervals equal a sequential sweep") {
    val rnd = new scala.util.Random(23L)
    val rows = for (g <- 0L until 4L; _ <- 0 until 30) yield {
      val s = rnd.nextInt(200).toLong
      (g, s, s + 1 + rnd.nextInt(30).toLong)
    }
    val got = Series.intervalUnion(rows.toDF("grp", "s", "e"))
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.map(t => (t._2, t._3)).sortBy(identity)
      var islands = 0L; var covered = 0L
      var curS = 0L; var curE = Long.MinValue
      sorted.foreach { case (s, e) =>
        if (curE == Long.MinValue || s > curE) {
          if (curE != Long.MinValue) covered += curE - curS
          islands += 1; curS = s; curE = e
        } else if (e > curE) curE = e
      }
      if (curE != Long.MinValue) covered += curE - curS
      g -> (rs.length.toLong, islands, covered)
    }
    assert(got == want)
  }

  test("gini: equal values give 0, extreme concentration approaches 1, brute parity") {
    // all equal: num = 2*(1+..+n)*v - (n+1)*n*v = 0
    val eq = (0L until 5L).map(i => (1L, i, 7L)).toDF("grp", "x", "y")
    val Seq((_, n1, _, num1, _)) = Series.gini(eq)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(n1 == 5 && num1 == 0)
    // one spike: {0,0,0,10}: G = (2*4*10 - 5*10)/(4*10) = 30/40
    val spike = Seq((2L, 0L, 0L), (2L, 1L, 0L), (2L, 2L, 0L), (2L, 3L, 10L))
      .toDF("grp", "x", "y")
    assert(Series.gini(spike).as[(Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq((2L, 4L, 10L, 30L, 40L)))
    // brute parity via the mean-absolute-difference definition:
    // G = sum_ij |yi - yj| / (2 n sum_y)  ->  num/den = that exactly
    val rnd = new scala.util.Random(17L)
    val rows = for (g <- 0L until 4L; i <- 0L until 15L)
      yield (g, i, rnd.nextInt(9).toLong)
    val got = Series.gini(rows.toDF("grp", "x", "y"))
      .as[(Long, Long, Long, Long, Long)].collect()
    got.foreach { case (g, n, sy, num, den) =>
      val ys = rows.filter(_._1 == g).map(_._3)
      val mad2 = (for (a <- ys; b <- ys) yield math.abs(a - b)).sum
      assert(den == n * sy && num * 2 * n * sy == mad2 * den,
        s"g=$g num/den vs brute")
    }
    // negative values refuse loudly
    val neg = Seq((9L, 0L, -1L)).toDF("grp", "x", "y")
    intercept[Exception](Series.gini(neg).collect())
  }

  test("kendallTau: monotone series is all-concordant; duplicate x fails loudly") {
    val up = (0L until 6L).map(i => (1L, i, i * i)).toDF("grp", "x", "y")
    assert(Series.kendallTau(up)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq((1L, 6L, 15L, 0L, 0L)))
    val down = (0L until 5L).map(i => (2L, i, 10L - i)).toDF("grp", "x", "y")
    assert(Series.kendallTau(down)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq((2L, 5L, 0L, 10L, 0L)))
    val dup = Seq((3L, 1L, 1L), (3L, 1L, 2L)).toDF("grp", "x", "y")
    val e = intercept[Exception](Series.kendallTau(dup).collect())
    assert(e.getMessage != null)
  }

  test("kendallTau: nc + nd + t_y = n(n-1)/2 and matches brute force") {
    val rnd = new scala.util.Random(5L)
    val rows = for (g <- 0L until 3L; i <- 0L until 25L)
      yield (g, i, rnd.nextInt(6).toLong)
    val got = Series.kendallTau(rows.toDF("grp", "x", "y"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val ys = rs.sortBy(_._2).map(_._3)
      val ps = for (i <- ys.indices; j <- ys.indices if i < j)
        yield math.signum(ys(j) - ys(i))
      g -> (ys.length.toLong, ps.count(_ > 0).toLong,
        ps.count(_ < 0).toLong, ps.count(_ == 0).toLong)
    }
    assert(got == want)
    got.values.foreach { case (n, nc, nd, ty) =>
      assert(nc + nd + ty == n * (n - 1) / 2)
    }
  }

  /** Sequential pool-adjacent-violators reference: returns one (sum,
    * len) block stat per position. Pools while the previous block's
    * average is >= the current's (merging equal averages changes no
    * fitted value).
    */
  private def pavaRef(ys: Seq[Long]): Seq[(Long, Long)] = {
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (y <- ys) {
      var s = y
      var l = 1L
      while (st.nonEmpty && st.last._1 * l >= s * st.last._2) {
        val (ps, pl) = st.remove(st.length - 1); s += ps; l += pl
      }
      st += ((s, l))
    }
    st.toSeq.flatMap { case (s, l) => Seq.fill(l.toInt)((s, l)) }
  }

  test("isotonic: equals sequential PAVA on random series; monotone; fixed point") {
    val rnd = new scala.util.Random(17L)
    val rows = for (g <- 0L until 4L; i <- 0L until 20L)
      yield (g, i * 3, rnd.nextInt(15).toLong)
    val got = Series.isotonic(rows.toDF("grp", "x", "y"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    for ((g, rs) <- rows.groupBy(_._1)) {
      val ys = rs.sortBy(_._2).map(_._3)
      val want = pavaRef(ys.toSeq)
      val gs = got(g)
      assert(gs.map(_._3) == ys.toSeq, s"y passthrough broken for $g")
      val bigl = gs.head._5
      // iso_num = blockSum * (L / blockLen), same L across the group
      assert(gs.map(_._4) == want.map { case (s, l) => s * (bigl / l) },
        s"PAVA mismatch for group $g")
      // monotone non-decreasing (same denominator -> numerators ordered)
      assert(gs.map(_._4) == gs.map(_._4).sorted)
    }
    // already-monotone series is its own fit: iso_num/iso_den == y
    val mono = Seq(1L, 2L, 2L, 5L, 9L).zipWithIndex
      .map { case (y, i) => (9L, i.toLong, y) }
    val fix = Series.isotonic(mono.toDF("grp", "x", "y"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(fix.forall(r => r._4 == r._3 * r._5))
  }
}
