package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cell.ZOrder

/** Z-order clustering pins: the Morton kernel against a naive bit
  * interleave, column/scalar parity with no UDF, the rectangle-corner
  * monotonicity the pruning interval relies on, and the physical
  * clustered write actually pruning partitions for a bbox read.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naiveMorton(x: Long, y: Long): Long = {
    var z = 0L
    var b = 0
    while (b < 16) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  test("morton mask chain equals the naive bit interleave") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val x = rnd.nextInt(1 << 16).toLong
      val y = rnd.nextInt(1 << 16).toLong
      assert(ZOrder.morton(x, y) == naiveMorton(x, y), s"x=$x y=$y")
    }
    assert(ZOrder.morton(0, 0) == 0L)
    assert(ZOrder.morton(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
  }

  test("mortonCol matches the scalar kernel and compiles to no UDF") {
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), shiftright(col("id"), 6).as("y"))
    val got = df.select(col("x"), col("y"),
        ZOrder.mortonCol(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ZOrder.morton(x, y), s"($x,$y)") }
    val plan = df.select(ZOrder.mortonCol(col("x"), col("y")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("z is monotone per coordinate: rectangle corners bound the box") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val x0 = rnd.nextInt(200).toLong; val x1 = x0 + rnd.nextInt(56)
      val y0 = rnd.nextInt(200).toLong; val y1 = y0 + rnd.nextInt(56)
      val lo = ZOrder.morton(x0, y0); val hi = ZOrder.morton(x1, y1)
      for (_ <- 0 until 20) {
        val x = x0 + rnd.nextInt((x1 - x0 + 1).toInt)
        val y = y0 + rnd.nextInt((y1 - y0 + 1).toInt)
        val z = ZOrder.morton(x, y)
        assert(lo <= z && z <= hi, s"box ($x0,$y0)-($x1,$y1) point ($x,$y)")
      }
    }
  }

  test("layoutStats: counts cover every row, z-ranges sit inside the prefix") {
    val pts = spark.range(0, 5000).select(
      (rand(11) * 180 - 90).as("lat"), (rand(13) * 360 - 180).as("lon"))
    val stats = ZOrder.layoutStats(pts, "lat", "lon", res = 8, prefixBits = 6,
      qx0 = 149, qy0 = 142, qx1 = 163, qy1 = 156).collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum == 5000L)
    stats.foreach { r =>
      val fk = r.getAs[Long]("file_key")
      assert(r.getAs[Long]("min_z") >> 10 == fk && r.getAs[Long]("max_z") >> 10 == fk)
    }
    // the bbox is ~6% of the world; a z-clustered layout must not scan
    // every file
    val scanned = stats.count(_.getAs[Boolean]("scanned"))
    assert(scanned < stats.length, s"scanned $scanned of ${stats.length}")
  }

  test("clusteredWrite prunes partitions for a bbox read, rows identical") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val pts = spark.range(0, 20000).select(col("id"),
      (rand(3) * 180 - 90).as("lat"), (rand(5) * 360 - 180).as("lon"))
    ZOrder.clusteredWrite(pts, "lat", "lon", res = 8, prefixBits = 6, dir)
    val table = spark.read.parquet(dir)
    // bbox lat [10,20] lon [30,50] → z-interval → candidate file keys
    val zLo = ZOrder.morton(149, 142); val zHi = ZOrder.morton(163, 156)
    val keys: Seq[Long] = ((zLo >> 10) to (zHi >> 10)).toSeq
    val pruned = table.filter(col("z_file").isin(keys: _*) &&
      col("lat").between(10, 20) && col("lon").between(30, 50))
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*z_file".r.findFirstIn(plan).isDefined,
      s"no static pruning:\n$plan")
    // pruning is conservative: identical rows to the unpruned filter
    val full = table.filter(col("lat").between(10, 20) && col("lon").between(30, 50))
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ===
      full.select("id").as[Long].collect().sorted.toSeq)
    assert(pruned.count() > 0)
  }

  test("hilbert: bijective on the grid and UNIT-step (the locality claim)") {
    import graft.cell.Hilbert
    for (res <- 1 to 4) {
      val n = 1 << res
      val byD = (for (x <- 0L until n; y <- 0L until n)
        yield Hilbert.d(res, x, y) -> ((x, y))).toMap
      assert(byD.size == n * n) // bijection onto 0..n^2-1
      assert(byD.keys.min == 0L && byD.keys.max == n.toLong * n - 1)
      // consecutive keys are GRID-ADJACENT - Hilbert's defining property
      val maxStep = (1L until n.toLong * n).map { k =>
        val (ax, ay) = byD(k - 1); val (bx, by) = byD(k)
        math.abs(ax - bx) + math.abs(ay - by)
      }.max
      assert(maxStep == 1L, s"res=$res")
    }
    // Morton does NOT have it - the jump Z-order pays at block seams
    val mByZ = (for (x <- 0L until 8; y <- 0L until 8)
      yield ZOrder.morton(x, y) -> ((x, y))).toMap
    val mStep = (1L until 64L).map { k =>
      val (ax, ay) = mByZ(k - 1); val (bx, by) = mByZ(k)
      math.abs(ax - bx) + math.abs(ay - by)
    }.max
    assert(mStep > 1L)
  }

  test("hilbert: column chain is bit-identical to the scalar kernel") {
    import graft.cell.Hilbert
    val pts = (for (x <- 0L until 16; y <- 0L until 16) yield (x, y))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.dCol(col("x"), col("y"), 4).as("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) => assert(d == Hilbert.d(4, x, y), s"($x, $y)") }
  }

  test("hilbert: leveled-projection withD is bit-identical to the scalar kernel") {
    import graft.cell.Hilbert
    // res 7 — the layoutStats production path (dCol's single expression
    // quadruples per level; withD must agree at full depth)
    val pts = (0 until 400).map(i => ((i * 37L) % 128, (i * 53L) % 128))
    val got = Hilbert.withD(pts.toDF("x", "y"), 7)
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) => assert(d == Hilbert.d(7, x, y), s"($x, $y)") }
  }

  test("geohash: known vectors, column/scalar parity, prefix containment") {
    import graft.cell.Geohash
    // classic reference point (geohash.org example): u4pruydqqvj
    assert(Geohash.encode(57.64911, 10.40744, 6) === "u4pruy")
    assert(Geohash.encode(57.64911, 10.40744, 8) === "u4pruydq")
    // column form is bit-identical to the scalar
    val pts = (0 until 300).map { i =>
      ((i * 37 % 170) - 85 + 0.5, (i * 53 % 360) - 180 + 0.5)
    }
    val got = pts.toDF("lat", "lon")
      .select(col("lat"), col("lon"),
        Geohash.geohashCol(col("lat"), col("lon"), 6).as("g"))
      .as[(Double, Double, String)].collect()
    got.foreach { case (la, lo, g) =>
      assert(g === Geohash.encode(la, lo, 6), s"($la, $lo)")
    }
    // p=8 parity too: 20 quantization bits per axis exceed spreadCol's
    // 16-bit masks — the column form must use the wide spread or the
    // top 4 bits of each axis silently vanish
    val got8 = pts.toDF("lat", "lon")
      .select(col("lat"), col("lon"),
        Geohash.geohashCol(col("lat"), col("lon"), 8).as("g"))
      .as[(Double, Double, String)].collect()
    got8.foreach { case (la, lo, g) =>
      assert(g === Geohash.encode(la, lo, 8), s"p=8 ($la, $lo)")
    }
    // prefix containment: a longer hash starts with the shorter one
    got.foreach { case (la, lo, g) =>
      assert(Geohash.encode(la, lo, 8).startsWith(g), s"($la, $lo)")
    }
    intercept[IllegalArgumentException](Geohash.encode(0, 0, 5)) // odd p
  }

  test("hilbert layoutStats: totals and bboxes are exact") {
    import graft.cell.Hilbert
    val pts = (0 until 500).map { i =>
      ((i * 37 % 170) / 1.0 - 85.0, (i * 53 % 360) / 1.0 - 180.0)
    }.toDF("lat", "lon")
    val st = Hilbert.layoutStats(pts, "lat", "lon", res = 7, prefixBits = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(st.map(_._2).sum == 500L)
    st.foreach { case (fk, _, minD, maxD, minX, maxX, minY, maxY) =>
      assert(minD >> 10 == fk && maxD >> 10 == fk) // file = d-prefix, exact
      assert(minX <= maxX && minY <= maxY)
    }
  }

  test("hilbert bboxRanges: maximal contiguous runs partitioning the bbox exactly") {
    import graft.cell.Hilbert
    val got = Hilbert.bboxRanges(spark, 6, 10, 25, 33, 40)
      .as[(Long, Long, Long)].collect()
    val ds = (for { x <- 10L to 25L; y <- 33L to 40L } yield Hilbert.d(6, x, y)).toSet
    assert(got.map(_._3).sum === 128L)
    for ((s, e, n) <- got) {
      assert(e - s + 1 === n, s"range [$s,$e] not dense")
      assert((s to e).forall(ds.contains), s"range [$s,$e] leaves the bbox")
      // maximality: the run cannot extend either way
      assert(!ds.contains(s - 1) && !ds.contains(e + 1), s"range [$s,$e] not maximal")
    }
    // disjoint cover
    assert(got.flatMap(r => r._1 to r._2).toSet === ds)
  }
}
