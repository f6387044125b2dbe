package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.QuantExpr

/** Direct pins on the fused quantizer kernel expressions ([[graft.sim
  * .QuantExpr]]): column results must be BIT-IDENTICAL to an
  * independently-written scalar reference (the same math the ANN DuckDB
  * oracles replay), under both codegen'd and interpreted evaluation, and
  * null vectors/elements must yield null. The end-to-end ANN oracles
  * (q52/q54/q55/q65/q66/q89) cover composition; this spec catches kernel
  * drift at the unit level, where the failure message says WHICH kernel.
  */
class QuantExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic fixture: 40 vectors of dim 16, values in [-1, 1)
  private val dim = 16
  private val rnd = new scala.util.Random(0xC0FFEE)
  private val vecs: Seq[(Long, Seq[Float])] =
    (0L until 40L).map(i => (i, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  private val cents: Array[(Int, Array[Double])] = {
    val r = new scala.util.Random(0xBEEF)
    // non-contiguous cids exercise the label-not-index contract
    Array.tabulate(6)(p => (p * 3 + 1, Array.fill(dim)(r.nextDouble() - 0.5)))
  }
  private val m = 4
  private val dsub = dim / m
  private val ksub = 5
  private val cbs: Array[Array[(Int, Array[Double])]] = {
    val r = new scala.util.Random(0xD00D)
    Array.tabulate(m)(_ => Array.tabulate(ksub - 1)(p => // one dropped cid
      (p + 1, Array.fill(dsub)(r.nextDouble() - 0.5))))
  }

  private def df = vecs.toDF("vec_id", "embedding")

  // ——— independent scalar reference (same math as the DuckDB oracles) ———
  private def refSqDist(v: Seq[Float], off: Int, cv: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < cv.length && off + i < v.length) {
      val t = v(off + i) - cv(i); d += t * t; i += 1
    }
    d
  }
  private def refNearest(cs: Array[(Int, Array[Double])], v: Seq[Float]): Int = {
    var best = -1; var bestD = Double.MaxValue
    cs.foreach { case (ci, cv) =>
      val d = refSqDist(v, 0, cv)
      if (d < bestD || (d == bestD && ci < best)) { best = ci; bestD = d }
    }
    best
  }
  private def refProbes(cs: Array[(Int, Array[Double])], v: Seq[Float],
      nprobe: Int): Seq[Int] =
    cs.map { case (ci, cv) => (refSqDist(v, 0, cv), ci) }
      .sortBy(identity).take(nprobe).map(_._2).toSeq
  private def refResidual(cs: Array[(Int, Array[Double])], v: Seq[Float],
      cid: Int): Seq[Float] = {
    val cv = cs.find(_._1 == cid).get._2
    v.indices.map(i => (v(i).toDouble - cv(i)).toFloat)
  }
  private def refCodes(v: Seq[Float]): Seq[Int] =
    (0 until m).map { j =>
      refNearest(cbs(j), Seq.tabulate(dsub)(i => v(j * dsub + i)))
    }
  private def refLut(v: Seq[Float]): Seq[Double] = {
    val lut = Array.fill(m * ksub)(0.0)
    for (j <- 0 until m; (ci, cv) <- cbs(j))
      lut(j * ksub + ci) = refSqDist(v, j * dsub, cv)
    lut.toSeq
  }

  test("nearest_cid is bit-identical to the scalar argmin (label cids)") {
    val got = df.select(col("vec_id"),
        QuantExpr.nearestCid(spark, col("embedding"), cents).as("cid"))
      .as[(Long, Int)].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === refNearest(cents, v), s"vec $id")
    }
  }

  test("quant_probes returns the nprobe nearest by (distance, cid)") {
    val got = df.select(col("vec_id"),
        QuantExpr.probes(spark, col("embedding"), cents, 3).as("p"))
      .as[(Long, Seq[Int])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === refProbes(cents, v, 3), s"vec $id")
    }
    // nprobe past the centroid count returns all of them, ordered
    val all = df.limit(1).select(
        QuantExpr.probes(spark, col("embedding"), cents, 99))
      .as[Seq[Int]].head()
    assert(all === refProbes(cents, vecs.head._2, cents.length))
  }

  test("residual_f32 rounds each element through float exactly") {
    val got = df.select(col("vec_id"),
        QuantExpr.residualF32(spark, col("embedding"),
          QuantExpr.nearestCid(spark, col("embedding"), cents), cents).as("r"))
      .as[(Long, Seq[Float])].collect().toMap
    vecs.foreach { case (id, v) =>
      val bits = got(id).map(java.lang.Float.floatToIntBits)
      val ref = refResidual(cents, v, refNearest(cents, v))
        .map(java.lang.Float.floatToIntBits)
      assert(bits === ref, s"vec $id")
    }
  }

  test("pq_codes / pq_lut / pq_adc are bit-identical to the scalar chain") {
    val got = df.select(col("vec_id"),
        QuantExpr.pqCodes(spark, col("embedding"), cbs).as("codes"),
        QuantExpr.pqLut(spark, col("embedding"), cbs, ksub).as("lut"))
      .withColumn("adist",
        QuantExpr.pqAdc(spark, col("codes"), col("lut"), ksub))
      .as[(Long, Seq[Int], Seq[Double], Double)].collect()
    got.foreach { case (id, codes, lut, adist) =>
      val v = vecs(id.toInt)._2
      assert(codes === refCodes(v), s"codes of vec $id")
      assert(lut.map(java.lang.Double.doubleToLongBits) ===
        refLut(v).map(java.lang.Double.doubleToLongBits), s"lut of vec $id")
      // self-ADC: Σⱼ lut[j·ksub + codes[j]], fold order left-to-right
      val ref = refCodes(v).zipWithIndex
        .foldLeft(0.0) { case (s, (c, j)) => s + refLut(v)(j * ksub + c) }
      assert(java.lang.Double.doubleToLongBits(adist) ===
        java.lang.Double.doubleToLongBits(ref), s"adc of vec $id")
    }
  }

  test("sign_sig is bit-identical to the scalar signature kernel") {
    // the scalar kernel is itself pinned by q30's DuckDB oracle (the
    // hyperplane CTE replays the same ascending-dim accumulation)
    for (nBits <- Seq(8, 16)) {
      val got = df.select(col("vec_id"),
          QuantExpr.signSig(spark, col("embedding"), nBits).as("sig"))
        .as[(Long, Int)].collect().toMap
      vecs.foreach { case (id, v) =>
        assert(got(id) === graft.sim.Similarity.signature(v.toArray, nBits),
          s"vec $id at nBits=$nBits")
      }
    }
  }

  test("sign_sig quarantines null vectors and null elements to null") {
    val withNulls = spark.sql(
      """SELECT * FROM VALUES
        |  (0L, array(cast(0.5 as float), cast(0.25 as float))),
        |  (1L, cast(null as array<float>)),
        |  (2L, array(cast(0.5 as float), cast(null as float)))
        |AS t(vec_id, embedding)""".stripMargin)
    val got = withNulls.select(col("vec_id"),
        QuantExpr.signSig(spark, col("embedding"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got(0L).isNullAt(1), "clean row must sign")
    assert(got(1L).isNullAt(1), "null vector must quarantine")
    assert(got(2L).isNullAt(1), "null element must quarantine")
  }

  test("interpreted eval matches codegen bit-for-bit") {
    val q = df.select(col("vec_id"),
      QuantExpr.nearestCid(spark, col("embedding"), cents).as("cid"),
      QuantExpr.pqCodes(spark, col("embedding"), cbs).as("codes"),
      QuantExpr.pqLut(spark, col("embedding"), cbs, ksub).as("lut"),
      QuantExpr.signSig(spark, col("embedding"), 16).as("sig"))
    val gen = q.collect().map(_.toString).sorted
    val codegenConf = "spark.sql.codegen.wholeStage"
    val factoryConf = "spark.sql.codegen.factoryMode"
    val (c0, f0) = (spark.conf.get(codegenConf), spark.conf.get(factoryConf))
    try {
      spark.conf.set(codegenConf, "false")
      spark.conf.set(factoryConf, "NO_CODEGEN")
      assert(q.collect().map(_.toString).sorted === gen)
    } finally {
      spark.conf.set(codegenConf, c0)
      spark.conf.set(factoryConf, f0)
    }
  }

  test("null vector and null element both yield null, not garbage") {
    val withNulls = spark.sql(
      """SELECT * FROM VALUES
        |  (0L, array(cast(0.5 as float), cast(0.25 as float))),
        |  (1L, cast(null as array<float>)),
        |  (2L, array(cast(0.5 as float), cast(null as float)))
        |AS t(vec_id, embedding)""".stripMargin)
    val c2 = Array((0, Array(0.0, 0.0)), (1, Array(1.0, 1.0)))
    val cb2 = Array.fill(2)(Array((0, Array(0.0)), (1, Array(1.0))))
    val got = withNulls.select(col("vec_id"),
        QuantExpr.nearestCid(spark, col("embedding"), c2).as("cid"),
        QuantExpr.probes(spark, col("embedding"), c2, 1).as("p"),
        QuantExpr.pqCodes(spark, col("embedding"), cb2).as("codes"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got(0L).isNullAt(1) && !got(0L).isNullAt(2) && !got(0L).isNullAt(3))
    for (id <- Seq(1L, 2L); i <- 1 to 3)
      assert(got(id).isNullAt(i), s"row $id col $i must be null")
  }

  test("wrong-dim vectors quarantine to null in PQ/residual/JL kernels") {
    // a truncated embedding must never encode or rank (the old scalar
    // UDFs zero-padded or threw); nearest_cid stays defined for any
    // length (scalar-parity prefix distance)
    val short = spark.sql(
      "SELECT array(cast(0.5 as float), cast(0.25 as float)) AS embedding")
    val r = short.select(
      QuantExpr.pqCodes(spark, col("embedding"), cbs).as("codes"),
      QuantExpr.pqLut(spark, col("embedding"), cbs, ksub).as("lut"),
      QuantExpr.residualF32(spark, col("embedding"),
        lit(cents.head._1), cents).as("res"),
      QuantExpr.jlProject(spark, col("embedding"),
        Array.fill(2)(Array.fill(dim)(1.0))).as("jl"),
      QuantExpr.nearestCid(spark, col("embedding"), cents).as("cid"))
      .head()
    for (i <- 0 to 3) assert(r.isNullAt(i), s"col $i must be null")
    assert(!r.isNullAt(4), "nearest_cid is defined for any length")
  }

  test("ADC ranking drops corrupt rows instead of surfacing them first") {
    // one corpus row with a null embedding: its adist is null, which ASC
    // window ordering would rank FIRST - the pipelines must filter it
    val corpus = spark.sql(
      """SELECT * FROM VALUES
        |  (cast(100 as bigint), array(cast(0.1 as float), cast(0.2 as float))),
        |  (cast(101 as bigint), cast(null as array<float>)),
        |  (cast(102 as bigint), array(cast(0.9 as float), cast(0.8 as float)))
        |AS t(vec_id, embedding)""".stripMargin)
    val q = corpus.filter(col("vec_id") === 100L)
    val got = graft.sim.Similarity.pqTopK(spark, q, corpus, k = 2, m = 1, ksub = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got === Set(102L), s"corrupt row must never rank: $got")
  }

  test("all-NaN vectors quarantine to null instead of crashing the ADC path") {
    // every distance to an all-NaN vector is NaN, so the argmin never
    // fires: the raw -1 cid crashed residual_f32's unknown-cid require
    // (one corrupt row aborted the whole q66-style job) and a -1 PQ code
    // would index lut[-1]
    val nan = spark.sql(
      "SELECT array(cast('NaN' as float), cast('NaN' as float)) AS embedding")
    val c2 = Array((0, Array(0.0, 0.0)), (1, Array(1.0, 1.0)))
    val cb2 = Array.fill(2)(Array((0, Array(0.0)), (1, Array(1.0))))
    val r = nan.select(
      QuantExpr.nearestCid(spark, col("embedding"), c2).as("cid"),
      QuantExpr.pqCodes(spark, col("embedding"), cb2).as("codes")).head()
    assert(r.isNullAt(0), "all-NaN vector must not assign a coarse cid")
    assert(r.isNullAt(1), "all-NaN vector must not PQ-encode")
    // end-to-end: a NaN corpus row never ranks and never aborts
    val corpus = spark.sql(
      """SELECT * FROM VALUES
        |  (cast(100 as bigint), array(cast(0.1 as float), cast(0.2 as float))),
        |  (cast(101 as bigint), array(cast('NaN' as float), cast('NaN' as float))),
        |  (cast(102 as bigint), array(cast(0.9 as float), cast(0.8 as float)))
        |AS t(vec_id, embedding)""".stripMargin)
    val q = corpus.filter(col("vec_id") === 100L)
    val got = graft.sim.Similarity.ivfpqTopK(spark, q, corpus, k = 2,
        nlist = 2, m = 1, ksub = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!got.contains(101L), s"NaN row must never rank: $got")
    // query-side: an all-NaN query selects no probes (an arbitrary probe
    // list would hand the corrupt query k arbitrary "neighbors")
    val p = nan.select(
      QuantExpr.probes(spark, col("embedding"), c2, 1).as("p")).head()
    assert(p.isNullAt(0), "NaN query must not select probes")
    // cosine ranking: NaN sorts FIRST under desc — the corrupt corpus row
    // must be filtered, not surfaced as every query's top-1
    val brute = graft.sim.Similarity.bruteForceTopK(q, corpus, k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!brute.contains(101L), s"NaN row must never cosine-rank: $brute")
  }

  test("array<double> vectors implicit-cast into the kernels (UDF-era analyzer behavior)") {
    // the retired ScalaUDFs declared Seq[Float] so the analyzer cast
    // array<double> embeddings before the kernel; without inputTypes the
    // expressions would read double-backed ArrayData via getFloat and
    // produce GARBAGE silently — this pin keeps the coercion in place
    val dbl = spark.sql(
      "SELECT array(cast(0.5 as double), cast(0.25 as double)) AS embedding")
    val c2 = Array((0, Array(0.0, 0.0)), (7, Array(1.0, 1.0)))
    val r = dbl.select(
      QuantExpr.nearestCid(spark, col("embedding"), c2).as("cid"),
      QuantExpr.signSig(spark, col("embedding"), 16).as("sig")).head()
    assert(r.getInt(0) === 0, "nearest to the origin centroid")
    assert(r.getInt(1) ===
      graft.sim.Similarity.signature(Array(0.5f, 0.25f), 16),
      "signature must equal the float-kernel value after coercion")
  }

  test("ANN plans stay free of UDFs AND interpreted HOF lambdas") {
    val sf = "/root/testdata/sf0.001"
    // q30 joins the strict list with the fused sign_sig kernel + static
    // band arrays; q28's bucket-local pair-gen CASE keeps its (bounded,
    // candidate-sized) lambdas, so it is pinned ScalaUDF-free below
    for (q <- Seq("q52_ann_ivf", "q65_ann_pq", "q66_ann_ivfpq",
        "q30_ann_lsh")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"), s"$q has a UDF:\n$plan")
      assert(!plan.contains("lambdafunction"),
        s"$q fell back to interpreted higher-order lambdas (the 4-6x " +
          s"regression this spec exists to prevent):\n$plan")
    }
    val p28 = SparkEntry.queries("q28_embed_neardup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p28.contains("ScalaUDF"),
      s"q28's signature pass must stay codegen'd:\n$p28")
  }
}
