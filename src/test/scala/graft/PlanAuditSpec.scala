package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the plan properties the 100 TB design depends on — not just that
  * queries return the right rows, but that they produce the PLAN a 1000-
  * executor cluster needs: filters and projections reaching the parquet
  * scan, broadcast joins where the build side is small, and no shuffle in
  * the narrow image→tile streaming phase.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("filter and projection push down to the parquet scan (q01 shape)") {
    val df = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      s"filter must reach the scan:\n$plan")
    // ReadSchema carries only the needed columns (projection + filter col),
    // not the full events schema
    val readSchema = "ReadSchema: ([^\\n]*)".r.findFirstMatchIn(plan).get.group(1)
    assert(readSchema.contains("event_id") && readSchema.contains("event_type"))
    assert(!readSchema.contains("props"), s"unused column read: $readSchema")
  }

  test("column pruning: 2-column aggregate reads 2 of 16 lineitem columns") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: ([^\\n]*)".r.findFirstMatchIn(plan).get.group(1)
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan reads more than the projection needs: $readSchema")
  }

  test("q60 sequence packing has no global sort and exactly one big-side exchange") {
    val df = SparkEntry.queries("q60_sequence_pack")(spark, sf)
    // string-level audit (AQE wraps the tree, so node collect() won't
    // descend): SortExec prints as `Sort [keys], <global>, ...`
    val plan = df.queryExecution.executedPlan.toString
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"q60 must not contain a global (single-partition) sort:\n$plan")
    // the only exchange is the hash-by-shard repartition for the window;
    // per-shard chunk offsets enter as a literal map, not a join
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(plan).length == 1,
      s"expected exactly 1 exchange (shard hash):\n$plan")
    assert(!plan.contains("Exchange SinglePartition") && !plan.contains("rangepartitioning"),
      s"single-partition / range exchange in q60 plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "chunk offsets must be a literal map lookup, not a join")
  }

  test("q68/q69 span-dedup and tfidf plans: partitioned windows only, no global sort") {
    for (q <- Seq("q68_dup_spans", "q69_tfidf")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global (single-partition) sort:\n$plan")
      assert(!plan.contains("Exchange SinglePartition") && !plan.contains("rangepartitioning"),
        s"single-partition / range exchange in $q plan:\n$plan")
    }
  }

  test("q122 prefix-filter Jaccard join: no single-partition sort over the vocabulary") {
    // the per-doc prefix window orders by the raw (f, item) key; a global
    // rank window here would materialize the whole (corpus-growing)
    // vocabulary through one partition — pinned out of the plan
    val plan = SparkEntry.queries("q122_jaccard_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"q122 must not contain a global (single-partition) sort:\n$plan")
    assert(!plan.contains("Exchange SinglePartition") && !plan.contains("rangepartitioning"),
      s"single-partition / range exchange in q122 plan:\n$plan")
  }

  test("q138/q139/q140 scale shapes: no window/global sort; q139 exchange-free") {
    // q138: LM scoring is groupBys + hash joins — never a window or a
    // global sort (the scalar V aggregate's 1-row exchange is inherent)
    val p138 = SparkEntry.queries("q138_lm_surprisal")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p138.contains("Window"), s"q138 must not window:\n$p138")
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(p138).isDefined &&
      !p138.contains("rangepartitioning"),
      s"q138 must not globally sort:\n$p138")
    // q139: per-image decode+RLE is NARROW — zero exchanges of any kind
    val p139 = SparkEntry.queries("q139_rle_mask")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p139.contains("Exchange"), s"q139 must be exchange-free:\n$p139")
    // q140: adjacency is edge-key groupBys — never polygon×polygon
    val p140 = SparkEntry.queries("q140_contiguity")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p140.contains("CartesianProduct") && !p140.contains("Window"),
      s"q140 must not cross-join or window:\n$p140")
    // q141: Moran is hash joins + 1-row broadcast aggregates — the only
    // nested-loop joins allowed are the broadcast scalar re-attaches
    val p141 = SparkEntry.queries("q141_moran")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p141.contains("CartesianProduct") && !p141.contains("Window") &&
      !p141.contains("rangepartitioning"),
      s"q141 must not cartesian/window/sort:\n$p141")
    // q142/q143: LISA and the global battery keep the same discipline —
    // hash joins + broadcast scalar re-attaches only
    Seq("q142_lisa", "q143_autocorr").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("Window") &&
        !p.contains("rangepartitioning"),
        s"$q must not cartesian/window/sort:\n$p")
    }
  }

  test("q70/q72 top-k plans end in TakeOrdered, never a global sort") {
    for (q <- Seq("q70_top_terms", "q72_collocations")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q: expected TakeOrderedAndProject top-k:\n$plan")
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global sort:\n$plan")
    }
  }

  test("flagship spatial join is broadcast on the polygon side, never SMJ/NLJ") {
    val plan = SparkEntry.flagship(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "the 10^12-row probe side must not sort-shuffle")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "PIP must not degenerate to NLJ")
  }

  test("image→assign→tile streaming phase has no exchange except the final count") {
    val imgs = graft.img.ImageTable.generate(spark, 200, 4).toDF()
      .withColumn("idx", substring(col("image_id"), 5, 9).cast("long"))
      .withColumn("lat", graft.functions.GraftFunctions.latOfKey(col("idx")))
      .withColumn("lon", graft.functions.GraftFunctions.lonOfKey(col("idx")))
    // a PRE-BUILT polygon set (the polygon-index build legitimately
    // shuffles once at fixed cost; here we audit the per-image path only)
    import spark.implicits._
    val polys = spark.createDataset(Seq(graft.geom.PolygonRow("world", Seq(Seq(
      graft.geom.Pt(-89f, -179f), graft.geom.Pt(-89f, 179f),
      graft.geom.Pt(89f, 179f), graft.geom.Pt(89f, -179f))), 1L, 8L)))
    val assigned = graft.join.SpatialJoin.assign(spark, imgs, polys, res = 7)
    val tiles = graft.tile.Tiling.tile(spark, assigned)
    val plan = tiles.groupBy().count().queryExecution.executedPlan.toString
    // broadcast exchanges are fine (tiny build sides); the big image stream
    // itself must never hash-repartition before the final 1-row count
    val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(plan).length
    assert(shuffles == 0, s"streaming phase must not shuffle the image stream:\n$plan")
  }

  test("whole-stage codegen covers the probe-side refine filter (native expression)") {
    // AQE wraps stages in QueryStageExec, which the codegen-explain walker
    // does not descend into — audit the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.flagship(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      // the ray-cast filter must appear INSIDE the plan (not as an
      // interpreted fallback wrapper)
      assert(plan.contains("ray_cast_contains"))
      // "*(n)" node prefixes mark whole-stage-codegen'd operators
      assert(plan.contains("*("), s"refine fell out of codegen:\n$plan")
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
      val m = "Found (\\d+) WholeStageCodegen subtrees".r.findFirstMatchIn(codegen)
      assert(m.isDefined && m.get.group(1).toInt >= 1, s"no codegen subtrees:\n${codegen.take(800)}")
      // and the generated code really calls the native kernel (codegen'd
      // doGenCode path, not CodegenFallback)
      assert(codegen.contains("RayCastKernel.contains"),
        "ray-cast should be generated as a static kernel call")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** Counts Spark jobs triggered while `body` runs — the driver-round
    * overhead audit for the iterative/setup-heavy operators.
    */
  private def countJobs[A](body: => A): (A, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val a = body
      // listener bus is async — wait for quiescence before reading
      var last = -1; var stable = 0; var waited = 0
      while (stable < 2 && waited < 3000) {
        val c = n.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
        Thread.sleep(50); waited += 50
      }
      (a, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("minhashPairs shuffles exactly twice: bucket groupBy + pair-dedup agg") {
    // the r2 regression was a THIRD exchange (a standalone pair distinct());
    // the verify joins must stay broadcast (texts are the small side)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import spark.implicits._
      val docs = (0L until 100L).map(i => (i, s"w$i a b c d e f g")).toDF("doc_id", "text")
      val plan = graft.dedup.Dedup.minhashPairs(spark, docs, 0.5)
        .queryExecution.executedPlan.toString
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(hashEx == 2, s"expected 2 hash exchanges, got $hashEx:\n$plan")
      assert("BroadcastExchange".r.findAllIn(plan).length >= 2,
        s"verify joins must broadcast the texts side:\n$plan")
      assert(!plan.contains("SortMergeJoin"), "no sort-merge in the verify path")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("connectedComponents driver cutover costs ONE job for metadata-sized graphs") {
    import spark.implicits._
    val edges = (0L until 500L).map(i => (i, i + 1)).toDF("src", "dst")
    val (planStr, jobs) = countJobs {
      val out = graft.dedup.Dedup.connectedComponents(spark, edges)
      out.queryExecution.optimizedPlan.toString
    }
    // the labels frame is a driver-local collection, not a distributed plan
    assert(planStr.contains("LocalRelation"), s"expected LocalRelation:\n$planStr")
    // one early-terminating limit+collect scan; the union-find itself and
    // the result frame are driver-local (r2 paid 3+ rounds × 4 jobs here)
    assert(jobs <= 1, s"driver cutover ran $jobs jobs")
  }

  test("ivfTopK runs ONE pre-query job (sample TakeOrdered); training is driver-side") {
    import spark.implicits._
    val vecs = (0 until 300).map { i =>
      (i.toLong, (0 until 8).map(d =>
        (graft.img.ImageTable.splitmix64(i * 31 + d).toDouble / Long.MaxValue).toFloat))
    }.toDF("vec_id", "embedding").localCheckpoint(true) // isolate setup jobs
    val q = vecs.filter(col("vec_id") < 5)
    val (_, jobs) = countJobs {
      graft.sim.Similarity.ivfTopK(spark, q, vecs, k = 3, nlist = 4, nprobe = 2)
      () // construction only — the returned frame is lazy
    }
    assert(jobs <= 1, s"IVF setup ran $jobs jobs (r2 paid 2/iteration + a dim probe)")
  }

  test("splitmixCol: bit parity with the scalar kernel, pure codegen (no UDF)") {
    import spark.implicits._
    val df = spark.range(-500, 500).toDF("id")
      .select(col("id"), graft.functions.GraftFunctions.splitmixCol(spark, col("id")).as("h"))
    df.as[(Long, Long)].collect().foreach { case (i, h) =>
      assert(h == graft.img.ImageTable.splitmix64(i), s"mismatch at $i")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"splitmixCol fell out of codegen:\n$plan")
  }

  test("star join: fact table streams through FOUR broadcast dims, one shuffle at the agg") {
    val plan = SparkEntry.queries("q59_star_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 4, s"expected 4 broadcast joins:\n$plan")
    // the only exchange is the final aggregation's — the fact scan never
    // shuffles through the dimension chain
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, s"extra shuffles:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$plan")
  }

  test("q115 segment overlay: no aggregate/dedup exchange, no cartesian, one join") {
    val df = SparkEntry.queries("q115_segment_overlay")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // reference-point dedup is a FILTER: distinct pairs must not cost an
    // Aggregate (dropDuplicates) or any exchange beyond the cell equi-join
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"q115 must dedup by reference point, not aggregation:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q115 must join on the cell key, never a cross product:\n$plan")
  }

  test("q117 teleport filter: one device-key window, no extra exchange") {
    val df = SparkEntry.queries("q117_teleport_filter")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1,
      s"expected exactly the window's device-key exchange:\n$plan")
    assert(!plan.contains("Exchange SinglePartition") && !plan.contains("rangepartitioning"),
      s"q117 must not sort or gather globally:\n$plan")
  }

  test("q52/q65/q66 ANN plans carry no ScalaUDF anywhere") {
    // quantizer assignment, PQ encode, LUT build, probe selection, and
    // ADC scoring are all native column folds over typedLit codebooks —
    // the corpus-sized sides stay inside codegen'd expressions
    for (q <- Seq("q52_ann_ivf", "q65_ann_pq", "q66_ann_ivfpq")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
        s"$q plan contains a UDF:\n$plan")
    }
  }

  test("q121 apriori prune is a broadcast; q128 geohash plan has no UDF") {
    val p121 = SparkEntry.queries("q121_frequent_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p121.contains("BroadcastHashJoin"),
      s"frequent-term prune must broadcast:\n$p121")
    val p128 = SparkEntry.queries("q128_geohash")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p128.contains("ScalaUDF") && !p128.contains("BatchEvalPython"),
      s"geohash must be pure column arithmetic:\n$p128")
    assert(!p128.contains("Exchange"),
      s"geohash is a narrow projection, no shuffle:\n$p128")
  }

  test("semanticDedup costs TWO pre-output jobs: quantizer sample + edge collect") {
    import spark.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, (0 until 8).map(d =>
        (graft.img.ImageTable.splitmix64(i * 31 + d).toDouble / Long.MaxValue).toFloat))
    }.toDF("vec_id", "embedding").localCheckpoint(true) // isolate setup jobs
    val (_, jobs) = countJobs {
      graft.sim.Similarity.semanticDedup(spark, vecs, minCosine = 0.99, nlist = 4)
      () // construction only — the returned frame is lazy
    }
    // 1: bounded splitmix sample (TakeOrdered); 2+3: the early-terminating
    // edge collect inside connectedComponents' driver cutover — the edge
    // pipeline has one exchange, which AQE materializes as its own job
    // before the result job. The final label join stays lazy — the
    // caller's action is the only further scan.
    assert(jobs <= 3, s"semanticDedup setup ran $jobs jobs")
  }

  test("q145/q151/q152 scale shapes: zonal join broadcast; binned pair joins never cartesian") {
    val zonal = SparkEntry.queries("q145_zonal_stats")(spark, sf)
      .queryExecution.executedPlan.toString
    // the zone raster rides a broadcast — the pixel side stays map-side
    assert(zonal.contains("BroadcastHashJoin"), s"zonal join must broadcast zones:\n$zonal")
    assert(!zonal.contains("CartesianProduct") && !zonal.contains("BroadcastNestedLoopJoin"),
      s"cartesian in q145 plan:\n$zonal")
    for (q <- Seq("q151_distance_band", "q152_ripley_k")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      // the distance predicate must ride the cell equi-join, never a
      // points×points nested loop, and no global sort anywhere. q152
      // legitimately carries ONE BroadcastNestedLoopJoin: the 1-row
      // global-count crossJoin (metadata-sized by construction).
      assert(!plan.contains("CartesianProduct"),
        s"$q pair generation degenerated to a cross product:\n$plan")
      val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      val nljBudget = if (q == "q152_ripley_k") 1 else 0
      assert(nlj <= nljBudget,
        s"$q has $nlj nested-loop joins (budget $nljBudget):\n$plan")
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global sort:\n$plan")
    }
  }

  test("q157 salted assign really shuffles: salt key present, candidate join not broadcast") {
    val plan = SparkEntry.queries("q157_assign_salted")(spark, sf)
      .queryExecution.executedPlan.toString
    // the candidate join must be the salted shuffle (that is the point);
    // the rings re-attach stays broadcast (unique per polygon, small)
    assert(plan.contains("salt"), s"salt column missing from q157 plan:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      s"q157 candidate join must shuffle on (cell, salt):\n$plan")
  }

  test("q147 focal and q149 areal plans: no window, no global sort, no cartesian") {
    for (q <- Seq("q147_focal_stats", "q149_areal_interp")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$q must not use a window:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"cartesian in $q plan:\n$plan")
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global sort:\n$plan")
    }
  }

  test("SAT windows are image-row/column grained — never image-global") {
   for (q <- Seq("q166_integral_image", "q172_haar_features")) {
    val plan = SparkEntry.queries(q)(spark, sf)
      .queryExecution.executedPlan.toString
    // both cumulative windows must partition by (image_id, axis); a
    // window keyed on image_id alone would serialize each image onto one
    // task — the 100 TB hazard this operator is designed around
    // Spark prints windowspecdefinition(...) inside the Window node; audit
    // the partition columns through the spec strings
    val specs = "windowspecdefinition\\(([^)]*), [a-z]+#".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(specs.nonEmpty, s"expected window specs in plan:\n$plan")
    assert(specs.forall(s => s.split(", ").length >= 2),
      s"every SAT window must carry a 2-column partition key, got $specs")
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"$q must not contain a global sort:\n$plan")
   }
  }

  test("q170 quadtree: broadcast parent joins, no window, no global sort") {
    val plan = SparkEntry.queries("q170_quadtree")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"parent joins must broadcast the cell-sized parent side:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cartesian in q170 plan:\n$plan")
    assert(!plan.contains("Window"), s"q170 must not use a window:\n$plan")
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"q170 must not contain a global sort:\n$plan")
  }

  test("q176/q177 neighbor joins ride cell equi-joins — no cartesian") {
    for (q <- Seq("q176_idw", "q177_border_weights")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"cartesian in $q plan:\n$plan")
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global sort:\n$plan")
    }
  }

  test("lattice-BFS queries are scatter+join — no window, no cartesian") {
    for (q <- Seq("q167_voronoi_assign", "q168_cost_distance")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$q must not use a window:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"cartesian in $q plan:\n$plan")
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global sort:\n$plan")
    }
  }

  test("q165 separable distance transform: run-partitioned windows, bounded exchanges") {
    // the closed-form rewrite replaced the D-round BFS loop with four
    // window passes over per-run partitions (id, axis, run) — assert the
    // whole field is TWO hash exchanges, every sort partition-local,
    // and no join/cartesian/loop remains in the plan
    val plan = SparkEntry.queries("q165_distance_transform")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"q165 should use window passes:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"q165 must stay <= 2 hash exchanges, saw $exchanges:\n$plan")
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"q165 must not contain a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"q165 closed form must not join at all:\n$plan")
  }

  test("q192 line raster is pure column arithmetic — zero exchanges, no UDF") {
    val plan = SparkEntry.queries("q192_line_raster")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q192 must not shuffle:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("lambdafunction"),
      s"q192 must stay codegen'd column arithmetic:\n$plan")
  }

  test("q186 slope/aspect rides hash exchanges only — no window, no global sort") {
    val plan = SparkEntry.queries("q186_slope_aspect")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q186 must not use a window:\n$plan")
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"q186 must not contain a global sort:\n$plan")
    assert(!plan.contains("Exchange SinglePartition") &&
      !plan.contains("rangepartitioning"),
      s"q186 must not concentrate on one partition:\n$plan")
  }

  test("q200 map matching broadcasts the road network — no shuffle join on points") {
    val plan = SparkEntry.queries("q200_map_match")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"q200 must not shuffle-join the points against the network:\n$plan")
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"q200 must not contain a global sort:\n$plan")
    assert(plan.contains("Broadcast"),
      s"q200's network side must broadcast:\n$plan")
  }

  test("q193 skyline: candidate set broadcasts into the dominance anti-join") {
    val plan = SparkEntry.queries("q193_skyline")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") && plan.contains("LeftAnti"),
      s"q193's dominance filter must be a broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"q193 must not shuffle or go cartesian:\n$plan")
  }

  test("q190/q199 mosaics: narrow decode into exactly one world-cell exchange") {
    for (q <- Seq("q190_mosaic", "q199_feather_mosaic")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning\\(wx".r.findAllIn(plan).length == 1,
        s"$q: expected exactly one world-cell exchange:\n$plan")
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global sort:\n$plan")
    }
  }

  test("q226/q227 per-row kernels are exchange-free (no shuffle at any scale)") {
    for (q <- Seq("q226_template_match", "q227_pitch")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$q is a narrow per-row kernel and must not shuffle:\n$plan")
    }
  }

  test("series battery q220-q230: grp-keyed windows only, no global sort") {
    for (q <- Seq("q220_lag_autocorr", "q221_changepoint", "q222_ranksum",
        "q228_mad", "q229_runs_test", "q230_spearman")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global (single-partition) sort:\n$plan")
      assert(!plan.contains("Exchange SinglePartition") ||
        plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
        s"single-partition exchange in $q plan:\n$plan")
      assert(!plan.contains("rangepartitioning"),
        s"range exchange in $q plan:\n$plan")
    }
  }

  test("q232 chi-square: the one-row total broadcasts, never shuffles the cells") {
    val plan = SparkEntry.queries("q232_chisq")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"q232's total must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"q232 must not shuffle-join or go cartesian:\n$plan")
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"q232 must not contain a global sort:\n$plan")
  }

  test("q233 convexity: ring-keyed hash joins only, no window, no global sort") {
    val plan = SparkEntry.queries("q233_convexity")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q233 must not use a window:\n$plan")
    assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"q233 must not contain a global sort:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"q233 must not range-partition:\n$plan")
  }

  test("q238/q241 vocabulary- and series-keyed plans: no global sort anywhere") {
    // q238's windows partition by word (vocabulary-keyed), q241's by
    // device group — the O(n³) expansion must stay inside per-group
    // hash exchanges, never a single-partition or range sort
    for (q <- Seq("q238_bpe_step", "q241_isotonic")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global (single-partition) sort:\n$plan")
      assert(!plan.contains("rangepartitioning"),
        s"range exchange in $q plan:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"cartesian in $q plan:\n$plan")
    }
  }

  test("q243-q257 wave: no global sort, no range exchange, no cartesian") {
    // iterative outputs (q243/q256/q257) are localCheckpoint-truncated,
    // so this pins their FINAL stage plans; the rest pin end-to-end.
    // q244/q252 rank windows partition by query/zone; q249-q251 windows
    // by zone/device; q253-q255 are hash joins + aggregations only.
    for (q <- Seq("q243_articulation", "q244_mutual_knn", "q246_pivot",
        "q249_rect_union", "q250_trimmed_mean", "q251_ks_test",
        "q252_ransac_line", "q253_morans_i", "q254_gearys_c",
        "q255_simpson", "q256_mst", "q257_single_linkage")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global (single-partition) sort:\n$plan")
      assert(!plan.contains("rangepartitioning"),
        s"range exchange in $q plan:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"cartesian in $q plan:\n$plan")
      assert(!plan.contains("ScalaUDF"), s"UDF in $q plan:\n$plan")
    }
  }

  test("q258-q264 eval/inference wave: broadcast dims, no global sort, no UDF") {
    for (q <- Seq("q258_knn_classify", "q259_rand_index", "q260_local_morans",
        "q261_bipartite", "q262_linear_infer", "q263_reliability",
        "q264_admin_nesting")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global (single-partition) sort:\n$plan")
      assert(!plan.contains("rangepartitioning"),
        s"range exchange in $q plan:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"cartesian in $q plan:\n$plan")
      assert(!plan.contains("ScalaUDF"), s"UDF in $q plan:\n$plan")
    }
    // the weight grid and polygon dimension must BROADCAST
    for (q <- Seq("q262_linear_infer", "q264_admin_nesting")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastExchange") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"$q's dimension side must broadcast:\n$plan")
    }
  }

  test("q265-q272 analytics wave: no global sort over rows, no cartesian, no UDF") {
    // q265's cutoff windows run over DISTINCT-VALUE histograms and
    // q267's cumsums over 50-doc buckets — both value/bucket-domain
    // sized (the q98 pattern), so the plans may contain a
    // single-partition window over that bounded side but never a
    // range exchange or cartesian; the rest are hash aggs, grp-keyed
    // windows, and broadcast scalar joins
    for (q <- Seq("q265_rfm", "q266_fano", "q267_vocab_growth",
        "q268_iqr_outliers", "q269_survivorship", "q270_dq_report",
        "q271_dag_layers", "q272_autocomplete")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("rangepartitioning"),
        s"range exchange in $q plan:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"cartesian in $q plan:\n$plan")
      assert(!plan.contains("ScalaUDF"), s"UDF in $q plan:\n$plan")
    }
    // the device/vocab-keyed ones additionally pin no global sort
    for (q <- Seq("q266_fano", "q268_iqr_outliers", "q270_dq_report",
        "q272_autocomplete")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q must not contain a global (single-partition) sort:\n$plan")
    }
  }

  test("q273-q275 mining/audit wave: no range exchange, no cartesian, no UDF") {
    for (q <- Seq("q273_hard_negatives", "q274_count_of_counts",
        "q275_coverage_gaps")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("rangepartitioning"),
        s"range exchange in $q plan:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"cartesian in $q plan:\n$plan")
      assert(!plan.contains("ScalaUDF"), s"UDF in $q plan:\n$plan")
    }
  }

  test("q242 per-image kernel is narrow: zero exchanges, no UDF") {
    for (q <- Seq("q242_marching_squares")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$q decodes and classifies in-task — no shuffle belongs here:\n$plan")
      assert(!plan.contains("ScalaUDF"), s"UDF in $q plan:\n$plan")
    }
  }
}
